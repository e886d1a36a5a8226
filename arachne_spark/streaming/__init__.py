from arachne_spark.streaming.incremental import IncrementalMaterializer, stream_triples

__all__ = ["IncrementalMaterializer", "stream_triples"]
