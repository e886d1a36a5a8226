"""Structured-Streaming incremental materialization.

The reference has no streaming API, but its Rete network IS an incremental
insert-only maintenance engine: new triples re-enter the same network and only
new consequences propagate (README.md:9; RuleEngine.scala:67-78). This module
is the Spark-native equivalent: a stream of asserted triples drives
`FixpointEngine.incremental` through foreachBatch, so each micro-batch pays
only for its own consequences — the materialized store is never recomputed.

Event-time windowing / watermarks belong to the *analytics* layer (see
__spark_entry__.events_windowed); inference is monotone and insert-only, so
late data simply arrives as another micro-batch (set semantics absorb
duplicates — R11).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from arachne_spark.engine import FixpointEngine, FixpointResult, TRIPLE_SCHEMA


def stream_triples(spark: SparkSession, path: str) -> DataFrame:
    """Read a growing directory of parquet triple files as a stream (the
    simplest exactly-once triple source; swap for Kafka/Iceberg CDC at
    cluster scale — the sink logic below is source-agnostic)."""
    return spark.readStream.schema(TRIPLE_SCHEMA).parquet(path)


class IncrementalMaterializer:
    """foreachBatch sink: keeps the fixpoint result up to date as asserted
    triples stream in."""

    def __init__(
        self,
        engine: FixpointEngine,
        initial: Optional[FixpointResult] = None,
        on_batch: Optional[Callable[[int, FixpointResult], None]] = None,
    ) -> None:
        self.engine = engine
        self.result: Optional[FixpointResult] = initial
        self.on_batch = on_batch
        self.batches_processed = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if self.result is None:
            self.result = self.engine.materialize(batch_df)
        else:
            self.result = self.engine.incremental(self.result, batch_df)
        self.batches_processed += 1
        if self.on_batch:
            self.on_batch(batch_id, self.result)

    def run(
        self,
        stream: DataFrame,
        *,
        checkpoint_location: str,
        available_now: bool = True,
    ):
        """Start the query. With available_now=True, processes everything
        currently in the source then stops (batch-incremental mode); with
        False, runs continuously with the default trigger."""
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_location)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
