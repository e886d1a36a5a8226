from arachne_spark.kg.datagen import gen_code_files, gen_entity_dict
from arachne_spark.kg.extract import extract_mentions, mentions_to_triples
from arachne_spark.kg.link import link_mentions
from arachne_spark.kg.canon import connected_components, canonicalize

__all__ = [
    "gen_code_files",
    "gen_entity_dict",
    "extract_mentions",
    "mentions_to_triples",
    "link_mentions",
    "connected_components",
    "canonicalize",
]
