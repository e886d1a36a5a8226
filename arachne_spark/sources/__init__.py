from arachne_spark.sources.folder import read_rdf_folder
from arachne_spark.sources.ntriples import read_nquads, read_ntriples, write_ntriples
from arachne_spark.sources.rdfxml import parse_rdfxml, read_rdfxml
from arachne_spark.sources.turtle import parse_turtle, read_turtle
from arachne_spark.sources.tripleio import (
    read_facts_parquet,
    write_facts_parquet,
    read_flat_parquet,
    write_flat_parquet,
)

__all__ = [
    "parse_rdfxml",
    "read_rdf_folder",
    "read_nquads",
    "parse_turtle",
    "read_ntriples",
    "read_rdfxml",
    "read_turtle",
    "write_ntriples",
    "read_facts_parquet",
    "write_facts_parquet",
    "read_flat_parquet",
    "write_flat_parquet",
]
