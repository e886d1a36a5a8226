from arachne_spark.sources.ntriples import read_ntriples, write_ntriples
from arachne_spark.sources.tripleio import (
    read_facts_parquet,
    write_facts_parquet,
    read_flat_parquet,
    write_flat_parquet,
)

__all__ = [
    "read_ntriples",
    "write_ntriples",
    "read_facts_parquet",
    "write_facts_parquet",
    "read_flat_parquet",
    "write_flat_parquet",
]
