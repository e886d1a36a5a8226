"""Parquet triple store IO — the canonical sink/source at scale (SURVEY S5).

Two layouts:
- *flat* (interchange): the 6-column schema of FIXTURES.md §3.
- *facts* (engine): encoded 3-column schema, optionally bucketed by a
  predicate hash partition column ``p_bucket`` so constant-predicate alpha
  patterns get partition pruning at the scan (O1: the reference's 8-mask alpha
  dispatch becomes physical partition pruning). At cluster scale the same
  layout maps to an Iceberg table with a `bucket(p, N)` hidden partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arachne_spark.model import TRIPLE_COLS, decode_triples, encode_triples

P_BUCKETS = 32


def _with_bucket(df: DataFrame) -> DataFrame:
    return df.withColumn("p_bucket", F.pmod(F.xxhash64("p"), F.lit(P_BUCKETS)))


def write_facts_parquet(
    df: DataFrame, path: str, partition_by_predicate: bool = True, mode: str = "overwrite"
) -> None:
    if partition_by_predicate:
        _with_bucket(df).write.mode(mode).partitionBy("p_bucket").parquet(path)
    else:
        df.select(*TRIPLE_COLS).write.mode(mode).parquet(path)


def read_facts_parquet(
    spark: SparkSession, path: str, predicate: str | None = None
) -> DataFrame:
    """Read the facts store; with ``predicate`` (an *encoded* term), add the
    bucket filter so Spark prunes partitions before the scan."""
    df = spark.read.parquet(path)
    if predicate is not None:
        df = df.filter(F.col("p") == predicate)
        if "p_bucket" in df.columns:
            # recompute the bucket driver-side via a 1-row job-free literal:
            # xxhash64 must match Spark's — use a tiny Spark expression instead
            b = (
                spark.range(1)
                .select(F.pmod(F.xxhash64(F.lit(predicate)), F.lit(P_BUCKETS)).alias("b"))
                .collect()[0]["b"]
            )
            df = df.filter(F.col("p_bucket") == b)
    return df.select(*TRIPLE_COLS)


def write_flat_parquet(encoded: DataFrame, path: str, mode: str = "overwrite") -> None:
    decode_triples(encoded).write.mode(mode).parquet(path)


def read_flat_parquet(spark: SparkSession, path: str) -> DataFrame:
    return encode_triples(spark.read.parquet(path))
