from __future__ import annotations

import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arachne_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session("arachne_spark_tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()


def triples_df(spark, triples):
    """list of (s,p,o) encoded tuples -> engine DataFrame."""
    from arachne_spark.engine import TRIPLE_SCHEMA

    return spark.createDataFrame([tuple(t) for t in triples], TRIPLE_SCHEMA)


def spo_set(df):
    return {(r["s"], r["p"], r["o"]) for r in df.collect()}
