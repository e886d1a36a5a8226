"""Incremental maintenance: engine.incremental equivalence with batch
materialization, and the Structured-Streaming foreachBatch driver."""

import pytest
from pyspark.sql import functions as F

from arachne_spark.engine import FixpointEngine, TRIPLE_SCHEMA
from arachne_spark.oracle import naive_fixpoint
from arachne_spark.rules import load_rules_json
from arachne_spark.streaming import IncrementalMaterializer, stream_triples
from tests.conftest import spo_set, triples_df

R = "http://ex/r"


def _rules():
    return load_rules_json(
        [{"name": "trans", "body": [["?x", R, "?y"], ["?y", R, "?z"]],
          "head": [["?x", R, "?z"]]}]
    )


def test_incremental_equals_batch(spark):
    base = [(f"<n{i}>", f"<{R}>", f"<n{i+1}>") for i in range(6)]
    extra = [(f"<n{i}>", f"<{R}>", f"<n{i+1}>") for i in range(6, 10)]
    eng = FixpointEngine(spark, _rules())
    res1 = eng.materialize(triples_df(spark, base))
    res2 = eng.incremental(res1, triples_df(spark, extra))
    batch = eng.materialize(triples_df(spark, base + extra))
    assert spo_set(res2.facts) == spo_set(batch.facts)
    assert spo_set(res2.facts) == naive_fixpoint(base + extra, _rules())


def test_incremental_noop_on_known_facts(spark):
    base = [("<a>", f"<{R}>", "<b>"), ("<b>", f"<{R}>", "<c>")]
    eng = FixpointEngine(spark, _rules())
    res1 = eng.materialize(triples_df(spark, base))
    res2 = eng.incremental(res1, triples_df(spark, base))  # all already known
    assert res2.facts_count == res1.facts_count
    # first-round delta was empty => one round, nothing derived
    assert res2.metrics[-1].delta_out == 0


def test_streaming_foreachbatch(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    batch1 = [(f"<n{i}>", f"<{R}>", f"<n{i+1}>") for i in range(5)]
    batch2 = [(f"<n{i}>", f"<{R}>", f"<n{i+1}>") for i in range(5, 9)]
    triples_df(spark, batch1).write.mode("append").parquet(src)
    eng = FixpointEngine(spark, _rules())
    mat = IncrementalMaterializer(eng)
    q = mat.run(stream_triples(spark, src), checkpoint_location=ckpt)
    q.awaitTermination(120)
    first_facts = spo_set(mat.result.facts)
    assert first_facts == naive_fixpoint(batch1, _rules())

    # second micro-batch arrives; availableNow query restarts from checkpoint
    triples_df(spark, batch2).write.mode("append").parquet(src)
    q2 = mat.run(stream_triples(spark, src), checkpoint_location=ckpt)
    q2.awaitTermination(120)
    assert spo_set(mat.result.facts) == naive_fixpoint(batch1 + batch2, _rules())
    assert mat.batches_processed == 2
