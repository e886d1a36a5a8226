"""Round-6 optimization internals: SQL-text variant compilation must be
result-identical to the DataFrame compiler, scan fan-out must be a pure
repartition (same rows, no-op when already parallel), and canonicalize's
driver fast path must equal the distributed CC path."""

from pyspark.sql import functions as F

from arachne_spark.engine import TRIPLE_SCHEMA, FixpointEngine
from arachne_spark.functions._parallel import fan_out
from arachne_spark.kg.canon import canonicalize
from arachne_spark.rules import load_rules_json

# shapes that exercise every sqlgen branch: symmetric 1-atom, var-predicate
# join, const-only existence gate, true cross product, repeated-var guard,
# plus a literal containing a quote and a backslash
_RULES = [
    {"name": "sym", "body": [["?x", "p:same", "?y"]],
     "head": [["?y", "p:same", "?x"]]},
    {"name": "rep", "body": [["?x", "p:same", "?y"], ["?x", "?p", "?z"]],
     "head": [["?y", "?p", "?z"]]},
    {"name": "gate", "body": [["a", "p:flag", "on"], ["?x", "p:t", None]],
     "head": [["?x", "p:t2", "m"]]},
    {"name": "cross", "body": [["?a", "p:l", None], ["?b", "p:r", None]],
     "head": [["?a", "p:pair", "?b"]]},
    {"name": "guard", "body": [["?x", "p:rel", "?x"]],
     "head": [["?x", "p:selfy", "yes"]]},
]

_ROWS = [
    ("<a>", "<p:flag>", "<on>"),
    ("<x1>", "<p:same>", "<x2>"),
    ("<x1>", "<p:t>", "<v>"),
    ("<q1>", "<p:l>", "<z>"),
    ("<q2>", "<p:r>", "<z>"),
    ("<x2>", "<p:w>", "<k>"),
    ("<s>", "<p:rel>", "<s>"),
    ("<s>", "<p:rel>", "<u>"),
    ("<lit>", "<p:t>", '"it\'s a \\\\ test"'),
]


def test_sql_compile_matches_dataframe_compile(spark):
    rules = load_rules_json(_RULES)
    data = spark.createDataFrame(_ROWS, TRIPLE_SCHEMA)
    base = None
    for sql_mode in (False, True):
        for enc in (False, True):
            res = FixpointEngine(
                spark, rules, dict_encode=enc, sql_compile=sql_mode
            ).materialize(data)
            got = sorted(tuple(r) for r in res.facts.collect())
            if base is None:
                base = got
            assert got == base, (sql_mode, enc)
    assert len(base) > len(_ROWS)  # rules actually fired


def test_sql_compile_store_mode_matches(spark, tmp_path):
    """__pb bucket-pruning conditions in generated SQL (store mode)."""
    rules = load_rules_json(
        [{"name": "tc", "body": [["?x", "p:up", "?y"], ["?y", "p:up", "?z"]],
          "head": [["?x", "p:up", "?z"]]}]
    )
    tree = spark.createDataFrame(
        [(f"<n{i}>", "<p:up>", f"<n{i + 1}>") for i in range(8)], TRIPLE_SCHEMA
    )
    outs = []
    for sql_mode in (False, True):
        res = FixpointEngine(
            spark, rules, dict_encode=True, sql_compile=sql_mode,
            checkpoint_dir=str(tmp_path / f"cp{sql_mode}"),
            pred_partitioned=True,
        ).materialize(tree)
        outs.append(sorted(tuple(r) for r in res.facts.collect()))
    assert outs[0] == outs[1] and len(outs[0]) == 8 * 9 // 2


def test_fan_out_repartitions_only_when_narrow(spark):
    one = spark.createDataFrame([(i,) for i in range(100)], "x long").coalesce(1)
    wide = fan_out(one)
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert sorted(r["x"] for r in wide.collect()) == list(range(100))
    # already at/above parallelism -> returned unchanged (no extra shuffle)
    assert fan_out(wide) is wide


def test_canonicalize_driver_matches_distributed(spark, tmp_path):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "alias": ["A", "a", "B", "b", "shared", "shared", "C"],
            "canonical_iri": [
                "http://x/A", "http://x/A", "http://x/B", "http://x/B",
                "http://x/A", "http://x/B", "http://x/C",
            ],
            "kind": ["k"] * 7,
            "prior": [0.5] * 7,
        }
    )
    edict = spark.createDataFrame(pdf)
    fast = sorted(tuple(r) for r in canonicalize(edict).collect())
    slow = sorted(
        tuple(r) for r in canonicalize(edict, driver_threshold=0).collect()
    )
    assert fast == slow
    # 'shared' alias merges the A and B clusters; C stays alone
    m = dict(fast)
    assert m["http://x/A"] == m["http://x/B"] == "http://x/A"
    assert m["http://x/C"] == "http://x/C"


def test_stage0_observation_stats_match_grouped_job(spark):
    """Round-0 stats folded into the stage-0 checkpoint's Observation must be
    bit-identical to the separate grouped _delta_stats job they replace
    (gate counts + total; lineage is the documented opt-in exception)."""
    rules = load_rules_json(_RULES)
    eng = FixpointEngine(spark, rules)
    data = spark.createDataFrame(_ROWS, TRIPLE_SCHEMA)
    ctx = eng._string_ctx
    facts, n, stats0 = eng._stage0_checkpoint(data.distinct(), ctx)
    preds_ref, total_ref, _ = eng._delta_stats(facts, ctx)
    assert stats0 is not None
    preds_obs, total_obs, lineage_obs = stats0
    assert total_obs == total_ref == n == len(set(_ROWS))
    assert preds_obs == preds_ref
    assert lineage_obs == []
    # lineage tracking keeps the grouped job path (stats0 None)
    eng_l = FixpointEngine(spark, rules, track_lineage=True)
    _, n_l, stats0_l = eng_l._stage0_checkpoint(data.distinct(), ctx)
    assert stats0_l is None and n_l == n
    # end-to-end: folded and grouped paths materialize identical facts
    a = sorted(tuple(r) for r in eng.materialize(data).facts.collect())
    b = sorted(tuple(r) for r in eng_l.materialize(data).facts.collect())
    assert a == b
