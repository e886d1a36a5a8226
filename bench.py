"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Runs the full suite $SPARK_GRAFT_BENCH_REPS times (default 3) and reports
BEST-OF-N per query plus per-query spread and per-rep /proc/stat steal
seconds — this host shows bursty hypervisor steal (identical jobs varied
28-77 s; BENCH_r03 moved +9-57% on byte-identical outputs), so single-run
round-over-round comparisons are unusable (VERDICT r3 missing #1 /
next-round #3). BASELINE.md's protocol is best-of-N with steal recorded;
this makes the driver's BENCH_rN follow it.

Prints ONE JSON line:
  {"metric": "...", "value": <total best sec>, "unit": "sec",
   "queries": {...per-query BEST sec...}, "queries_spread": {...max-min...},
   "reps": N, "steal_sec": [per-rep], "sf": ..., "triples_per_sec": ...,
   "facts_materialized": ..., "rounds": ...}

Headliners:
- kg_materialize: the flagship — triples derived from the sf tables
  (typed customers, nation/region class hierarchy, supplier peer edges,
  sameAs sprinkles) through the OWL-RL core fixpoint. The north-rule metric
  (triples materialized/sec to fixpoint) comes from this query.
- fixpoint_tc: deep-recursion stress (binary-tree closure, log-rounds).
- kg_extract_link: extraction + linking + canonicalization over a synthetic
  code corpus sized by the sf (mapInPandas + broadcast join + CC).
- dedup_minhash / knn / text_quality: the training-data operators.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def _steal_jiffies() -> int:
    try:
        with open("/proc/stat", encoding="utf-8") as f:
            return int(f.readline().split()[8])  # cpu line, steal field
    except Exception:
        return 0


def run_suite(spark, sf_dir: str, sf_label: str) -> tuple[dict, dict]:
    """One full pass over the headline queries -> (timings, extras)."""
    timings: dict[str, float] = {}
    extras: dict = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # ---- kg_materialize (north-rule headline) ------------------------------
    def kg_materialize():
        from arachne_spark.engine import FixpointEngine
        from arachne_spark.model import (
            OWL_SAMEAS,
            RDF_TYPE,
            RDFS_SUBCLASSOF,
            encode_iri,
        )
        from arachne_spark.owlrl import (
            indirect_type_rule,
            owl_rl_core,
            strict_superclass_triples,
        )
        from arachne_spark.rules import RuleSet

        TYPE, SCO, SAME = (
            encode_iri(RDF_TYPE),
            encode_iri(RDFS_SUBCLASSOF),
            encode_iri(OWL_SAMEAS),
        )
        customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        region = spark.read.parquet(f"{sf_dir}/region.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

        def eid(prefix, col):
            return F.concat(F.lit(f"<{prefix}"), col.cast("string"), F.lit(">"))

        types = customer.select(
            eid("c", F.col("c_custkey")).alias("s"),
            F.lit(TYPE).alias("p"),
            eid("nat", F.col("c_nationkey")).alias("o"),
        )
        sco = nation.select(
            eid("nat", F.col("n_nationkey")).alias("s"),
            F.lit(SCO).alias("p"),
            eid("reg", F.col("n_regionkey")).alias("o"),
        ).union(
            region.select(
                eid("reg", F.col("r_regionkey")).alias("s"),
                F.lit(SCO).alias("p"),
                F.lit("<world>").alias("o"),
            )
        )
        # object-property edges with a transitive property declaration:
        # order -> customer (hasCust), declared under a property hierarchy
        edges = orders.select(
            eid("o", F.col("o_orderkey")).alias("s"),
            F.lit("<p:hasCust>").alias("p"),
            eid("c", F.col("o_custkey")).alias("o"),
        )
        spo = encode_iri("http://www.w3.org/2000/01/rdf-schema#subPropertyOf")
        tbox_extra = spark.createDataFrame(
            [("<p:hasCust>", spo, "<p:linkedTo>")], "s string, p string, o string"
        )
        sames = customer.filter(F.col("c_custkey") % 97 == 0).select(
            eid("c", F.col("c_custkey")).alias("s"),
            F.lit(SAME).alias("p"),
            eid("dup", F.col("c_custkey")).alias("o"),
        )
        strict = strict_superclass_triples(
            [(r["s"], r["o"]) for r in sco.collect()]
        )
        asserted = (
            types.union(sco)
            .union(edges)
            .union(tbox_extra)
            .union(sames)
            .union(spark.createDataFrame(strict, "s string, p string, o string"))
        )
        rules = RuleSet(list(owl_rl_core()) + [indirect_type_rule()])
        res = FixpointEngine(spark, rules).materialize(asserted)
        extras["facts_materialized"] = res.facts_count
        extras["rounds"] = res.rounds
        extras["asserted"] = res.metrics[0].facts_total
        return res

    timed("kg_materialize", kg_materialize)

    # ---- fixpoint_tc --------------------------------------------------------
    def fixpoint_tc():
        from arachne_spark.engine import FixpointEngine
        from arachne_spark.rules import load_rules_json

        customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
        tree = customer.filter(F.col("c_custkey") > 1).select(
            F.concat(F.lit("<n"), F.col("c_custkey").cast("string"), F.lit(">")).alias("s"),
            F.lit("<p:up>").alias("p"),
            F.concat(
                F.lit("<n"), (F.col("c_custkey") / 2).cast("long").cast("string"), F.lit(">")
            ).alias("o"),
        )
        rules = load_rules_json(
            [{"name": "tc", "body": [["?x", "p:up", "?y"], ["?y", "p:up", "?z"]],
              "head": [["?x", "p:up", "?z"]]}]
        )
        res = FixpointEngine(spark, rules).materialize(tree)
        extras["tc_facts"] = res.facts_count
        return res

    timed("fixpoint_tc", fixpoint_tc)

    # ---- kg_extract_link ----------------------------------------------------
    def kg_extract_link():
        from arachne_spark.kg import gen_code_files, gen_entity_dict
        from arachne_spark.kg.pipeline import build_triples

        n_files = max(int(float(sf_label) * 100_000), 2_000)
        corpus = gen_code_files(spark, n_files)
        edict = gen_entity_dict(spark)
        triples = build_triples(corpus, edict)
        extras["kg_triples_extracted"] = triples.count()
        return None

    timed("kg_extract_link", kg_extract_link)

    # ---- training-data operators -------------------------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def dedup_minhash():
        from arachne_spark.functions import lsh_candidate_pairs

        return lsh_candidate_pairs(docs).count()

    def knn():
        from arachne_spark.functions import cosine_topk

        return cosine_topk(emb, emb.filter(F.col("vec_id") < 20), k=10).count()

    def text_quality():
        from arachne_spark.functions import quality_features

        return quality_features(docs).count()

    timed("dedup_minhash", dedup_minhash)
    timed("knn", knn)
    timed("text_quality", text_quality)
    return timings, extras


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    from arachne_spark.session import build_session

    spark = build_session(
        "arachne_bench",
        cores=cpus,
        shuffle_partitions=cpus,
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    sf_label = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    all_timings: list[dict[str, float]] = []
    steals: list[float] = []
    extras: dict = {}
    for _ in range(max(1, reps)):
        s0 = _steal_jiffies()
        timings, extras = run_suite(spark, sf_dir, sf_label)
        steals.append(round((_steal_jiffies() - s0) / 100.0, 1))
        all_timings.append(timings)

    best = {
        q: min(t[q] for t in all_timings) for q in all_timings[0]
    }
    spread = {
        q: round(max(t[q] for t in all_timings) - best[q], 3)
        for q in all_timings[0]
    }
    total = round(sum(best.values()), 3)
    if best["kg_materialize"] > 0:
        extras["triples_per_sec"] = round(
            extras["facts_materialized"] / best["kg_materialize"], 1
        )
    out = {
        "metric": "e2e_headline_sec",
        "value": total,
        "unit": "sec",
        "queries": best,
        "queries_spread": spread,
        "reps": max(1, reps),
        "steal_sec": steals,
        "sf": float(sf_label) if sf_label.replace(".", "").isdigit() else sf_label,
        "cpus": cpus,
        **extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
