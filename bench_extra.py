"""Round-6 optimization profiler (guide §1): per-query isolation with the
noop sink, per-round engine phase timings, and .explain("formatted") capture.

NOT part of the frozen driver contract (bench.py is the measured harness);
this file exists so OPTIMIZATION_r06.md's numbers are reproducible.

Usage:
    python bench_extra.py [query ...]        # default: all
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32

Prints a JSON line per query: {"query":..., "sec":..., "phases": {...}} and
writes plans to plans/r06/<query>_profile.txt when PLANS=1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def profile_kg_materialize(spark, sf_dir, sf_label):
    """bench.py's kg_materialize, with RoundMetrics phases surfaced."""
    from arachne_spark.engine import FixpointEngine
    from arachne_spark.model import OWL_SAMEAS, RDF_TYPE, RDFS_SUBCLASSOF, encode_iri
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
    t0 = time.time()
    strict = strict_superclass_triples([(r["s"], r["o"]) for r in sco.collect()])
    t_collect = time.time() - t0
    asserted = (
        types.union(sco)
        .union(edges)
        .union(tbox_extra)
        .union(sames)
        .union(spark.createDataFrame(strict, "s string, p string, o string"))
    )
    rules = RuleSet(list(owl_rl_core()) + [indirect_type_rule()])
    t1 = time.time()
    res = FixpointEngine(spark, rules).materialize(asserted)
    t_mat = time.time() - t1
    rounds = [
        {"round": m.round, "din": m.delta_in, "dout": m.delta_out,
         "sec": m.seconds, "phases": m.phases}
        for m in res.metrics
    ]
    return {"sec": round(time.time() - t0, 3), "collect_sco": round(t_collect, 3),
            "materialize": round(t_mat, 3), "rounds": rounds,
            "facts": res.facts_count}


def profile_fixpoint_tc(spark, sf_dir, sf_label):
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
    t0 = time.time()
    res = FixpointEngine(spark, rules).materialize(tree)
    rounds = [
        {"round": m.round, "din": m.delta_in, "dout": m.delta_out,
         "sec": m.seconds, "phases": m.phases}
        for m in res.metrics
    ]
    return {"sec": round(time.time() - t0, 3), "rounds": rounds,
            "facts": res.facts_count}


def profile_kg_extract_link(spark, sf_dir, sf_label):
    from arachne_spark.kg import gen_code_files, gen_entity_dict
    from arachne_spark.kg.pipeline import build_triples

    n_files = max(int(float(sf_label) * 100_000), 2_000)
    t0 = time.time()
    corpus = gen_code_files(spark, n_files)
    edict = gen_entity_dict(spark)
    triples = build_triples(corpus, edict)
    n = triples.count()
    return {"sec": round(time.time() - t0, 3), "triples": n}


def profile_dedup_minhash(spark, sf_dir, sf_label):
    from arachne_spark.functions import lsh_candidate_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.time()
    n = lsh_candidate_pairs(docs).count()
    return {"sec": round(time.time() - t0, 3), "pairs": n}


def profile_knn(spark, sf_dir, sf_label):
    from arachne_spark.functions import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    t0 = time.time()
    n = cosine_topk(emb, emb.filter(F.col("vec_id") < 20), k=10).count()
    return {"sec": round(time.time() - t0, 3), "rows": n}


def profile_text_quality(spark, sf_dir, sf_label):
    from arachne_spark.functions import quality_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.time()
    n = quality_features(docs).count()
    return {"sec": round(time.time() - t0, 3), "rows": n}


PROFILES = {
    "kg_materialize": profile_kg_materialize,
    "fixpoint_tc": profile_fixpoint_tc,
    "kg_extract_link": profile_kg_extract_link,
    "dedup_minhash": profile_dedup_minhash,
    "knn": profile_knn,
    "text_quality": profile_text_quality,
}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("PROFILE_REPS", "2"))
    from arachne_spark.session import build_session

    spark = build_session(
        "arachne_profile",
        cores=cpus,
        shuffle_partitions=cpus,
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    sf_label = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    names = sys.argv[1:] or list(PROFILES)
    for rep in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"profile:{name}")
            out = PROFILES[name](spark, sf_dir, sf_label)
            print(json.dumps({"rep": rep, "query": name, **out}), flush=True)
            spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
