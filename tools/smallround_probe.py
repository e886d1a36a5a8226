"""Attribute per-variant cost inside fixpoint rounds (the small-delta-round
decomposition).

Round 3 of the scaling bench derives ZERO rows yet costs 8-46 s of
`derive_distinct` — data-proportional to TOTAL facts, not to the 600-row
delta. This tool runs the same pipeline at a modest size with the engine's
`variant_probe` channel on, then prints per-round, per-variant (rule,
position) row counts and seconds, so the expensive branches are named
instead of guessed.

    python tools/smallround_probe.py --n-files 4000000 --cores 16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-files", type=int, default=4000000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--mult", type=int, default=2)
    ap.add_argument("--mode", default="local")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", str(args.cores))
    master = None
    if args.mode == "local-cluster":
        exec_cores = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "4"))
        exec_mem_mb = int(os.environ.get("SPARK_GRAFT_EXEC_MEM_MB", "6144"))
        n_exec = max(1, args.cores // exec_cores)
        master = f"local-cluster[{n_exec},{exec_cores},{exec_mem_mb}]"
        os.environ["SPARK_GRAFT_EXECUTOR_MEM"] = f"{exec_mem_mb - 1024}m"
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from arachne_spark.engine import FixpointEngine
    from arachne_spark.kg import gen_code_files, gen_entity_dict
    from arachne_spark.kg.pipeline import build_triples
    from arachne_spark.model import (
        RDF_TYPE,
        RDFS_SUBCLASSOF,
        RDFS_SUBPROPERTYOF,
        encode_iri,
    )
    from arachne_spark.owlrl import (
        OWL,
        indirect_type_rule,
        owl_rl_core,
        strict_superclass_triples,
    )
    from arachne_spark.rules import RuleSet
    from arachne_spark.session import build_session

    spark = build_session(
        "smallround_probe",
        cores=args.cores,
        shuffle_partitions=args.cores * args.mult,
        extra={"spark.ui.showConsoleProgress": "false"},
        master=master,
    )

    corpus = gen_code_files(spark, args.n_files)
    edict = gen_entity_dict(spark)
    triples = build_triples(corpus, edict, dedup=False, staging="none")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    abox_dir = tempfile.mkdtemp(prefix="probe_abox_", dir=base) + "/triples"
    obs = Observation()
    t0 = time.time()
    triples.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
        "overwrite"
    ).parquet(abox_dir)
    n_abox = obs.get["n"]
    abox = spark.read.parquet(abox_dir)
    print(f"staged {n_abox} abox triples in {time.time()-t0:.1f}s", flush=True)

    TYPE, SCO, SPO = (
        encode_iri(RDF_TYPE),
        encode_iri(RDFS_SUBCLASSOF),
        encode_iri(RDFS_SUBPROPERTYOF),
    )
    K = "http://example.org/code/Kind/"
    kind_edges = [
        (encode_iri(K + "class"), encode_iri(K + "entity")),
        (encode_iri(K + "func"), encode_iri(K + "entity")),
        (encode_iri(K + "module"), encode_iri(K + "entity")),
        (encode_iri(K + "entity"), encode_iri(K + "thing")),
    ]
    tbox = [(s, SCO, o) for s, o in kind_edges]
    tbox.append(
        (
            "<http://example.org/code/extends>",
            TYPE,
            encode_iri(OWL + "TransitiveProperty"),
        )
    )
    tbox.append(
        ("<http://example.org/code/calls>", SPO, "<http://example.org/code/dependsOn>")
    )
    tbox += strict_superclass_triples(kind_edges)
    asserted = abox.unionByName(
        spark.createDataFrame(tbox, "s string, p string, o string")
    )

    ckpt_dir = tempfile.mkdtemp(prefix="probe_fixpoint_", dir=base)
    rules = RuleSet(list(owl_rl_core()) + [indirect_type_rule()])
    eng = FixpointEngine(spark, rules, checkpoint_dir=ckpt_dir)
    eng.variant_probe = []
    t0 = time.time()
    res = eng.materialize(asserted, row_hint=n_abox + len(tbox))
    t_infer = time.time() - t0
    print(f"facts={res.facts_ids.count() if res.facts_ids is not None else res.facts.count()} rounds={res.rounds} infer={t_infer:.1f}s")
    for m in res.metrics:
        print(f"round {m.round}: out={m.delta_out} phases={m.phases}")
    print("\nper-variant attribution (rows / seconds):")
    by_round: dict = {}
    for rec in eng.variant_probe:
        by_round.setdefault(rec["round"], []).append(rec)
    for rnd in sorted(by_round):
        print(f"  round {rnd}:")
        for rec in sorted(by_round[rnd], key=lambda r: -r["seconds"]):
            print(
                f"    {rec['rule']:>14s}[{rec['variant']}] rows={rec['rows']:>10} {rec['seconds']:7.2f}s"
            )
    print(json.dumps({"probe": eng.variant_probe}))
    spark.stop()


if __name__ == "__main__":
    main()
