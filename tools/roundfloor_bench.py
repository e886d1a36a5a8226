"""Round-floor measurement for the predicate-bucketed facts store (SURVEY O1).

The fixpoint's late rounds have tiny deltas but still scan the FULL facts
store once per active rule variant (BENCH r2 measured ~9 s/round at 40M
facts). With `pred_partitioned=True` the store lives as parquet partitioned
by a predicate hash bucket and every const-predicate alpha selection prunes
to its bucket's files. This harness runs the SAME multi-predicate KG
fixpoint twice in fresh JVM children — in-memory store vs bucketed store —
on identical input and reports wall, per-round seconds, and the facts
checksum (must match exactly).

Usage:
  python tools/roundfloor_bench.py --n-files 2000000 [--cores 16]
  python tools/roundfloor_bench.py --run-child mem|store --n-files N --cores C
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_child(variant: str, n_files: int, cores: int) -> None:
    from pyspark.sql import functions as F

    from arachne_spark.engine import FixpointEngine
    from arachne_spark.kg import gen_code_files, gen_entity_dict
    from arachne_spark.kg.pipeline import build_triples
    from arachne_spark.model import RDF_TYPE, RDFS_SUBCLASSOF, RDFS_SUBPROPERTYOF, encode_iri
    from arachne_spark.owlrl import OWL, indirect_type_rule, owl_rl_core, strict_superclass_triples
    from arachne_spark.rules import RuleSet
    from arachne_spark.session import build_session

    spark = build_session(
        f"roundfloor_{variant}",
        cores=cores,
        shuffle_partitions=cores * 2,
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    corpus = gen_code_files(spark, n_files)
    edict = gen_entity_dict(spark)
    abox = build_triples(corpus, edict, dedup=False).localCheckpoint(eager=True)
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
    tbox.append(("<http://example.org/code/extends>", TYPE, encode_iri(OWL + "TransitiveProperty")))
    tbox.append(("<http://example.org/code/calls>", SPO, "<http://example.org/code/dependsOn>"))
    tbox += strict_superclass_triples(kind_edges)
    asserted = abox.unionByName(spark.createDataFrame(tbox, "s string, p string, o string"))
    rules = RuleSet(list(owl_rl_core()) + [indirect_type_rule()])

    with tempfile.TemporaryDirectory() as td:
        kwargs = {}
        if variant == "store":
            kwargs = {"checkpoint_dir": td, "pred_partitioned": True}
        t0 = time.time()
        res = FixpointEngine(spark, rules, **kwargs).materialize(asserted)
        t_infer = time.time() - t0
        checksum = res.facts.select(
            F.sum(
                F.pmod(F.xxhash64(F.concat_ws("", "s", "p", "o")), F.lit(2147483647))
            ).alias("c")
        ).collect()[0]["c"]
    print(
        json.dumps(
            {
                "variant": variant,
                "cores": cores,
                "n_files": n_files,
                "facts": res.facts_count,
                "rounds": res.rounds,
                "checksum": int(checksum),
                "t_infer": round(t_infer, 2),
                "round_seconds": [m.seconds for m in res.metrics],
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-files", type=int, default=2_000_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--run-child", choices=["mem", "store"])
    args = ap.parse_args()
    if args.run_child:
        run_child(args.run_child, args.n_files, args.cores)
        return
    results = {}
    for variant in ["mem", "store"]:
        p = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--run-child",
                variant,
                "--n-files",
                str(args.n_files),
                "--cores",
                str(args.cores),
            ],
            capture_output=True,
            text=True,
        )
        lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print(f"child {variant} failed:", p.stderr[-2000:], file=sys.stderr)
            return
        results[variant] = json.loads(lines[-1])
        print(lines[-1])
    assert results["mem"]["checksum"] == results["store"]["checksum"], "RESULTS DIFFER"
    m, s = results["mem"], results["store"]
    print(
        f"\nmem   t_infer={m['t_infer']}s rounds={m['round_seconds']}\n"
        f"store t_infer={s['t_infer']}s rounds={s['round_seconds']}\n"
        f"checksums identical: {m['checksum']}"
    )


if __name__ == "__main__":
    main()
