"""Per-substage timing of the extract+link+canon stage at two parallelism
levels — localizes the non-scaling floor the e2e gate dies in.

Substages (each forced by a checkpoint/count so timings don't fuse):
  gen      — synthetic corpus materialization
  extract  — codegen'd regexp mention extraction (checkpointed)
  link     — vocabulary scoring + broadcast join back
  canon    — alias connected-components + coalesce
  triples  — (s,p,o) projection + checkpoint (the abox the engine consumes)

Usage:
  python tools/extract_decompose.py --n-files 2000000 --cores 4
  (run once per level in a fresh process; compare the printed JSON)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-files", type=int, default=2_000_000)
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--mode", default="local")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from arachne_spark.kg import gen_code_files, gen_entity_dict
    from arachne_spark.kg.canon import canonicalize
    from arachne_spark.kg.extract import extract_mentions, mentions_to_triples
    from arachne_spark.kg.link import link_mentions
    from arachne_spark.model import RDF_TYPE, encode_iri
    from arachne_spark.session import build_session

    master = None
    if args.mode == "local-cluster":
        n_exec = max(1, args.cores // 4)
        master = f"local-cluster[{n_exec},4,6144]"
        os.environ["SPARK_GRAFT_EXECUTOR_MEM"] = "5120m"
    spark = build_session(
        f"exdec_{args.cores}",
        cores=args.cores,
        shuffle_partitions=args.cores * 2,
        extra={"spark.ui.showConsoleProgress": "false"},
        master=master,
    )
    t: dict[str, float] = {}

    t0 = time.time()
    corpus = gen_code_files(spark, args.n_files).localCheckpoint(eager=True)
    t["gen"] = time.time() - t0

    t0 = time.time()
    mentions = extract_mentions(corpus).localCheckpoint(eager=True)
    n_mentions = mentions.count()
    t["extract"] = time.time() - t0

    edict = gen_entity_dict(spark)
    t0 = time.time()
    linked = link_mentions(mentions, edict).localCheckpoint(eager=True)
    t["link"] = time.time() - t0

    t0 = time.time()
    canon = canonicalize(edict)
    linked2 = (
        linked.join(F.broadcast(canon), on="canonical_iri", how="left")
        .withColumn(
            "canonical_iri", F.coalesce(F.col("canonical"), F.col("canonical_iri"))
        )
        .drop("canonical")
    ).localCheckpoint(eager=True)
    t["canon"] = time.time() - t0

    t0 = time.time()
    edge = mentions_to_triples(linked2)
    typ = linked2.select(
        F.concat(F.lit("<"), F.col("canonical_iri"), F.lit(">")).alias("s"),
        F.lit(encode_iri(RDF_TYPE)).alias("p"),
        F.concat(
            F.lit("<http://example.org/code/Kind/"), F.col("kind"), F.lit(">")
        ).alias("o"),
    )
    abox = edge.unionByName(typ).localCheckpoint(eager=True)
    n_abox = abox.count()
    t["triples"] = time.time() - t0

    print(
        json.dumps(
            {
                "cores": args.cores,
                "mode": args.mode,
                "n_files": args.n_files,
                "n_mentions": n_mentions,
                "n_abox": n_abox,
                "timings": {k: round(v, 2) for k, v in t.items()},
                "total": round(sum(t.values()), 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
