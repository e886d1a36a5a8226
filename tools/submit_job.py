"""spark-submit entry point for the KG-construction pipeline (north rule:
"runs via spark-submit --py-files ... on a multi-executor cluster").

The library ships as a zip on the executors' PYTHONPATH; this driver only
wires inputs and calls the packaged pipeline. Local replica of the cluster
invocation:

    cd /root/repo && zip -qr /tmp/arachne_spark.zip arachne_spark
    spark-submit --master 'local[8]' --py-files /tmp/arachne_spark.zip \
        tools/submit_job.py --n-files 100000 --output /tmp/kg_out

On a real cluster, swap --master for the cluster manager and point --data at
the Iceberg/parquet code-corpus table (columns repo, path, commit, lang,
content); --n-files synthesizes the same-shaped corpus instead (no external
data in this sandbox, BASELINE.json input_hint).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", help="parquet dir with (repo,path,commit,lang,content)")
    ap.add_argument("--n-files", type=int, default=100_000)
    ap.add_argument("--output", required=True, help="output dir (parquet triples)")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--inferred-only", action="store_true")
    args = ap.parse_args()

    # imports AFTER argparse: on the cluster these resolve from the
    # --py-files zip shipped to driver and executors
    from pyspark.sql import SparkSession

    from arachne_spark.engine import FixpointEngine
    from arachne_spark.kg import gen_code_files, gen_entity_dict
    from arachne_spark.kg.pipeline import build_triples
    from arachne_spark.model import RDF_TYPE, RDFS_SUBCLASSOF, encode_iri
    from arachne_spark.owlrl import owl_rl_core, strict_superclass_triples
    from arachne_spark.rules import RuleSet

    spark = SparkSession.builder.appName("arachne_spark_kg").getOrCreate()
    t0 = time.time()
    corpus = (
        spark.read.parquet(args.data)
        if args.data
        else gen_code_files(spark, args.n_files)
    )
    edict = gen_entity_dict(spark)
    abox = build_triples(corpus, edict, dedup=False)
    SCO = encode_iri(RDFS_SUBCLASSOF)
    K = "http://example.org/code/Kind/"
    kind_edges = [
        (encode_iri(K + "class"), encode_iri(K + "entity")),
        (encode_iri(K + "func"), encode_iri(K + "entity")),
        (encode_iri(K + "module"), encode_iri(K + "entity")),
        (encode_iri(K + "entity"), encode_iri(K + "thing")),
    ]
    tbox = [(s, SCO, o) for s, o in kind_edges] + strict_superclass_triples(kind_edges)
    asserted = abox.unionByName(
        spark.createDataFrame(tbox, "s string, p string, o string")
    )
    engine = FixpointEngine(
        spark, RuleSet(list(owl_rl_core())), checkpoint_dir=args.checkpoint_dir
    )
    res = engine.materialize(asserted)
    out = res.inferred_only() if args.inferred_only else res.facts
    out.write.mode("overwrite").parquet(args.output)
    print(
        json.dumps(
            {
                "facts": res.facts_count,
                "rounds": res.rounds,
                "wall_sec": round(time.time() - t0, 2),
                "output": args.output,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
