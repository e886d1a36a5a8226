"""Command-line entry point — the Spark counterpart of the reference CLI
(cli/Main.scala:22-97):

    python -m arachne_spark --data DATA [--ontology ONT] [--rules RULES]
        [--export PATH] [--inferred-only] [--indirect-types]
        [--store-derivations] [--cores N] [--master URL]

- --data: file or folder of RDF data — .nt (distributed line scan), .ttl
  (driver-side Turtle subset), .owl/.rdf/.xml (RDF/XML subset), or a parquet
  directory of encoded triples. Folders recurse, skipping hidden files and
  catalog-v001.xml (Main.scala:66-70).
- --ontology: OWL ontology (.ttl or RDF/XML) translated to per-axiom rules
  (owl2rules.py — the OWLtoRules role, Main.scala:44-48).
- --rules: additional rules file — Jena-syntax subset or JSON (Main.scala:51-55).
- --export: write N-Triples text (default stdout prints a summary only);
  .parquet suffix writes bucketed parquet instead.
- --inferred-only: export facts minus asserted (Main.scala:81).
- --indirect-types: add the B3 indirect-type marker rule (Main.scala:47).
- per-stage wall times print exactly like the reference's `time(...)` blocks
  (Main.scala:93-97).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _time(action: str):
    class _T:
        def __enter__(self):
            self.t0 = time.time()
            return self

        def __exit__(self, *exc):
            if not exc[0]:
                print(f"{action} in {round(time.time() - self.t0, 3)}s")

    return _T()


def load_data(spark, path: str):
    """Dispatch by extension, folders recurse (mixed formats allowed);
    many-file Turtle/RDF-XML folders parse one-file-per-task (S1,
    sources/folder.py)."""
    from arachne_spark.sources.folder import read_rdf_folder

    if os.path.isdir(path) and any(
        f.endswith(".parquet") or f.startswith("part-") for f in os.listdir(path)
    ):
        return spark.read.parquet(path).select("s", "p", "o")
    try:
        return read_rdf_folder(spark, path)
    except ValueError as e:
        raise SystemExit(str(e))


def load_ontology_rules(path: str, indirect_types: bool):
    from arachne_spark.owl2rules import owl_to_rules
    from arachne_spark.sources.rdfxml import parse_rdfxml
    from arachne_spark.sources.turtle import parse_turtle

    if path.endswith(".ttl"):
        with open(path, encoding="utf-8") as f:
            tbox = parse_turtle(f.read())
    else:
        tbox = parse_rdfxml(path)
    rules = owl_to_rules(tbox)
    extra_rules = []
    extra_triples: list[tuple[str, str, str]] = []
    if indirect_types:
        from arachne_spark.model import RDFS_SUBCLASSOF, encode_iri
        from arachne_spark.owlrl import indirect_type_rule, strict_superclass_triples

        sco = encode_iri(RDFS_SUBCLASSOF)
        edges = [(s, o) for s, p, o in tbox if p == sco]
        extra_triples = strict_superclass_triples(edges)
        extra_rules = [indirect_type_rule()]
    return rules, extra_rules, extra_triples, tbox


def main(argv: list[str] | None = None, spark=None) -> int:
    ap = argparse.ArgumentParser(
        prog="arachne_spark",
        description="Spark-native RDF rule-engine CLI (reference: arachne)",
    )
    ap.add_argument("--data", required=True, help="file or folder of RDF data files")
    ap.add_argument("--ontology", help="OWL ontology to import into reasoning rules")
    ap.add_argument("--rules", help="Jena-syntax or JSON rules file to import")
    ap.add_argument("--export", help="export triples to N-Triples text (or .parquet dir)")
    ap.add_argument("--inferred-only", action="store_true", help="export inferred triples only")
    ap.add_argument("--indirect-types", action="store_true",
                    help="mark indirect types with additional triples")
    ap.add_argument("--store-derivations", action="store_true",
                    help="record one derivation per inferred fact (provenance)")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--master", default=None, help="Spark master URL override")
    args = ap.parse_args(argv)

    from arachne_spark.engine import TRIPLE_SCHEMA, FixpointEngine
    from arachne_spark.rules import RuleSet, load_rules
    from arachne_spark.session import build_session

    owns_session = spark is None
    if owns_session:
        spark = build_session(
            "arachne_spark_cli", cores=args.cores, master=args.master,
            extra={"spark.ui.showConsoleProgress": "false"},
        )

    all_rules = []
    extra_triples: list[tuple[str, str, str]] = []
    if args.ontology:
        with _time("Imported ontology into rules"):
            ont_rules, ind_rules, extra_triples, _ = load_ontology_rules(
                args.ontology, args.indirect_types
            )
            all_rules += list(ont_rules) + ind_rules
            if ont_rules.dropped:
                print(f"  (dropped {ont_rules.dropped} untranslatable axioms)")
    if args.rules:
        with _time("Imported rules file"):
            rs = load_rules(args.rules)
            all_rules += list(rs)
            if rs.dropped:
                print(f"  (dropped {rs.dropped} non-triple-pattern rules)")
    if not all_rules:
        raise SystemExit("no rules: pass --ontology and/or --rules")

    with _time("Constructed reasoner from rules"):
        engine = FixpointEngine(
            spark, RuleSet(all_rules), store_derivations=args.store_derivations
        )

    with _time("Imported data files"):
        data = load_data(spark, args.data)
        if extra_triples:
            data = data.unionByName(
                spark.createDataFrame(extra_triples, TRIPLE_SCHEMA)
            )
        n_asserted = data.distinct().count()

    with _time("Applied reasoning"):
        res = engine.materialize(data)
    print(
        f"  facts: {res.facts_count} (asserted {n_asserted}, "
        f"inferred {res.facts_count - n_asserted}) in {res.rounds} rounds"
    )

    with _time("Exported data"):
        out = res.inferred_only() if args.inferred_only else res.facts
        if args.export and args.export.endswith(".parquet"):
            out.write.mode("overwrite").parquet(args.export)
        elif args.export:
            from arachne_spark.sources.ntriples import write_ntriples

            write_ntriples(out, args.export)
        else:
            print(f"  (no --export; {out.count()} triples computed)")
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
