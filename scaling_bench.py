"""Scaling-evidence harness (BASELINE.md protocol / north rule).

Runs the SAME end-to-end KG-construction job — synthetic code corpus ->
extraction -> linking -> canonicalization -> OWL-RL fixpoint — on IDENTICAL
input at two local parallelism levels (default local[4] vs local[16] = N and
4N cores, shuffle partitions scaled to cores), each level in a fresh JVM,
several repetitions. Levels 4/16 rather than 8/32 because the 32-thread
endpoint saturates the host: a pure-CPU calibration (multiprocessing sha256)
sustains only 3.16x from 8->32 workers (eff 0.79) but 3.67x from 4->16
(eff 0.92) — i.e. 8->32 is hardware-capped below the 0.8 target before Spark
enters the picture. The host also shows bursty CPU steal (identical Spark
jobs varying 28s..77s); each run records the /proc/stat steal delta and
best-of-N per level is reported (median shown too).

Correctness gates before throughput is recorded:
- facts count AND an order-insensitive checksum must be identical across
  levels and repetitions. Dictionary-encoded runs hash the long-id facts
  plus the dictionary itself (identical dict + identical id-facts implies
  identical string facts, with no decode joins); string-mode runs hash
  xxhash64 over s||p||o directly;
- the per-query oracle gate (tools/check_contract.py) is the P/R evidence at
  sf0.01 — run separately.

Output: per-run JSON lines to scaling_runs.jsonl + a summary to stdout;
BENCH.md is written with the table the protocol asks for (input size, facts,
rounds, wall, triples/sec per level, efficiency = (T_4N/T_N)/4).

Usage:
  python scaling_bench.py                      # orchestrate both levels
  python scaling_bench.py --levels 8,32 --reps 2 --n-files 60000
  python scaling_bench.py --run-level 8 --n-files 60000   # one child run
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _steal_jiffies() -> int:
    with open("/proc/stat", encoding="utf-8") as f:
        return int(f.readline().split()[8])


_REV_CACHE: list[str] = []


def _config_stamp(abox_store: str, staging: str, fixpoint_store: str, mult: int) -> str:
    """One short string identifying the code+config epoch of a run.

    The git rev is read once per process, so both legs of an invocation
    carry the same stamp even if a commit lands between them.
    """
    if _REV_CACHE:
        return _REV_CACHE[0].format(
            abox=abox_store, staging=staging, store=fixpoint_store, mult=mult
        )
    try:
        import subprocess

        # hash the MEASURED code, not HEAD: the package tree + this file.
        # A doc/tool-only commit landing between two legs must not split
        # them into different epochs (pair_report would refuse the pair).
        hashes = subprocess.run(
            ["git", "rev-parse", "HEAD:arachne_spark", "HEAD:scaling_bench.py"],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout=10,
        ).stdout.split()
        rev = ".".join(h[:7] for h in hashes) or "nogit"
    except Exception:
        rev = "nogit"
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "")
    shm = "tmpfs" if local_dir.startswith("/dev/shm") else ("disk" if not local_dir else "custom")
    shape = os.environ.get("SPARK_GRAFT_EXEC_SHAPE", "")
    exec_part = (
        f"exec=shape({shape})"
        if shape
        else (
            f"exec={os.environ.get('SPARK_GRAFT_EXEC_CORES', '4')}x"
            f"{os.environ.get('SPARK_GRAFT_EXEC_MEM_MB', '6144')}"
        )
    )
    link_mode = os.environ.get("SPARK_GRAFT_LINK", "vocab")
    vocab_mode = os.environ.get("SPARK_GRAFT_VOCAB", "dims")
    shj = os.environ.get("SPARK_GRAFT_PREFER_SHJ", "1") != "0"
    preenc_on = (
        os.environ.get("SPARK_GRAFT_PREENC", "1") != "0" and vocab_mode == "dims"
    )
    tmpl = (
        rev + ";abox={abox};staging={staging};store={store};mult={mult};"
        f"{exec_part};shuffle={shm}"
        + (f";link={link_mode}" if link_mode != "vocab" else "")
        + (f";vocab={vocab_mode}" if vocab_mode != "dims" else "")
        + (";shj" if shj else ";smj")
        + (";preenc" if preenc_on else "")
    )
    _REV_CACHE.append(tmpl)
    return tmpl.format(
        abox=abox_store, staging=staging, store=fixpoint_store, mult=mult
    )


def run_level(cores: int, n_files: int, mode: str = "local") -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    # resolve the config/rev stamp BEFORE the run: a commit landing while a
    # leg executes must not split one invocation's legs into two epochs
    # (pair_report pairs legs only on exact stamp match)
    abox_store_0 = os.environ.get("SPARK_GRAFT_ABOX_STORE", "parquet")
    staging_0 = os.environ.get("SPARK_GRAFT_MENTION_STAGING", "parquet")
    fixpoint_store_0 = os.environ.get("SPARK_GRAFT_FIXPOINT_STORE", "auto")
    mult_0 = int(os.environ.get("SPARK_GRAFT_SHUFFLE_MULT", "2"))
    stamp = _config_stamp(abox_store_0, staging_0, fixpoint_store_0, mult_0)
    steal0 = _steal_jiffies()
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

    mult = int(os.environ.get("SPARK_GRAFT_SHUFFLE_MULT", "2"))
    master = None
    if mode == "local-cluster":
        # SEPARATE executor JVMs: `cores` is the TOTAL; each executor gets a
        # fixed core count and a fixed heap, so going N -> 4N multiplies
        # heap/GC/shuffle resources exactly like a real cluster scale-out
        # (the thing a single shared local[N] heap cannot express).
        exec_cores = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "4"))
        exec_mem_mb = int(os.environ.get("SPARK_GRAFT_EXEC_MEM_MB", "6144"))
        # SPARK_GRAFT_EXEC_SHAPE="4:1x1536,16:4x6144" gives each LEVEL its
        # own executor shape in one invocation. The default protocol (fixed
        # 4-core/6144MB executors, so N->4N multiplies executor COUNT 1->4)
        # moves the remote-shuffle fraction 0%->75% across the pair — a
        # structural penalty a real 250->1000-node scale-out does not pay
        # (remote fraction is ~100% at BOTH sizes there). The shape knob
        # holds executor count constant (e.g. 4 execs of 1 core/1536MB ->
        # 4 execs of 4 cores/6144MB): resources still scale exactly 4x but
        # the remote fraction stays 75% at both levels — the
        # constant-remote-fraction regime a large cluster actually lives in.
        # BENCH.md reports both protocols (node-count scaling = lower bound,
        # constant-remote-fraction = the at-scale estimate).
        for part in os.environ.get("SPARK_GRAFT_EXEC_SHAPE", "").split(","):
            if not part.strip():
                continue
            lvl, _, sh = part.strip().partition(":")
            c, _, m = sh.partition("x")
            if int(lvl) == cores:
                exec_cores, exec_mem_mb = int(c), int(m)
        n_exec = max(1, cores // exec_cores)
        master = f"local-cluster[{n_exec},{exec_cores},{exec_mem_mb}]"
        os.environ["SPARK_GRAFT_EXECUTOR_MEM"] = f"{exec_mem_mb - 1024}m"
    spark = build_session(
        f"scaling_{cores}",
        cores=cores,
        shuffle_partitions=cores * mult,
        extra={"spark.ui.showConsoleProgress": "false"},
        master=master,
    )
    t_all = time.time()

    # stage 1-3: extract + link + canonicalize
    t0 = time.time()
    corpus = gen_code_files(spark, n_files)
    edict = gen_entity_dict(spark)
    # dedup=False: set semantics are enforced by the engine's id-level
    # distinct (24-byte rows); a string-level distinct here was the
    # extraction-side scaling bottleneck. mentions are checkpointed inside
    # build_triples, so the engine's extra passes over this plan are cheap
    # map-only broadcast joins.
    # checkpoint the slim (s,p,o) rows WITHOUT a distinct: set semantics are
    # the engine's job (id-level distinct on 24-byte rows); a string-level
    # distinct was the round-1 extraction bottleneck, while an un-distinct'd
    # checkpoint is one map pass + block write and makes the engine's
    # dictionary/encode passes cheap scans instead of extraction re-runs.
    # Staging-store choice for the candidate-triple table (the engine scans
    # it ~5x: count, per-column vocab distincts, encode). `parquet` writes a
    # compressed columnar snapshot to local disk and re-reads it — the
    # realistic cluster shape (staging tables live on distributed storage)
    # and MUCH cheaper than block-manager localCheckpoint of fat string rows
    # in separate-executor mode (r2 measured block-store writes ~5x the
    # equivalent recompute).
    # r4 defaults (VERDICT r3 next-round #1/#4): the extract->link->canon
    # stage is ONE fused lazy plan (staging="none" — no mentions block write;
    # pure-Catalyst extraction left nothing to cut), staged ONCE to parquet
    # (the realistic cluster shape: candidate-triple table on distributed
    # storage, columnar + compressed; block-manager localCheckpoint of fat
    # string rows measured ~5x the recompute AND cannot hold 16M files on
    # the 1x4 leg). Both knobs remain env-overridable for A/B.
    abox_store = os.environ.get("SPARK_GRAFT_ABOX_STORE", "parquet")
    # r4 A/B (8M, both legs, identical checksums): parquet mention staging
    # beat the fused double-pass at BOTH levels (1x4 245->194 s, 4x16
    # 87.6->85.3 s) — one corpus pass + a columnar staging write is the
    # 100 TB shape (the source is never read twice)
    staging = os.environ.get("SPARK_GRAFT_MENTION_STAGING", "parquet")
    mentions_dir = None
    if staging == "parquet":
        import tempfile

        mentions_dir = tempfile.mkdtemp(
            prefix="mentions_",
            dir=os.environ.get(
                "SPARK_GRAFT_ABOX_DIR",
                "/dev/shm" if os.path.isdir("/dev/shm") else None,
            ),
        )
    # TBox: kind hierarchy, extends is transitive, calls ⊑ dependsOn
    # (driver-side constants — built BEFORE extraction because the
    # pre-encoded path needs the vocabulary, and the vocabulary needs the
    # TBox constant set)
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
        (
            "<http://example.org/code/calls>",
            SPO,
            "<http://example.org/code/dependsOn>",
        )
    )
    tbox += strict_superclass_triples(kind_edges)

    # stage 4 config: a checkpoint_dir on tmpfs turns on the
    # predicate-bucketed facts store (pred_partitioned="auto" crosses over
    # at 10M facts): per-round alpha scans and the fact-dedup join then
    # prune to __pb bucket files instead of scanning the full in-memory
    # facts union — the located small-delta round floor. "off" reverts to
    # the memory-staged union for A/B.
    fixpoint_store = os.environ.get("SPARK_GRAFT_FIXPOINT_STORE", "auto")
    ckpt_dir = None
    if fixpoint_store != "off":
        import tempfile

        ckpt_base = os.environ.get(
            "SPARK_GRAFT_ABOX_DIR",
            "/dev/shm" if os.path.isdir("/dev/shm") else None,
        )
        ckpt_dir = tempfile.mkdtemp(prefix="fixpoint_", dir=ckpt_base)
    # Dictionary vocabulary from DIMENSION tables (SPARK_GRAFT_VOCAB=dims,
    # the default; "scan" reverts to the engine's per-column distincts for
    # A/B). The pipeline KNOWS its term universe structurally: file IRIs
    # project off the corpus table (one thin scan), entity/kind IRIs off the
    # entity dictionary, plus the closed predicate/TBox constant set —
    # exactly the Iceberg-dimension-table shape a production KG build has.
    # This replaces the dictionary build's two high-cardinality fat-string
    # distinct shuffles over the full 2N-row triple table with one distinct
    # over ~N thin rows; the engine's strict decode makes any coverage slip
    # a loud error (and the id-space + dictionary checksums would catch it
    # cross-level anyway).
    vocab = None
    if os.environ.get("SPARK_GRAFT_VOCAB", "dims") == "dims":
        from arachne_spark.kg.extract import _KIND_PRED, file_iri_col

        const_terms = [f"<{p}>" for p in _KIND_PRED.values()] + [TYPE]
        const_terms += [t for row in tbox for t in row]
        vocab = (
            corpus.select(file_iri_col().alias("term"))
            .unionByName(
                edict.select(
                    F.concat(
                        F.lit("<"), F.col("canonical_iri"), F.lit(">")
                    ).alias("term")
                )
            )
            .unionByName(
                edict.select(
                    F.concat(
                        F.lit("<http://example.org/code/Kind/"),
                        F.col("kind"),
                        F.lit(">"),
                    ).alias("term")
                )
            )
            .unionByName(
                spark.createDataFrame(
                    [(t,) for t in set(const_terms)], "term string"
                )
            )
        )
    rules = RuleSet(list(owl_rl_core()) + [indirect_type_rule()])
    # track_lineage: the scaling report's rows-per-partition tables need the
    # per-round histogram (r6: off by default — it costs one grouped stats
    # job per round that the headline bench no longer pays)
    engine = FixpointEngine(
        spark, rules, checkpoint_dir=ckpt_dir, track_lineage=True
    )
    # PRE-ENCODED long-id extraction (SPARK_GRAFT_PREENC=1, the default;
    # requires the dims vocabulary): build the dictionary FIRST from the
    # thin dimension tables, then have the extract/link plan emit xxhash64
    # ids directly — the fat IRI strings never hit the abox staging table
    # (24-byte rows instead of ~200-byte strings: the r4-pinned DRAM-bound
    # stage-0 distinct + encode phases shrink proportionally). "0" reverts
    # to string staging + engine-side encode for A/B; ids and checksums are
    # identical either way (differential-tested).
    preenc = (
        os.environ.get("SPARK_GRAFT_PREENC", "1") != "0" and vocab is not None
    )
    salt, term_dict, t_dict = 0, None, 0.0
    if preenc:
        td0 = time.time()
        salt, term_dict = engine.build_dictionary(vocab)
        t_dict = round(time.time() - td0, 2)
    triples = build_triples(
        corpus,
        edict,
        dedup=False,
        staging=staging,
        staging_dir=mentions_dir,
        link=os.environ.get("SPARK_GRAFT_LINK", "vocab"),
        id_salt=salt if preenc else None,
    )
    if abox_store == "parquet":
        import tempfile

        # stage on tmpfs when available: a single local ext4 device caps
        # write bandwidth at a constant regardless of cores (anti-scaling
        # artifact of the sandbox), while a real cluster's staging storage
        # (HDFS/S3/Iceberg) scales with the writer count — RAM-backed tmpfs
        # is the closest local model of that
        base = os.environ.get(
            "SPARK_GRAFT_ABOX_DIR",
            "/dev/shm" if os.path.isdir("/dev/shm") else None,
        )
        abox_dir = tempfile.mkdtemp(prefix="abox_", dir=base) + "/triples"
        # fold the row count into the write job itself (Observation) — the
        # count-back after the write was one extra full scan of the staged
        # table per leg
        from pyspark.sql import Observation

        obs = Observation()
        triples.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).parquet(abox_dir)
        n_abox = obs.get["n"]
        abox = spark.read.parquet(abox_dir)
    else:
        abox = triples.localCheckpoint(eager=True)
        n_abox = abox.count()
    t_extract = time.time() - t0

    tbox_strings = spark.createDataFrame(tbox, "s string, p string, o string")
    if preenc:
        from arachne_spark.dictionary import encode_ids

        asserted = abox.unionByName(encode_ids(tbox_strings, salt))
    else:
        asserted = abox.unionByName(tbox_strings)

    # stage 4: fixpoint.
    t0 = time.time()
    # row_hint: the abox was just counted off its parquet staging — skip the
    # engine's auto-mode sizing scan (one full pass over 2N*16M rows saved)
    if preenc:
        res = engine.materialize_encoded(
            asserted, term_dict=term_dict, salt=salt,
            row_hint=n_abox + len(tbox),
        )
    else:
        res = engine.materialize(
            asserted, row_hint=n_abox + len(tbox), vocab=vocab
        )
    t_infer = time.time() - t0
    facts = res.facts

    # Correctness checksum, id-space when the run is dictionary-encoded:
    # hashing the STRING facts forces the lazy 3-join decode of the whole
    # facts store (measured ~100 s at 16c on 80M facts — a bench-harness
    # verification cost that was ~30% of wall, barely scaled with cores, and
    # poisoned the efficiency ratio). Hash (a) the long-id facts (one
    # numeric scan) and (b) the dictionary itself (one scan): identical dict
    # + identical id-facts implies identical string facts — strictly
    # stronger than the string hash, with zero joins. String fallback when
    # encoding is off; t_checksum keeps verification cost visible and out of
    # the throughput claim.
    t0 = time.time()
    P = F.lit(2147483647)
    if res.facts_ids is not None:
        checksum = res.facts_ids.select(
            F.sum(F.pmod(F.xxhash64("s", "p", "o"), P)).alias("c")
        ).collect()[0]["c"]
        dict_checksum = int(
            res.term_dict.select(
                F.sum(F.pmod(F.xxhash64("id", "term"), P)).alias("c")
            ).collect()[0]["c"]
        )
    else:
        checksum = facts.select(
            F.sum(F.pmod(F.xxhash64(F.concat_ws("", "s", "p", "o")), P)).alias("c")
        ).collect()[0]["c"]
        dict_checksum = 0
    t_checksum = time.time() - t0
    wall = time.time() - t_all
    out = {
        "cores": cores,
        "mode": mode,
        "n_files": n_files,
        "abox_triples": n_abox,
        "asserted": res.metrics[0].facts_total,
        "facts": res.facts_count,
        "rounds": res.rounds,
        "checksum": int(checksum),
        "dict_checksum": dict_checksum,
        "t_extract_link_canon": round(t_extract, 2),
        "t_dict": t_dict,
        "t_infer": round(t_infer, 2),
        "t_checksum": round(t_checksum, 2),
        "wall": round(wall, 2),
        "triples_per_sec": round(res.facts_count / wall, 1),
        "infer_triples_per_sec": round(res.facts_count / t_infer, 1),
        "steal_sec": round((_steal_jiffies() - steal0) / 100.0, 1),
        # config epoch stamp: tools/pair_report.py only pairs N/4N legs whose
        # stamps match, so efficiency claims never mix code versions or
        # staging configs (the r3 16M confound, mechanically prevented)
        "config": _config_stamp(abox_store, staging, fixpoint_store, mult),
        "round_metrics": [m.to_dict() for m in res.metrics],
    }
    spark.stop()
    import shutil

    if abox_store == "parquet":
        shutil.rmtree(os.path.dirname(abox_dir), ignore_errors=True)
    if ckpt_dir:
        shutil.rmtree(ckpt_dir, ignore_errors=True)
    if mentions_dir:
        shutil.rmtree(mentions_dir, ignore_errors=True)
    return out


def orchestrate(levels: list[int], reps: int, n_files: int, mode: str = "local") -> None:
    runs: list[dict] = []
    for rep in range(reps):
        for cores in levels:
            cmd = [
                sys.executable,
                os.path.abspath(__file__),
                "--run-level",
                str(cores),
                "--n-files",
                str(n_files),
                "--mode",
                mode,
            ]
            p = subprocess.run(cmd, capture_output=True, text=True)
            line = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if not line:
                print(f"child failed (cores={cores}):", p.stderr[-2000:], file=sys.stderr)
                continue
            rec = json.loads(line[-1])
            rec["rep"] = rep
            runs.append(rec)
            # append incrementally so a killed orchestration keeps its runs
            with open("scaling_runs.jsonl", "a", encoding="utf-8") as f:
                f.write(json.dumps(rec) + "\n")
            print(
                f"cores={cores} rep={rep}: wall={rec['wall']}s "
                f"tps={rec['triples_per_sec']} facts={rec['facts']}"
            )

    # a leg can fail wholesale (child crash, deleted staging dir); exit
    # nonzero with what we have rather than tripping max() on an empty set
    if any(not [r for r in runs if r["cores"] == c] for c in levels):
        print(json.dumps({"error": "missing level runs", "got": len(runs)}))
        sys.exit(1)

    # correctness gate: identical facts + checksum (and dictionary
    # checksum, id-space protocol) everywhere
    counts = {(r["facts"], r["checksum"], r.get("dict_checksum", 0)) for r in runs}
    assert len(counts) == 1, f"results differ across runs/levels: {counts}"

    best = {
        c: max((r for r in runs if r["cores"] == c), key=lambda r: r["triples_per_sec"])
        for c in levels
    }

    def median_tps(c: int) -> float:
        xs = sorted(r["triples_per_sec"] for r in runs if r["cores"] == c)
        return xs[len(xs) // 2]

    lo, hi = min(levels), max(levels)
    ratio = hi / lo
    eff = (best[hi]["triples_per_sec"] / best[lo]["triples_per_sec"]) / ratio
    eff_infer = (
        best[hi]["infer_triples_per_sec"] / best[lo]["infer_triples_per_sec"]
    ) / ratio
    summary = {
        "levels": levels,
        "reps": reps,
        "n_files": n_files,
        "facts": best[hi]["facts"],
        "rounds": best[hi]["rounds"],
        "best": {str(c): best[c] for c in levels},
        "median_tps": {str(c): median_tps(c) for c in levels},
        "scaling_efficiency_e2e": round(eff, 3),
        "scaling_efficiency_infer": round(eff_infer, 3),
        "scaling_efficiency_e2e_median": round(
            (median_tps(hi) / median_tps(lo)) / ratio, 3
        ),
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "best"}))
    _write_bench_md(summary)


def _write_bench_md(s: dict) -> None:
    # NOTE: writes the mechanical per-study summary to BENCH_LAST_RUN.md;
    # BENCH.md is the curated analysis and must not be clobbered.
    lo, hi = min(s["levels"]), max(s["levels"])
    b_lo, b_hi = s["best"][str(lo)], s["best"][str(hi)]
    lines = [
        "# BENCH — scaling evidence (BASELINE.md protocol)",
        "",
        "Same end-to-end KG-construction job (synthetic code corpus -> fused",
        "codegen regex extraction -> broadcast expression linking ->",
        "connected-components canonicalization -> OWL-RL semi-naive fixpoint on",
        "dictionary-encoded ids) on IDENTICAL input at two",
        f"local parallelism levels (N={lo} and 4N={hi} cores per the BASELINE.md",
        "protocol), fresh JVM per run, best of "
        f"{s['reps']} repetitions per level.",
        "",
        f"Why {lo}/{hi} and not 8/32: a pure-CPU calibration (multiprocessing",
        "sha256, no Spark) sustains only 3.16x speedup from 8->32 workers",
        "(eff 0.79) but 3.67x from 4->16 (eff 0.92) on this host — the 32-thread",
        "endpoint is hardware-capped below the 0.8 target before Spark enters the",
        "picture. The host also shows bursty CPU steal (identical Spark jobs",
        "varied 28s..77s in calibration); per-run /proc/stat steal seconds are",
        "recorded in scaling_runs.jsonl and best-of-N is the headline",
        "(median-based efficiency also reported).",
        "",
        f"- input: {s['n_files']} synthetic code files; "
        f"ABox {b_hi['abox_triples']} extracted triples; asserted {b_hi['asserted']}",
        f"- facts at fixpoint: {s['facts']} in {s['rounds']} rounds "
        "(identical count + order-insensitive xxhash64 checksum at BOTH levels — "
        "correctness gate)",
        "",
        "| level | wall (s) | extract+link+canon (s) | infer (s) | triples/s (e2e) | triples/s (infer) |",
        "|---|---|---|---|---|---|",
        f"| local[{lo}] | {b_lo['wall']} | {b_lo['t_extract_link_canon']} | "
        f"{b_lo['t_infer']} | {b_lo['triples_per_sec']} | {b_lo['infer_triples_per_sec']} |",
        f"| local[{hi}] | {b_hi['wall']} | {b_hi['t_extract_link_canon']} | "
        f"{b_hi['t_infer']} | {b_hi['triples_per_sec']} | {b_hi['infer_triples_per_sec']} |",
        "",
        f"**Scaling efficiency (e2e, best-of-{s['reps']})** = "
        f"(tps@{hi} / tps@{lo}) / {hi//lo} = "
        f"**{s['scaling_efficiency_e2e']}** (target >= 0.8 per north rule)",
        f"**Scaling efficiency (inference only)** = **{s['scaling_efficiency_infer']}**; "
        f"median-based e2e efficiency = **{s['scaling_efficiency_e2e_median']}**",
        "",
        "Per-round delta sizes and per-partition lineage for the best "
        f"local[{hi}] run:",
        "",
        "| round | delta_in | delta_out | facts_total | sec | partition_lineage (rows/partition) |",
        "|---|---|---|---|---|---|",
    ]
    for m in b_hi["round_metrics"]:
        lin = m["partition_lineage"]
        lin_s = f"{len(lin)} parts, max {max(lin)}, min {min(lin)}" if lin else "-"
        lines.append(
            f"| {m['round']} | {m['delta_in']} | {m['delta_out']} | "
            f"{m['facts_total']} | {m['seconds']} | {lin_s} |"
        )
    lines += [
        "",
        "Raw per-run records: `scaling_runs.jsonl`. Resumability: the engine",
        "checkpoints each round's delta as parquet (`round=NNNN/`) with a",
        "`metrics.jsonl` line per round; `FixpointEngine.resume` restarts from",
        "the last completed round (tests/test_engine.py::test_checkpoint_resume).",
    ]
    with open("BENCH_LAST_RUN.md", "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="4,16")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n-files", type=int, default=200000)
    ap.add_argument("--run-level", type=int, default=None)
    ap.add_argument("--mode", default="local", choices=["local", "local-cluster"])
    args = ap.parse_args()
    if args.run_level:
        print(json.dumps(run_level(args.run_level, args.n_files, args.mode)))
    else:
        orchestrate(
            [int(x) for x in args.levels.split(",")], args.reps, args.n_files,
            args.mode,
        )


if __name__ == "__main__":
    main()
