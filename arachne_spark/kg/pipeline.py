"""End-to-end KG construction pipeline (north star):

    code_files --extract--> mentions --link--> linked --canon--> triples
        --FixpointEngine--> materialized facts (+ metrics, checkpoints)

Each stage is a pure DataFrame transform; the driver loop only orchestrates
the fixpoint rounds. Skew note: the corpus is Zipf-skewed by repo; extraction
and linking are narrow maps/broadcast joins, so no skewed shuffle exists until
the fixpoint joins — where AQE skew splitting plus small broadcast TBox sides
handle the hot rdf:type/subClassOf keys (SURVEY O12).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arachne_spark.engine import FixpointEngine, FixpointResult
from arachne_spark.kg.canon import canonicalize
from arachne_spark.kg.extract import extract_mentions, linked_to_triples
from arachne_spark.kg.link import link_mentions, link_mentions_single_pass
from arachne_spark.rules import RuleSet


def build_triples(
    code_files: DataFrame,
    entity_dict: DataFrame,
    *,
    apply_canon: bool = True,
    min_score: float = 0.5,
    dedup: bool = True,
    staging: str = "none",
    staging_dir: Optional[str] = None,
    link: str = "vocab",
    id_salt: Optional[int] = None,
) -> DataFrame:
    """Extraction + linking + canonicalization -> encoded candidate triples.

    ``dedup=False`` skips the output distinct: when the triples feed
    FixpointEngine (which dedups on 8-byte dictionary ids anyway), a distinct
    here shuffles the full fat-string rows for nothing — measured as THE
    extraction-side scaling bottleneck in separate-executor (local-cluster)
    runs. Keep the default for standalone use of the triple table.

    ``id_salt`` is not None -> PRE-ENCODED output: (s,p,o) are xxhash64 long
    ids (linked_to_triples(salt=...)); pair with
    ``FixpointEngine.materialize_encoded`` and a ``build_term_dict(vocab=...)``
    dictionary fixed at the same salt. The IRI strings then never hit a
    staging table or shuffle — the r4-measured DRAM-bound phases (fat-string
    stage-0 distinct + encode) shrink to 24-byte-row work.

    ``staging`` controls the mentions materialization boundary:
    - "none" (default): the WHOLE stage is one fused lazy plan — codegen'd
      regex extraction -> broadcast link -> canon -> one explode emitting
      both triple kinds (linked_to_triples). Since the r3 move to
      pure-Catalyst extraction there is no Python runner anywhere in this
      plan, so there is nothing to cut: a block-manager checkpoint of the
      fat mentions table costs ~5x the recompute (r2 measurement) and was
      the located extract-stage scaling residue (VERDICT r3 #1). Callers
      that scan the result repeatedly (e.g. the fixpoint engine) should
      stage the OUTPUT once — parquet at cluster scale.
    - "checkpoint": the pre-r4 behavior (mentions localCheckpoint), kept for
      memory-staged single-scan pipelines and as the differential baseline.
    - "parquet": write the mentions ONCE to a parquet staging table
      (``staging_dir`` or a temp dir under $SPARK_GRAFT_STAGING_DIR /
      /dev/shm) and re-read it. The fused "none" plan evaluates the corpus
      subtree TWICE — the vocab-scoring branch of link_mentions re-runs
      source read + regex to discover the vocabulary — which at 100 TB means
      reading the source corpus twice. Parquet staging pays one columnar
      write of the (much smaller) mention table instead; the vocab branch
      then scans a single dictionary-encoded column, and the join-back scans
      the staged table once. This is the realistic cluster shape (derived
      tables on distributed storage), and the caller owns ``staging_dir``'s
      lifetime (the default temp dir lives until process exit, then an
      atexit hook removes it).
    """
    mentions = extract_mentions(code_files)
    if id_salt is not None:
        # Pre-encoded thin staging: the only file-side value any downstream
        # stage needs is the file IRI's xxhash64 id (the edge triple's
        # subject), so hash it HERE — before the staging boundary — and drop
        # repo/path/commit/lang/content_sha256 from the staged table. At the
        # 8M-file scale that turns the ~110-byte string row (the sha256
        # column alone is 64 incompressible chars) into (long, mention,
        # kind); the staging write, its re-read, and the link join-back all
        # shrink proportionally — the remaining extract-side DRAM traffic
        # after the abox staging went id-sided.
        from arachne_spark.dictionary import term_id_col
        from arachne_spark.kg.extract import file_iri_col

        mentions = mentions.select(
            term_id_col(file_iri_col(), id_salt).alias("file_sid"),
            "mention",
            "mention_kind",
        )
    if staging == "checkpoint":
        mentions = mentions.localCheckpoint(eager=True)
    elif staging == "parquet":
        import os
        import tempfile

        base = staging_dir or os.environ.get("SPARK_GRAFT_STAGING_DIR") or (
            "/dev/shm" if os.path.isdir("/dev/shm") else None
        )
        tmp_root = tempfile.mkdtemp(prefix="mentions_", dir=base)
        if staging_dir is None:
            # default (caller didn't claim the dir): register cleanup so
            # repeated build_triples calls don't leak RAM-backed /dev/shm
            # staging tables for the life of the process (ADVICE r4 #3).
            # atexit, not eager delete — the returned plan lazily re-reads
            # the staged parquet, so it must outlive this function.
            import atexit
            import shutil

            atexit.register(shutil.rmtree, tmp_root, ignore_errors=True)
        d = os.path.join(tmp_root, "mentions")
        mentions.write.mode("overwrite").parquet(d)
        mentions = code_files.sparkSession.read.parquet(d)
    # ``link``: "vocab" scores the distinct mention vocabulary then
    # broadcast-joins back (cheapest when mentions are staged/checkpointed —
    # the second scan is a block read); "single_pass" pre-groups the
    # broadcast dictionary and picks the best candidate with in-row array
    # expressions — ONE corpus scan total, the right shape for the fused
    # staging="none" plan where the vocab branch would re-run extraction
    # over the whole corpus (differential-tested row-identical).
    if link == "single_pass":
        linked = link_mentions_single_pass(mentions, entity_dict, min_score=min_score)
    else:
        linked = link_mentions(mentions, entity_dict, min_score=min_score)
    # linked is deliberately NOT persisted: DataFrame.persist() block-manager
    # writes measured ~5x slower than the equivalent recompute in
    # local-cluster (separate executor JVMs) — and on a real cluster a cache
    # of a map-only derivation is pure overhead.
    if apply_canon:
        canon = canonicalize(entity_dict)
        linked = (
            linked.join(F.broadcast(canon), on="canonical_iri", how="left")
            .withColumn(
                "canonical_iri", F.coalesce(F.col("canonical"), F.col("canonical_iri"))
            )
            .drop("canonical")
        )
    out = linked_to_triples(linked, salt=id_salt)
    return out.distinct() if dedup else out


def materialize_kg(
    code_files: DataFrame,
    entity_dict: DataFrame,
    ruleset: RuleSet,
    *,
    checkpoint_dir: Optional[str] = None,
    min_score: float = 0.5,
) -> FixpointResult:
    triples = build_triples(code_files, entity_dict, min_score=min_score)
    spark = code_files.sparkSession
    engine = FixpointEngine(spark, ruleset, checkpoint_dir=checkpoint_dir)
    return engine.materialize(triples)
