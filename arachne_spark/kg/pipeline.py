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
from arachne_spark.kg.extract import extract_mentions, mentions_to_triples
from arachne_spark.kg.link import link_mentions
from arachne_spark.model import RDF_TYPE, encode_iri
from arachne_spark.rules import RuleSet


def build_triples(
    code_files: DataFrame,
    entity_dict: DataFrame,
    *,
    apply_canon: bool = True,
    min_score: float = 0.5,
    dedup: bool = True,
) -> DataFrame:
    """Extraction + linking + canonicalization -> encoded candidate triples.

    ``dedup=False`` skips the output distinct: when the triples feed
    FixpointEngine (which dedups on 8-byte dictionary ids anyway), a distinct
    here shuffles the full fat-string rows for nothing — measured as THE
    extraction-side scaling bottleneck in separate-executor (local-cluster)
    runs. Keep the default for standalone use of the triple table."""
    # Materialize the extraction output before linking: chaining
    # mapInPandas -> broadcast join -> pandas UDF -> window into one set of
    # stages stacks Python runners and re-serializes Arrow batches through
    # every shuffle boundary (measured ~7x slower than cutting the plan
    # here). At cluster scale this boundary is a parquet/Iceberg write of the
    # mentions table — which the lineage story wants anyway.
    mentions = extract_mentions(code_files).localCheckpoint(eager=True)
    linked = link_mentions(mentions, entity_dict, min_score=min_score)
    # linked feeds BOTH the edge triples and the type triples below. It is
    # deliberately NOT persisted: downstream of the checkpointed mentions it
    # is just a broadcast join + projection (two cheap map passes), while
    # DataFrame.persist() block-manager writes measured ~5x slower than the
    # equivalent recompute in local-cluster (separate executor JVMs) — and on
    # a real cluster a cache of a map-only derivation is pure overhead.
    if apply_canon:
        canon = canonicalize(entity_dict)
        linked = (
            linked.join(F.broadcast(canon), on="canonical_iri", how="left")
            .withColumn(
                "canonical_iri", F.coalesce(F.col("canonical"), F.col("canonical_iri"))
            )
            .drop("canonical")
        )
    edge_triples = mentions_to_triples(linked)
    type_triples = linked.select(
        F.concat(F.lit("<"), F.col("canonical_iri"), F.lit(">")).alias("s"),
        F.lit(encode_iri(RDF_TYPE)).alias("p"),
        F.concat(
            F.lit("<http://example.org/code/Kind/"), F.col("kind"), F.lit(">")
        ).alias("o"),
    )
    out = edge_triples.unionByName(type_triples)
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
