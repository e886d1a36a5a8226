"""Stage B — entity linking (SURVEY §7.0 step B).

Mentions are scored against a broadcast entity dictionary. The candidate
generation is a broadcast hash join on a normalized alias key (JVM-side,
codegen'd); the scoring is a vectorized pandas UDF (Arrow batches, no per-row
Python — input_hint) combining the dictionary prior with a character-bigram
Jaccard similarity between the raw mention and the alias surface form; the
best candidate per mention wins via one window (deterministic tie-break on
canonical_iri).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _bigrams(s: pd.Series) -> pd.Series:
    def grams(x: str) -> set:
        x = x or ""
        return {x[i : i + 2] for i in range(len(x) - 1)} or {x}

    return s.map(grams)


@F.pandas_udf(T.DoubleType())
def link_score(mention: pd.Series, alias: pd.Series, prior: pd.Series) -> pd.Series:
    """score = 0.7 * bigram-Jaccard(mention, alias) + 0.3 * prior (vectorized)."""
    mg, ag = _bigrams(mention.str.lower()), _bigrams(alias.str.lower())
    inter = [len(a & b) for a, b in zip(mg, ag)]
    union = [len(a | b) or 1 for a, b in zip(mg, ag)]
    jac = pd.Series(inter, index=mention.index) / pd.Series(union, index=mention.index)
    return 0.7 * jac + 0.3 * prior.astype(float)


def _norm(c):
    return F.translate(F.lower(c), "_", "")


def link_mentions(
    mentions: DataFrame,
    entity_dict: DataFrame,
    min_score: float = 0.5,
) -> DataFrame:
    """mentions x broadcast(dict) -> best (mention, canonical_iri, kind, score).

    The dictionary is the small side — broadcast explicitly so the join never
    shuffles the (huge) mention table (SURVEY O8: broadcast the ontology-
    derived side tables)."""
    cand = mentions.join(
        F.broadcast(entity_dict.withColumn("alias_norm", _norm(F.col("alias")))),
        _norm(F.col("mention")) == F.col("alias_norm"),
        "inner",
    ).withColumn("score", link_score(F.col("mention"), F.col("alias"), F.col("prior")))
    # best candidate per mention via min_by on (-score, canonical_iri): one
    # hash aggregation with map-side partial combine — cheaper than a sort
    # window, same deterministic semantics (max score, ties -> min IRI)
    keys = ["repo", "path", "commit", "lang", "content_sha256", "mention", "mention_kind"]
    best = F.min_by(
        F.struct("canonical_iri", "kind", "alias", "prior", "score"),
        F.struct((-F.col("score")).alias("ns"), F.col("canonical_iri").alias("ci")),
    ).alias("best")
    return (
        cand.filter(F.col("score") >= min_score)
        .groupBy(*keys)
        .agg(best)
        .select(*keys, "best.canonical_iri", "best.kind", "best.alias", "best.prior", "best.score")
    )
