"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure Catalyst expressions (no UDFs), formula-
identical to the DuckDB oracles in __spark_entry__.py.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arachne_spark.functions._parallel import fan_out

# stopword marker lists per language (n-gram heuristic langid)
LANG_MARKERS = {
    "en": ["the", "and", "is", "of"],
    "de": ["der", "und", "ist", "das"],
    "fr": ["le", "et", "est", "les"],
    "es": ["el", "y", "es", "los"],
    "zh": ["的", "是", "了", "在"],
}

STOPWORDS = ["the", "a", "is", "and", "of", "to"]

TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _count_token(text_col, tok: str):
    """Occurrences of ' tok ' in ' '||text||' ' via length arithmetic —
    identical in Spark and DuckDB SQL."""
    padded = F.concat(F.lit(" "), text_col, F.lit(" "))
    needle = f" {tok} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def langid(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, pred_lang, marker_hits): argmax language by marker-word counts,
    lexicographic tie-break (deterministic)."""
    t = F.col(text_col)
    scores = {
        lang: reduce(
            lambda a, b: a + b, [_count_token(t, m) for m in markers]
        )
        for lang, markers in LANG_MARKERS.items()
    }
    df = docs.select(F.col(id_col), *[c.alias(f"s_{l}") for l, c in scores.items()])
    pairs = F.array(
        *[
            F.struct(
                F.col(f"s_{l}").alias("hits"), F.lit(l).alias("lang")
            )
            for l in sorted(LANG_MARKERS)
        ]
    )
    # order on (hits desc) then break ties on the lexicographically smallest
    # language — deterministic and easy to mirror in the SQL oracle
    sorted_pairs = F.reverse(F.array_sort(pairs))
    top_hits = sorted_pairs[0]["hits"]
    candidates = F.filter(pairs, lambda s: s["hits"] == top_hits)
    pred = F.array_min(F.transform(candidates, lambda s: s["lang"]))
    return df.select(
        F.col(id_col), pred.alias("pred_lang"), top_hits.alias("marker_hits")
    )


def quality_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_chars, n_words, punct_bp, stopword_bp, mean_word_len_c,
    quality_milli) — ratios expressed in integer basis points / centi-units
    via integer division only. Floating-point decimal rounding is
    implementation-defined at half-way values (Spark HALF_UP vs DuckDB
    HALF_EVEN), so the feature contract is pure integer arithmetic: exact and
    engine-independent."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = F.size(F.split(t, " "))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    stop_hits = reduce(lambda a, b: a + b, [_count_token(t, s) for s in STOPWORDS])
    punct_bp = (n_punct * 10000).cast("long") / F.greatest(n_chars, F.lit(1))
    punct_bp = F.floor(punct_bp).cast("long")
    stop_bp = F.floor((stop_hits * 10000) / F.greatest(n_words, F.lit(1))).cast("long")
    mean_wl_c = F.floor(
        ((n_chars - (n_words - 1)) * 100) / F.greatest(n_words, F.lit(1))
    ).cast("long")
    quality_milli = (
        F.least(n_words, F.lit(100)) * 5
        + F.floor(stop_bp * 3 / 100).cast("long")
        + F.floor((10000 - punct_bp) * 2 / 100).cast("long")
    ).cast("long")
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        punct_bp.alias("punct_bp"),
        stop_bp.alias("stopword_bp"),
        mean_wl_c.alias("mean_word_len_c"),
        quality_milli.alias("quality_milli"),
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, ws_tokens, bpe_ish_tokens): whitespace count + a BPE-ish regex
    tokenizer count (letters runs / digit runs / single punctuation)."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.size(F.split(t, " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), 0)).alias("bpe_ish_tokens"),
    )


def fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    gram: int = 8, step: int = 4,
) -> DataFrame:
    """(id, fp): winnowing-style rolling fingerprint — minimum md5 over char
    8-grams sampled every 4 chars. One expression, no explode.

    The only text operator with fan_out: ~len(text)/4 md5 calls per row is
    compute-amplifying like minhash (guide §2.5); the length-arithmetic
    operators (langid/quality/tokens) are too cheap for the extra shuffle
    to pay (measured: quality 0.167 s -> 0.199 s WITH fan-out at sf0.1,
    so they deliberately stay un-fanned)."""
    docs = fan_out(docs)
    t = F.col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - gram + 1, F.lit(1)), F.lit(step)),
        lambda i: F.md5(F.substring(t, i, gram)),
    )
    return docs.select(F.col(id_col), F.array_min(grams).alias("fp"))
