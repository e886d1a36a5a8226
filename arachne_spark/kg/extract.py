"""Stage A — triple extraction from the code corpus (SURVEY §7.0 step A).

The reference's "loader" merges RDF files into triples (Main.scala:63-74); for
the KG-construction pipeline the loader is *extraction*: lang-aware regex
extractors over code_files(repo, path, commit, lang, content) producing
candidate entity mentions (class defs, inheritance, function defs, imports,
call edges).

Implementation: ``mapInPandas`` with Arrow batches — vectorized pandas
``str.extractall`` per batch, no per-row Python (input_hint). The per-row
``content_sha256`` invariant is computed in the SAME pass, so tests can prove
the extractor saw exactly the bytes of the source table.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arachne_spark.model import encode_iri, encode_literal

MENTION_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content_sha256", T.StringType(), False),
        T.StructField("mention", T.StringType(), False),
        T.StructField("mention_kind", T.StringType(), False),
    ]
)

# one pattern per mention kind; language-aware where grammar differs
_PATTERNS = {
    "python": {
        "class_def": r"^class\s+(\w+)",
        "extends": r"^class\s+\w+\((\w+)\)",
        "func_def": r"def\s+(\w+)\s*\(",
        "import": r"^(?:import|from)\s+([\w.]+)",
        "call": r"(?:return|=)\s*(\w+)\(",
    },
    "scala": {
        "class_def": r"(?:class|object|trait)\s+(\w+)",
        "extends": r"extends\s+(\w+)",
        "func_def": r"def\s+(\w+)\s*[\[(:]",
        "import": r"^import\s+([\w.]+)",
        "call": r"(?:return|=)\s*(\w+)\(",
    },
    "java": {
        "class_def": r"(?:class|interface|enum)\s+(\w+)",
        "extends": r"(?:extends|implements)\s+(\w+)",
        "func_def": r"(?:\w+)\s+(\w+)\s*\([^)]*\)\s*\{",
        "import": r"^import\s+([\w.]+)",
        "call": r"(?:return|=)\s*(\w+)\(",
    },
}
# generators fall back to python-ish patterns for unknown langs
_DEFAULT = _PATTERNS["python"]


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if pdf.empty:
            continue
        sha = pdf["content"].map(
            lambda c: hashlib.sha256(c.encode("utf-8")).hexdigest()
        )
        base = pdf[["repo", "path", "commit", "lang"]].copy()
        base["content_sha256"] = sha
        outs = []
        for lang, group_idx in pdf.groupby("lang").groups.items():
            sub = pdf.loc[group_idx]
            pats = _PATTERNS.get(lang, _DEFAULT)
            for kind, pat in pats.items():
                hits = sub["content"].str.extractall(pat, flags=__import__("re").M)
                if hits.empty:
                    continue
                hits = hits.reset_index(level=1, drop=True)[0].rename("mention")
                joined = base.loc[hits.index].copy()
                joined["mention"] = hits.values
                joined["mention_kind"] = kind
                outs.append(joined)
        if outs:
            out = pd.concat(outs, ignore_index=True).drop_duplicates()
            yield out[list(MENTION_SCHEMA.fieldNames())]


def extract_mentions(code_files: DataFrame) -> DataFrame:
    """code_files -> mentions, Arrow-batched; columns pruned before the UDF so
    the scan reads only what extraction needs."""
    cols = ["repo", "path", "commit", "lang", "content"]
    return code_files.select(*cols).mapInPandas(_extract_batches, MENTION_SCHEMA)


_KIND_PRED = {
    "class_def": "http://example.org/code/definesClass",
    "extends": "http://example.org/code/extends",
    "func_def": "http://example.org/code/definesFunction",
    "import": "http://example.org/code/imports",
    "call": "http://example.org/code/calls",
}


def file_iri_col() -> F.Column:
    return F.concat(
        F.lit("<http://example.org/code/file/"),
        F.col("repo"), F.lit("/"), F.col("path"),
        F.lit("@"), F.col("commit"), F.lit(">"),
    )


def mentions_to_triples(linked: DataFrame, mention_col: str = "canonical_iri") -> DataFrame:
    """Linked mentions -> encoded candidate triples:
    (file IRI, predicate-by-kind, linked entity IRI)."""
    pred = F.element_at(
        F.create_map(*[F.lit(x) for kv in _KIND_PRED.items() for x in kv]),
        F.col("mention_kind"),
    )
    return linked.select(
        file_iri_col().alias("s"),
        F.concat(F.lit("<"), pred, F.lit(">")).alias("p"),
        F.concat(F.lit("<"), F.col(mention_col), F.lit(">")).alias("o"),
    )
