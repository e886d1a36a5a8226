"""N-Triples source/sink — the RDF loader/exporter (SURVEY S1/S5).

The reference loads any Jena-readable syntax from a file or a recursive folder,
skipping `catalog-v001.xml` and hidden files (Main.scala:63-74), and exports
Turtle (Main.scala:80-87). The canonical line-based RDF syntax for a
distributed engine is N-Triples: one triple per line, splittable, parseable
with pure Catalyst expressions (regexp_extract — JVM-side, whole-stage
codegen'd, no Python in the hot path).

Our encoded term strings ARE canonical N-Triples terms, so parsing reduces to
tokenizing the line and normalizing literal escapes, and serialization is a
single concat_ws.
"""

from __future__ import annotations

import os
from typing import Iterable, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# term token: IRI | bnode | literal (with escaped chars) + optional @lang/^^<dt>
_LINE_RE = (
    r'^\s*(<[^>]*>|_:\S+)'                                # subject
    r'\s+(<[^>]*>)'                                        # predicate
    r'\s+(<[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+|\^\^<[^>]*>)?)'  # object
    r'\s*\.\s*$'
)


def _expand_paths(path: str) -> list[str]:
    """Folder -> recursive file list, skipping catalog-v001.xml and hidden
    files (Main.scala:66-70); single file passes through."""
    if not os.path.isdir(path):
        return [path]
    out: list[str] = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(".")]
        for f in files:
            if f.startswith(".") or f == "catalog-v001.xml":
                continue
            out.append(os.path.join(root, f))
    return sorted(out)


def _normalize_nt_escapes(c):
    """N-Triples literal escapes (\\n \\t \\r) -> raw characters, keeping our
    canonical \\\\ and \\" escapes. Pure column expressions."""
    # \n, \r, \t unescape; a literal backslash stays doubled. The replacement
    # strings carry REAL control characters (Java replaceAll would read a
    # backslash-n replacement as a literal 'n').
    c = F.regexp_replace(c, r"(?<!\\)((?:\\\\)*)\\n", "$1\n")
    c = F.regexp_replace(c, r"(?<!\\)((?:\\\\)*)\\r", "$1\r")
    c = F.regexp_replace(c, r"(?<!\\)((?:\\\\)*)\\t", "$1\t")
    return c


def read_ntriples(
    spark: SparkSession, path: Union[str, Iterable[str]]
) -> DataFrame:
    """Read N-Triples file(s)/folder into the encoded 3-column schema.

    Malformed / comment / blank lines are dropped (count them yourself by
    comparing to `spark.read.text(...).count()` if needed). Entirely
    JVM-side: text scan + regexp extraction, no Python row work.
    """
    paths = (
        _expand_paths(path) if isinstance(path, str) else [p for x in path for p in _expand_paths(x)]
    )
    lines = spark.read.text(paths)
    parsed = lines.select(
        F.regexp_extract("value", _LINE_RE, 1).alias("s"),
        F.regexp_extract("value", _LINE_RE, 2).alias("p"),
        F.regexp_extract("value", _LINE_RE, 3).alias("o"),
    ).filter((F.col("s") != "") & (F.col("p") != "") & (F.col("o") != ""))
    return parsed.select(
        "s",
        "p",
        F.when(
            F.col("o").startswith('"'), _normalize_nt_escapes(F.col("o"))
        ).otherwise(F.col("o")).alias("o"),
    )


def write_ntriples(df: DataFrame, path: str, single_file: bool = False) -> None:
    """Write encoded triples as N-Triples text (S5). Control characters in
    literals are re-escaped to keep one triple per line."""
    esc_o = F.when(
        F.col("o").startswith('"'),
        F.regexp_replace(
            F.regexp_replace(F.regexp_replace(F.col("o"), "\n", "\\\\n"), "\r", "\\\\r"),
            "\t",
            "\\\\t",
        ),
    ).otherwise(F.col("o"))
    out = df.select(
        F.concat_ws(" ", F.col("s"), F.col("p"), esc_o, F.lit(".")).alias("value")
    )
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").text(path)
