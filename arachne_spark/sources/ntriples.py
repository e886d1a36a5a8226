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
    """N-Triples literal escapes (\\n \\t \\r \\f \\b) -> raw characters,
    keeping our canonical \\\\ and \\" escapes. Pure column expressions."""
    # unescape; a literal backslash stays doubled. The replacement strings
    # carry REAL control characters (Java replaceAll would read a
    # backslash-n replacement as a literal 'n').
    c = F.regexp_replace(c, r"(?<!\\)((?:\\\\)*)\\n", "$1\n")
    c = F.regexp_replace(c, r"(?<!\\)((?:\\\\)*)\\r", "$1\r")
    c = F.regexp_replace(c, r"(?<!\\)((?:\\\\)*)\\t", "$1\t")
    c = F.regexp_replace(c, r"(?<!\\)((?:\\\\)*)\\f", "$1\f")
    c = F.regexp_replace(c, r"(?<!\\)((?:\\\\)*)\\b", "$1\b")
    return _decode_uchar_escapes(c)


# A UCHAR escape written \\uXXXX or \\UXXXXXXXX. After the sentinel pass
# below there are no doubled backslashes left, so every remaining \\u/\\U is a
# real escape.
_UCHAR_RE = r"\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8}"
# private-use sentinel standing in for an escaped backslash during decoding
_BS_SENTINEL = "\ue000"


def _uchar_to_char(e):
    """One UCHAR escape token -> its character, via UTF-16BE decode of the
    code point (surrogate-pair arithmetic above the BMP). Spark's chr() is
    byte-oriented, so decode(unhex(...), 'UTF-16BE') is the unicode-correct
    route — still pure Catalyst."""
    cp = F.conv(F.substring(e, 3, 8), 16, 10).cast("long")
    hex4 = F.lpad(F.hex(cp), 4, "0")
    hi = F.lit(0xD800) + F.shiftright(cp - 0x10000, 10)
    lo = F.lit(0xDC00) + (cp - 0x10000).bitwiseAND(F.lit(0x3FF))
    surrogates = F.concat(F.lpad(F.hex(hi), 4, "0"), F.lpad(F.hex(lo), 4, "0"))
    # quote and backslash stay ESCAPED in our canonical term encoding
    # (model.py: esc() escapes exactly these two), so " -> \" not "
    return (
        F.when(cp == 0x22, F.lit('\\"'))
        .when(cp == 0x5C, F.lit("\\\\"))
        .otherwise(
            F.decode(
                F.unhex(F.when(cp <= 0xFFFF, hex4).otherwise(surrogates)), "UTF-16BE"
            )
        )
    )


def _decode_uchar_escapes(c):
    """Decode N-Triples \\uXXXX / \\UXXXXXXXX escapes to raw characters so a
    term written either way is ONE term (the Jena loader's behavior the
    reference inherits, Main.scala:63-74). Escaped backslashes are protected
    via a private-use sentinel so \\\\u0041 stays a literal backslash + text.
    The whole path is gated on the presence of an escape, so ASCII-clean data
    pays one `contains` check. Caveat (documented): raw U+E000 in input data
    would collide with the sentinel on escape-bearing lines only."""
    protected = F.regexp_replace(c, r"\\\\", _BS_SENTINEL)
    parts = F.split(protected, _UCHAR_RE, -1)
    escs = F.regexp_extract_all(protected, F.lit(f"({_UCHAR_RE})"), 1)
    recombined = F.aggregate(
        F.sequence(F.lit(1), F.size(escs)),
        F.element_at(parts, 1),
        lambda acc, i: F.concat(
            acc, _uchar_to_char(F.element_at(escs, i)), F.element_at(parts, i + 1)
        ),
    )
    decoded = F.when(F.size(escs) > 0, recombined).otherwise(protected)
    restored = F.regexp_replace(decoded, _BS_SENTINEL, r"\\\\")
    return F.when(
        c.contains("\\u") | c.contains("\\U"), restored
    ).otherwise(c)


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
    # IRIREF allows UCHAR escapes too, so every position gets the unicode
    # decode; the literal-only escapes (\n etc.) apply to literal objects.
    return parsed.select(
        _decode_uchar_escapes(F.col("s")).alias("s"),
        _decode_uchar_escapes(F.col("p")).alias("p"),
        F.when(
            F.col("o").startswith('"'), _normalize_nt_escapes(F.col("o"))
        ).otherwise(_decode_uchar_escapes(F.col("o"))).alias("o"),
    )


# N-Quads line: N-Triples + an optional graph label (IRI or bnode) before
# the terminating dot (lines without one belong to the default graph)
_QLINE_RE = (
    r'^\s*(<[^>]*>|_:\S+)'
    r'\s+(<[^>]*>)'
    r'\s+(<[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+|\^\^<[^>]*>)?)'
    r'(?:\s+(<[^>]*>|_:\S+))?'
    r'\s*\.\s*$'
)


def read_nquads(
    spark: SparkSession,
    path: Union[str, Iterable[str]],
    with_graph: bool = False,
) -> DataFrame:
    """Read N-Quads file(s)/folder — the line-based bulk-dump format most
    public RDF corpora ship as (each line carries an optional named-graph
    label). Same pure-Catalyst pipeline as read_ntriples; N-Triples input is
    valid N-Quads, so this also subsumes S1's file/folder loading.

    with_graph=False (default) projects to the engine's 3-column schema
    (graph labels dropped — the reference merges all data files into ONE
    model the same way, Main.scala:71-74); with_graph=True keeps a 4th
    encoded `g` column (empty string for default-graph lines)."""
    paths = (
        _expand_paths(path)
        if isinstance(path, str)
        else [p for x in path for p in _expand_paths(x)]
    )
    lines = spark.read.text(paths)
    parsed = lines.select(
        F.regexp_extract("value", _QLINE_RE, 1).alias("s"),
        F.regexp_extract("value", _QLINE_RE, 2).alias("p"),
        F.regexp_extract("value", _QLINE_RE, 3).alias("o"),
        F.regexp_extract("value", _QLINE_RE, 4).alias("g"),
    ).filter((F.col("s") != "") & (F.col("p") != "") & (F.col("o") != ""))
    out = parsed.select(
        _decode_uchar_escapes(F.col("s")).alias("s"),
        _decode_uchar_escapes(F.col("p")).alias("p"),
        F.when(
            F.col("o").startswith('"'), _normalize_nt_escapes(F.col("o"))
        ).otherwise(_decode_uchar_escapes(F.col("o"))).alias("o"),
        _decode_uchar_escapes(F.col("g")).alias("g"),
    )
    return out if with_graph else out.drop("g")


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
