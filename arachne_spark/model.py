"""RDF term model and the engine's triple schema.

Reference data model: Triple.scala:3-100 (term ADT), Triple.scala:83-87 (structural
triple identity), Triple.scala:23-30 (literal identity is *lexical*: exact
(lexicalForm, datatype, lang) — "1"^^xsd:int != "01"^^xsd:int).

Spark mapping (SURVEY.md §1.3): we keep TWO representations.

1. the *flat* 6-column interchange schema used for IO and fixtures:
       s, p, o, o_kind ('iri'|'bnode'|'lit'), o_dt, o_lang
2. the *encoded* 3-column engine schema used in the fixpoint hot loop:
       s, p, o   — each an N-Triples-canonical encoded term string.

The encoded form makes term identity a single string equality, so every Datalog
join key is one column per variable, dedup is a 3-column distinct, and a literal
can never spuriously join an IRI (a literal encodes with surrounding quotes, an
IRI with angle brackets, a bnode with the `_:` prefix). This mirrors the cached
structural hashCode identity in the reference (Triple.scala:85, URI interning
Triple.scala:11) without any driver-side interning.

Encoding (injective, deterministic):
    IRI   u           ->  <u>
    bnode label       ->  _:label
    literal lex       ->  "esc(lex)"            (plain / xsd:string)
                      ->  "esc(lex)"@lang       (language-tagged)
                      ->  "esc(lex)"^^<dt>      (typed, dt != xsd:string)
    esc() escapes backslash and double-quote, so the encoding is unambiguous.

xsd:string is canonicalized away (plain and xsd:string literals are the same
term, matching RDF 1.1 / Jena's treatment that the reference inherits through
`tripleFromJena`, Bridge.scala:41-49).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_SUBCLASSOF = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
RDFS_SUBPROPERTYOF = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
RDFS_DOMAIN = "http://www.w3.org/2000/01/rdf-schema#domain"
RDFS_RANGE = "http://www.w3.org/2000/01/rdf-schema#range"
OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
OWL_DIFFERENTFROM = "http://www.w3.org/2002/07/owl#differentFrom"
OWL_NOTHING = "http://www.w3.org/2002/07/owl#Nothing"
OWL_NAMED_INDIVIDUAL = "http://www.w3.org/2002/07/owl#NamedIndividual"
OWL_INVERSEOF = "http://www.w3.org/2002/07/owl#inverseOf"
# The reference facade's indirect-type marker predicate
# (ArachneOWLReasoner.scala:26: `http://arachne.geneontology.org/indirect_type`).
INDIRECT_TYPE = "http://arachne.geneontology.org/indirect_type"

TRIPLE_COLS = ("s", "p", "o")
FLAT_COLS = ("s", "p", "o", "o_kind", "o_dt", "o_lang")


# ---------------------------------------------------------------------------
# Python-side term encoding (driver: rules, fixtures, oracle)
# ---------------------------------------------------------------------------

def _esc(lex: str) -> str:
    return lex.replace("\\", "\\\\").replace('"', '\\"')


def _unesc(lex: str) -> str:
    return lex.replace('\\"', '"').replace("\\\\", "\\")


def encode_iri(uri: str) -> str:
    return f"<{uri}>"


def encode_bnode(label: str) -> str:
    return label if label.startswith("_:") else f"_:{label}"


def encode_literal(lex: str, dt: Optional[str] = None, lang: Optional[str] = None) -> str:
    if lang:
        return f'"{_esc(lex)}"@{lang}'
    if dt and dt not in (XSD_STRING, RDF_LANGSTRING):
        return f'"{_esc(lex)}"^^<{dt}>'
    return f'"{_esc(lex)}"'


def encode_resource(value: str) -> str:
    """IRI-or-bnode convenience (subject/predicate positions)."""
    return value if value.startswith("_:") else encode_iri(value)


def decode_term(t: str) -> dict:
    """Encoded term -> {'kind': 'iri'|'bnode'|'lit', 'lex', 'dt', 'lang'}."""
    if t.startswith("<") and t.endswith(">"):
        return {"kind": "iri", "lex": t[1:-1], "dt": None, "lang": None}
    if t.startswith("_:"):
        return {"kind": "bnode", "lex": t, "dt": None, "lang": None}
    if t.startswith('"'):
        # find closing unescaped quote by scanning from the end markers
        if t.endswith('"'):
            return {"kind": "lit", "lex": _unesc(t[1:-1]), "dt": None, "lang": None}
        close = _closing_quote(t)
        rest = t[close + 1 :]
        lex = _unesc(t[1:close])
        if rest.startswith("@"):
            return {"kind": "lit", "lex": lex, "dt": None, "lang": rest[1:]}
        if rest.startswith("^^<") and rest.endswith(">"):
            return {"kind": "lit", "lex": lex, "dt": rest[3:-1], "lang": None}
    raise ValueError(f"undecodable term: {t!r}")


def _closing_quote(t: str) -> int:
    i = len(t) - 1
    while i > 0:
        if t[i] == '"':
            # count preceding backslashes
            j = i - 1
            n = 0
            while j > 0 and t[j] == "\\":
                n += 1
                j -= 1
            if n % 2 == 0:
                return i
        i -= 1
    raise ValueError(f"unterminated literal: {t!r}")


# ---------------------------------------------------------------------------
# Column-level encode/decode (pure Catalyst expressions — no UDFs; SURVEY.md S4)
# ---------------------------------------------------------------------------

def _esc_col(c: Column) -> Column:
    return F.regexp_replace(F.regexp_replace(c, r"\\", r"\\\\"), '"', '\\\\"')


def _unesc_col(c: Column) -> Column:
    return F.regexp_replace(F.regexp_replace(c, r'\\"', '"'), r"\\\\", r"\\")


def encode_resource_col(c: Column) -> Column:
    return F.when(c.startswith("_:"), c).otherwise(F.concat(F.lit("<"), c, F.lit(">")))


def encode_object_col(o: Column, o_kind: Column, o_dt: Column, o_lang: Column) -> Column:
    lit_body = F.concat(F.lit('"'), _esc_col(o), F.lit('"'))
    lit_enc = (
        F.when(o_lang.isNotNull(), F.concat(lit_body, F.lit("@"), o_lang))
        .when(
            o_dt.isNotNull() & ~o_dt.isin(XSD_STRING, RDF_LANGSTRING),
            F.concat(lit_body, F.lit("^^<"), o_dt, F.lit(">")),
        )
        .otherwise(lit_body)
    )
    return (
        F.when(o_kind == "lit", lit_enc)
        .when(o_kind == "bnode", o)
        .otherwise(F.concat(F.lit("<"), o, F.lit(">")))
    )


def encode_triples(flat: DataFrame) -> DataFrame:
    """Flat 6-column interchange schema -> encoded 3-column engine schema."""
    return flat.select(
        encode_resource_col(F.col("s")).alias("s"),
        F.concat(F.lit("<"), F.col("p"), F.lit(">")).alias("p"),
        encode_object_col(
            F.col("o"), F.col("o_kind"), F.col("o_dt"), F.col("o_lang")
        ).alias("o"),
    )


def decode_resource_col(c: Column) -> Column:
    return F.when(c.startswith("_:"), c).otherwise(c.substr(F.lit(2), F.length(c) - 2))


def decode_triples(enc: DataFrame) -> DataFrame:
    """Encoded 3-column engine schema -> flat 6-column interchange schema."""
    s, p, o = F.col("s"), F.col("p"), F.col("o")
    o_kind = (
        F.when(o.startswith("<"), F.lit("iri"))
        .when(o.startswith("_:"), F.lit("bnode"))
        .otherwise(F.lit("lit"))
    )
    # literal parts: "lex"  |  "lex"@lang  |  "lex"^^<dt>
    lit_lex = _unesc_col(F.regexp_extract(o, r'^"((?:[^"\\]|\\.)*)"', 1))
    lit_lang = F.nullif(F.regexp_extract(o, r'"@([A-Za-z0-9-]+)$', 1), F.lit(""))
    lit_dt = F.nullif(F.regexp_extract(o, r'"\^\^<([^>]*)>$', 1), F.lit(""))
    return enc.select(
        F.when(s.startswith("_:"), s).otherwise(s.substr(F.lit(2), F.length(s) - 2)).alias("s"),
        p.substr(F.lit(2), F.length(p) - 2).alias("p"),
        F.when(o_kind == "iri", o.substr(F.lit(2), F.length(o) - 2))
        .when(o_kind == "bnode", o)
        .otherwise(lit_lex)
        .alias("o"),
        o_kind.alias("o_kind"),
        F.when(o_kind == "lit", lit_dt).otherwise(F.lit(None)).alias("o_dt"),
        F.when(o_kind == "lit", lit_lang).otherwise(F.lit(None)).alias("o_lang"),
    )
