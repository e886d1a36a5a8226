"""Term encoding: injectivity, literal lexical identity (Triple.scala:23-30),
6-col <-> 3-col round trip."""

import pytest

from arachne_spark.model import (
    XSD_STRING,
    decode_term,
    encode_bnode,
    encode_iri,
    encode_literal,
    encode_resource,
    encode_triples,
    decode_triples,
)
from tests.conftest import spo_set


def test_encode_kinds_disjoint():
    assert encode_iri("http://a") == "<http://a>"
    assert encode_bnode("b1") == "_:b1"
    assert encode_bnode("_:b1") == "_:b1"
    assert encode_literal("http://a") == '"http://a"'
    # an IRI whose text equals a literal's lexical form never collides
    assert encode_iri("x") != encode_literal("x") != encode_bnode("x")


def test_literal_lexical_identity():
    xsd_int = "http://www.w3.org/2001/XMLSchema#integer"
    # "1"^^xsd:int != "01"^^xsd:int (lexical, not value-space — SURVEY N3)
    assert encode_literal("1", xsd_int) != encode_literal("01", xsd_int)
    # xsd:string canonicalized to plain
    assert encode_literal("a", XSD_STRING) == encode_literal("a")
    assert encode_literal("a", None, "en") == '"a"@en'


def test_escaping_roundtrip():
    nasty = 'a"b\\c"^^<http://fake>'
    enc = encode_literal(nasty)
    d = decode_term(enc)
    assert d == {"kind": "lit", "lex": nasty, "dt": None, "lang": None}
    enc2 = encode_literal('x', "http://dt")
    assert decode_term(enc2) == {"kind": "lit", "lex": "x", "dt": "http://dt", "lang": None}
    assert decode_term('"x"@en') == {"kind": "lit", "lex": "x", "dt": None, "lang": "en"}
    assert decode_term("<http://a>")["kind"] == "iri"
    assert decode_term("_:z")["kind"] == "bnode"


def test_column_encode_decode_roundtrip(spark):
    rows = [
        ("http://s1", "http://p", "http://o", "iri", None, None),
        ("_:b1", "http://p", "_:b2", "bnode", None, None),
        ("http://s1", "http://p", "plain lit", "lit", None, None),
        ("http://s1", "http://p", "typed", "lit", "http://www.w3.org/2001/XMLSchema#integer", None),
        ("http://s1", "http://p", "bonjour", "lit", None, "fr"),
        ("http://s1", "http://p", 'quo"te\\slash', "lit", None, None),
        ("http://s1", "http://p", "str typed", "lit", XSD_STRING, None),
    ]
    flat = spark.createDataFrame(rows, "s string, p string, o string, o_kind string, o_dt string, o_lang string")
    enc = encode_triples(flat)
    got = spo_set(enc)
    assert ("<http://s1>", "<http://p>", '"plain lit"') in got
    assert ("_:b1", "<http://p>", "_:b2") in got
    assert ("<http://s1>", "<http://p>", '"bonjour"@fr') in got
    # xsd:string canonicalized same as plain
    assert ("<http://s1>", "<http://p>", '"str typed"') in got

    back = decode_triples(enc).collect()
    back_set = {(r.s, r.p, r.o, r.o_kind, r.o_dt, r.o_lang) for r in back}
    expect = {
        (s, p, o, k, None if dt == XSD_STRING else dt, lg)
        for (s, p, o, k, dt, lg) in rows
    }
    assert back_set == expect


def test_python_vs_column_encoding_agree(spark):
    """Driver-side and Catalyst-side encoders must be bit-identical."""
    rows = [
        ("http://s", "http://p", 'a"b\\c', "lit", None, None),
        ("_:x", "http://p", "o", "lit", "http://dt", None),
    ]
    flat = spark.createDataFrame(rows, "s string, p string, o string, o_kind string, o_dt string, o_lang string")
    got = spo_set(encode_triples(flat))
    assert (encode_resource("http://s"), encode_iri("http://p"), encode_literal('a"b\\c')) in got
    assert (encode_resource("_:x"), encode_iri("http://p"), encode_literal("o", "http://dt")) in got
