"""SPARQL text front-end (Q13): parse-and-execute must agree with the native
BGP atom API on the same reasoner (the reference's ARQ surface,
ArachneOWLReasoner.scala:319-338)."""

import pytest

from arachne_spark.engine import FixpointEngine
from arachne_spark.facade import Reasoner
from arachne_spark.model import encode_iri, encode_literal
from arachne_spark.owlrl import (
    indirect_type_rule,
    owl_rl_core,
    strict_superclass_triples,
)
from arachne_spark.rules import RuleSet, Var
from arachne_spark.sparql import parse_sparql
from tests.conftest import triples_df

EX = "http://example.org/"
TYPE = encode_iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
SCO = encode_iri("http://www.w3.org/2000/01/rdf-schema#subClassOf")


def e(x):
    return encode_iri(EX + x)


PFX = "PREFIX ex: <http://example.org/> PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> "


@pytest.fixture(scope="module")
def reasoner(spark):
    tbox = [(e("B"), SCO, e("A")), (e("C"), SCO, e("B"))]
    abox = [
        (e("i1"), TYPE, e("C")),
        (e("i2"), TYPE, e("B")),
        (e("i1"), e("knows"), e("i2")),
        (e("i2"), e("knows"), e("i3")),
        (e("i1"), e("label"), encode_literal("one")),
    ]
    strict = strict_superclass_triples([(s, o) for s, _, o in tbox])
    rules = RuleSet(list(owl_rl_core()) + [indirect_type_rule()])
    res = FixpointEngine(spark, rules).materialize(
        triples_df(spark, tbox + abox + strict)
    )
    return Reasoner(res.facts.cache())


def test_select_matches_bgp_api(reasoner):
    q = PFX + "SELECT ?x ?y WHERE { ?x a ex:C . ?x ex:knows ?y . }"
    got = {tuple(r) for r in reasoner.sparql(q).collect()}
    x, y = Var("x"), Var("y")
    want = {
        (r["v_x"], r["v_y"])
        for r in reasoner.select_bgp(
            [(x, TYPE, e("C")), (x, e("knows"), y)]
        ).collect()
    }
    assert got == want and got == {(e("i1"), e("i2"))}


def test_select_star_semicolon_comma_and_a(reasoner):
    # ; predicate list, 'a', SELECT * — columns in first-appearance order
    q = PFX + "SELECT * WHERE { ?x a ex:B ; ex:knows ?y . }"
    df = reasoner.sparql(q)
    assert df.columns == ["x", "y"]
    got = {tuple(r) for r in df.collect()}
    # i1 a C => a B (subclass closure); i2 a B directly
    assert got == {(e("i1"), e("i2")), (e("i2"), e("i3"))}


def test_distinct_order_limit_offset(reasoner):
    q = PFX + "SELECT DISTINCT ?x WHERE { ?x a ex:A . } ORDER BY DESC(?x) LIMIT 1 OFFSET 1"
    rows = [r["x"] for r in reasoner.sparql(q).collect()]
    # instances of A: i1, i2 -> desc = [i2, i1] -> offset 1, limit 1 = [i1]
    assert rows == [e("i1")]


def test_filter_eq_neq_and_regex(reasoner):
    q = PFX + "SELECT ?y WHERE { ?x ex:knows ?y . FILTER(?x = ex:i1) }"
    assert {r["y"] for r in reasoner.sparql(q).collect()} == {e("i2")}
    q = PFX + "SELECT ?y WHERE { ?x ex:knows ?y . FILTER(?x != ex:i1) }"
    assert {r["y"] for r in reasoner.sparql(q).collect()} == {e("i3")}
    q = PFX + 'SELECT ?x WHERE { ?x ex:knows ?y . FILTER(REGEX(?x, "i[12]$")) }'
    assert {r["x"] for r in reasoner.sparql(q).collect()} == {e("i1"), e("i2")}


def test_literal_object(reasoner):
    q = PFX + 'SELECT ?x WHERE { ?x ex:label "one" . }'
    assert {r["x"] for r in reasoner.sparql(q).collect()} == {e("i1")}


def test_ask(reasoner):
    assert reasoner.sparql(PFX + "ASK { ex:i1 a ex:A . }") is True
    assert reasoner.sparql(PFX + "ASK WHERE { ex:i3 a ex:A . }") is False


def test_construct_matches_bgp_api(reasoner):
    q = PFX + (
        "CONSTRUCT { ?x ex:inferredType ex:A . } WHERE { ?x a ex:A . }"
    )
    got = {tuple(r) for r in reasoner.sparql(q).collect()}
    x = Var("x")
    want = {
        tuple(r)
        for r in reasoner.construct_bgp(
            [(x, TYPE, e("A"))], [(x, e("inferredType"), e("A"))]
        ).collect()
    }
    assert got == want and len(got) == 2


def test_unsupported_constructs_raise(reasoner):
    for frag in (
        "SELECT ?x WHERE { ?x a ex:A . OPTIONAL { ?x ex:knows ?y } }",
        "SELECT ?x WHERE { { ?x a ex:A } UNION { ?x a ex:B } }",
        "SELECT (COUNT(?x) AS ?n) WHERE { ?x a ex:A }",
    ):
        with pytest.raises((NotImplementedError, ValueError)):
            reasoner.sparql(PFX + frag)
    with pytest.raises(NotImplementedError, match="FILTER operator"):
        parse_sparql(PFX + "SELECT ?x WHERE { ?x ex:v ?y . FILTER(?y > 3) }")


def test_parse_shapes():
    q = parse_sparql(
        "PREFIX : <http://x/> SELECT ?a WHERE { ?a :p :b , :c ; :q ?z . }"
    )
    assert len(q.where) == 3  # object list ',' + predicate list ';'
    assert q.where[0][1] == "<http://x/p>"
    assert q.where[2][1] == "<http://x/q>"
    # typed + lang literals, numbers, booleans
    q2 = parse_sparql(
        'PREFIX : <http://x/> SELECT * WHERE { ?a :p "v"@en . ?a :q 42 . ?a :r true . }'
    )
    assert q2.where[0][2] == '"v"@en'
    assert q2.where[1][2].startswith('"42"^^<')
    assert q2.where[2][2].startswith('"true"^^<')


@pytest.fixture(scope="module")
def unicode_reasoner(spark):
    """Facts with non-ASCII literals (VERDICT r5 'What's wrong' #1: the text
    parser's unicode_escape round-trip mojibake'd them -> silent empty
    matches; fixed by reusing sources.turtle._unescape)."""
    abox = [
        (e("i1"), e("label"), encode_literal("café", lang="fr")),
        (e("i2"), e("label"), encode_literal("naïve δοκιμή")),
        (e("i3"), e("label"), encode_literal("A\nB")),  # real newline
    ]
    return Reasoner(triples_df(spark, abox))


def test_non_ascii_literal_matches_atom_api(unicode_reasoner):
    # text front-end vs native BGP atom API on the same literal
    q = PFX + 'SELECT ?x WHERE { ?x ex:label "café"@fr . }'
    got = {r["x"] for r in unicode_reasoner.sparql(q).collect()}
    want = {
        r["v_x"]
        for r in unicode_reasoner.select_bgp(
            [(Var("x"), e("label"), encode_literal("café", lang="fr"))]
        ).collect()
    }
    assert got == want == {e("i1")}


def test_unicode_escape_sequences_still_work(unicode_reasoner):
    # é must decode to é; \n to a newline — the escapes the old
    # round-trip DID handle must keep working through _unescape
    q = PFX + 'SELECT ?x WHERE { ?x ex:label "caf\\u00E9"@fr . }'
    assert {r["x"] for r in unicode_reasoner.sparql(q).collect()} == {e("i1")}
    q2 = PFX + 'SELECT ?x WHERE { ?x ex:label "A\\nB" . }'
    assert {r["x"] for r in unicode_reasoner.sparql(q2).collect()} == {e("i3")}


def test_non_ascii_regex(unicode_reasoner):
    q = PFX + 'SELECT ?x WHERE { ?x ex:label ?l . FILTER(REGEX(?l, "δοκιμή")) }'
    assert {r["x"] for r in unicode_reasoner.sparql(q).collect()} == {e("i2")}
