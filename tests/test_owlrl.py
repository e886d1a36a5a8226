"""OWL-RL core rules: behavior checklist mirroring the reference's test1.ttl
fixture constructs (symmetric property, transitive property, subPropertyOf of
an inverse, hasValue restriction, sameAs, explicit SWRL-style chain rule —
test1.ttl:28-33,67-71,95,174-215), validated differentially against the
pure-Python oracle."""

import pytest

from arachne_spark.engine import FixpointEngine
from arachne_spark.model import encode_iri
from arachne_spark.oracle import naive_fixpoint
from arachne_spark.owlrl import (
    OWL,
    indirect_type_rule,
    owl_rl_core,
    strict_superclass_triples,
)
from arachne_spark.rules import RuleSet
from tests.conftest import spo_set, triples_df

EX = "http://example.org/"


def e(x: str) -> str:
    return encode_iri(EX + x)


TYPE = encode_iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
SCO = encode_iri("http://www.w3.org/2000/01/rdf-schema#subClassOf")
SPO = encode_iri("http://www.w3.org/2000/01/rdf-schema#subPropertyOf")
DOM = encode_iri("http://www.w3.org/2000/01/rdf-schema#domain")
RNG = encode_iri("http://www.w3.org/2000/01/rdf-schema#range")
SAME = encode_iri("http://www.w3.org/2002/07/owl#sameAs")
INV = encode_iri("http://www.w3.org/2002/07/owl#inverseOf")


@pytest.fixture(scope="module")
def tbox_abox():
    """test1.ttl-shaped fixture: q symmetric, r transitive, t subPropertyOf
    inverse-of-s (via explicit inverse edge), hasValue restriction, sameAs,
    chain rule s∘t→u, class hierarchy + domain/range."""
    t = [
        # TBox
        (e("q"), TYPE, encode_iri(OWL + "SymmetricProperty")),
        (e("r"), TYPE, encode_iri(OWL + "TransitiveProperty")),
        (e("t"), SPO, e("tSuper")),
        (e("s"), INV, e("sInv")),
        (e("B"), SCO, e("A")),
        (e("C"), SCO, e("B")),
        (e("p"), DOM, e("DomC")),
        (e("p"), RNG, e("RngC")),
        # hasValue restriction: Restr ≡ onProperty hv, hasValue val1
        (e("Restr"), encode_iri(OWL + "onProperty"), e("hv")),
        (e("Restr"), encode_iri(OWL + "hasValue"), e("val1")),
        # chain axiom: s ∘ t ⊑ u
        (e("u"), encode_iri(OWL + "chainFirst"), e("s")),
        (e("u"), encode_iri(OWL + "chainSecond"), e("t")),
        # ABox
        (e("i1"), e("q"), e("i2")),
        (e("i1"), e("r"), e("i2")),
        (e("i2"), e("r"), e("i3")),
        (e("i3"), e("r"), e("i4")),
        (e("i5"), TYPE, e("C")),
        (e("i1"), e("p"), e("i6")),
        (e("i7"), e("s"), e("i8")),
        (e("i8"), e("t"), e("i9")),
        (e("i10"), TYPE, e("Restr")),
        (e("i11"), e("hv"), e("val1")),
        (e("i5"), SAME, e("i12")),
        (e("i12"), e("p"), e("i13")),
    ]
    return t


def test_owlrl_core_vs_oracle(spark, tbox_abox):
    rules = owl_rl_core()
    expect = naive_fixpoint(tbox_abox, rules)
    res = FixpointEngine(spark, rules).materialize(triples_df(spark, tbox_abox))
    got = spo_set(res.facts)
    assert got == expect

    # spot-check each construct:
    assert (e("i2"), e("q"), e("i1")) in got            # symmetric
    assert (e("i1"), e("r"), e("i4")) in got            # transitive
    assert (e("i8"), e("tSuper"), e("i9")) in got       # subPropertyOf
    assert (e("i8"), e("sInv"), e("i7")) in got         # inverseOf
    assert (e("i5"), TYPE, e("A")) in got               # subclass closure
    assert (e("i1"), TYPE, e("DomC")) in got            # domain
    assert (e("i6"), TYPE, e("RngC")) in got            # range
    assert (e("i10"), e("hv"), e("val1")) in got        # hasValue cls-hv1
    assert (e("i11"), TYPE, e("Restr")) in got          # hasValue cls-hv2
    assert (e("i7"), e("u"), e("i9")) in got            # chain s∘t→u
    assert (e("i12"), TYPE, e("C")) in got              # sameAs substitution
    assert (e("i5"), e("p"), e("i13")) in got           # sameAs substitution


def test_indirect_types(spark):
    """B3 declarative re-expression: indirect_type marker triples."""
    edges = [(e("C"), e("B")), (e("B"), e("A")), (e("X"), e("X2")), (e("X2"), e("X"))]
    strict = strict_superclass_triples(edges)
    # X and X2 are mutually-subclassing (equivalent) -> not strict supers
    strict_pairs = {(s, o) for s, _, o in strict}
    assert (e("C"), e("A")) in strict_pairs
    assert (e("X"), e("X2")) not in strict_pairs

    rules = RuleSet([indirect_type_rule()])
    abox = [(e("i"), TYPE, e("C"))] + strict
    res = FixpointEngine(spark, rules).materialize(triples_df(spark, abox))
    got = spo_set(res.facts)
    ind = encode_iri("http://arachne.geneontology.org/indirect_type")
    assert (e("i"), ind, e("B")) in got
    assert (e("i"), ind, e("A")) in got
    expect = naive_fixpoint(abox, rules)
    assert got == expect
