"""Unit fixtures for the compositional class-expression translation in
owl2rules (the Spark-repo counterpart of the reference's owl-to-rules
dependency, build.sbt:43) — one tiny ontology per axiom form, entailments
checked through the naive fixpoint oracle (no Spark needed; the Spark engine
is differentially tested against the same oracle in test_e2e_replica.py,
and the reference-golden 611 E2E pins the full RO translation).

Axiom forms: cls-svf1/svf2 (someValuesFrom subclass side), cls-avf
(allValuesFrom superclass side), cls-int1/int2, cls-uni, hasSelf, cax-dw
(disjointWith → owl:Nothing), ABox ∀-type assertions, and the
dropped-with-reason accounting for inexpressible forms.
"""

from __future__ import annotations

from arachne_spark.oracle import naive_fixpoint
from arachne_spark.owl2rules import owl_to_rules
from arachne_spark.sources.turtle import parse_turtle

PREFIXES = """
@prefix : <http://example.org/t/> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
"""

E = "http://example.org/t/"
OWL = "http://www.w3.org/2002/07/owl#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _t(s, p, o):
    return (f"<{E}{s}>", f"<{E}{p}>", f"<{E}{o}>")


def _ty(s, c):
    return (f"<{E}{s}>", f"<{RDF}type>", f"<{E}{c}>")


def _run(ttl: str):
    triples = parse_turtle(PREFIXES + ttl)
    rules = owl_to_rules(triples)
    return rules, naive_fixpoint(triples, rules)


def test_svf_subclass_side_cls_svf1():
    # ∃partOf.Engine ⊑ EnginePart  ⇒  (x partOf y)∧(y type Engine) → (x type EnginePart)
    rules, facts = _run("""
    [ a owl:Restriction ; owl:onProperty :partOf ; owl:someValuesFrom :Engine ]
        rdfs:subClassOf :EnginePart .
    :piston :partOf :v8 . :v8 a :Engine .
    :knob :partOf :door .
    """)
    assert rules.dropped == 0
    assert _ty("piston", "EnginePart") in facts
    assert _ty("knob", "EnginePart") not in facts  # door is not an Engine


def test_svf_thing_filler_cls_svf2():
    # ∃p.Thing ⊑ D  ⇒  (x p y) → (x type D)
    rules, facts = _run("""
    [ a owl:Restriction ; owl:onProperty :hasPart ; owl:someValuesFrom owl:Thing ]
        rdfs:subClassOf :Whole .
    :car :hasPart :wheel .
    """)
    assert rules.dropped == 0
    assert _ty("car", "Whole") in facts


def test_avf_superclass_side_cls_avf():
    # Vegan ⊑ ∀eats.Plant  ⇒  (x type Vegan)∧(x eats y) → (y type Plant)
    rules, facts = _run("""
    :Vegan rdfs:subClassOf
        [ a owl:Restriction ; owl:onProperty :eats ; owl:allValuesFrom :Plant ] .
    :v a :Vegan . :v :eats :kale .
    :o :eats :steak .
    """)
    assert rules.dropped == 0
    assert _ty("kale", "Plant") in facts
    assert _ty("steak", "Plant") not in facts


def test_nested_svf_in_svf():
    # ∃p.(∃q.C) ⊑ D — nesting expands to a 3-atom body, one rule
    rules, facts = _run("""
    [ a owl:Restriction ; owl:onProperty :p ; owl:someValuesFrom
        [ a owl:Restriction ; owl:onProperty :q ; owl:someValuesFrom :C ] ]
        rdfs:subClassOf :D .
    :a :p :b . :b :q :c . :c a :C .
    """)
    assert rules.dropped == 0
    assert _ty("a", "D") in facts


def test_intersection_both_sides():
    # cls-int1: A⊓B ⊑ C;  cls-int2: C ⊑ A⊓B
    rules, facts = _run("""
    [ owl:intersectionOf ( :Student :Employee ) ] rdfs:subClassOf :WorkingStudent .
    :Intern rdfs:subClassOf [ owl:intersectionOf ( :Person :Temporary ) ] .
    :w a :Student . :w a :Employee .
    :s a :Student .
    :i a :Intern .
    """)
    assert rules.dropped == 0
    assert _ty("w", "WorkingStudent") in facts
    assert _ty("s", "WorkingStudent") not in facts  # int1 needs BOTH conjuncts
    assert _ty("i", "Person") in facts and _ty("i", "Temporary") in facts


def test_union_subclass_side_cls_uni():
    # Cat∪Dog ⊑ Pet — one rule per disjunct
    rules, facts = _run("""
    [ owl:unionOf ( :Cat :Dog ) ] rdfs:subClassOf :Pet .
    :tom a :Cat . :rex a :Dog . :moby a :Whale .
    """)
    assert rules.dropped == 0
    assert _ty("tom", "Pet") in facts and _ty("rex", "Pet") in facts
    assert _ty("moby", "Pet") not in facts


def test_hasself_both_directions():
    rules, facts = _run("""
    [ a owl:Restriction ; owl:onProperty :likes ; owl:hasSelf true ]
        rdfs:subClassOf :Narcissist .
    :AutoFan rdfs:subClassOf
        [ a owl:Restriction ; owl:onProperty :admires ; owl:hasSelf true ] .
    :n :likes :n .
    :f a :AutoFan .
    """)
    assert rules.dropped == 0
    assert _ty("n", "Narcissist") in facts
    assert _t("f", "admires", "f") in facts


def test_disjoint_with_cax_dw():
    rules, facts = _run("""
    :Alive owl:disjointWith :Dead .
    :cat a :Alive . :cat a :Dead .
    :dog a :Alive .
    """)
    assert rules.dropped == 0
    nothing = (f"<{E}cat>", f"<{RDF}type>", f"<{OWL}Nothing>")
    assert nothing in facts
    assert (f"<{E}dog>", f"<{RDF}type>", f"<{OWL}Nothing>") not in facts


def test_abox_avf_type_assertion():
    # a type [∀p.D]  ⇒  (a p y) → (y type D)  — constant-subject rule
    rules, facts = _run("""
    :box a [ a owl:Restriction ; owl:onProperty :contains ; owl:allValuesFrom :Toy ] .
    :box :contains :ball .
    :bag :contains :rock .
    """)
    assert _ty("ball", "Toy") in facts
    assert _ty("rock", "Toy") not in facts


def test_inexpressible_forms_counted_not_silent():
    # svf in SUPERCLASS position (existential head) and union in head —
    # both must be dropped WITH a reason, never silently ignored
    rules, _ = _run("""
    :Engine rdfs:subClassOf
        [ a owl:Restriction ; owl:onProperty :hasPart ; owl:someValuesFrom :Piston ] .
    :Parent rdfs:subClassOf [ owl:unionOf ( :Mother :Father ) ] .
    :Odd rdfs:subClassOf [ owl:complementOf :Even ] .
    :Lonely rdfs:subClassOf
        [ a owl:Restriction ; owl:onProperty :knows ; owl:maxCardinality 1 ] .
    """)
    assert rules.dropped == 4
    assert sum("svf in superclass" in l for l in rules.drop_log) == 1
    assert sum("union in superclass" in l for l in rules.drop_log) == 1
    assert sum("compl in superclass" in l for l in rules.drop_log) == 1
    assert sum("card in superclass" in l for l in rules.drop_log) == 1


def test_equivalent_class_to_restriction_compositional():
    # C ≡ ∃p.D : the body-expressible direction fires compositionally
    rules, facts = _run("""
    :Parent owl:equivalentClass
        [ a owl:Restriction ; owl:onProperty :hasChild ; owl:someValuesFrom owl:Thing ] .
    :sam :hasChild :kid .
    """)
    assert _ty("sam", "Parent") in facts
    # the reverse (Parent ⊑ ∃hasChild.Thing) is existential → counted
    assert rules.dropped == 1
    assert "svf in superclass" in rules.drop_log[0]


def test_no_intermediate_bnode_membership_facts():
    """Compositional expansion must not materialize (x type _:R) facts for
    TBox-only restriction bnodes (the reference's Jena rules cannot mention
    bnodes; fact counts must match its compositional shape)."""
    _, facts = _run("""
    [ a owl:Restriction ; owl:onProperty :p ; owl:someValuesFrom :C ]
        rdfs:subClassOf :D .
    :a :p :b . :b a :C .
    """)
    derived_bnode_types = {
        (s, p, o) for s, p, o in facts
        if p == f"<{RDF}type>" and o.startswith("_:") and not s.startswith("_:")
        and s == f"<{E}a>"
    }
    assert derived_bnode_types == set()
