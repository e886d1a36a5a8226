"""OWL-RL-core rule set — the schema-driven Datalog rules that
`org.geneontology:owl-to-rules` produces for the reference engine
(Main.scala:44-48 translates the ontology to Jena rules; Bridge.scala keeps the
triple-pattern subset). Rule names follow the W3C OWL 2 RL/RDF profile table.

These are *generic* rules: TBox atoms like (?p rdf:type owl:TransitiveProperty)
appear in bodies, so one fixed rule set serves any ontology — matching the
reference's "load rules once, reuse for any number of datasets" design
(README.md:9). Variables in predicate position are required (SURVEY N5) and
supported by the engine.

Also implements B3 (Bridge.scala:63-100) declaratively: instead of attaching a
mutable-callback action per type rule, `indirect_type_support` materializes a
strict-superclass TBox relation and one rule emitting
(?x <http://arachne.geneontology.org/indirect_type> ?d) triples — the facade
consumes them exactly as the reference's SPARQL does
(ArachneOWLReasoner.scala:26, 84, 257).
"""

from __future__ import annotations

from arachne_spark.model import (
    INDIRECT_TYPE,
    OWL_INVERSEOF,
    OWL_SAMEAS,
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBCLASSOF,
    RDFS_SUBPROPERTYOF,
    encode_iri,
)
from arachne_spark.rules import Rule, RuleSet, Var

OWL = "http://www.w3.org/2002/07/owl#"

_x, _y, _z = Var("x"), Var("y"), Var("z")
_p, _q, _r = Var("p"), Var("q"), Var("r")
_c, _d = Var("c"), Var("d")

TYPE = encode_iri(RDF_TYPE)
SCO = encode_iri(RDFS_SUBCLASSOF)
SPO = encode_iri(RDFS_SUBPROPERTYOF)
DOM = encode_iri(RDFS_DOMAIN)
RNG = encode_iri(RDFS_RANGE)
SAME = encode_iri(OWL_SAMEAS)
INV = encode_iri(OWL_INVERSEOF)
TRANSP = encode_iri(OWL + "TransitiveProperty")
SYMP = encode_iri(OWL + "SymmetricProperty")
FUNP = encode_iri(OWL + "FunctionalProperty")
IFP = encode_iri(OWL + "InverseFunctionalProperty")
EQC = encode_iri(OWL + "equivalentClass")
EQP = encode_iri(OWL + "equivalentProperty")
ONPROP = encode_iri(OWL + "onProperty")
HASVAL = encode_iri(OWL + "hasValue")
CHAIN = encode_iri(OWL + "propertyChainAxiom")  # binary-chain simplification
IND_TYPE = encode_iri(INDIRECT_TYPE)


def owl_rl_core() -> RuleSet:
    """The OWL-RL core closure rules (positive-Datalog subset)."""
    R = Rule
    rules = [
        # -- class hierarchy -------------------------------------------------
        R("scm-sco", ((_c, SCO, _d), (_d, SCO, Var("e"))), ((_c, SCO, Var("e")),)),
        R("cax-sco", ((_x, TYPE, _c), (_c, SCO, _d)), ((_x, TYPE, _d),)),
        R("cax-eqc1", ((_c, EQC, _d),), ((_c, SCO, _d), (_d, SCO, _c))),
        # -- property hierarchy ---------------------------------------------
        R("scm-spo", ((_p, SPO, _q), (_q, SPO, _r)), ((_p, SPO, _r),)),
        R("prp-spo1", ((_x, _p, _y), (_p, SPO, _q)), ((_x, _q, _y),)),
        R("prp-eqp1", ((_p, EQP, _q),), ((_p, SPO, _q), (_q, SPO, _p))),
        # -- domain / range ---------------------------------------------------
        R("prp-dom", ((_x, _p, _y), (_p, DOM, _c)), ((_x, TYPE, _c),)),
        R("prp-rng", ((_x, _p, _y), (_p, RNG, _c)), ((_y, TYPE, _c),)),
        # -- property characteristics ----------------------------------------
        R("prp-trp", ((_p, TYPE, TRANSP), (_x, _p, _y), (_y, _p, _z)), ((_x, _p, _z),)),
        R("prp-symp", ((_p, TYPE, SYMP), (_x, _p, _y)), ((_y, _p, _x),)),
        R("prp-inv1", ((_p, INV, _q), (_x, _p, _y)), ((_y, _q, _x),)),
        R("prp-inv2", ((_p, INV, _q), (_x, _q, _y)), ((_y, _p, _x),)),
        # functional / inverse-functional derive sameAs
        R("prp-fp", ((_p, TYPE, FUNP), (_x, _p, _y), (_x, _p, _z)), ((_y, SAME, _z),)),
        R("prp-ifp", ((_p, TYPE, IFP), (_x, _p, _z), (_y, _p, _z)), ((_x, SAME, _y),)),
        # -- sameAs equality theory (symmetric/transitive + substitution) ----
        R("eq-sym", ((_x, SAME, _y),), ((_y, SAME, _x),)),
        R("eq-trans", ((_x, SAME, _y), (_y, SAME, _z)), ((_x, SAME, _z),)),
        R("eq-rep-s", ((_x, SAME, _y), (_x, _p, _z)), ((_y, _p, _z),)),
        R("eq-rep-o", ((_x, SAME, _y), (_z, _p, _x)), ((_z, _p, _y),)),
        # -- hasValue restrictions --------------------------------------------
        R(
            "cls-hv1",
            ((_c, ONPROP, _p), (_c, HASVAL, _y), (_x, TYPE, _c)),
            ((_x, _p, _y),),
        ),
        R(
            "cls-hv2",
            ((_c, ONPROP, _p), (_c, HASVAL, _y), (_x, _p, _y)),
            ((_x, TYPE, _c),),
        ),
        # -- binary property chain  p o q ⊑ r  encoded as
        #    (?r chain:first ?p), (?r chain:second ?q) TBox triples ----------
        R(
            "prp-chain2",
            (
                (_r, encode_iri(OWL + "chainFirst"), _p),
                (_r, encode_iri(OWL + "chainSecond"), _q),
                (_x, _p, _y),
                (_y, _q, _z),
            ),
            ((_x, _r, _z),),
        ),
    ]
    return RuleSet(rules)


def indirect_type_rule() -> Rule:
    """B3 declarative re-expression: with a strict-superclass TBox relation
    <owl:strictSubClassOf>-style edges materialized (see
    ``strict_superclass_triples``), one rule derives the facade's
    indirect-type marker triples (Bridge.scala:69-100)."""
    strict = encode_iri(INDIRECT_TYPE + "_strictSuper")
    return Rule(
        "indirect-types",
        ((_x, TYPE, _c), (_c, strict, _d)),
        ((_x, IND_TYPE, _d),),
    )


def strict_superclass_triples(
    subclass_edges: list[tuple[str, str]]
) -> list[tuple[str, str, str]]:
    """Driver-side strict-superclass closure of ontology SubClassOf axioms
    (the `subToSupers` map of Bridge.scala:69-72, minus self/equivalents).
    TBox-sized — computed on the driver, broadcast by Spark as a small facts
    slice. Input/output terms are *encoded*."""
    from collections import defaultdict

    succ: dict[str, set[str]] = defaultdict(set)
    for sub, sup in subclass_edges:
        if sub != sup:
            succ[sub].add(sup)
    # transitive closure (TBox is small; simple worklist)
    closure: dict[str, set[str]] = {}
    for start in list(succ):
        seen: set[str] = set()
        stack = list(succ[start])
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            stack.extend(succ.get(n, ()))
        closure[start] = seen
    # strict: exclude classes mutually-subclassing (equivalents) and self
    strict_pred = encode_iri(INDIRECT_TYPE + "_strictSuper")
    out = []
    for sub, sups in closure.items():
        for sup in sups:
            if sup == sub:
                continue
            if sub in closure.get(sup, ()):  # equivalent classes — not strict
                continue
            out.append((sub, strict_pred, sup))
    return out
