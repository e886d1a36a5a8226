"""Ontology-to-rules translator — the Spark-repo counterpart of the
reference's `org.geneontology:owl-to-rules` dependency (build.sbt:43;
Main.scala:44-48 translates the ontology, Bridge.scala keeps the
triple-pattern subset). Closes SURVEY S2.

Input: the ontology's TBox as encoded (s,p,o) triples — from read_turtle,
read_rdfxml, or a collected DataFrame. Output: one rule PER AXIOM with the
axiom's terms baked in as constants (the owl-to-rules shape: ontology-specific
rules, load once, reuse for any ABox), plus optionally the generic
sameAs-equality theory and the indirect-type support (B3).

Covered axiom forms (the positive-Datalog-expressible subset — exactly the
subset that survives the reference's Bridge filter, Bridge.scala:19-32):
  - rdfs:subClassOf / owl:equivalentClass  (named classes or restriction
    bnodes — bnodes are constants, SURVEY N4)
  - rdfs:subPropertyOf (incl. the sub-property-of-an-inverse bnode pattern,
    test1.ttl:28-33) / owl:equivalentProperty / owl:inverseOf
  - owl:TransitiveProperty / SymmetricProperty / FunctionalProperty /
    InverseFunctionalProperty
  - rdfs:domain / rdfs:range
  - owl:hasValue restrictions (both directions, cls-hv1/cls-hv2)
  - owl:propertyChainAxiom over RDF lists of any length
  - SWRL Imp rules with IndividualPropertyAtom / ClassAtom bodies and heads
    (test1.ttl:174-215)
  - COMPOSITIONAL class expressions in subClassOf/equivalentClass axioms —
    the axiom's sub/super class expression trees are expanded structurally
    into body/head triple patterns of ONE rule, never materializing
    intermediate bnode-membership facts (matching the compositional shape of
    the reference's owl-to-rules translation, which emits Jena rules that
    cannot mention bnodes at all):
      * someValuesFrom in SUBCLASS position (OWL RL cls-svf1/svf2):
        `∃p.C ⊑ D`  ⇒  (x p y) ∧ (y type C) → (x type D)
        (filler owl:Thing drops the (y type C) conjunct)
      * allValuesFrom in SUPERCLASS position (OWL RL cls-avf):
        `C ⊑ ∀p.D`  ⇒  (x type C) ∧ (x p y) → (y type D)
      * hasSelf both positions: (x p x) ↔ (x type R…)
      * intersectionOf: conjunction in subclass position (cls-int1),
        one head conjunct per member in superclass position (cls-int2)
      * unionOf in subclass position (cls-uni): one rule per disjunct
      * nesting of all of the above (DNF expansion on the body side)
  - owl:disjointWith (OWL RL cax-dw): membership in both classes derives
    (x type owl:Nothing), which powers the facade's isConsistent (Q10)
  - ABox type-assertions to allValuesFrom restriction bnodes:
    (a type [∀p.D]) ⇒ (a p y) → (y type D)
NOT covered — every occurrence is COUNTED in RuleSet.dropped with a reason
in drop_log (the reference's Bridge counts every dropped rule the same way,
Bridge.scala:19-32): someValuesFrom/unionOf/oneOf in superclass position
(existential/disjunctive heads need bnode invention / makeSkolem builtins),
allValuesFrom in subclass position, complementOf, cardinality restrictions,
negative atoms.
"""

from __future__ import annotations

from typing import Iterable, Optional

from arachne_spark.model import (
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

Triple = tuple[str, str, str]

OWL = "http://www.w3.org/2002/07/owl#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
SWRL = "http://www.w3.org/2003/11/swrl#"

TYPE = encode_iri(RDF_TYPE)
SCO = encode_iri(RDFS_SUBCLASSOF)
SPO = encode_iri(RDFS_SUBPROPERTYOF)
DOM = encode_iri(RDFS_DOMAIN)
RNG = encode_iri(RDFS_RANGE)
SAME = encode_iri(OWL_SAMEAS)
INV = encode_iri(OWL_INVERSEOF)
EQC = encode_iri(OWL + "equivalentClass")
EQP = encode_iri(OWL + "equivalentProperty")
ONPROP = encode_iri(OWL + "onProperty")
HASVAL = encode_iri(OWL + "hasValue")
CHAIN = encode_iri(OWL + "propertyChainAxiom")
FIRST = encode_iri(RDF + "first")
REST = encode_iri(RDF + "rest")
NIL = encode_iri(RDF + "nil")
TRANSP = encode_iri(OWL + "TransitiveProperty")
SYMP = encode_iri(OWL + "SymmetricProperty")
FUNP = encode_iri(OWL + "FunctionalProperty")
IFP = encode_iri(OWL + "InverseFunctionalProperty")
SVF = encode_iri(OWL + "someValuesFrom")
AVF = encode_iri(OWL + "allValuesFrom")
INTER = encode_iri(OWL + "intersectionOf")
UNION = encode_iri(OWL + "unionOf")
HASSELF = encode_iri(OWL + "hasSelf")
COMPL = encode_iri(OWL + "complementOf")
DISJ = encode_iri(OWL + "disjointWith")
ONEOF = encode_iri(OWL + "oneOf")
THING = encode_iri(OWL + "Thing")
NOTHING = encode_iri(OWL + "Nothing")
CARD_PREDS = frozenset(
    encode_iri(OWL + n)
    for n in (
        "cardinality",
        "minCardinality",
        "maxCardinality",
        "qualifiedCardinality",
        "minQualifiedCardinality",
        "maxQualifiedCardinality",
    )
)

_x, _y, _z = Var("x"), Var("y"), Var("z")


class _Index:
    """po / sp maps over the TBox triple set for axiom traversal."""

    def __init__(self, triples: Iterable[Triple]):
        self.spo: dict[tuple[str, str], list[str]] = {}
        for s, p, o in triples:
            self.spo.setdefault((s, p), []).append(o)

    def objects(self, s: str, p: str) -> list[str]:
        return self.spo.get((s, p), [])

    def first(self, s: str, p: str) -> Optional[str]:
        os_ = self.objects(s, p)
        return os_[0] if os_ else None

    def rdf_list(self, head: str) -> list[str]:
        out: list[str] = []
        seen: set[str] = set()
        while head != NIL and head not in seen:
            seen.add(head)
            f = self.first(head, FIRST)
            if f is None:
                break
            out.append(f)
            head = self.first(head, REST) or NIL
        return out


def _is_bnode(t: str) -> bool:
    return t.startswith("_:")


class _Inexpressible(Exception):
    """Raised during class-expression expansion when the expression has no
    positive-Datalog form in the requested (body/head) position; the message
    is the drop reason recorded in RuleSet.drop_log."""


class _Expander:
    """Compositional class-expression → triple-pattern expansion.

    Mirrors the shape of the reference's owl-to-rules translation (one rule
    per axiom, class expressions flattened into the rule itself — Jena rules
    cannot mention bnodes, so the reference never materializes intermediate
    restriction-membership facts; neither do we on this path)."""

    def __init__(self, ix: _Index):
        self.ix = ix
        self._fresh = 0

    def fresh(self) -> Var:
        self._fresh += 1
        return Var(f"e{self._fresh}")

    def _kind(self, expr: str):
        """Classify a bnode class expression; returns (kind, payload)."""
        ix = self.ix
        for pred, kind in ((SVF, "svf"), (AVF, "avf"), (HASVAL, "hv")):
            filler = ix.first(expr, pred)
            if filler is not None:
                return kind, (ix.first(expr, ONPROP), filler)
        if ix.first(expr, HASSELF) is not None:
            return "hasself", (ix.first(expr, ONPROP), None)
        for pred, kind in ((INTER, "inter"), (UNION, "union"), (ONEOF, "oneof")):
            head = ix.first(expr, pred)
            if head is not None:
                return kind, ix.rdf_list(head)
        if ix.first(expr, COMPL) is not None:
            return "compl", None
        for pred in CARD_PREDS:
            if ix.first(expr, pred) is not None:
                return "card", None
        return "opaque", None

    def body_alts(self, expr: str, var) -> list[list]:
        """Expression in SUBCLASS (body) position, instance bound to `var` →
        DNF: list of alternative conjunctions of body atoms.  owl:Thing is
        the empty conjunction.  Raises _Inexpressible otherwise."""
        if not _is_bnode(expr):
            if expr == THING:
                return [[]]
            return [[(var, TYPE, expr)]]
        kind, payload = self._kind(expr)
        if kind == "svf":
            prop, filler = payload
            if prop is None:
                raise _Inexpressible(f"someValuesFrom without onProperty: {expr}")
            y = self.fresh()
            return [[(var, prop, y)] + alt for alt in self.body_alts(filler, y)]
        if kind == "hv":
            prop, value = payload
            if prop is None:
                raise _Inexpressible(f"hasValue without onProperty: {expr}")
            return [[(var, prop, value)]]
        if kind == "hasself":
            prop, _ = payload
            if prop is None:
                raise _Inexpressible(f"hasSelf without onProperty: {expr}")
            return [[(var, prop, var)]]
        if kind == "inter":
            alts = [[]]
            for member in payload:
                alts = [a + b for a in alts for b in self.body_alts(member, var)]
            return alts
        if kind == "union":
            out = []
            for member in payload:
                out.extend(self.body_alts(member, var))
            return out
        if kind == "opaque":
            # structureless bnode class: bnode-as-constant (SURVEY N4)
            return [[(var, TYPE, expr)]]
        raise _Inexpressible(f"{kind} in subclass position: {expr}")

    def head_parts(self, expr: str, var) -> tuple[list, list]:
        """Expression in SUPERCLASS (head) position → (extra body atoms,
        head atoms).  allValuesFrom contributes a BODY atom (the role edge)
        plus its filler's head (OWL RL cls-avf).  Raises _Inexpressible for
        existential/disjunctive heads (svf, unionOf, oneOf, …)."""
        if not _is_bnode(expr):
            if expr == THING:
                return [], []
            return [], [(var, TYPE, expr)]
        kind, payload = self._kind(expr)
        if kind == "avf":
            prop, filler = payload
            if prop is None:
                raise _Inexpressible(f"allValuesFrom without onProperty: {expr}")
            y = self.fresh()
            extra, head = self.head_parts(filler, y)
            return [(var, prop, y)] + extra, head
        if kind == "hv":
            prop, value = payload
            if prop is None:
                raise _Inexpressible(f"hasValue without onProperty: {expr}")
            return [], [(var, prop, value)]
        if kind == "hasself":
            prop, _ = payload
            if prop is None:
                raise _Inexpressible(f"hasSelf without onProperty: {expr}")
            return [], [(var, prop, var)]
        if kind == "inter":
            extra: list = []
            head: list = []
            for member in payload:
                e, h = self.head_parts(member, var)
                extra += e
                head += h
            return extra, head
        if kind == "opaque":
            # structureless bnode class: bnode-as-constant (SURVEY N4)
            return [], [(var, TYPE, expr)]
        raise _Inexpressible(f"{kind} in superclass position: {expr}")


def owl_to_rules(
    tbox: Iterable[Triple],
    *,
    include_equality: bool = True,
    include_swrl: bool = True,
) -> RuleSet:
    """Translate ontology TBox triples to per-axiom Datalog rules."""
    triples = list(tbox)
    ix = _Index(triples)
    rules: list[Rule] = []
    dropped = 0
    drop_log: list[str] = []

    def add(name, body, head):
        rules.append(Rule(name, tuple(body), tuple(head)))

    def class_axiom(sub: str, sup: str, tag: str) -> None:
        """sub ⊑ sup with arbitrary class expressions on either side.

        Compositional: the rule's body/head carry the flattened expression
        patterns.  For a bnode SUBCLASS we additionally keep the
        bnode-as-constant membership rule (SURVEY N4) so ABox-asserted
        anonymous restriction types still entail the superclass."""
        nonlocal dropped
        expander = _Expander(ix)
        try:
            extra_body, head = expander.head_parts(sup, _x)
            if not head:
                return  # C ⊑ owl:Thing — trivially satisfied, nothing to derive
            bodies = expander.body_alts(sub, _x)
            for i, alt in enumerate(bodies):
                body = alt + extra_body
                if not body:
                    raise _Inexpressible(f"owl:Thing in subclass position: {sub}")
                suffix = f"#{i}" if len(bodies) > 1 else ""
                add(f"{tag}:{sub}<{sup}{suffix}", body, head)
            if _is_bnode(sub):
                add(f"{tag}-cst:{sub}<{sup}", [(_x, TYPE, sub)] + extra_body, head)
        except _Inexpressible as e:
            dropped += 1
            drop_log.append(f"{tag} {sub} ⊑ {sup}: {e}")

    for s, p, o in triples:
        if p == SCO:
            class_axiom(s, o, "sco")
        elif p == EQC:
            class_axiom(s, o, "eqc1")
            class_axiom(o, s, "eqc2")
        elif p == DISJ:
            # OWL RL cax-dw: joint membership is inconsistent → owl:Nothing
            # (consumed by the facade's isConsistent, Q10)
            expander = _Expander(ix)
            try:
                lhs = expander.body_alts(s, _x)
                rhs = expander.body_alts(o, _x)
                for i, (a, b) in enumerate((a, b) for a in lhs for b in rhs):
                    if not (a + b):
                        raise _Inexpressible("owl:Thing disjointWith owl:Thing")
                    add(f"cax-dw:{s}|{o}#{i}", a + b, [(_x, TYPE, NOTHING)])
            except _Inexpressible as e:
                dropped += 1
                drop_log.append(f"disjointWith {s} | {o}: {e}")
        elif p == TYPE and _is_bnode(o):
            # ABox assertion of an anonymous class: derivable consequences
            # with the instance baked in as a constant (e.g. a type [∀p.D]
            # ⇒ (a p y) → (y type D)).  Plain named/hasValue consequences of
            # asserted bnode types flow through the bnode-as-constant rules
            # (hv1 below / class_axiom's -cst rule) instead.
            expander = _Expander(ix)
            try:
                extra_body, head = expander.head_parts(o, s)
                if extra_body and head:
                    add(f"type-anon:{s}:{o}", extra_body, head)
            except _Inexpressible:
                pass  # counted at the axiom site if referenced; existential
                # ABox types (a type [∃p.C]) have no consequence without
                # bnode invention — same as the reference
        elif p == SPO:
            # sub-property of an inverse: P ⊑ inverse(Q) (test1.ttl:28-33)
            inv_target = ix.first(o, INV) if o.startswith("_:") else None
            if inv_target is not None:
                add(f"spo-inv:{s}<^{inv_target}", [(_x, s, _y)], [(_y, inv_target, _x)])
            elif o.startswith("_:"):
                dropped += 1
                drop_log.append(f"subPropertyOf bnode without inverseOf: {s} {o}")
            else:
                add(f"spo:{s}<{o}", [(_x, s, _y)], [(_x, o, _y)])
        elif p == EQP:
            add(f"eqp1:{s}={o}", [(_x, s, _y)], [(_x, o, _y)])
            add(f"eqp2:{s}={o}", [(_x, o, _y)], [(_x, s, _y)])
        elif p == INV:
            # a bnode subject is an anonymous ObjectInverseOf EXPRESSION
            # (e.g. the target of subPropertyOf, consumed by spo-inv above),
            # not an InverseObjectProperties axiom between named properties —
            # emitting rules for it would materialize bnode-PREDICATE facts
            # no RDF syntax can serialize
            if not s.startswith("_:"):
                add(f"inv1:{s}^{o}", [(_x, s, _y)], [(_y, o, _x)])
                add(f"inv2:{s}^{o}", [(_x, o, _y)], [(_y, s, _x)])
        elif p == DOM:
            add(f"dom:{s}", [(_x, s, _y)], [(_x, TYPE, o)])
        elif p == RNG:
            add(f"rng:{s}", [(_x, s, _y)], [(_y, TYPE, o)])
        elif p == TYPE and o == TRANSP:
            add(f"trans:{s}", [(_x, s, _y), (_y, s, _z)], [(_x, s, _z)])
        elif p == TYPE and o == SYMP:
            add(f"sym:{s}", [(_x, s, _y)], [(_y, s, _x)])
        elif p == TYPE and o == FUNP:
            add(f"fp:{s}", [(_x, s, _y), (_x, s, _z)], [(_y, SAME, _z)])
        elif p == TYPE and o == IFP:
            add(f"ifp:{s}", [(_x, s, _z), (_y, s, _z)], [(_x, SAME, _y)])
        elif p == HASVAL:
            # restriction node s: onProperty P, hasValue v  (cls-hv1/hv2)
            prop = ix.first(s, ONPROP)
            if prop is None:
                dropped += 1
                drop_log.append(f"hasValue restriction without onProperty: {s}")
            else:
                add(f"hv1:{s}", [(_x, TYPE, s)], [(_x, prop, o)])
                add(f"hv2:{s}", [(_x, prop, o)], [(_x, TYPE, s)])
        elif p == CHAIN:
            props = ix.rdf_list(o)
            if len(props) < 2:
                dropped += 1
                drop_log.append(f"propertyChainAxiom with <2 links: {s}")
            else:
                vs = [Var(f"c{i}") for i in range(len(props) + 1)]
                body = [
                    (vs[i], props[i], vs[i + 1]) for i in range(len(props))
                ]
                add(f"chain:{s}", body, [(vs[0], s, vs[-1])])

    if include_swrl:
        sw_rules, sw_dropped, sw_log = _swrl_rules(triples, ix)
        rules += sw_rules
        dropped += sw_dropped
        drop_log += sw_log

    if include_equality and (
        any(SAME in _rule_terms(r) for r in rules)
        or any(p == SAME for _, p, _ in triples)
    ):
        rules += _equality_theory()

    return RuleSet(rules, dropped, drop_log)


def _rule_terms(r: Rule):
    return {t for a in r.body + r.head for t in a if isinstance(t, str)}


def _equality_theory() -> list[Rule]:
    """owl:sameAs symmetric/transitive + substitution (OWL-RL eq-*) — what
    owl-to-rules emits when equality can be derived."""
    _p = Var("p")
    return [
        Rule("eq-sym", ((_x, SAME, _y),), ((_y, SAME, _x),)),
        Rule("eq-trans", ((_x, SAME, _y), (_y, SAME, _z)), ((_x, SAME, _z),)),
        Rule("eq-rep-s", ((_x, SAME, _y), (_x, _p, _z)), ((_y, _p, _z),)),
        Rule("eq-rep-o", ((_x, SAME, _y), (_z, _p, _x)), ((_z, _p, _y),)),
    ]


def _swrl_rules(
    triples: list[Triple], ix: _Index
) -> tuple[list[Rule], int, list[str]]:
    """SWRL Imp -> Datalog: IndividualPropertyAtom and ClassAtom only, the
    subset Bridge keeps (test1.ttl:174-215 is exactly this shape)."""
    IMP = encode_iri(SWRL + "Imp")
    BODY = encode_iri(SWRL + "body")
    HEAD = encode_iri(SWRL + "head")
    IPA = encode_iri(SWRL + "IndividualPropertyAtom")
    CA = encode_iri(SWRL + "ClassAtom")
    PROP = encode_iri(SWRL + "propertyPredicate")
    CLSP = encode_iri(SWRL + "classPredicate")
    ARG1 = encode_iri(SWRL + "argument1")
    ARG2 = encode_iri(SWRL + "argument2")
    VARCLS = encode_iri(SWRL + "Variable")
    variables = {s for s, p, o in triples if p == TYPE and o == VARCLS}

    def term(t: str):
        return Var(t) if t in variables else t

    def atom_list(head_node: str):
        """AtomList via rdf:first/rest; returns list of atoms or None."""
        out = []
        for node in ix.rdf_list(head_node):
            kinds = ix.objects(node, TYPE)
            if IPA in kinds:
                p = ix.first(node, PROP)
                a1, a2 = ix.first(node, ARG1), ix.first(node, ARG2)
                if None in (p, a1, a2):
                    return None
                out.append((term(a1), p, term(a2)))
            elif CA in kinds:
                c = ix.first(node, CLSP)
                a1 = ix.first(node, ARG1)
                if None in (c, a1):
                    return None
                out.append((term(a1), TYPE, c))
            else:
                return None  # unsupported atom kind -> drop whole rule
        return out

    rules: list[Rule] = []
    dropped = 0
    log: list[str] = []
    imps = [s for s, p, o in triples if p == TYPE and o == IMP]
    for imp in imps:
        b, h = ix.first(imp, BODY), ix.first(imp, HEAD)
        body = atom_list(b) if b else None
        head = atom_list(h) if h else None
        if not body or not head:
            dropped += 1
            log.append(f"SWRL rule {imp}: unsupported atoms or empty body/head")
            continue
        try:
            rules.append(Rule(f"swrl:{imp}", tuple(body), tuple(head)))
        except ValueError as e:
            dropped += 1
            log.append(f"SWRL rule {imp}: {e}")
    return rules, dropped, log
