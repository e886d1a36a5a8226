"""Pure-Python naive Datalog oracle for differential testing.

The reference validates its engine differentially against Jena's
GenericRuleReasoner FORWARD_RETE on identical rules + data
(TestInference.scala:30-36). The sandbox has no JVM oracle, so this ~80-line
naive-evaluation fixpoint plays Jena's role: same rule language (positive
Datalog over triples, variables in any position, repeated-variable equality,
wildcards), evaluated by brute-force substitution until fixpoint. Intentionally
simple and slow — correctness baseline only, used on tiny fixtures.
"""

from __future__ import annotations

from typing import Iterable, Optional

from arachne_spark.rules import ANY, Any_, Atom, Rule, Var

Triple = tuple[str, str, str]
Binding = dict[Var, str]


def _match_atom(atom: Atom, triple: Triple, binding: Binding) -> Optional[Binding]:
    out = dict(binding)
    for t, v in zip(atom, triple):
        if isinstance(t, Any_):
            continue
        if isinstance(t, Var):
            if t in out:
                if out[t] != v:
                    return None
            else:
                out[t] = v
        elif t != v:
            return None
    return out


def _match_body(body: tuple[Atom, ...], facts: set[Triple]) -> Iterable[Binding]:
    stack: list[Binding] = [{}]
    for atom in body:
        nxt: list[Binding] = []
        for b in stack:
            for f in facts:
                nb = _match_atom(atom, f, b)
                if nb is not None:
                    nxt.append(nb)
        stack = nxt
        if not stack:
            return []
    return stack


def _instantiate(atom: Atom, binding: Binding) -> Triple:
    out = []
    for t in atom:
        if isinstance(t, Var):
            out.append(binding[t])
        else:
            out.append(t)  # constants incl. head bnodes emitted as-is (SURVEY N4)
    return tuple(out)  # type: ignore[return-value]


def naive_fixpoint(asserted: Iterable[Triple], rules: Iterable[Rule]) -> set[Triple]:
    """Least fixpoint of the rules over the asserted triples (R13 semantics:
    facts = asserted ∪ derived, set semantics, monotone)."""
    facts: set[Triple] = set(asserted)
    rules = list(rules)
    while True:
        new: set[Triple] = set()
        for rule in rules:
            for b in _match_body(rule.body, facts):
                for h in rule.head:
                    t = _instantiate(h, b)
                    if t not in facts:
                        new.add(t)
        if not new:
            return facts
        facts |= new
