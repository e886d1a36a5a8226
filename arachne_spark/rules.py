"""Rule model, JSON rule loader, and a Jena-rule-syntax subset parser.

Reference semantics this mirrors:

- Rule = named conjunctive body -> conjunctive head of triple patterns, variables
  legal in ANY position including predicate (Triple.scala:34-38, 96-100; SURVEY N5).
- Rule language = positive Datalog only: no negation, no builtins, no arithmetic,
  no aggregates. The reference's Jena bridge *silently drops* any rule containing a
  non-triple-pattern clause (a builtin/functor such as makeSkolem or notEqual) via a
  monadic sequence (Bridge.scala:19-32); our loaders do the same but count and report
  the drops (SURVEY B1/B2).
- Head variables must be bound by the body; a wildcard in a head is illegal
  (ReteNodes.scala:240 raises on AnyNode in produceNode).
- Bnodes in heads are emitted as constants — the same bnode on every firing, no
  skolemization (ReteNodes.scala:221-247; SURVEY N4).
- Rule-set dedup: identical rules collapse (RuleEngine.scala:8, a Set[Rule]).

JSON rule format (FIXTURES.md §4):

    {"name": "transitive-r",
     "body": [["?x", "http://ex.org/r", "?y"], ["?y", "http://ex.org/r", "?z"]],
     "head": [["?x", "http://ex.org/r", "?z"]]}

Atom terms: "?name" = variable; null = wildcard (AnyNode, body only); a string is
an IRI or `_:label` bnode; {"lex":…, "dt":…, "lang":…} is a literal.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Iterable, Optional, Sequence, Union

from arachne_spark.model import (
    encode_literal,
    encode_resource,
)


@dataclass(frozen=True)
class Var:
    name: str

    def __repr__(self) -> str:  # pragma: no cover
        return f"?{self.name}"


class Any_:
    """AnyNode wildcard (Triple.scala:40): matches anything, binds nothing.

    Legal in body patterns only — illegal in heads (ReteNodes.scala:240).
    """

    _instance: Optional["Any_"] = None

    def __new__(cls) -> "Any_":
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:  # pragma: no cover
        return "ANY"


ANY = Any_()

# A term inside an atom: encoded-constant string, variable, or wildcard.
Term = Union[str, Var, Any_]
Atom = tuple[Term, Term, Term]


def atom_vars(atom: Atom) -> list[Var]:
    seen: list[Var] = []
    for t in atom:
        if isinstance(t, Var) and t not in seen:
            seen.append(t)
    return seen


@dataclass(frozen=True)
class Rule:
    """A positive Datalog rule over triple patterns (Triple.scala:96-100)."""

    name: Optional[str]
    body: tuple[Atom, ...]
    head: tuple[Atom, ...]

    def __post_init__(self) -> None:
        body_vars = {v for a in self.body for v in atom_vars(a)}
        for a in self.head:
            for t in a:
                if isinstance(t, Any_):
                    raise ValueError(f"rule {self.name}: wildcard in head is illegal")
                if isinstance(t, Var) and t not in body_vars:
                    raise ValueError(
                        f"rule {self.name}: head variable {t} not bound by body"
                    )
        if not self.body or not self.head:
            raise ValueError(f"rule {self.name}: empty body or head")

    def key(self) -> tuple:
        """Structural identity ignoring the name (rule-set dedup, RuleEngine.scala:8)."""
        return (self.body, self.head)


@dataclass
class RuleSet:
    rules: list[Rule]
    dropped: int = 0  # non-triple-pattern rules dropped at load (Bridge.scala:19-32)
    drop_log: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        # C1 rule-set dedup: identical (body, head) collapse.
        seen: dict[tuple, Rule] = {}
        for r in self.rules:
            seen.setdefault(r.key(), r)
        self.rules = list(seen.values())

    def __len__(self) -> int:
        return len(self.rules)

    def __iter__(self):
        return iter(self.rules)


# ---------------------------------------------------------------------------
# JSON loader (FIXTURES.md §4)
# ---------------------------------------------------------------------------

def _term_from_json(t, *, in_head: bool) -> Term:
    if t is None:
        if in_head:
            raise ValueError("wildcard in head")
        return ANY
    if isinstance(t, str):
        if t.startswith("?"):
            return Var(t[1:])
        return encode_resource(t)
    if isinstance(t, dict):
        return encode_literal(t["lex"], t.get("dt"), t.get("lang"))
    raise ValueError(f"bad term: {t!r}")


def rule_from_dict(d: dict) -> Rule:
    body = tuple(
        tuple(_term_from_json(t, in_head=False) for t in atom) for atom in d["body"]
    )
    head = tuple(
        tuple(_term_from_json(t, in_head=True) for t in atom) for atom in d["head"]
    )
    return Rule(d.get("name"), body, head)  # type: ignore[arg-type]


def load_rules_json(source: Union[str, Iterable[dict]]) -> RuleSet:
    """Load rules from a JSON file path, a JSON string, or an iterable of dicts.

    File layout: either a JSON array of rule objects or JSON-lines.
    """
    if isinstance(source, str):
        text = source
        if "\n" not in source and not source.lstrip().startswith(("[", "{")):
            with open(source, encoding="utf-8") as f:
                text = f.read()
        stripped = text.lstrip()
        if stripped.startswith("["):
            dicts = json.loads(text)
        else:
            dicts = [json.loads(line) for line in text.splitlines() if line.strip()]
    else:
        dicts = list(source)
    rules, dropped, log = [], 0, []
    for d in dicts:
        try:
            rules.append(rule_from_dict(d))
        except (ValueError, KeyError, TypeError) as e:
            dropped += 1
            log.append(f"dropped rule {d.get('name') if isinstance(d, dict) else d!r}: {e}")
    return RuleSet(rules, dropped, log)


# ---------------------------------------------------------------------------
# Jena-rule-syntax subset parser (the subset the reference accepts; Main.scala:51-55
# feeds Jena `Rule.parseRules` output through Bridge.ruleFromJena, which keeps only
# plain triple-pattern clauses and drops whole rules containing builtins.)
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*|//[^\n]*)
  | (?P<lbrak>\[)
  | (?P<rbrak>\])
  | (?P<lpar>\()
  | (?P<rpar>\))
  | (?P<arrow>->|<-)
  | (?P<comma>,)
  | (?P<iri><[^>]*>)
  | (?P<literal>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<var>\?[A-Za-z_][\w]*)
  | (?P<bnode>_:[\w.-]+)
  | (?P<name>[A-Za-z_][\w.-]*:?[\w.-]*)
  | (?P<colon>:)
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise ValueError(f"jena-rules: cannot tokenize at {text[i:i+30]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
    return out


def parse_jena_rules(text: str) -> RuleSet:
    """Parse the Jena-rule-syntax subset:

        @prefix ex: <http://example.org/>.
        [ruleName: (?x ex:p ?y) (?y ex:p ?z) -> (?x ex:p ?z)]

    Rules containing any non-triple-pattern clause (builtin functor like
    ``notEqual(?x, ?y)`` or ``makeSkolem(...)``) are dropped whole, mirroring
    Bridge.scala:19-32 — but counted in ``RuleSet.dropped``.
    """
    prefixes: dict[str, str] = {}
    # strip @prefix lines first (simple line-based handling)
    body_lines = []
    for line in text.splitlines():
        ls = line.strip()
        if ls.startswith("@prefix"):
            m = re.match(r"@prefix\s+([\w-]*):\s*<([^>]*)>\s*\.?", ls)
            if m:
                prefixes[m.group(1)] = m.group(2)
            continue
        body_lines.append(line)
    toks = _tokenize("\n".join(body_lines))

    def resolve(kind: str, text_: str, in_head: bool) -> Term:
        if kind == "var":
            return Var(text_[1:])
        if kind == "iri":
            return encode_resource(text_[1:-1])
        if kind == "bnode":
            return text_
        if kind == "literal":
            lex = text_[1:-1].replace("\\'", "'").replace('\\"', '"')
            return encode_literal(lex)
        if kind == "name":
            if ":" in text_:
                pre, local = text_.split(":", 1)
                if pre in prefixes:
                    return encode_resource(prefixes[pre] + local)
            raise ValueError(f"unresolvable name {text_!r}")
        raise ValueError(f"unexpected term token {text_!r}")

    rules: list[Rule] = []
    dropped = 0
    drop_log: list[str] = []
    i = 0
    n = len(toks)
    while i < n:
        kind, tx = toks[i]
        if kind != "lbrak":
            raise ValueError(f"expected '[' at token {tx!r}")
        i += 1
        name = None
        if (
            i + 1 < n
            and toks[i][0] == "name"
            and toks[i][1].endswith(":") is False
            and toks[i + 1][0] == "colon"
        ):
            name = toks[i][1]
            i += 2
        elif i < n and toks[i][0] == "name" and toks[i][1].endswith(":"):
            name = toks[i][1][:-1]
            i += 1
        clauses_before: list = []
        clauses_after: list = []
        cur = clauses_before
        bad = False
        arrow = None
        while i < n and toks[i][0] != "rbrak":
            k, t = toks[i]
            if k == "arrow":
                arrow = t
                cur = clauses_after
                i += 1
            elif k == "lpar":
                # triple pattern
                terms = []
                i += 1
                while i < n and toks[i][0] != "rpar":
                    tk, tt = toks[i]
                    if tk == "comma":
                        i += 1
                        continue
                    try:
                        terms.append(resolve(tk, tt, in_head=cur is clauses_after))
                    except ValueError:
                        bad = True
                        terms.append(None)
                    i += 1
                i += 1  # consume ')'
                if len(terms) != 3 or any(t is None for t in terms):
                    bad = True
                else:
                    cur.append(tuple(terms))
            elif k == "name":
                # builtin functor call: name(args...) — skip args, mark rule bad
                bad = True
                i += 1
                if i < n and toks[i][0] == "lpar":
                    depth = 1
                    i += 1
                    while i < n and depth:
                        if toks[i][0] == "lpar":
                            depth += 1
                        elif toks[i][0] == "rpar":
                            depth -= 1
                        i += 1
            else:
                bad = True
                i += 1
        i += 1  # consume ']'
        if arrow == "<-":
            clauses_before, clauses_after = clauses_after, clauses_before
        if bad or arrow is None or not clauses_before or not clauses_after:
            dropped += 1
            drop_log.append(f"dropped rule {name!r}: non-triple-pattern clause or malformed")
            continue
        try:
            rules.append(Rule(name, tuple(clauses_before), tuple(clauses_after)))
        except ValueError as e:
            dropped += 1
            drop_log.append(f"dropped rule {name!r}: {e}")
    return RuleSet(rules, dropped, drop_log)


def load_rules(path: str) -> RuleSet:
    """Load a rules file by extension: .json/.jsonl -> JSON format, else Jena subset."""
    with open(path, encoding="utf-8") as f:
        text = f.read()
    if path.endswith((".json", ".jsonl")):
        return load_rules_json(text)
    return parse_jena_rules(text)
