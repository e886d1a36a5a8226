"""Turtle-subset reader (SURVEY S1; ref Main.scala:63-74 loads any
Jena-readable syntax — Turtle is what its own fixtures use).

Covers the subset the reference's fixtures and OWL-API output need:
@prefix/@base, IRIs, prefixed names, the `a` keyword, `;` predicate lists,
`,` object lists, labeled bnodes (_:genid1), anonymous bnode property lists
([ ... ] — fresh labels), string literals with ^^datatype / @lang and the
standard escapes. RDF collections ( ... ) materialize as rdf:first/rdf:rest lists.
NOT covered (raises): triple-quoted long strings, bare numeric/boolean
literals.

This parse is DRIVER-SIDE by design: Turtle's statement syntax is not
line-splittable, so it cannot scan in parallel — the same constraint that
makes the reference parse through an in-memory Jena model. Use it for
TBox/fixture-scale files; the distributed ingestion path is N-Triples
(sources/ntriples.py, one triple per line, fully parallel) or parquet.

Output terms use the canonical encoded form (model.py), so a .ttl TBox and
an N-Triples/parquet ABox interoperate term-for-term.
"""

from __future__ import annotations

import re
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession

from arachne_spark.model import encode_iri, encode_literal

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE_IRI = RDF_NS + "type"

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*)
  | (?P<prefix_decl>@prefix\b|@base\b)
  | (?P<iri><[^<>"{}|^`\\\s]*>)
  | (?P<literal>"(?:[^"\\]|\\.)*")
  | (?P<dtype>\^\^)
  | (?P<lang>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<bnode>_:[A-Za-z0-9][\w.-]*)
  | (?P<pname>(?:[A-Za-z_][\w-]*)?:[\w%-]*(?:[\w.%-]*[\w%-])?)
  | (?P<boolean>\b(?:true|false)\b)
  | (?P<number>[+-]?(?:\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+|\.\d+(?:[eE][+-]?\d+)?|\d+))
  | (?P<kw_a>\ba\b)
  | (?P<punct>[.;,\[\]()])
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "n": "\n", "r": "\r", "t": "\t", "f": "\f", "b": "\b",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(lex: str) -> str:
    out = []
    i = 0
    while i < len(lex):
        c = lex[i]
        if c == "\\" and i + 1 < len(lex):
            n = lex[i + 1]
            if n in _ESCAPES:
                out.append(_ESCAPES[n])
                i += 2
                continue
            if n == "u" and i + 6 <= len(lex):
                out.append(chr(int(lex[i + 2 : i + 6], 16)))
                i += 6
                continue
            if n == "U" and i + 10 <= len(lex):
                out.append(chr(int(lex[i + 2 : i + 10], 16)))
                i += 10
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _tokenize(text: str) -> Iterator[tuple[str, str]]:
    if '"""' in text or "'''" in text:
        raise ValueError("turtle subset: triple-quoted long strings unsupported")
    i = 0
    n = len(text)
    while i < n:
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise ValueError(f"turtle: cannot tokenize at {text[i:i+40]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        yield kind, m.group()


class _Parser:
    def __init__(self, text: str):
        self.toks = list(_tokenize(text))
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base: Optional[str] = None
        self.triples: list[tuple[str, str, str]] = []
        self._anon = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, value: str):
        kind, tx = self.next()
        if tx != value:
            raise ValueError(f"turtle: expected {value!r}, got {tx!r}")

    def fresh_bnode(self) -> str:
        self._anon += 1
        return f"_:ttl-anon{self._anon}"

    def resolve_iri(self, raw: str) -> str:
        iri = _unescape(raw[1:-1])
        if ":" not in iri and self.base:
            iri = self.base + iri
        return iri

    def resolve_pname(self, tx: str) -> str:
        pre, local = tx.split(":", 1)
        if pre not in self.prefixes:
            raise ValueError(f"turtle: undeclared prefix {pre!r}: in {tx!r}")
        return self.prefixes[pre] + local

    def parse(self) -> "_Parser":
        while self.peek()[0] is not None:
            kind, tx = self.peek()
            if kind == "prefix_decl":
                self.next()
                if tx == "@prefix":
                    _, pname = self.next()
                    if not pname.endswith(":"):
                        raise ValueError(f"turtle: bad prefix name {pname!r}")
                    _, iri = self.next()
                    self.prefixes[pname[:-1]] = _unescape(iri[1:-1])
                else:  # @base
                    _, iri = self.next()
                    self.base = _unescape(iri[1:-1])
                self.expect(".")
                continue
            self.statement()
        return self

    def statement(self):
        was_bracket = self.peek()[1] == "["
        subj = self.term(position="subject")
        # `[ ...props ] .` — the predicateObjectList is optional when the
        # subject is a blankNodePropertyList (OWL-API axiom annotations)
        if not (was_bracket and self.peek()[1] == "."):
            self.predicate_object_list(subj)
        self.expect(".")

    def predicate_object_list(self, subj: str):
        while True:
            pred = self.term(position="predicate")
            while True:
                obj = self.term(position="object")
                self.triples.append((subj, pred, obj))
                if self.peek()[1] == ",":
                    self.next()
                    continue
                break
            if self.peek()[1] == ";":
                self.next()
                # trailing ';' before '.' or ']' is legal
                if self.peek()[1] in (".", "]"):
                    break
                continue
            break

    def term(self, position: str) -> str:
        kind, tx = self.next()
        if kind == "kw_a":
            if position != "predicate":
                raise ValueError("turtle: 'a' outside predicate position")
            return encode_iri(RDF_TYPE_IRI)
        if kind == "iri":
            return encode_iri(self.resolve_iri(tx))
        if kind == "pname":
            return encode_iri(self.resolve_pname(tx))
        if kind == "bnode":
            return tx
        if kind == "literal":
            if position != "object":
                raise ValueError("turtle: literal outside object position")
            lex = _unescape(tx[1:-1])
            nk, ntx = self.peek()
            if nk == "dtype":
                self.next()
                dk, dtx = self.next()
                dt = (
                    self.resolve_iri(dtx)
                    if dk == "iri"
                    else self.resolve_pname(dtx)
                )
                return encode_literal(lex, dt=dt)
            if nk == "lang":
                self.next()
                return encode_literal(lex, lang=ntx[1:])
            return encode_literal(lex)
        if kind == "boolean":
            if position != "object":
                raise ValueError("turtle: literal outside object position")
            return encode_literal(tx, dt="http://www.w3.org/2001/XMLSchema#boolean")
        if kind == "number":
            if position != "object":
                raise ValueError("turtle: literal outside object position")
            # Turtle 2.5.2 shorthand: integer / decimal / double by shape
            if "e" in tx.lower():
                dt = "http://www.w3.org/2001/XMLSchema#double"
            elif "." in tx:
                dt = "http://www.w3.org/2001/XMLSchema#decimal"
            else:
                dt = "http://www.w3.org/2001/XMLSchema#integer"
            return encode_literal(tx, dt=dt)
        if tx == "[":
            if position == "predicate":
                raise ValueError("turtle: bnode list in predicate position")
            node = self.fresh_bnode()
            if self.peek()[1] != "]":
                self.predicate_object_list(node)
            self.expect("]")
            return node
        if tx == "(":
            # RDF collection -> rdf:first/rdf:rest chain with fresh bnodes
            items = []
            while self.peek()[1] != ")":
                if self.peek()[0] is None:
                    raise ValueError("turtle: unterminated collection")
                items.append(self.term(position="object"))
            self.next()  # consume ')'
            head = encode_iri(RDF_NS + "nil")
            first = encode_iri(RDF_NS + "first")
            rest = encode_iri(RDF_NS + "rest")
            for item in reversed(items):
                cell = self.fresh_bnode()
                self.triples.append((cell, first, item))
                self.triples.append((cell, rest, head))
                head = cell
            return head
        raise ValueError(f"turtle: unexpected token {tx!r} in {position}")


def parse_turtle(text: str) -> list[tuple[str, str, str]]:
    """Turtle text -> list of encoded (s, p, o) triples."""
    return _Parser(text).parse().triples


def read_turtle(spark: SparkSession, path: str) -> DataFrame:
    """Read one .ttl file into the encoded 3-column engine schema."""
    from arachne_spark.engine import TRIPLE_SCHEMA

    with open(path, encoding="utf-8") as f:
        triples = parse_turtle(f.read())
    return spark.createDataFrame(triples, TRIPLE_SCHEMA)
