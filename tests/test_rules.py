"""Rule loading: JSON format, Jena-subset parser, B1 drop semantics, validation."""

import pytest

from arachne_spark.rules import (
    ANY,
    Rule,
    RuleSet,
    Var,
    load_rules_json,
    parse_jena_rules,
    rule_from_dict,
)


def test_json_rule_roundtrip():
    rs = load_rules_json(
        [
            {
                "name": "trans",
                "body": [["?x", "http://ex/r", "?y"], ["?y", "http://ex/r", "?z"]],
                "head": [["?x", "http://ex/r", "?z"]],
            }
        ]
    )
    assert len(rs) == 1
    r = rs.rules[0]
    assert r.body[0] == (Var("x"), "<http://ex/r>", Var("y"))
    assert r.head[0] == (Var("x"), "<http://ex/r>", Var("z"))


def test_json_literal_and_bnode_terms():
    rs = load_rules_json(
        [
            {
                "name": "lit",
                "body": [["?x", "http://p", {"lex": "1", "dt": "http://www.w3.org/2001/XMLSchema#integer"}]],
                "head": [["?x", "http://p2", "_:const"]],
            }
        ]
    )
    r = rs.rules[0]
    assert r.body[0][2] == '"1"^^<http://www.w3.org/2001/XMLSchema#integer>'
    assert r.head[0][2] == "_:const"  # head bnode = constant (SURVEY N4)


def test_wildcard_body_only():
    rs = load_rules_json(
        [
            {"name": "w", "body": [["?x", None, "?y"]], "head": [["?x", "http://p", "?y"]]},
            {"name": "bad", "body": [["?x", "http://p", "?y"]], "head": [["?x", None, "?y"]]},
        ]
    )
    assert len(rs) == 1 and rs.dropped == 1
    assert rs.rules[0].body[0][1] is ANY


def test_unbound_head_var_dropped():
    rs = load_rules_json(
        [{"name": "u", "body": [["?x", "http://p", "?y"]], "head": [["?x", "http://p", "?z"]]}]
    )
    assert len(rs) == 0 and rs.dropped == 1


def test_ruleset_dedup():
    d = {"name": "a", "body": [["?x", "http://p", "?y"]], "head": [["?y", "http://p", "?x"]]}
    rs = RuleSet([rule_from_dict(d), rule_from_dict({**d, "name": "b"})])
    assert len(rs) == 1  # C1: identical (body, head) collapse


def test_jena_parser_basic():
    rs = parse_jena_rules(
        """
        @prefix ex: <http://example.org/>.
        # a comment
        [trans: (?x ex:r ?y) (?y ex:r ?z) -> (?x ex:r ?z)]
        [iri: (?a <http://example.org/p> ?b) -> (?b ex:q ?a)]
        """
    )
    assert len(rs) == 2 and rs.dropped == 0
    assert rs.rules[0].name == "trans"
    assert rs.rules[0].body[0] == (Var("x"), "<http://example.org/r>", Var("y"))
    assert rs.rules[1].head[0] == (Var("b"), "<http://example.org/q>", Var("a"))


def test_jena_parser_drops_builtins():
    """Mirrors Bridge.scala:19-32: any builtin clause drops the WHOLE rule."""
    rs = parse_jena_rules(
        """
        @prefix ex: <http://example.org/>.
        [good: (?x ex:r ?y) -> (?y ex:r ?x)]
        [bad: (?x ex:r ?y) notEqual(?x, ?y) -> (?x ex:s ?y)]
        [bad2: (?x ex:r ?y) makeSkolem(?s, ?x) -> (?s ex:t ?y)]
        """
    )
    assert len(rs) == 1 and rs.dropped == 2
    assert rs.rules[0].name == "good"


def test_jena_parser_backward_arrow():
    rs = parse_jena_rules(
        "[bw: (?x <http://ex/head> ?y) <- (?x <http://ex/body> ?y)]"
    )
    assert len(rs) == 1
    assert rs.rules[0].body[0][1] == "<http://ex/body>"
    assert rs.rules[0].head[0][1] == "<http://ex/head>"


def test_jena_parser_literals():
    rs = parse_jena_rules(
        "[l: (?x <http://ex/p> 'v') -> (?x <http://ex/q> 'w')]"
    )
    assert rs.rules[0].body[0][2] == '"v"'
    assert rs.rules[0].head[0][2] == '"w"'


def test_predicate_position_variable():
    """Variables legal in any position incl. predicate (SURVEY N5)."""
    r = rule_from_dict(
        {"name": "pvar", "body": [["?x", "?p", "?y"]], "head": [["?y", "?p", "?x"]]}
    )
    assert r.body[0][1] == Var("p")
