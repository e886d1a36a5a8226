"""Pattern -> plan compilation: alpha selection, binding projection,
repeated-variable guards (uniform, SURVEY N2), beta join, cross product,
head construction."""

import pytest

from arachne_spark.plans.compiler import (
    apply_rule_once,
    atom_relation,
    atom_signature,
)
from arachne_spark.rules import ANY, Var, rule_from_dict
from tests.conftest import spo_set, triples_df

X, Y, Z, P = Var("x"), Var("y"), Var("z"), Var("p")

T1 = [
    ("<a>", "<p>", "<b>"),
    ("<b>", "<p>", "<c>"),
    ("<a>", "<q>", "<a>"),
    ("<a>", "<q>", '"lit"'),
]


def test_alpha_selection_consts(spark):
    df = triples_df(spark, T1)
    rel = atom_relation(df, (X, "<p>", Y))
    rows = {(r.v_x, r.v_y) for r in rel.collect()}
    assert rows == {("<a>", "<b>"), ("<b>", "<c>")}


def test_repeated_var_guard(spark):
    df = triples_df(spark, T1)
    rel = atom_relation(df, (X, "<q>", X))  # s == o required, uniformly (N2)
    rows = {r.v_x for r in rel.collect()}
    assert rows == {"<a>"}


def test_wildcard_matches_anything_binds_nothing(spark):
    df = triples_df(spark, T1)
    rel = atom_relation(df, (X, ANY, ANY))
    assert rel.columns == ["v_x"]
    assert {r.v_x for r in rel.collect()} == {"<a>", "<b>"}


def test_const_only_atom_is_existence_gate(spark):
    df = triples_df(spark, T1)
    rel = atom_relation(df, ("<a>", "<p>", "<b>"))
    assert rel.columns == [] and rel.count() == 1
    rel0 = atom_relation(df, ("<zz>", "<p>", "<b>"))
    assert rel0.count() == 0


def test_predicate_variable_binding(spark):
    df = triples_df(spark, T1)
    rel = atom_relation(df, ("<a>", P, Y))
    rows = {(r.v_p, r.v_y) for r in rel.collect()}
    assert rows == {("<p>", "<b>"), ("<q>", "<a>"), ("<q>", '"lit"')}


def test_two_atom_join(spark):
    df = triples_df(spark, T1)
    rule = rule_from_dict(
        {"name": "chain", "body": [["?x", "p", "?y"], ["?y", "p", "?z"]],
         "head": [["?x", "r", "?z"]]}
    )
    out = spo_set(apply_rule_once(df, rule))
    assert out == {("<a>", "<r>", "<c>")}


def test_cross_product_no_shared_vars(spark):
    df = triples_df(spark, [("<a>", "<p>", "<b>"), ("<c>", "<q>", "<d>")])
    rule = rule_from_dict(
        {"name": "cross", "body": [["?x", "p", None], ["?y", "q", None]],
         "head": [["?x", "r", "?y"]]}
    )
    out = spo_set(apply_rule_once(df, rule))
    assert out == {("<a>", "<r>", "<c>")}


def test_head_constants_and_multi_atom(spark):
    df = triples_df(spark, [("<a>", "<p>", "<b>")])
    rule = rule_from_dict(
        {"name": "h", "body": [["?x", "p", "?y"]],
         "head": [["?x", "t", "C"], ["_:marker", "t2", "?y"]]}
    )
    out = spo_set(apply_rule_once(df, rule))
    assert out == {("<a>", "<t>", "<C>"), ("_:marker", "<t2>", "<b>")}


def test_literal_never_joins_resource(spark):
    # '"x"' (literal) and '<x>' (IRI) are distinct join keys by encoding
    df = triples_df(spark, [("<s>", "<p>", '"x"'), ("<x>", "<q>", "<o>")])
    rule = rule_from_dict(
        {"name": "j", "body": [["?a", "p", "?m"], ["?m", "q", "?b"]],
         "head": [["?a", "r", "?b"]]}
    )
    assert spo_set(apply_rule_once(df, rule)) == set()


def test_atom_signature_sharing_key():
    assert atom_signature((X, "<p>", Y)) == atom_signature((Z, "<p>", X))
    assert atom_signature((X, "<p>", X)) != atom_signature((X, "<p>", Y))
    assert atom_signature((X, ANY, Y)) != atom_signature((X, "<p>", Y))


def test_beta_prefix_sharing(spark):
    """C3: rules with alpha-identical leading atoms (up to variable renaming)
    share one joined intermediate per round; results are unchanged."""
    from arachne_spark.plans.compiler import shared_join_chain, prefix_signature
    from arachne_spark.engine import FixpointEngine
    from arachne_spark.rules import Rule, Var, load_rules_json
    from arachne_spark.oracle import naive_fixpoint
    from tests.conftest import spo_set, triples_df

    # cls-hv1/cls-hv2 shape: shared 2-atom prefix, different third atom
    rules = load_rules_json(
        [
            {"name": "hv1",
             "body": [["?c", "p:onProp", "?p"], ["?c", "p:hasVal", "?y"], ["?x", "p:type", "?c"]],
             "head": [["?x", "p:rel", "?y"]]},
            {"name": "hv2",
             "body": [["?k", "p:onProp", "?q"], ["?k", "p:hasVal", "?v"], ["?z", "p:other", "?k"]],
             "head": [["?z", "p:rel2", "?v"]]},
        ]
    )
    data = [
        ("<R1>", "<p:onProp>", "<prop>"),
        ("<R1>", "<p:hasVal>", "<val>"),
        ("<i>", "<p:type>", "<R1>"),
        ("<j>", "<p:other>", "<R1>"),
    ]
    res = FixpointEngine(spark, rules, dict_encode=False).materialize(
        triples_df(spark, data)
    )
    assert spo_set(res.facts) == naive_fixpoint(data, rules)
    # the two bodies share the canonical 2-atom prefix signature
    r1, r2 = list(rules)
    sig1, _ = prefix_signature(r1.body[:2])
    sig2, _ = prefix_signature(r2.body[:2])
    assert sig1 == sig2
    # and compiling both against the same relations populates ONE beta entry
    # per shared prefix depth (cache-hit on the second rule)
    eng = FixpointEngine(spark, rules, dict_encode=False)
    facts = triples_df(spark, data).localCheckpoint(eager=True)
    cache = {}
    dfs = [facts] * 3
    eng._compile_variant(cache, dfs, r1)
    n_beta_after_first = sum(1 for k in cache if k[0] == "beta")
    eng._compile_variant(cache, dfs, r2)
    n_beta_after_second = sum(1 for k in cache if k[0] == "beta")
    # depths 1 and 2 shared; only depth 3 added a new entry
    assert n_beta_after_first == 3
    assert n_beta_after_second == 4
