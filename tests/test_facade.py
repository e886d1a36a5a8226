"""Facade Q1-Q14 over a materialized facts view (ArachneOWLReasoner.scala map)."""

import pytest

from arachne_spark.engine import FixpointEngine
from arachne_spark.facade import Reasoner, transitive_closure
from arachne_spark.model import encode_iri, encode_literal
from arachne_spark.owlrl import owl_rl_core, indirect_type_rule, strict_superclass_triples
from arachne_spark.rules import RuleSet, Var
from tests.conftest import spo_set, triples_df

EX = "http://example.org/"
TYPE = encode_iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
SCO = encode_iri("http://www.w3.org/2000/01/rdf-schema#subClassOf")
SAME = encode_iri("http://www.w3.org/2002/07/owl#sameAs")
DIFF = encode_iri("http://www.w3.org/2002/07/owl#differentFrom")
NOTHING = encode_iri("http://www.w3.org/2002/07/owl#Nothing")
NAMED = encode_iri("http://www.w3.org/2002/07/owl#NamedIndividual")


def e(x):
    return encode_iri(EX + x)


@pytest.fixture(scope="module")
def reasoner(spark):
    tbox = [(e("B"), SCO, e("A")), (e("C"), SCO, e("B"))]
    abox = [
        (e("i1"), TYPE, e("C")),
        (e("i2"), TYPE, e("B")),
        (e("i1"), TYPE, NAMED),
        ("_:anon", TYPE, e("C")),
        (e("i1"), e("knows"), e("i2")),
        (e("i1"), e("label"), encode_literal("one")),
        (e("i1"), SAME, e("i1b")),
        (e("i1"), DIFF, e("i9")),
    ]
    strict = strict_superclass_triples([(s, o) for s, _, o in tbox])
    rules = RuleSet(list(owl_rl_core()) + [indirect_type_rule()])
    res = FixpointEngine(spark, rules).materialize(
        triples_df(spark, tbox + abox + strict)
    )
    return Reasoner(res.facts.cache())


def test_q1_instances(reasoner):
    got = {r["s"] for r in reasoner.instances(EX + "A").collect()}
    # isIRI filter drops the blank node (Q1: FILTER(isIRI(?s)))
    assert got == {e("i1"), e("i2"), e("i1b")}


def test_q2_direct_instances(reasoner):
    got = {r["s"] for r in reasoner.instances(EX + "B", direct=True).collect()}
    # i1 is type B only indirectly (via C subClassOf B)
    assert e("i2") in got and e("i1") not in got


def test_q3_types(reasoner):
    got = {r["cls"] for r in reasoner.types(EX + "i1").collect()}
    assert got >= {e("A"), e("B"), e("C")}
    assert NAMED not in got  # FILTER(?o != owl:NamedIndividual)
    direct = {r["cls"] for r in reasoner.types(EX + "i1", direct=True).collect()}
    assert e("C") in direct and e("A") not in direct


def test_q4_q5_class_hierarchy(reasoner):
    subs = {r["cls"] for r in reasoner.subclasses(EX + "A").collect()}
    assert subs >= {e("B"), e("C")}
    direct_subs = {r["cls"] for r in reasoner.subclasses(EX + "A", direct=True).collect()}
    assert e("B") in direct_subs
    sups = {r["cls"] for r in reasoner.superclasses(EX + "C").collect()}
    assert sups >= {e("A"), e("B")}


def test_q6_q7_property_values(reasoner):
    vals = {r["value"] for r in reasoner.object_property_values(EX + "i1", EX + "knows").collect()}
    assert e("i2") in vals
    inv = {r["value"] for r in reasoner.object_property_values(EX + "i2", EX + "knows", inverse=True).collect()}
    assert e("i1") in inv
    data = {r["value"] for r in reasoner.data_property_values(EX + "i1", EX + "label").collect()}
    assert data == {encode_literal("one")}


def test_q8_q9_same_different(reasoner):
    same = {r["ind"] for r in reasoner.same_individuals(EX + "i1").collect()}
    assert same == {e("i1"), e("i1b")}  # unioned with self (:156)
    diff = {r["ind"] for r in reasoner.different_individuals(EX + "i1").collect()}
    assert diff == {e("i9")}


def test_q10_consistency(reasoner, spark):
    assert reasoner.is_consistent()
    bad = Reasoner(triples_df(spark, [(e("i"), TYPE, NOTHING)]))
    assert not bad.is_consistent()


def test_q11_q12_entailment(reasoner, spark):
    assert reasoner.is_entailed(e("i1"), TYPE, e("A"))
    assert not reasoner.is_entailed(e("i1"), TYPE, e("Zzz"))
    axioms = triples_df(spark, [(e("i1"), TYPE, e("A")), (e("i2"), TYPE, e("A"))])
    assert reasoner.all_entailed(axioms)
    axioms2 = triples_df(spark, [(e("i1"), TYPE, e("Zzz"))])
    assert not reasoner.all_entailed(axioms2)


def test_q13_bgp(reasoner):
    x, y = Var("x"), Var("y")
    rows = reasoner.select_bgp([(x, TYPE, e("C")), (x, e("knows"), y)]).collect()
    # sameAs substitution (eq-rep-s) makes i1b a C that knows i2, too
    assert {(r["v_x"], r["v_y"]) for r in rows} == {
        (e("i1"), e("i2")),
        (e("i1b"), e("i2")),
    }
    assert reasoner.ask_bgp([(x, TYPE, e("C"))])
    out = reasoner.construct_bgp([(x, TYPE, e("C"))], [(x, e("inferredType"), e("C"))])
    assert (e("i1"), e("inferredType"), e("C")) in spo_set(out)


def test_q14_unsupported(reasoner):
    with pytest.raises(NotImplementedError):
        reasoner.equivalent_classes()


def test_transitive_closure_doubling(spark):
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(9)], "src string, dst string"
    )
    clo = transitive_closure(edges)
    assert clo.count() == 45  # 10 nodes, all ordered pairs


def test_anchored_closure_matches_global_and_handles_cycles(spark):
    """subclasses/superclasses walk an anchored frontier (the reference query
    is anchored, ArachneOWLReasoner.scala:179) — results must equal the
    global-closure answers, including a mutual-subClassOf cycle where
    C subClassOf+ C holds."""
    edges = [
        (e("B"), SCO, e("A")),
        (e("C"), SCO, e("B")),
        (e("D"), SCO, e("C")),
        (e("X"), SCO, e("Y")),  # unrelated component: must never be touched
        (e("P"), SCO, e("Q")),  # cycle P <-> Q
        (e("Q"), SCO, e("P")),
    ]
    r = Reasoner(triples_df(spark, edges))
    subs = {x["cls"] for x in r.subclasses(EX + "A").collect()}
    assert subs == {e("B"), e("C"), e("D")}
    sups = {x["cls"] for x in r.superclasses(EX + "D").collect()}
    assert sups == {e("A"), e("B"), e("C")}
    # cycle: P subClassOf+ P, so P appears in its own descendants/ancestors
    assert {x["cls"] for x in r.subclasses(EX + "P").collect()} == {e("P"), e("Q")}
    assert {x["cls"] for x in r.superclasses(EX + "P").collect()} == {e("P"), e("Q")}
    # direct=True unaffected
    assert {x["cls"] for x in r.subclasses(EX + "A", direct=True).collect()} == {e("B")}


def test_facade_isiri_filters(spark):
    """Bnode classes/individuals are filtered where the reference SPARQL has
    FILTER(isIRI(...)): types, sub/superclasses, sameAs, differentFrom,
    inverse object-property values."""
    facts = [
        (e("i1"), TYPE, e("C")),
        (e("i1"), TYPE, "_:restriction"),       # bnode class expression
        ("_:b1", SCO, e("C")),                   # bnode subclass
        (e("C"), SCO, "_:b2"),                   # bnode superclass
        (e("D"), SCO, e("C")),
        (e("i1"), SAME, "_:b3"),
        (e("i1"), SAME, e("i2")),
        (e("i1"), DIFF, "_:b4"),
        ("_:b5", e("knows"), e("i1")),           # bnode subject for inverse
        (e("i3"), e("knows"), e("i1")),
    ]
    r = Reasoner(triples_df(spark, facts))
    assert {x["cls"] for x in r.types(EX + "i1").collect()} == {e("C")}
    assert {x["cls"] for x in r.subclasses(EX + "C").collect()} == {e("D")}
    assert {x["cls"] for x in r.superclasses(EX + "C").collect()} == set()
    assert {x["ind"] for x in r.same_individuals(EX + "i1").collect()} == {
        e("i1"), e("i2")
    }
    assert {x["ind"] for x in r.different_individuals(EX + "i1").collect()} == set()
    assert {
        x["value"] for x in r.object_property_values(EX + "i1", EX + "knows", inverse=True).collect()
    } == {e("i3")}


def test_reasoner_invalidate_after_incremental(spark):
    """Memoized cones are tied to the facts snapshot; invalidate() (or a
    fresh Reasoner) picks up an incremental() result's new facts."""
    from arachne_spark.engine import FixpointEngine
    from arachne_spark.model import RDFS_SUBCLASSOF, encode_iri
    from arachne_spark.rules import load_rules_json
    from tests.conftest import triples_df

    SCO = RDFS_SUBCLASSOF
    rules = load_rules_json(
        [{"name": "scoT", "body": [["?a", SCO, "?b"], ["?b", SCO, "?c"]],
          "head": [["?a", SCO, "?c"]]}]
    )
    eng = FixpointEngine(spark, rules)
    res = eng.materialize(
        triples_df(spark, [("<A>", encode_iri(SCO), "<B>"), ("<B>", encode_iri(SCO), "<C>")])
    )
    r = Reasoner(res.facts)
    subs_before = {row["cls"] for row in r.subclasses("C").collect()}
    assert subs_before == {"<A>", "<B>"}
    res2 = eng.incremental(res, triples_df(spark, [("<Z>", encode_iri(SCO), "<A>")]))
    # stale snapshot still memoized; invalidate with the new facts
    r.invalidate(res2.facts)
    subs_after = {row["cls"] for row in r.subclasses("C").collect()}
    assert subs_after == {"<A>", "<B>", "<Z>"}


@pytest.mark.parametrize("dict_encode", [True, False])
def test_facade_over_bucketed_store(spark, tmp_path, dict_encode):
    """Reasoner.from_result on a pred_partitioned run: every const-predicate
    facade query reads the bucketed store with a __pb partition filter
    (partition pruning — VERDICT r3 next-round #10) and returns EXACTLY the
    plain facade's answers, in both representations."""
    tbox = [(e("B"), SCO, e("A")), (e("C"), SCO, e("B"))]
    abox = [
        (e("i1"), TYPE, e("C")),
        (e("i2"), TYPE, e("B")),
        (e("i1"), e("knows"), e("i2")),
        (e("i1"), e("label"), encode_literal("one")),
        (e("i1"), SAME, e("i1b")),
    ]
    rules = RuleSet(list(owl_rl_core()))
    eng = FixpointEngine(
        spark, rules, checkpoint_dir=str(tmp_path / "ck"),
        pred_partitioned=True, dict_encode=dict_encode,
    )
    res = eng.materialize(triples_df(spark, tbox + abox))
    assert res.facts_store is not None
    r_store = Reasoner.from_result(res)
    r_plain = Reasoner(res.facts)
    assert r_store._store is not None

    def col_set(df, col):
        return {r[col] for r in df.collect()}

    # answers identical across every const-predicate surface
    assert col_set(r_store.instances(EX + "A"), "s") == col_set(
        r_plain.instances(EX + "A"), "s"
    )
    assert col_set(r_store.subclasses(EX + "A"), "cls") == col_set(
        r_plain.subclasses(EX + "A"), "cls"
    ) == {e("B"), e("C")}
    assert col_set(r_store.superclasses(EX + "C"), "cls") == {e("A"), e("B")}
    assert col_set(r_store.types(EX + "i1"), "cls") == col_set(
        r_plain.types(EX + "i1"), "cls"
    )
    inv_store = col_set(
        r_store.object_property_values(EX + "i2", EX + "knows", inverse=True),
        "value",
    )
    inv_plain = col_set(
        r_plain.object_property_values(EX + "i2", EX + "knows", inverse=True),
        "value",
    )
    assert inv_store == inv_plain and e("i1") in inv_store
    assert col_set(
        r_store.data_property_values(EX + "i1", EX + "label"), "value"
    ) == {encode_literal("one")}
    assert col_set(r_store.same_individuals(EX + "i1"), "ind") == col_set(
        r_plain.same_individuals(EX + "i1"), "ind"
    )
    assert r_store.is_consistent() == r_plain.is_consistent() is True
    assert r_store.is_entailed(e("i1"), TYPE, e("A")) is True
    assert r_store.is_entailed(e("i1"), TYPE, e("Zz")) is False

    # plan-level: the cone-scan edge relation carries a __pb partition filter
    plan = (
        r_store._po(SCO)._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan, plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "__pb" in pf, plan
