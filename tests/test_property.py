"""Property-based differential testing: random small rulesets + random
triple sets, engine vs the naive Python oracle (the generalization of the
reference's Jena differential test to arbitrary rule shapes — repeated
variables, var-predicates, cross products, multi-atom heads)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arachne_spark.engine import FixpointEngine
from arachne_spark.oracle import naive_fixpoint
from arachne_spark.rules import Rule, RuleSet, Var
from tests.conftest import spo_set, triples_df

CONSTS = [f"<c{i}>" for i in range(4)]
PREDS = [f"<p{i}>" for i in range(3)]
VARS = [Var("x"), Var("y"), Var("z")]

_term = st.one_of(st.sampled_from(CONSTS + PREDS), st.sampled_from(VARS))
_atom = st.tuples(_term, _term, _term)


@st.composite
def _rules(draw):
    n_rules = draw(st.integers(1, 2))
    rules = []
    for i in range(n_rules):
        body = tuple(draw(st.lists(_atom, min_size=1, max_size=2)))
        bound = [t for a in body for t in a if isinstance(t, Var)]
        if not bound:
            bound = [None]
        head_term = st.one_of(
            st.sampled_from(CONSTS + PREDS),
            st.sampled_from(bound) if bound[0] is not None else st.sampled_from(CONSTS),
        )
        head = (tuple(draw(st.tuples(head_term, head_term, head_term))),)
        rules.append(Rule(f"r{i}", body, head))
    return RuleSet(rules)


_triples = st.lists(
    st.tuples(
        st.sampled_from(CONSTS + PREDS),
        st.sampled_from(PREDS),
        st.sampled_from(CONSTS + PREDS),
    ),
    min_size=1,
    max_size=10,
    unique=True,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rules=_rules(), triples=_triples)
def test_engine_matches_oracle_on_random_programs(spark, rules, triples):
    expect = naive_fixpoint(triples, rules)
    # guard against pathological blowups the oracle itself created
    if len(expect) > 3000:
        return
    res = FixpointEngine(spark, rules, dict_encode=False).materialize(
        triples_df(spark, sorted(triples))
    )
    assert spo_set(res.facts) == expect
