"""Compile triple patterns and rule bodies to Catalyst plans.

This module replaces the reference's Rete network construction and runtime
(ReteNodes.scala, RuleEngine.scala:8-48) with declarative DataFrame plans:

- R1/R2 alpha selection  -> `facts.filter(const-position equalities)`; Catalyst
  pushes these to the scan (predicate pushdown), so the 8-way alpha dispatch
  (RuleEngine.scala:80-89) needs no runtime analogue.
- R3 repeated-variable guard -> equality filter applied UNIFORMLY (the reference
  checks only on right-activation, ReteNodes.scala:160-166 — documented divergence
  SURVEY N2; we implement standard Datalog semantics).
- R4 binding extraction -> projection of pattern positions to variable-named
  columns (ReteNodes.scala:168-178).
- R5 beta join -> `join(on=shared_var_columns)`; the reference's per-variable
  candidate-list intersection (ReteNodes.scala:128-132, 190-196) is exactly a
  composite equi-join key, and Spark/AQE picks broadcast vs shuffle-hash vs
  sort-merge per stage.
- R6 cross product (no shared vars) -> crossJoin (ReteNodes.scala:77,129,196).
- R10 production -> per-head-atom `select(lit(const)…, col(var)…)`, unioned
  (ReteNodes.scala:221-247). Bnodes in heads are constants (SURVEY N4).

All inputs/outputs use the encoded 3-column triple schema (model.py), so every
join key is a single string column per shared variable.
"""

from __future__ import annotations

import re
from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arachne_spark.rules import ANY, Any_, Atom, Rule, Var, atom_vars

_POS = ("s", "p", "o")


def var_col(v: Var) -> str:
    """Variable -> stable, valid column name."""
    return "v_" + re.sub(r"\W", "_", v.name)


def atom_signature(atom: Atom) -> tuple:
    """The atom with variables blanked — the alpha-memory sharing key.

    Patterns differing only in variable names share one selection
    (RuleEngine.scala:20-21 keyed by TriplePattern.blankVariables,
    Triple.scala:64-69). Repeated-variable structure is part of the key
    because it changes the filter.
    """
    names: dict[Var, int] = {}
    sig = []
    for t in atom:
        if isinstance(t, Var):
            sig.append(("var", names.setdefault(t, len(names))))
        elif isinstance(t, Any_):
            sig.append(("any", None))
        else:
            sig.append(("const", t))
    return tuple(sig)


def atom_filter_condition(atom: Atom) -> Optional[Column]:
    """Constant-position equalities + repeated-variable guards (R2 + R3)."""
    conds: list[Column] = []
    for t, c in zip(atom, _POS):
        if isinstance(t, (Var, Any_)):
            continue
        conds.append(F.col(c) == F.lit(t))
    s, p, o = atom
    if isinstance(s, Var):
        if s == p:
            conds.append(F.col("s") == F.col("p"))
        if s == o:
            conds.append(F.col("s") == F.col("o"))
    if isinstance(p, Var) and p == o:
        conds.append(F.col("p") == F.col("o"))
    if not conds:
        return None
    return reduce(lambda a, b: a & b, conds)


def alpha_filter(triples: DataFrame, atom: Atom) -> DataFrame:
    """The shareable alpha selection (R2): constants + repeated-var guards only.
    Cacheable per blanked-pattern signature (C2) — projection to variable
    names is NOT part of the shared node, exactly as in the reference where
    AlphaNodes are keyed by `blankVariables` (RuleEngine.scala:20-21)."""
    cond = atom_filter_condition(atom)
    return triples.filter(cond) if cond is not None else triples


def bind_vars(
    filtered: DataFrame, atom: Atom, triple_as: Optional[str] = None
) -> DataFrame:
    """Binding extraction (R4): project pattern positions to variable columns.

    A constant-only atom (no variables) returns a zero-column, 0-or-1-row
    DataFrame acting as an existence gate (R6 corner: facts are a set, so at
    most one row can match).

    With ``triple_as`` set, the matched source triple rides along as a struct
    column of that name — the provenance hook (R12): the reference's
    Derivation keeps the token's triples (WorkingMemory.scala:72,
    ReteNodes.scala:232), and here each body atom's triple survives the join
    chain so head rows know their supporting facts.
    """
    cols: list[Column] = []
    seen: set[Var] = set()
    for t, c in zip(atom, _POS):
        if isinstance(t, Var) and t not in seen:
            seen.add(t)
            cols.append(F.col(c).alias(var_col(t)))
    if triple_as is not None:
        cols.append(F.struct(*_POS).alias(triple_as))
    if not cols:
        return filtered.limit(1).select()
    if not any(isinstance(t, Var) for t in atom):
        # constant-only existence gate still carries at most one row
        return filtered.limit(1).select(*cols)
    return filtered.select(*cols)


def atom_relation(triples: DataFrame, atom: Atom) -> DataFrame:
    """Alpha node: filter by constants/guards, project variable bindings (R2-R4)."""
    return bind_vars(alpha_filter(triples, atom), atom)


def join_chain(rels: Sequence[DataFrame], atoms: Sequence[Atom]) -> DataFrame:
    """Chain of equi-joins over shared variables, in author order (O8).

    ``rels[i]`` is the already-projected binding relation for atom i (columns =
    variable columns). Catalyst and AQE choose join physicals; body order is
    the logical chain only, as in the reference (join order = rule body order,
    RuleEngine.scala:17-27).
    """
    cur: Optional[DataFrame] = None
    bound: set[Var] = set()
    for rel, atom in zip(rels, atoms):
        avars = set(atom_vars(atom))
        if cur is None:
            cur = rel
        else:
            shared = [var_col(v) for v in sorted(bound & avars, key=lambda v: v.name)]
            if shared:
                cur = cur.join(rel, on=shared, how="inner")
            else:
                cur = cur.crossJoin(rel)
        bound |= avars
    assert cur is not None
    return cur


def compile_body(
    atom_dfs: Sequence[DataFrame], atoms: Sequence[Atom]
) -> DataFrame:
    """Alpha selection + beta join chain: ``atom_dfs[i]`` is the triples
    DataFrame to match atom i against (the semi-naive driver passes
    delta/full/old variants per position)."""
    return join_chain(
        [atom_relation(df, a) for df, a in zip(atom_dfs, atoms)], atoms
    )


def apply_head(
    bound: DataFrame, head: Sequence[Atom], extra: Sequence[Column] = ()
) -> DataFrame:
    """Production node: instantiate head templates from bindings (R10).
    ``extra`` columns (e.g. the provenance body-triple array) are appended to
    every head atom's projection."""
    outs = []
    for atom in head:
        cols = []
        for t, c in zip(atom, _POS):
            if isinstance(t, Var):
                cols.append(F.col(var_col(t)).alias(c))
            else:
                cols.append(F.lit(t).alias(c))
        outs.append(bound.select(*cols, *extra))
    return reduce(DataFrame.unionByName, outs)


def apply_rule_once(triples: DataFrame, rule: Rule) -> DataFrame:
    """Single naive pass of one rule over one facts relation (tests/tooling)."""
    bound = compile_body([triples] * len(rule.body), rule.body)
    return apply_head(bound, rule.head)


# ---------------------------------------------------------------------------
# C3: beta-node (body-prefix) sharing across rules within a round
# (RuleEngine.scala:13,22-27 keys JoinNodes by JoinNodeSpec — the pattern
# list up to this depth; two rules with identical leading patterns share the
# join chain). Here: prefixes identical up to VARIABLE RENAMING and evaluated
# against the same relation sequence share one joined intermediate per round;
# variables are canonicalized to first-occurrence indices (the blankVariables
# idea extended to whole prefixes), and each rule projects the canonical
# columns back to its own names at the end — a free projection.
# ---------------------------------------------------------------------------

def _cv(idx: int) -> str:
    return f"cv_{idx}"


def prefix_signature(atoms: Sequence[Atom]) -> tuple[tuple, dict]:
    """(blanked signature of the whole prefix, Var -> canonical index).
    Variable numbering is FIRST-OCCURRENCE-GLOBAL across the prefix, so the
    join structure (which positions share variables) is part of the key."""
    names: dict[Var, int] = {}
    sig = []
    for atom in atoms:
        s = []
        for t in atom:
            if isinstance(t, Var):
                s.append(("var", names.setdefault(t, len(names))))
            elif isinstance(t, Any_):
                s.append(("any", None))
            else:
                s.append(("const", t))
        sig.append(tuple(s))
    return tuple(sig), names


def shared_join_chain(
    cache: dict,
    atom_rel,
    dfs: Sequence[DataFrame],
    atoms: Sequence[Atom],
) -> DataFrame:
    """join_chain with per-prefix memoization. ``cache`` is the round-scoped
    dict also used for alpha sharing; ``atom_rel(cache, df, atom)`` supplies
    the bound atom relation. The cached intermediates carry canonical
    column names (cv_0, cv_1, ...)."""
    cur: Optional[DataFrame] = None
    names: dict[Var, int] = {}
    bound: set[Var] = set()
    for i, (df, atom) in enumerate(zip(dfs, atoms)):
        sig, names = prefix_signature(atoms[: i + 1])
        key = ("beta", tuple(id(d) for d in dfs[: i + 1]), sig)
        if key in cache:
            cur = cache[key]
            bound |= set(atom_vars(atom))
            continue
        rel = atom_rel(cache, df, atom)
        avars = atom_vars(atom)
        if avars:
            rel = rel.select(
                *[F.col(var_col(v)).alias(_cv(names[v])) for v in avars]
            )
        if cur is None:
            cur = rel
        else:
            shared = sorted(names[v] for v in bound & set(avars))
            if shared and avars:
                cur = cur.join(rel, on=[_cv(ix) for ix in shared], how="inner")
            else:
                cur = cur.crossJoin(rel)
        bound |= set(avars)
        cache[key] = cur
    assert cur is not None
    # project canonical columns back to this rule's variable names
    out_cols = [F.col(_cv(ix)).alias(var_col(v)) for v, ix in names.items()]
    return cur.select(*out_cols) if out_cols else cur
