"""Semi-naive Datalog fixpoint engine over Spark DataFrames.

This is the Spark-first replacement for the reference's entire Rete runtime
(RuleEngine.scala:50-95, ReteNodes.scala) — SURVEY.md O7. Instead of a triple-at-
a-time agenda (LIFO, RuleEngine.scala:56-63) the engine runs *rounds*:

    round r:  for each rule with k body atoms, evaluate k delta variants
              (delta at position i, facts-so-far at positions j<i, facts-as-of-
              previous-round at positions j>i — classic semi-naive, no duplicate
              re-derivation across variants)
              -> union instantiated heads across rules
              -> distinct                       (R11 set semantics)
              -> anti-join against accumulated facts   (R11 "only new to agenda")
              -> delta_{r+1}; empty delta => least fixpoint (R13)

Agenda order is irrelevant to the fixpoint (monotone rules + set semantics), so
the reference's LIFO agendas and child-activation ordering (C5/O6) have no
analogue — per-round `distinct` supersedes them.

Scale design (the reason this exists):
- delta is localCheckpoint'ed each round: truncates lineage AND gives AQE exact
  sizes, so small deltas broadcast automatically in the next round's joins.
- facts is a union of checkpointed deltas, re-checkpointed every few rounds to
  bound plan depth; persisted MEMORY_AND_DISK for reuse across the k variants
  of every rule in a round.
- driver-side rule/variant skipping (the unlinking analogue, O5/R7/R8): one
  `delta.groupBy(p).count()` per round yields the set of predicates with new
  facts; a variant whose delta-position atom has a constant predicate absent
  from the delta is skipped without launching a job, and a whole rule is
  skipped when any constant-predicate body atom has zero facts overall.
- alpha sharing (C2/O4): atom relations are memoized per (relation, blanked-
  pattern signature) within a round, so rules sharing a selection share the
  plan subtree.
- nonlinear rules (e.g. transitivity written r(x,y) ^ r(y,z) -> r(x,z)) double
  reachable path length per round, so rounds = O(log depth) out of the box.
- AQE (incl. skew-join splitting) is expected ON; hot-key skew on rdf:type /
  subClassOf object sides is further mitigated because TBox-side atom slices
  are small and broadcast (SURVEY O12).

Resumability (north rule): with ``checkpoint_dir`` set, each round's delta is
written to parquet (``round=NNNN``) together with a ``metrics.jsonl`` line
carrying round number, delta sizes, wall time, per-rule skip stats, and
per-partition lineage (rows per shuffle partition of the delta);
``FixpointEngine.resume`` restarts from the last completed round.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from functools import reduce
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arachne_spark.model import TRIPLE_COLS
from arachne_spark.plans.compiler import (
    alpha_filter,
    apply_head,
    atom_signature,
    bind_vars,
    join_chain,
)
from arachne_spark.rules import Any_, Rule, RuleSet, Var

TRIPLE_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType(), False) for c in TRIPLE_COLS]
)


def _is_const(t) -> bool:
    """Atom term is a constant — an encoded string OR a dictionary long id."""
    return not isinstance(t, (Var, Any_))

DERIVATION_COLS = ("s", "p", "o", "rule_name", "round")


@dataclass
class RoundMetrics:
    round: int
    delta_in: int
    delta_out: int
    facts_total: int
    seconds: float
    rules_skipped: int
    variants_skipped: int
    partition_lineage: list[int] = field(default_factory=list)

    def to_dict(self) -> dict:
        return dict(self.__dict__)


@dataclass
class FixpointResult:
    """The working memory at least fixpoint (WorkingMemory.scala:5-18 analogue)."""

    facts: DataFrame          # asserted ∪ derived (WorkingMemory.facts, N1)
    asserted: DataFrame
    rounds: int
    metrics: list[RoundMetrics]
    derivations: Optional[DataFrame] = None  # (s,p,o,rule_name,round) when enabled

    def inferred_only(self) -> DataFrame:
        """facts minus asserted — the --inferred-only export (S6, Main.scala:81)."""
        return self.facts.join(self.asserted, on=list(TRIPLE_COLS), how="left_anti")

    @property
    def facts_count(self) -> int:
        return self.metrics[-1].facts_total if self.metrics else -1

    def explain(self, s: str, p: str, o: str, max_depth: int = 10) -> list[dict]:
        """Provenance chain for one (encoded) triple from the derivations table —
        the offline analogue of WorkingMemory.explain (R14, WorkingMemory.scala:21-48).
        Returns the list of (rule_name, round) records that first derived it."""
        if self.derivations is None:
            raise ValueError("materialized with store_derivations=False")
        rows = (
            self.derivations.filter(
                (F.col("s") == s) & (F.col("p") == p) & (F.col("o") == o)
            )
            .select("rule_name", "round")
            .collect()
        )
        return [r.asDict() for r in rows]


def empty_triples(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], TRIPLE_SCHEMA)


class FixpointEngine:
    """Compile once, reuse for any number of datasets (README.md:9;
    RuleEngine.scala:8-9 immutable network / per-dataset WorkingMemory:50-51).
    The engine holds the validated RuleSet and per-materialization state lives
    in the FixpointResult."""

    def __init__(
        self,
        spark: SparkSession,
        ruleset: RuleSet,
        *,
        store_derivations: bool = False,
        checkpoint_dir: Optional[str] = None,
        facts_refresh: int = 8,
        broadcast_rows: int = 200_000,
        max_rounds: int = 10_000,
    ) -> None:
        self.spark = spark
        self.ruleset = ruleset
        self.store_derivations = store_derivations
        self.checkpoint_dir = checkpoint_dir
        # re-checkpoint the accumulated facts union every N rounds (bounds
        # plan width on deep fixpoints; individual deltas are always
        # checkpointed, so lineage depth is bounded regardless)
        self.facts_refresh = facts_refresh
        # derived sets at or below this row count dedup against facts via
        # broadcast semi/anti passes instead of a full facts shuffle
        self.broadcast_rows = broadcast_rows
        self.max_rounds = max_rounds
        # precompute per-rule structure
        self._rules = list(ruleset)
        # const-(p,o) gate atoms across the rule set: the alpha memories whose
        # emptiness is tracked per round (e.g. (?p rdf:type owl:TransitiveProperty))
        self._gate_pairs = sorted(
            {
                (a[1], a[2])
                for r in self._rules
                for a in r.body
                if _is_const(a[1]) and _is_const(a[2])
            }
        )
        # constant predicates across rule bodies: the ONLY per-predicate keys
        # rule/variant skipping ever consults (_atom_key), so the per-round
        # stats collect is bounded by the RULE SET, not the data's predicate
        # vocabulary (open RDF can have millions of distinct p)
        self._gate_preds = sorted(
            {a[1] for r in self._rules for a in r.body if _is_const(a[1])}
        )

    # -- alpha sharing (C2/O4): memoize the FILTER stage per (df, blanked
    # signature); the variable projection is applied per atom, mirroring the
    # reference where AlphaNodes share selections but bindings are per-pattern.
    @staticmethod
    def _atom_rel(cache: dict, df: DataFrame, atom) -> DataFrame:
        key = (id(df), atom_signature(atom))
        if key not in cache:
            cache[key] = alpha_filter(df, atom)
        return bind_vars(cache[key], atom)

    def _delta_stats(self, delta: DataFrame) -> tuple[dict, int, list[int]]:
        """One job -> (alpha counts, total, per-partition lineage).

        Alpha counts drive rule/variant skipping — the Rete left/right
        unlinking analogue (O5/R7/R8, ReteNodes.scala:88-93,153-158): a key
        ("p", p) counts rows per predicate, and a key ("po", p, o) counts the
        const-(p,o) gate atoms the rule set actually contains (e.g.
        (?p rdf:type owl:SymmetricProperty)) — exactly the alpha memories
        whose emptiness lets whole rules be skipped without launching a
        single job. The partition histogram is the per-partition lineage the
        north rule asks for.

        BOUNDED: both grouping keys are gated to the rule set's constant
        predicates / (p,o) gate pairs, so collect size is
        O(partitions x |rule consts|) regardless of the data's predicate
        vocabulary — open RDF with millions of distinct p collects the same
        handful of rows.
        """
        if self._gate_pairs:
            gate = reduce(
                lambda a, b: a | b,
                [
                    (F.col("p") == p) & (F.col("o") == o)
                    for (p, o) in self._gate_pairs
                ],
            )
            gate_o = F.when(gate, F.col("o"))
        else:
            gate_o = F.lit(None).cast(delta.schema["o"].dataType)
        if self._gate_preds:
            gate_p = F.when(F.col("p").isin(list(self._gate_preds)), F.col("p"))
        else:
            gate_p = F.lit(None).cast(delta.schema["p"].dataType)
        rows = (
            delta.groupBy(
                F.spark_partition_id().alias("pid"), gate_p.alias("gp"), gate_o.alias("go")
            )
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
        counts: dict = {}
        lineage: dict[int, int] = {}
        total = 0
        for r in rows:
            total += r["cnt"]
            if r["gp"] is not None:
                k = ("p", r["gp"])
                counts[k] = counts.get(k, 0) + r["cnt"]
            if r["go"] is not None:
                kk = ("po", r["gp"], r["go"])
                counts[kk] = counts.get(kk, 0) + r["cnt"]
            lineage[r["pid"]] = lineage.get(r["pid"], 0) + r["cnt"]
        return counts, total, [lineage[k] for k in sorted(lineage)]

    @staticmethod
    def _atom_key(atom) -> Optional[tuple]:
        """The alpha-count key this atom's emptiness can be checked against."""
        p, o = atom[1], atom[2]
        p_const, o_const = _is_const(p), _is_const(o)
        if p_const and o_const:
            return ("po", p, o)
        if p_const:
            return ("p", p)
        return None

    def _rule_keys(self, rule: Rule) -> list[Optional[tuple]]:
        return [self._atom_key(a) for a in rule.body]

    def materialize(self, asserted: DataFrame) -> FixpointResult:
        """Run to least fixpoint (processTriples, RuleEngine.scala:50-65)."""
        asserted = asserted.select(*TRIPLE_COLS)
        facts = asserted.distinct().localCheckpoint(eager=True)
        # the result's `asserted` is the checkpointed distinct — self-contained
        # (safe to reuse outside a foreachBatch micro-batch) at zero extra cost
        return self._run(facts, facts, round0=0, prior_metrics=[], derivations=None)

    def incremental(
        self, prev: FixpointResult, new_triples: DataFrame
    ) -> FixpointResult:
        """Insert-only incremental maintenance: new asserted triples seed the
        delta against an ALREADY-materialized store — the reuse pattern the
        reference's Rete gives for free (new triples re-enter the same
        network, README.md:9; SURVEY §2.6 streaming note). Semi-naive rounds
        then close the gap; unchanged facts are never recomputed."""
        spo = list(TRIPLE_COLS)
        # checkpoint the incoming batch so the result never holds micro-batch
        # lineage (a foreachBatch DataFrame is only valid inside its batch)
        new_triples = new_triples.select(*spo).distinct().localCheckpoint(eager=True)
        delta = new_triples.join(prev.facts, on=spo, how="left_anti").localCheckpoint(
            eager=True
        )
        d = delta.count()
        facts = prev.facts.unionByName(delta).localCheckpoint(eager=True)
        base = prev.facts_count + d
        # continue round numbering after the previous run so a shared
        # checkpoint_dir accumulates a consistent delta sequence (no
        # overwrites) and the seed delta itself is persisted for resume()
        round0 = prev.metrics[-1].round + 1 if prev.metrics else 1
        m0 = RoundMetrics(round0, 0, d, base, 0.0, 0, 0, [])
        self._write_round(round0, delta, m0)
        res = self._run(
            facts,
            prev.asserted.unionByName(new_triples),
            round0=round0,
            prior_metrics=list(prev.metrics) + [m0],
            derivations=prev.derivations,
            delta0=delta,
            facts_old0=prev.facts,
        )
        return res

    def resume(self, asserted: DataFrame) -> FixpointResult:
        """Restart from the last completed round under ``checkpoint_dir``."""
        if not self.checkpoint_dir:
            raise ValueError("no checkpoint_dir configured")
        rounds = sorted(
            int(d.split("=")[1])
            for d in os.listdir(self.checkpoint_dir)
            if d.startswith("round=")
        )
        if not rounds:
            return self.materialize(asserted)
        deltas = [
            self.spark.read.parquet(os.path.join(self.checkpoint_dir, f"round={r:04d}"))
            .select(*TRIPLE_COLS)
            for r in rounds
        ]
        facts = reduce(DataFrame.unionByName, deltas).localCheckpoint(eager=True)
        metrics = []
        mpath = os.path.join(self.checkpoint_dir, "metrics.jsonl")
        if os.path.exists(mpath):
            with open(mpath, encoding="utf-8") as f:
                metrics = [RoundMetrics(**json.loads(line)) for line in f if line.strip()]
            metrics = [m for m in metrics if m.round <= rounds[-1]]
        delta = deltas[-1]
        return self._run(
            facts,
            asserted,
            round0=rounds[-1],
            prior_metrics=metrics,
            derivations=None,
            delta0=delta.localCheckpoint(eager=True),
            facts_old0=reduce(DataFrame.unionByName, deltas[:-1]).localCheckpoint(eager=True)
            if len(deltas) > 1
            else empty_triples(self.spark),
        )

    def _write_round(self, rnd: int, delta: DataFrame, m: RoundMetrics) -> None:
        if not self.checkpoint_dir:
            return
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        delta.write.mode("overwrite").parquet(
            os.path.join(self.checkpoint_dir, f"round={rnd:04d}")
        )
        with open(
            os.path.join(self.checkpoint_dir, "metrics.jsonl"), "a", encoding="utf-8"
        ) as f:
            f.write(json.dumps(m.to_dict()) + "\n")

    def _run(
        self,
        facts: DataFrame,
        asserted: DataFrame,
        *,
        round0: int,
        prior_metrics: list[RoundMetrics],
        derivations: Optional[DataFrame],
        delta0: Optional[DataFrame] = None,
        facts_old0: Optional[DataFrame] = None,
    ) -> FixpointResult:
        spark = self.spark
        spo = list(TRIPLE_COLS)
        delta = delta0 if delta0 is not None else facts
        facts_old = facts_old0 if facts_old0 is not None else empty_triples(spark)
        # one aggregation job per delta yields total count, per-predicate counts
        # (variant skipping) and per-partition lineage (metrics) together
        delta_preds, delta_total, delta_lineage = self._delta_stats(delta)
        facts_count = (
            prior_metrics[-1].facts_total
            if prior_metrics
            else (delta_total if round0 == 0 and delta0 is None else facts.count())
        )
        if round0 == 0 and not prior_metrics:
            m0 = RoundMetrics(0, 0, delta_total, facts_count, 0.0, 0, 0, delta_lineage)
            prior_metrics = [m0]
            self._write_round(0, delta, m0)
        metrics = list(prior_metrics)
        if self.store_derivations and derivations is None:
            derivations = spark.createDataFrame(
                [],
                T.StructType(
                    [T.StructField(c, T.StringType(), False) for c in ("s", "p", "o", "rule_name")]
                    + [T.StructField("round", T.IntegerType(), False)]
                ),
            )

        # driver-side alpha counts for facts (whole-rule skip, O5/R7/R8)
        if round0 == 0 and delta0 is None:
            totals: dict = dict(delta_preds)
        else:
            totals, _, _ = self._delta_stats(facts)
        # facts-as-of-previous-round counts (variant pruning): in the first
        # round facts_old is empty, so only the last delta variant of every
        # rule can produce anything
        if facts_old0 is None:
            totals_old: dict = {}
            facts_old_total = 0
        else:
            totals_old, facts_old_total, _ = self._delta_stats(facts_old)

        rnd = round0
        while rnd < self.max_rounds:
            rnd += 1
            t0 = time.time()
            delta_in = delta_total

            cache: dict = {}
            derived_parts: list[DataFrame] = []
            derived_meta_parts: list[DataFrame] = []
            rules_skipped = 0
            variants_skipped = 0
            for rule in self._rules:
                keys = self._rule_keys(rule)
                # whole-rule skip: an alpha memory (const p / const (p,o) atom)
                # with zero matching facts overall
                if any(kk is not None and totals.get(kk, 0) == 0 for kk in keys):
                    rules_skipped += 1
                    continue
                k = len(rule.body)
                rule_fired = False
                for i in range(k):
                    kk = keys[i]
                    if kk is not None and delta_preds.get(kk, 0) == 0:
                        variants_skipped += 1
                        continue
                    # variant pruning against facts_old (positions j > i):
                    # provably-empty slices mean the whole variant is empty
                    if i < k - 1 and (
                        facts_old_total == 0
                        or any(
                            keys[j] is not None and totals_old.get(keys[j], 0) == 0
                            for j in range(i + 1, k)
                        )
                    ):
                        variants_skipped += 1
                        continue
                    dfs = [
                        facts if j < i else (delta if j == i else facts_old)
                        for j in range(k)
                    ]
                    bound = self._compile_variant(cache, dfs, rule)
                    heads = apply_head(bound, rule.head)
                    derived_parts.append(heads)
                    rule_fired = True
                    if self.store_derivations:
                        derived_meta_parts.append(
                            heads.withColumn("rule_name", F.lit(rule.name or ""))
                        )
                if not rule_fired:
                    rules_skipped += 1

            if derived_parts:
                derived = reduce(DataFrame.unionByName, derived_parts)
                # Dedup new heads, then subtract known facts. The derived set
                # is distinct'd and checkpointed FIRST so the driver can pick
                # the anti-join physical by its actual size: small derived →
                # two broadcast passes that stream facts map-only (semi to
                # find already-known triples, anti against that small set)
                # instead of shuffling the entire facts store; large derived →
                # plain shuffled left_anti. Late fixpoint rounds have tiny
                # deltas, so this turns their cost from O(|facts| shuffle)
                # into O(|facts| scan).
                dd = derived.distinct().localCheckpoint(eager=True)
                if dd.count() <= self.broadcast_rows:
                    seen = facts.join(
                        F.broadcast(dd), on=spo, how="left_semi"
                    ).localCheckpoint(eager=True)
                    new_delta = dd.join(
                        F.broadcast(seen), on=spo, how="left_anti"
                    ).localCheckpoint(eager=True)
                else:
                    new_delta = dd.join(facts, on=spo, how="left_anti").localCheckpoint(
                        eager=True
                    )
            else:
                new_delta = empty_triples(spark).localCheckpoint(eager=True)
            new_preds, delta_out, lineage = self._delta_stats(new_delta)

            if self.store_derivations and delta_out > 0 and derived_meta_parts:
                meta = reduce(DataFrame.unionByName, derived_meta_parts)
                round_derivs = (
                    meta.join(new_delta, on=spo, how="left_semi")
                    .distinct()
                    .withColumn("round", F.lit(rnd))
                )
                derivations = derivations.unionByName(round_derivs).localCheckpoint(
                    eager=True
                )

            facts_count += delta_out
            m = RoundMetrics(
                round=rnd,
                delta_in=delta_in,
                delta_out=delta_out,
                facts_total=facts_count,
                seconds=round(time.time() - t0, 4),
                rules_skipped=rules_skipped,
                variants_skipped=variants_skipped,
                partition_lineage=lineage,
            )
            metrics.append(m)
            self._write_round(rnd, new_delta, m)

            if delta_out == 0:
                break

            totals_old = dict(totals)
            facts_old_total = sum(v for (tag, *_), v in totals_old.items() if tag == "p")
            for kk, cnt in new_preds.items():
                totals[kk] = totals.get(kk, 0) + cnt
            delta_preds, delta_total = new_preds, delta_out

            facts_old = facts
            # The delta must not appear as the SAME LogicalRDD both inside the
            # facts union and as the join-side delta relation — that trips
            # Spark 4.1's relation deduplication ("key not found: attr") on
            # var-predicate rule shapes. A second localCheckpoint of the
            # (already materialized) delta is an O(|delta|) in-memory copy
            # with fresh attribute ids — far cheaper than re-checkpointing
            # the whole facts store every round, and keeps facts a union of
            # per-round checkpointed components (bounded lineage, exact AQE
            # sizes summing across components). Every `facts_refresh` rounds
            # the union itself is re-checkpointed to bound plan width on deep
            # fixpoints.
            facts = facts.unionByName(new_delta.localCheckpoint(eager=True))
            if (rnd - round0) % self.facts_refresh == 0:
                facts = facts.localCheckpoint(eager=True)
            delta = new_delta

        return FixpointResult(
            facts=facts,
            asserted=asserted,
            rounds=rnd - round0,
            metrics=metrics,
            derivations=derivations,
        )

    def _compile_variant(self, cache: dict, dfs, rule: Rule) -> DataFrame:
        rels = [self._atom_rel(cache, df, a) for df, a in zip(dfs, rule.body)]
        return join_chain(rels, rule.body)
