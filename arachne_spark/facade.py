"""Reasoner query facade over a materialized facts DataFrame — the Spark-SQL
re-expression of the reference's OWLReasoner/SPARQL facade
(util/ArachneOWLReasoner.scala; operator map SURVEY.md §2.5 Q1-Q14).

The reference materializes facts into a Jena model and answers OWLReasoner
calls with SPARQL (flush, ArachneOWLReasoner.scala:49-58). Here the facts are
already a DataFrame; every facade call is a Catalyst plan over it. All term
arguments and results use the *encoded* term strings (model.py); helpers that
take raw IRIs encode them.
"""

from __future__ import annotations

from functools import reduce
from typing import Iterable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arachne_spark.model import (
    INDIRECT_TYPE,
    OWL_DIFFERENTFROM,
    OWL_NAMED_INDIVIDUAL,
    OWL_NOTHING,
    OWL_SAMEAS,
    RDF_TYPE,
    RDFS_SUBCLASSOF,
    TRIPLE_COLS,
    encode_iri,
    encode_resource,
)
from arachne_spark.plans.compiler import apply_head, compile_body
from arachne_spark.rules import Atom

_TYPE = encode_iri(RDF_TYPE)
_SCO = encode_iri(RDFS_SUBCLASSOF)
_SAME = encode_iri(OWL_SAMEAS)
_DIFF = encode_iri(OWL_DIFFERENTFROM)
_IND = encode_iri(INDIRECT_TYPE)
_NOTHING = encode_iri(OWL_NOTHING)
_NAMED = encode_iri(OWL_NAMED_INDIVIDUAL)


def transitive_closure(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 64
) -> DataFrame:
    """Distributed transitive closure by iterative doubling — O(log depth)
    rounds. The facade's property-path evaluator (Q4/Q5
    `rdfs:subClassOf+`, ArachneOWLReasoner.scala:179). Each round joins the
    closure-so-far with itself, so a path of length 2^k exists after k rounds.
    """
    spark = edges.sparkSession
    closure = edges.select(src, dst).distinct().localCheckpoint(eager=True)
    n = closure.count()
    for _ in range(max_iter):
        hop = (
            closure.alias("a")
            .join(closure.alias("b"), F.col(f"a.{dst}") == F.col(f"b.{src}"))
            .select(F.col(f"a.{src}").alias(src), F.col(f"b.{dst}").alias(dst))
        )
        new_closure = closure.unionByName(hop).distinct().localCheckpoint(eager=True)
        n2 = new_closure.count()
        if n2 == n:
            return closure
        closure, n = new_closure, n2
    return closure


class Reasoner:
    """Query facade over materialized facts (encoded 3-column schema).

    Memoized structures (subClassOf edges, closure, cones) are tied to the
    FACTS SNAPSHOT passed at construction — DataFrames are immutable, so
    there is no staleness within one snapshot. After ``incremental()``
    produces a new result, either build a fresh ``Reasoner(new_result.facts)``
    or call :meth:`invalidate` with the new facts (the reference re-flushes
    its caches on ontology change the same way,
    ref ArachneOWLReasoner.scala:28-39)."""

    def __init__(
        self,
        facts: DataFrame,
        *,
        facts_store: Optional[DataFrame] = None,
        term_dict: Optional[DataFrame] = None,
        salt: int = 0,
    ):
        self.facts = facts
        # pred_partitioned runs: the raw bucketed store (with __pb), in the
        # run's representation — const-predicate facade scans then prune to
        # the predicate's bucket files (VERDICT r3 next-round #10)
        self._store = facts_store
        self._term_dict = term_dict
        self._salt = salt
        self._sco_edges_df: Optional[DataFrame] = None
        self._sco_clo_df: Optional[DataFrame] = None
        self._cone_cache: dict[tuple[str, bool], DataFrame] = {}

    @classmethod
    def from_result(cls, res) -> "Reasoner":
        """Facade over a FixpointResult, store-aware: when the result came
        from a ``pred_partitioned`` run, const-predicate queries (closure/
        cone scans included) read the bucketed store and prune to the
        predicate's __pb partition instead of scanning all facts."""
        return cls(
            res.facts,
            facts_store=res.facts_store,
            term_dict=res.term_dict,
            salt=res.salt,
        )

    def invalidate(self, facts: Optional[DataFrame] = None) -> "Reasoner":
        """Drop memoized closure/cone structures, optionally swapping in a
        new facts snapshot (e.g. an incremental() result). Returns self."""
        if facts is not None:
            self.facts = facts
            self._store = None
        self._sco_edges_df = None
        self._sco_clo_df = None
        self._cone_cache = {}
        return self

    # -- helpers -----------------------------------------------------------
    def _term_key(self, t: str):
        """The store-representation key for an encoded term: a foldable
        xxhash64 literal in id mode (constant-folds, so the __pb comparison
        prunes partitions at planning time), the string itself otherwise."""
        from arachne_spark.dictionary import term_id_col

        if self._term_dict is not None:
            return term_id_col(F.lit(t), self._salt)
        return F.lit(t)

    def _po_store(self, p: str, o: Optional[str]) -> DataFrame:
        """Const-predicate selection over the bucketed store: filter to the
        predicate's __pb bucket (partition pruning — 1/PB_BUCKETS of the
        files) + the predicate key, then decode back to encoded strings."""
        from arachne_spark.engine import PB_BUCKETS, _pb_of_const

        pk = self._term_key(p)
        bucket = (
            F.pmod(pk, F.lit(PB_BUCKETS))
            if self._term_dict is not None
            else _pb_of_const(p)
        )
        sel = self._store.filter(
            (F.col("__pb") == bucket) & (F.col("p") == pk)
        )
        if o is not None:
            sel = sel.filter(F.col("o") == self._term_key(o))
        if self._term_dict is None:
            return sel.select(*TRIPLE_COLS)
        d = self._term_dict
        out = sel.join(
            d.select(F.col("id").alias("s"), F.col("term").alias("__s")), on="s"
        )
        if o is None:
            out = out.join(
                d.select(F.col("id").alias("o"), F.col("term").alias("__o")),
                on="o",
            ).select(
                F.col("__s").alias("s"), F.lit(p).alias("p"), F.col("__o").alias("o")
            )
        else:
            out = out.select(
                F.col("__s").alias("s"), F.lit(p).alias("p"), F.lit(o).alias("o")
            )
        return out

    def _po(self, p: str, o: Optional[str] = None) -> DataFrame:
        if self._store is not None:
            return self._po_store(p, o)
        df = self.facts.filter(F.col("p") == p)
        if o is not None:
            df = df.filter(F.col("o") == o)
        return df

    # -- Q1/Q2: getInstances (ArachneOWLReasoner.scala:74-101) --------------
    def instances(self, cls: str, direct: bool = False) -> DataFrame:
        """Named individuals of class `cls` (raw IRI). direct=True filters out
        individuals that hold the indirect_type marker for the class (Q2,
        FILTER NOT EXISTS -> left_anti)."""
        c = encode_iri(cls)
        inst = (
            self._po(_TYPE, c)
            .filter(F.col("s").startswith("<"))  # FILTER(isIRI(?s))
            .select("s")
            .distinct()
        )
        if direct:
            indirect = self._po(_IND, c).select("s")
            inst = inst.join(indirect, on="s", how="left_anti")
        return inst

    # -- Q3: getTypes (ArachneOWLReasoner.scala:245-276) --------------------
    def types(self, ind: str, direct: bool = False) -> DataFrame:
        i = encode_resource(ind)
        t = (
            self._po(_TYPE).filter(F.col("s") == i)
            .filter(F.col("o").startswith("<"))  # FILTER(isIRI(?o)) (:254)
            .filter(F.col("o") != _NAMED)  # FILTER(?o != owl:NamedIndividual)
            .select(F.col("o").alias("cls"))
            .distinct()
        )
        if direct:
            ind_types = (
                self._po(_IND).filter(F.col("s") == i)
                .select(F.col("o").alias("cls"))
            )
            t = t.join(ind_types, on="cls", how="left_anti")
        return t

    # -- Q4/Q5: sub/superclass property paths (ArachneOWLReasoner.scala:159-223)
    def _sco_edges(self) -> DataFrame:
        """subClassOf edge relation, materialized once per facade instance."""
        if self._sco_edges_df is None:
            self._sco_edges_df = (
                self._po(_SCO)
                .select(F.col("s").alias("src"), F.col("o").alias("dst"))
                .distinct()
                .localCheckpoint(eager=True)
            )
        return self._sco_edges_df

    def _sco_closure(self) -> DataFrame:
        """GLOBAL closure of the whole subClassOf graph — memoized; only for
        callers that genuinely need all pairs. The anchored facade queries
        (subclasses/superclasses) never compute this."""
        if self._sco_clo_df is None:
            self._sco_clo_df = transitive_closure(self._sco_edges()).localCheckpoint(
                eager=True
            )
        return self._sco_clo_df

    def _anchored_closure(self, seed: str, *, reverse: bool) -> DataFrame:
        """Seed-anchored reachability cone over subClassOf edges — the shape
        of the reference query (`?s rdfs:subClassOf+ <C>` is anchored at C,
        ArachneOWLReasoner.scala:179). The frontier/visited sets are
        cone-sized and BROADCAST into each hop join, so the edge relation is
        scanned (map-side) but never shuffled, and only the cone reachable
        from the seed is ever materialized — unlike a global
        doubling-closure, which is quadratic-ish in the whole class graph.
        reverse=True walks edges dst->src (descendants); False walks src->dst
        (ancestors). Results are memoized per (seed, direction).
        Returns one `cls` column (seed excluded)."""
        key = (seed, reverse)
        if key in self._cone_cache:
            return self._cone_cache[key]
        edges = self._sco_edges()
        probe, out = ("dst", "src") if reverse else ("src", "dst")
        spark = self.facts.sparkSession
        visited = spark.createDataFrame([(seed,)], "cls string").localCheckpoint(
            eager=True
        )
        frontier = visited
        while not frontier.isEmpty():
            hop = (
                edges.join(
                    F.broadcast(frontier), on=edges[probe] == frontier["cls"]
                )
                .select(F.col(out).alias("cls"))
                .distinct()
            )
            frontier = hop.join(
                F.broadcast(visited), on="cls", how="left_anti"
            ).localCheckpoint(eager=True)
            if frontier.isEmpty():
                break
            visited = visited.unionByName(frontier).localCheckpoint(eager=True)
        # seed ⊑+ seed holds iff an edge leaves the seed back into the cone
        # (mutual-subClassOf cycle) — the `+` path semantics the global
        # closure gave; one bounded broadcast probe.
        seed_back = (
            edges.filter(F.col(out) == seed)
            .join(F.broadcast(visited), on=edges[probe] == visited["cls"], how="left_semi")
            .limit(1)
        )
        cone = visited if not seed_back.isEmpty() else visited.filter(F.col("cls") != seed)
        cone = cone.localCheckpoint(eager=True)
        self._cone_cache[key] = cone
        return cone

    def subclasses(self, cls: str, direct: bool = False) -> DataFrame:
        c = encode_iri(cls)
        if direct:
            return (
                self._po(_SCO, c)
                .filter(F.col("s").startswith("<"))  # FILTER(isIRI) (:169,:204)
                .select(F.col("s").alias("cls"))
                .distinct()
            )
        return (
            self._anchored_closure(c, reverse=True)
            .filter(F.col("cls").startswith("<"))
        )

    def superclasses(self, cls: str, direct: bool = False) -> DataFrame:
        c = encode_iri(cls)
        if direct:
            return (
                self._po(_SCO).filter(F.col("s") == c)
                .filter(F.col("o").startswith("<"))  # FILTER(isIRI) (:180)
                .select(F.col("o").alias("cls"))
                .distinct()
            )
        return (
            self._anchored_closure(c, reverse=False)
            .filter(F.col("cls").startswith("<"))
        )

    # -- Q6: getObjectPropertyValues (incl. inverse, :103-118) --------------
    def object_property_values(
        self, ind: str, prop: str, inverse: bool = False
    ) -> DataFrame:
        i, p = encode_resource(ind), encode_iri(prop)
        if inverse:
            # inverse path ^<p>: values are subjects with (?v p ind)
            return (
                self._po(p, i)
                .filter(F.col("s").startswith("<"))  # FILTER(isIRI(?s)) (:113)
                .select(F.col("s").alias("value"))
                .distinct()
            )
        return (
            self._po(p).filter(F.col("s") == i)
            .filter(F.col("o").startswith("<"))
            .select(F.col("o").alias("value"))
            .distinct()
        )

    # -- Q7: getDataPropertyValues (FILTER isLiteral, :120-137) --------------
    def data_property_values(self, ind: str, prop: str) -> DataFrame:
        i, p = encode_resource(ind), encode_iri(prop)
        return (
            self._po(p).filter(F.col("s") == i)
            .filter(F.col("o").startswith('"'))  # FILTER(isLiteral(?o))
            .select(F.col("o").alias("value"))
            .distinct()
        )

    # -- Q8: getSameIndividuals (unioned with self, :145-157) ---------------
    def same_individuals(self, ind: str) -> DataFrame:
        i = encode_resource(ind)
        spark = self.facts.sparkSession
        selfdf = spark.createDataFrame([(i,)], "ind string")
        sames = (
            self._po(_SAME).filter(F.col("s") == i)
            .filter(F.col("o").startswith("<"))  # FILTER(isIRI) (:152)
            .select(F.col("o").alias("ind"))
        )
        return sames.unionByName(selfdf).distinct()

    # -- Q9: getDifferentIndividuals (:60-72) --------------------------------
    def different_individuals(self, ind: str) -> DataFrame:
        i = encode_resource(ind)
        return (
            self._po(_DIFF).filter(F.col("s") == i)
            .filter(F.col("o").startswith("<"))  # FILTER(isIRI) (:67)
            .select(F.col("o").alias("ind"))
            .distinct()
        )

    # -- Q10: isConsistent (ASK ?s type owl:Nothing, negated; :280-291) ------
    def is_consistent(self) -> bool:
        return self._po(_TYPE, _NOTHING).limit(1).isEmpty()

    # -- Q11/Q12: isEntailed (:293-315) ---------------------------------------
    def is_entailed(self, s: str, p: str, o: str) -> bool:
        """Exact encoded triple present? (ASK)"""
        return not (
            self._po(p, o).filter(F.col("s") == s).limit(1).isEmpty()
        )

    def all_entailed(self, axioms: DataFrame) -> bool:
        """Set version as ONE query (the reference's TODO at :315): anti-join
        the axiom triples against facts; entailed iff no survivor."""
        return axioms.select(*TRIPLE_COLS).join(
            self.facts, on=list(TRIPLE_COLS), how="left_anti"
        ).limit(1).isEmpty()

    # -- Q13: generic query runners (:319-338) --------------------------------
    def select_bgp(self, patterns: Sequence[Atom]) -> DataFrame:
        """SPARQL basic-graph-pattern SELECT: self-joins of the facts view via
        the rule-body compiler; result columns are the variable names."""
        return compile_body([self.facts] * len(patterns), list(patterns))

    def ask_bgp(self, patterns: Sequence[Atom]) -> bool:
        return not self.select_bgp(patterns).limit(1).isEmpty()

    def construct_bgp(
        self, where: Sequence[Atom], template: Sequence[Atom]
    ) -> DataFrame:
        bound = self.select_bgp(where)
        return apply_head(bound, list(template)).distinct()

    def sparql(self, query: str):
        """SPARQL TEXT surface (Q13): parse a SPARQL string (BGP subset —
        see arachne_spark.sparql) and execute it through the same atom API
        as select_bgp/ask_bgp/construct_bgp. Mirrors the reference's ARQ
        entry points (ref ArachneOWLReasoner.scala:319-338: executeSelect/
        executeConstruct/executeAsk over the inferred model). Returns a
        DataFrame (SELECT/CONSTRUCT) or bool (ASK)."""
        from arachne_spark.sparql import execute_sparql

        return execute_sparql(self, query)

    def create_view(self, name: str = "facts") -> None:
        """Register the facts for spark.sql(...) — the general query surface."""
        self.facts.createOrReplaceTempView(name)

    # -- Q14: the ~25 OWLReasoner methods the reference leaves ??? ----------
    def __getattr__(self, item):
        _unsupported = {
            "equivalent_classes",
            "disjoint_classes",
            "equivalent_properties",
            "disjoint_properties",
            "sub_properties",
            "super_properties",
            "unsatisfiable_classes",
        }
        if item in _unsupported:
            raise NotImplementedError(
                f"{item} is unsupported, matching the reference "
                "(ArachneOWLReasoner.scala:190-241,340-378 leave these ???)"
            )
        raise AttributeError(item)
