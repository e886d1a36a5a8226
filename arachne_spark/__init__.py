"""arachne_spark — a from-scratch PySpark-native knowledge-graph construction and
forward-chaining inference engine with the query/data-processing capabilities of
balhoff/arachne (reference surveyed in SURVEY.md).

The reference is a single-JVM Rete network (reference: src/main/scala/org/geneontology/
rules/engine/RuleEngine.scala); this engine re-expresses the same least-fixpoint
semantics as semi-naive Datalog evaluation over Spark DataFrames, designed for
multi-executor clusters and 100 TB-scale inputs.
"""

from arachne_spark.model import (
    TRIPLE_COLS,
    encode_bnode,
    encode_iri,
    encode_literal,
    decode_term,
)
from arachne_spark.rules import Var, Rule, RuleSet
from arachne_spark.engine import FixpointEngine, FixpointResult
from arachne_spark.owl2rules import owl_to_rules

__all__ = [
    "TRIPLE_COLS",
    "encode_iri",
    "encode_bnode",
    "encode_literal",
    "decode_term",
    "Var",
    "Rule",
    "RuleSet",
    "FixpointEngine",
    "FixpointResult",
    "owl_to_rules",
]

__version__ = "0.1.0"
