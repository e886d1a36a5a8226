"""Deterministic synthetic code corpus + entity dictionary (FIXTURES.md §1-2).

The BASELINE.json input_hint table: code_files(repo, path, commit, lang,
content) — here generated *distributedly* with pure Catalyst expressions
(spark.range + deterministic modular arithmetic; no wall-clock, no RNG state),
so the same (n_files, seed) always yields byte-identical content at any
parallelism. Zipf-ish skew over repos comes from squaring a uniform index —
repo_0 gets ~sqrt(N) files, the long tail gets ~1 — giving the skew-handling
evidence the north rule asks for.

Ground truth: each file's class/function/import names are drawn from the
entity-dictionary name pools by index arithmetic, so extraction and linking
have exact expected outputs.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_CLASSES = 200
N_FUNCS = 300
N_MODULES = 100

LANGS = ["python", "scala", "java"]


def _name(kind: str, i) -> "F.Column":
    return F.concat(F.lit(kind.capitalize() + "_"), i.cast("string"))


def gen_code_files(spark: SparkSession, n_files: int, n_repos: int = 50) -> DataFrame:
    """code_files(repo, path, commit, lang, content, content_sha256)."""
    df = spark.range(n_files).withColumnRenamed("id", "fid")
    f = F.col("fid")
    # Zipf-ish repo skew: map uniform u in [0,1) through u^2
    u = (f % 997).cast("double") / 997.0
    repo_idx = F.floor(u * u * n_repos).cast("int")
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]), (f % 3 + 1).cast("int"))
    cls_i = f % N_CLASSES
    cls_j = (f * 7 + 3) % N_CLASSES
    fn_i = f % N_FUNCS
    fn_j = (f * 11 + 5) % N_FUNCS
    mod_i = f % N_MODULES
    cls_name = _name("class", cls_i)
    base_name = _name("class", cls_j)
    fn_name = _name("func", fn_i)
    callee = _name("func", fn_j)
    mod_name = F.concat(F.lit("module_"), mod_i.cast("string"))

    content = F.concat(
        F.lit("import "), mod_name, F.lit("\n\n"),
        F.lit("class "), cls_name, F.lit("("), base_name, F.lit("):\n"),
        F.lit("    def "), fn_name, F.lit("(self, x):\n"),
        F.lit("        return "), callee, F.lit("(x) + "), f.cast("string"), F.lit("\n"),
    )
    return (
        df.select(
            F.concat(F.lit("repo_"), F.lpad(repo_idx.cast("string"), 4, "0")).alias("repo"),
            F.concat(
                F.lit("src/pkg_"), (f % 13).cast("string"), F.lit("/mod_"), f.cast("string"),
                F.when(lang == "python", F.lit(".py"))
                .when(lang == "scala", F.lit(".scala"))
                .otherwise(F.lit(".java")),
            ).alias("path"),
            F.substring(F.sha2(F.concat(F.lit("commit"), f.cast("string")), 256), 1, 12).alias("commit"),
            lang.alias("lang"),
            content.alias("content"),
        )
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
    )


def gen_entity_dict(spark: SparkSession) -> DataFrame:
    """entity_dict(alias, canonical_iri, kind, prior) with seeded synonym
    clusters: every canonical name also gets a lowercase alias and an
    abbreviated alias, so canonicalization has known expected components."""
    rows = []

    def add(kind: str, n: int) -> None:
        for i in range(n):
            name = f"{kind.capitalize()}_{i}"
            iri = f"http://example.org/code/{kind}/{name}"
            prior = (hash_stable(name) % 1000) / 1000.0
            rows.append((name, iri, kind, 0.5 + prior / 2))
            rows.append((name.lower(), iri, kind, 0.3 + prior / 3))
            rows.append((name.replace("_", ""), iri, kind, 0.2 + prior / 4))

    add("class", N_CLASSES)
    add("func", N_FUNCS)
    for i in range(N_MODULES):
        name = f"module_{i}"
        iri = f"http://example.org/code/module/{name}"
        rows.append((name, iri, "module", 0.9))
    pdf = pd.DataFrame(rows, columns=["alias", "canonical_iri", "kind", "prior"])
    return spark.createDataFrame(pdf)


def hash_stable(s: str) -> int:
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:4], "big")
