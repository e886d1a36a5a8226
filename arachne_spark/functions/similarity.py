"""Similarity search over an embedding column (array<float>).

- cosine_topk: brute-force baseline — broadcast the (small) query set, one
  pass over the corpus, per-query top-k via window. The dot product runs in
  Catalyst higher-order functions (zip_with + aggregate), all doubles, fixed
  left-to-right summation so results are bit-reproducible (and match the
  DuckDB oracle's list_dot_product on DOUBLE[]).
- IVF (scale path): assign each vector to its nearest of C centroids
  (coarse quantizer); search probes only the query's nprobe nearest
  centroid buckets, turning all-pairs into bucket-local joins. Centroids are
  taken deterministically (first C vectors by id) — at real scale you'd feed
  k-means centroids in; the partitioning/plumbing is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from arachne_spark.functions._parallel import fan_out


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_sim(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(qid, vec_id, rank, sim): top-k cosine neighbors per query vector.
    Queries are broadcast; ties break on neighbor id (deterministic)."""
    q = queries.select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qe")
    )
    # per-(query, vector) dot products are compute-amplifying; the broadcast
    # cross join streams the corpus map-only, so fanning the (one-file-scan)
    # corpus parallelizes the scoring (guide §2.5; 0.95 s -> 0.39 s sf0.1)
    c = fan_out(corpus).select(F.col(id_col), _as_double(F.col(vec_col)).alias("e"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("qid"))
        .withColumn("sim", cosine_sim(F.col("qe"), F.col("e")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", id_col, "rank", F.round("sim", 4).alias("sim"))
    )


def _default_centroids(
    corpus: DataFrame, n_centroids: int, id_col: str, vec_col: str
) -> DataFrame:
    """Deterministic default centroids: vectors with id < n_centroids. This is
    a FILTER (pushed to the scan), not a global sort — orderBy(id).limit(C)
    would totally order the corpus just to pick C rows. At real scale pass
    k-means centroids via the `centroids` parameter instead; the
    partitioning/plumbing is identical."""
    cents = corpus.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), _as_double(F.col(vec_col)).alias("ce")
    )
    # the id<C filter assumes dense 0-based ids; with an offset/UUID-derived
    # id space it silently selects nothing — fall back to the deterministic
    # top-C-by-id selection (bounded: C rows through a TakeOrdered, not a
    # global sort of the corpus) rather than return empty results
    if cents.limit(1).count() == 0:
        cents = corpus.orderBy(id_col).limit(n_centroids).select(
            F.col(id_col).alias("cid"), _as_double(F.col(vec_col)).alias("ce")
        )
    return cents


def ivf_assign(
    corpus: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, centroid_id): nearest-centroid bucket per vector. Centroids
    are caller-supplied (cid, ce double-array) or the deterministic id-filter
    default; always broadcast."""
    cents = (
        centroids
        if centroids is not None
        else _default_centroids(corpus, n_centroids, id_col, vec_col)
    )
    # centroids derive from the RAW corpus above (pushed-down id filter);
    # only the scored side fans out, so the centroid probe never executes
    # the repartition
    c = fan_out(corpus).select(F.col(id_col), _as_double(F.col(vec_col)).alias("e"))
    scored = c.crossJoin(F.broadcast(cents)).withColumn(
        "sim", cosine_sim(F.col("ce"), F.col("e"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col("cid").alias("centroid_id"))
    )


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via random-hyperplane LSH.

    Each vector gets a sign-bit signature over ``n_planes`` deterministic
    pseudo-random hyperplanes (hash-seeded per dimension — engine-independent,
    reproducible in SQL); candidate pairs share the FULL signature bucket
    (SimHash property: P[sign match] = 1 - angle/pi per plane, so
    high-cosine pairs collide with high probability), then exact cosine
    verifies candidates. The join key is the signature — bucket-local,
    never all-pairs; at 100 TB the bucket join is one shuffle on a
    single long column.

    Emits (id_a, id_b, sim) with id_a < id_b and sim >= threshold.
    """
    # n_planes md5-seeded dot products per row: the module's heaviest
    # projection — fan a one-file corpus scan across cores (guide §2.5)
    c = fan_out(corpus).select(F.col(id_col), _as_double(F.col(vec_col)).alias("e"))
    # Plane p's normal vector: md5-hash-seeded coefficients in [-1, 1) per
    # dimension — engine-independent (the DuckDB oracle computes identical
    # md5 strings), and each dot product runs as a FIXED left-to-right
    # aggregate so the double summation (hence every sign bit) is
    # bit-reproducible; a groupBy sum would have nondeterministic partial
    # order. One projection per vector, no explode, no shuffle to sign.
    def plane_coeffs(p: int):
        return F.transform(
            F.sequence(F.lit(0), F.size(F.col("e")) - 1),
            lambda d: (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.lit(str(seed)),
                                F.lit(str(p)),
                                d.cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % 2000003
            )
            / 1000003.0
            - 1.0,
        )

    sig = None
    for p in range(n_planes):
        bit = F.when(
            _dot(F.col("e"), plane_coeffs(p)) >= 0, F.lit(1).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, p)
        sig = term if sig is None else sig.bitwiseXOR(term)
    bucketed = c.withColumn("sig", sig).localCheckpoint(eager=True)
    a = bucketed.select(F.col(id_col).alias("id_a"), F.col("e").alias("ea"), "sig")
    b = bucketed.select(F.col(id_col).alias("id_b"), F.col("e").alias("eb"), "sig")
    return (
        a.join(b, on="sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(cosine_sim(F.col("ea"), F.col("eb")), 4))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
        .distinct()
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's nprobe nearest
    centroid buckets. The corpus-side join key is centroid_id, so the search
    is bucket-local — the 100 TB scale path."""
    cents = (
        centroids
        if centroids is not None
        else _default_centroids(corpus, n_centroids, id_col, vec_col)
    )
    assign = ivf_assign(corpus, n_centroids, id_col, vec_col, centroids=cents)
    # fan the probe-scored side too: assign broadcasts, so the corpus streams
    # map-only into the per-candidate scoring at full parallelism
    bucketed = fan_out(corpus).join(assign, id_col)
    q = queries.select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qe")
    )
    qprobe = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("csim", cosine_sim(F.col("qe"), F.col("ce")))
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("qid").orderBy(F.col("csim").desc(), F.col("cid")))
        )
        .filter(F.col("rn") <= nprobe)
        .select("qid", "qe", F.col("cid").alias("centroid_id"))
    )
    scored = (
        bucketed.join(F.broadcast(qprobe), on="centroid_id")
        .filter(F.col(id_col) != F.col("qid"))
        .withColumn("sim", cosine_sim(F.col("qe"), _as_double(F.col(vec_col))))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", id_col, "rank", F.round("sim", 4).alias("sim"))
    )


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding column — the real
    centroid source for the IVF scale path (ivf_assign/ivf_topk accept the
    result via ``centroids=``).

    Per iteration: one broadcast-centroid assignment pass over the corpus
    (map-only) + one elementwise-mean aggregation (posexplode to (cid, dim)
    -> avg -> reassemble). k and dim are small, so every shuffle is
    k x dim-sized; the corpus is only ever scanned, never shuffled.
    Deterministic: init = vectors with id < k; ties in assignment break on
    centroid id (row_number ordering in ivf_assign)."""
    cents = _default_centroids(corpus, k, id_col, vec_col).localCheckpoint(eager=True)
    c = corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("e"))
    for _ in range(iters):
        assign = ivf_assign(c, id_col=id_col, vec_col="e", centroids=cents)
        dims = (
            c.join(assign, on=id_col)
            .select("centroid_id", F.posexplode(F.col("e")).alias("d", "x"))
            .groupBy("centroid_id", "d")
            .agg(F.avg("x").alias("m"))
        )
        cents = (
            dims.groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "m"))),
                    lambda s: s.getField("m"),
                ).alias("ce")
            )
            .select(F.col("centroid_id").alias("cid"), "ce")
            .localCheckpoint(eager=True)
        )
    return cents
