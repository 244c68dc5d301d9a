"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — broadcast the (small) query set
  against the corpus; dot products are native ``zip_with``/``aggregate``
  expressions (JVM, codegen), one shuffle for the per-query top-k window.
- ``lsh_topk``: random-hyperplane LSH — signature bucketing prunes the
  candidate set; the scale path when queries × corpus is too big to brute
  force.  Recall < 1.0 by construction; raise num_planes/probes for more.
- ``ivf_topk``: IVF-style coarse quantizer — deterministic centroid sample,
  assign corpus to nearest centroid (one pass), probe the ``nprobe`` nearest
  centroids per query.

All math in double precision, deterministic, no RNG at runtime (hyperplanes
are seeded numpy constants shipped as literals).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k by cosine.  The query side is broadcast —
    corpus is scanned once, never shuffled until the (tiny) top-k window.
    Output: (query_id, neighbor_id, cosine, rank)."""
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qv")
        )
    )
    c = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("_cv"))
    scored = c.crossJoin(q).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(num_planes, dim).round(6).tolist()


def hyperplane_signature(vec: Column, dim: int, num_planes: int = 12, seed: int = 42) -> Column:
    """Random-hyperplane (SRP) signature: bit i = sign(vec · plane_i).
    Returns a bigint bucket key."""
    planes = _hyperplanes(dim, num_planes, seed)
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        bits.append(bit.cast("bigint") * F.lit(1 << i).cast("bigint"))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    num_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: compare only within matching SRP buckets.
    Same output shape as cosine_topk (ranks within retrieved candidates)."""
    from .dedup import dim_hint

    dim = dim_hint(corpus, corpus_vec)
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("_cv"),
        hyperplane_signature(F.col(corpus_vec), dim, num_planes, seed).alias("_sig"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("query_id"),
            F.col(query_vec).alias("_qv"),
            hyperplane_signature(F.col(query_vec), dim, num_planes, seed).alias("_sig"),
        )
    )
    scored = c.join(q, "_sig").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """IVF-flat style ANN: centroids = deterministic corpus sample (every
    (n/n_centroids)-th row by id — no RNG), corpus assigned to nearest
    centroid once, queries probe the nprobe nearest centroid cells.
    """
    # Deterministic centroid "sample" without a global sort: hash-select
    # ~n_centroids rows, rank the (tiny) survivor set by id, keep the first
    # n_centroids.  (No bare ``limit`` — that picks partition-order-dependent
    # rows and breaks run-to-run determinism.)
    total = corpus.count()
    stride = max(total // n_centroids, 1)
    sampled = corpus.where(
        F.pmod(F.abs(F.xxhash64(F.col(corpus_id))), F.lit(stride)) == 0
    )
    w_cent = Window.orderBy(F.col(corpus_id))  # ~n_centroids rows — trivial
    centroids = (
        sampled.select(
            (F.row_number().over(w_cent) - 1).alias("centroid_id"),
            F.col(corpus_vec).alias("_cent"),
        )
        .where(F.col("centroid_id") < n_centroids)
    )
    cb = F.broadcast(centroids)

    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("_cv")
    ).crossJoin(cb).select(
        "neighbor_id",
        "_cv",
        "centroid_id",
        (1 - cosine(F.col("_cv"), F.col("_cent"))).alias("_d"),
    )
    w_assign = Window.partitionBy("neighbor_id").orderBy(F.col("_d").asc(), F.col("centroid_id").asc())
    assigned = (
        c.withColumn("_rn", F.row_number().over(w_assign))
        .where(F.col("_rn") == 1)
        .select("neighbor_id", "_cv", "centroid_id")
    )

    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qv")
    ).crossJoin(cb).select(
        "query_id",
        "_qv",
        "centroid_id",
        (1 - cosine(F.col("_qv"), F.col("_cent"))).alias("_d"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.col("_d").asc(), F.col("centroid_id").asc())
    probes = F.broadcast(
        q.withColumn("_rn", F.row_number().over(w_probe))
        .where(F.col("_rn") <= nprobe)
        .select("query_id", "_qv", "centroid_id")
    )

    scored = assigned.join(probes, "centroid_id").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cosine"),
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= k)
    )
