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
    centroids: "list[list[float]] | None" = None,
) -> DataFrame:
    """IVF-flat style ANN: centroids = deterministic corpus sample (every
    (n/n_centroids)-th row by id — no RNG), corpus assigned to nearest
    centroid once, queries probe the nprobe nearest centroid cells.

    Scale shape: the centroid table is tiny and becomes LITERALS in the
    corpus projection — each corpus row computes all ``n_centroids`` cosines
    in ONE whole-stage-codegen projection and takes the argmin with
    ``array_min`` over (distance, cid) structs.  Zero row amplification, zero
    shuffle before the final per-query top-k window (which ranks only the
    probed candidate set).  The previous crossJoin + row_number-over-
    neighbor_id formulation shuffled corpus×n_centroids rows just to compute
    a per-row argmin.

    ``centroids``: optional explicit centroid vectors (cid = list position);
    when None they are sampled deterministically from the corpus by id-hash.
    """
    if centroids is None:
        # Deterministic centroid "sample" without a global sort: hash-select
        # ~n_centroids rows, rank the (tiny) survivor set by id, keep the
        # first n_centroids.  (No bare ``limit`` — that picks partition-
        # order-dependent rows and breaks run-to-run determinism.)
        total = corpus.count()
        stride = max(total // n_centroids, 1)
        sampled = corpus.where(
            F.pmod(F.abs(F.xxhash64(F.col(corpus_id))), F.lit(stride)) == 0
        )
        w_cent = Window.orderBy(F.col(corpus_id))  # ~n_centroids rows — trivial
        centroids = [
            r["_cent"]
            for r in (
                sampled.select(
                    (F.row_number().over(w_cent) - 1).alias("centroid_id"),
                    F.col(corpus_vec).alias("_cent"),
                )
                .where(F.col("centroid_id") < n_centroids)
                .collect()  # bounded: n_centroids vectors
            )
        ]
    cent_arrays = [
        F.array(*[F.lit(float(x)) for x in cent]) for cent in centroids
    ]

    def dist_structs(vec: Column) -> Column:
        # array<struct<d,cid>> — struct ordering = (distance asc, cid asc),
        # exactly the old window's tie-break
        return F.array(
            *[
                F.struct(
                    (1 - cosine(vec, ca)).alias("d"),
                    F.lit(i).cast("int").alias("cid"),
                )
                for i, ca in enumerate(cent_arrays)
            ]
        )

    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("_cv")
    )
    # alias the distance array in its own select: it feeds array_min once but
    # keeping it a named projection keeps the plan readable and stops any
    # future second consumer from inlining the n_centroids dot products twice
    assigned = (
        c.select("neighbor_id", "_cv", dist_structs(F.col("_cv")).alias("_dc"))
        .select(
            "neighbor_id", "_cv", F.array_min("_dc")["cid"].alias("centroid_id")
        )
    )

    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qv")
    )
    probes = F.broadcast(
        q.select(
            "query_id",
            "_qv",
            F.slice(F.array_sort(dist_structs(F.col("_qv"))), 1, nprobe).alias(
                "_probe"
            ),
        ).select(
            "query_id",
            "_qv",
            F.explode(F.transform(F.col("_probe"), lambda s: s["cid"])).alias(
                "centroid_id"
            ),
        )
    )

    # (query, neighbor) pairs are unique by construction — a corpus row lives
    # in exactly one cell and a query probes nprobe distinct cells — so no
    # dedup (and no extra shuffle) is needed before ranking.
    scored = assigned.join(probes, "centroid_id").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cosine"),
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w_rank)).where(
        F.col("rank") <= k
    )
