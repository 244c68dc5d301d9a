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
    Output: (query_id, neighbor_id, cosine, rank).

    Norms are aliased in their own projection so each side's ‖v‖ is folded
    ONCE per row, not once per (query, corpus) pair — higher-order array
    folds are interpreted (outside codegen), so eliminating redundant folds
    is the whole ballgame.  Values are bit-identical (same fold order)."""
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qv")
        ).select("query_id", "_qv", norm(F.col("_qv")).alias("_qn"))
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("_cv")
    ).select("neighbor_id", "_cv", norm(F.col("_cv")).alias("_cn"))
    scored = c.crossJoin(q).select(
        "query_id",
        "neighbor_id",
        F.round(
            dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 6
        ).alias("cosine"),
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


def _lit_json(value, ddl: str) -> Column:
    """A large constant as ONE expression: from_json of a literal string.
    Catalyst constant-folds it (zero per-row cost), and building it costs a
    single py4j call instead of one per element — constructing hundreds of
    nested ``F.lit`` columns client-side dominated ANN plan-build time.
    ``json.dumps`` emits shortest-round-trip decimals, so parsed doubles are
    bit-identical to ``F.lit(float)``."""
    import json

    return F.from_json(F.lit(json.dumps(value)), ddl)


def hyperplane_signature(vec: Column, dim: int, num_planes: int = 12, seed: int = 42) -> Column:
    """Random-hyperplane (SRP) signature: bit i = sign(vec · plane_i).
    Returns a bigint bucket key.  The plane matrix ships as one folded
    constant; per-plane bits are summed with the same left-fold arithmetic
    as the previous unrolled form (identical values)."""
    planes = _hyperplanes(dim, num_planes, seed)
    planes_lit = _lit_json(planes, "array<array<double>>")
    zero = F.lit(0).cast("bigint")
    bits = F.transform(
        planes_lit,
        # shiftleft needs a literal bit count — 2.0**i is exact in double for
        # i ≤ 52, far above any plane count, so the cast is lossless
        lambda p, i: F.when(
            dot(vec, p) >= 0,
            F.pow(F.lit(2.0), i).cast("bigint"),
        ).otherwise(zero),
    )
    return F.aggregate(bits, zero, lambda acc, x: acc + x)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    num_planes: int = 8,
    bands: int = 4,
    seed: int = 42,
    dim: "int | None" = None,
) -> DataFrame:
    """Approximate top-k: compare only within matching SRP buckets.
    Same output shape as cosine_topk (ranks within retrieved candidates).
    Pass ``dim`` (embedding width) to skip the one-row metadata probe job.

    Band-amplified like ``embedding_near_duplicates``: ``bands`` independent
    ``num_planes``-bit signatures (band b seeded ``seed + 1000*b``, the
    EMBED_BAND_SEED_STRIDE rule) OR'd together — a corpus row is a candidate
    for a query if they collide in ANY band, then candidates are united,
    deduped and exactly scored before the per-query top-k window.  A single
    8-plane signature caps candidate probability at ~0.43 for cosine-0.95
    neighbors (0.90⁸); 4 bands lift it to ~0.90, 8 bands to ~0.99 — raise
    ``bands`` for higher recall at proportional signature cost."""
    from .dedup import EMBED_BAND_SEED_STRIDE, dim_hint

    if dim is None:
        dim = dim_hint(corpus, corpus_vec)

    def _banded(df, id_in, vec_in, id_out):
        sigged = df.select(
            F.col(id_in).alias(id_out), F.col(vec_in).alias("_v")
        ).select(
            id_out,
            "_v",
            norm(F.col("_v")).alias("_n"),
            *[
                hyperplane_signature(
                    F.col("_v"), dim, num_planes, seed + EMBED_BAND_SEED_STRIDE * b
                ).alias(f"_sig{b}")
                for b in range(bands)
            ],
        )
        return sigged.select(
            id_out,
            "_v",
            "_n",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"), F.col(f"_sig{b}").alias("bucket")
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("_e"),
        ).select(id_out, "_v", "_n", "_e.band", "_e.bucket")

    c = _banded(corpus, corpus_id, corpus_vec, "neighbor_id")
    q = F.broadcast(_banded(queries, query_id, query_vec, "query_id"))
    cand = (
        c.join(
            q.select(
                "query_id",
                F.col("_v").alias("_qv"),
                F.col("_n").alias("_qn"),
                "band",
                "bucket",
            ),
            ["band", "bucket"],
        )
        # a pair colliding in several bands must be scored (and ranked) once
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(
            dot(F.col("_qv"), F.col("_v")) / (F.col("_qn") * F.col("_n")), 6
        ).alias("cosine"),
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
        # Deterministic pseudo-random centroid sample in ONE bounded job:
        # global top-n_centroids by id-hash (tie-break id) compiles to
        # TakeOrderedAndProject — per-partition top-K, driver merges K rows.
        # No prior count() (the old stride derivation cost a full corpus
        # scan before any real work), no window, order-independent.
        centroids = [
            r["_cent"]
            for r in (
                corpus.select(
                    F.col(corpus_id).alias("_cid"),
                    F.col(corpus_vec).alias("_cent"),
                )
                .orderBy(F.xxhash64(F.col("_cid")).asc(), F.col("_cid").asc())
                .limit(n_centroids)
                .collect()  # bounded: n_centroids vectors
            )
        ]
    import math

    # centroid norms folded ONCE at plan-build time (Python left fold from 0 =
    # the exact summation order of norm()'s aggregate, so values are
    # bit-identical to computing them per row); the whole centroid table ships
    # as ONE folded constant (see _lit_json)
    cents_lit = _lit_json(
        [
            {
                "v": [float(x) for x in cent],
                "n": math.sqrt(sum(float(x) * float(x) for x in cent)),
                "cid": i,
            }
            for i, cent in enumerate(centroids)
        ],
        "array<struct<v:array<double>,n:double,cid:int>>",
    )

    def dist_structs(vec: Column, norm_col: Column) -> Column:
        # array<struct<d,cid>> — struct ordering = (distance asc, cid asc),
        # exactly the old window's tie-break.  Higher-order folds run
        # interpreted, so the row norm is aliased (folded once) and the
        # centroid norms are precomputed: n_centroids dot products per row,
        # not 3×n_centroids folds.
        return F.transform(
            cents_lit,
            lambda s: F.struct(
                (1 - dot(vec, s["v"]) / (norm_col * s["n"])).alias("d"),
                s["cid"].alias("cid"),
            ),
        )

    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("_cv")
    ).select("neighbor_id", "_cv", norm(F.col("_cv")).alias("_cn"))
    assigned = (
        c.select(
            "neighbor_id",
            "_cv",
            "_cn",
            dist_structs(F.col("_cv"), F.col("_cn")).alias("_dc"),
        )
        .select(
            "neighbor_id",
            "_cv",
            "_cn",
            F.array_min("_dc")["cid"].alias("centroid_id"),
        )
    )

    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qv")
    ).select("query_id", "_qv", norm(F.col("_qv")).alias("_qn"))
    probes = F.broadcast(
        q.select(
            "query_id",
            "_qv",
            "_qn",
            F.slice(
                F.array_sort(dist_structs(F.col("_qv"), F.col("_qn"))), 1, nprobe
            ).alias("_probe"),
        ).select(
            "query_id",
            "_qv",
            "_qn",
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
        F.round(
            dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 6
        ).alias("cosine"),
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w_rank)).where(
        F.col("rank") <= k
    )


def quantize_embedding(vec: Column) -> Column:
    """Symmetric int8 scalar quantization of an embedding — the standard
    4x storage/bandwidth lever for a 100 TB embedding table (floats only
    rematerialize on the (tiny) verified candidate set).

    Rule (deterministic, engine-neutral): scale = max(|x|)/127;
    q_i = floor(x_i/scale + 0.5) (round-half-toward-+inf — floor is
    bit-identical across engines, unlike banker's rounding); an all-zero
    vector gets scale 0 and all-zero codes.  Returns
    struct<scale:double, q:array<int>>.
    """
    absmax = F.aggregate(
        F.transform(vec, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    scale = absmax / F.lit(127.0)
    q = F.when(
        absmax == 0.0,
        F.transform(vec, lambda x: F.lit(0)),
    ).otherwise(
        F.transform(
            vec,
            lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int"),
        )
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_embedding(quant: Column) -> Column:
    """Inverse of ``quantize_embedding``: x̂_i = q_i · scale (array<double>)."""
    return F.transform(quant["q"], lambda qi: qi.cast("double") * quant["scale"])
