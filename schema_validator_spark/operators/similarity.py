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
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column, dim: "int | None" = None) -> Column:
    """vec·vec.  With ``dim`` known the product chain unrolls into a FLAT
    native expression — higher-order folds are evaluated interpreted and
    kick the whole projection out of whole-stage codegen, so the unrolled
    form is the scale path (pass ``dim`` everywhere on hot paths).  The
    summation order is the identical left fold (((0+t₁)+t₂)+…), so doubles
    are bit-for-bit the same as the HOF form.  Vectors must be ``dim``
    long: missing components read NULL (``try_element_at``) and null the
    result, where the zip form would zip to the longer length."""
    if dim is None:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    expr = F.lit(0.0)
    for i in range(1, dim + 1):
        expr = expr + (
            F.try_element_at(a, F.lit(i)).cast("double")
            * F.try_element_at(b, F.lit(i)).cast("double")
        )
    return expr


def norm(a: Column, dim: "int | None" = None) -> Column:
    """‖vec‖ — same unrolled-when-dim-known contract as ``dot``."""
    if dim is None:
        return F.sqrt(
            F.aggregate(
                F.transform(a, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    expr = F.lit(0.0)
    for i in range(1, dim + 1):
        x = F.try_element_at(a, F.lit(i)).cast("double")
        expr = expr + x * x
    return F.sqrt(expr)


def cosine(a: Column, b: Column, dim: "int | None" = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    dim: "int | None" = None,
) -> DataFrame:
    """Exact brute-force top-k by cosine.  The query side is broadcast —
    corpus is scanned once, never shuffled until the (tiny) top-k window.
    Output: (query_id, neighbor_id, cosine, rank).

    Norms are aliased in their own projection so each side's ‖v‖ is folded
    ONCE per row, not once per (query, corpus) pair.  With ``dim`` known,
    norms and the pair dot run as vectorized Arrow-batch UDFs
    (``arrow_dot``/``arrow_norm`` — bit-identical values, same fold
    order); without it they fall back to interpreted HOF folds."""
    _norm = (lambda v: arrow_norm(v, dim)) if dim is not None else norm
    _dot = (
        (lambda a, b: arrow_dot(a, b, dim)) if dim is not None else dot
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qv")
        ).select("query_id", "_qv", _norm(F.col("_qv")).alias("_qn"))
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("_cv")
    ).select("neighbor_id", "_cv", _norm(F.col("_cv")).alias("_cn"))
    scored = c.crossJoin(q).select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
            6,
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


def hyperplane_signature(
    vec: Column, dim: int, num_planes: int = 12, seed: int = 42
) -> Column:
    """Random-hyperplane (SRP) signature: bit i = sign(vec · plane_i).
    Returns a bigint bucket key.  Ad-hoc Column form (interpreted HOF) —
    the banded hot paths use ``srp_band_signatures`` (one vectorized Arrow
    batch per task, bit-identical values) instead: a num_planes×dim flat
    native expression blows janino's 64 KB method limit and falls back to
    interpreted eval of the giant tree, the worst of both worlds."""
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


def srp_band_signatures(
    vec: Column,
    dim: int,
    num_planes: int,
    bands: int,
    seed: int,
    seed_stride: int,
) -> Column:
    """All ``bands`` SRP signatures AND the row norm in ONE vectorized
    pandas UDF: struct<sigs: array<bigint>, nrm: double> (band b seeded
    seed + stride·b) — the vectors cross the Arrow boundary once and every
    per-component pass over them happens in the same batch.

    This is the Arrow path the north rule prescribes for math the built-in
    operators can't express efficiently: a flat unrolled expression of
    bands×num_planes×dim terms exceeds janino's 64 KB method limit (whole-
    stage codegen disabled → interpreted tree walk, measured 15 s for 6k
    rows), while interpreted HOF lambdas cost ~300 µs/row at crawl scale.
    Here each Arrow batch does bands×dim vectorized fused multiply-adds.

    Bit-exactness with the SQL/HOF forms (and the DuckDB oracles): the
    accumulator is float64, starts at 0.0, and adds the j-th component term
    for ALL planes at step j — the identical left-fold summation order per
    (row, plane) — and float32 components widen to float64 exactly as
    Spark's cast does.  Degenerate rows (NULL or non-``dim``-length
    vectors) fingerprint to 0, matching the NULL-propagated HOF fold
    (NULL dot ⇒ every WHEN false ⇒ all bits 0).
    """
    from pyspark.sql.functions import pandas_udf

    planes = [
        np.array(_hyperplanes(dim, num_planes, seed + seed_stride * b)).astype(
            np.float64
        )
        for b in range(bands)
    ]
    weights = (np.int64(1) << np.arange(num_planes, dtype=np.int64))[None, :]

    @pandas_udf("sigs array<bigint>, nrm double")
    def _sigs(v: pd.Series) -> pd.DataFrame:
        n = len(v)
        out = np.zeros((n, bands), dtype=np.int64)
        nrm = pd.array(np.zeros(n), dtype="Float64")
        ok = np.array(
            [x is not None and len(x) == dim for x in v], dtype=bool
        )
        nrm[~ok] = pd.NA
        if ok.any():
            X = np.stack(v[ok].to_numpy()).astype(np.float64)
            acc_n = np.zeros(X.shape[0], dtype=np.float64)
            for j in range(dim):
                x = X[:, j]
                acc_n += x * x
            nrm[ok] = np.sqrt(acc_n)
            for b, P in enumerate(planes):
                acc = np.zeros((X.shape[0], num_planes), dtype=np.float64)
                for j in range(dim):
                    acc += X[:, j][:, None] * P[:, j][None, :]
                out[ok, b] = ((acc >= 0.0).astype(np.int64) * weights).sum(
                    axis=1
                )
        return pd.DataFrame({"sigs": pd.Series(list(out)), "nrm": nrm})

    return _sigs(vec)


def arrow_dot(a: Column, b: Column, dim: int) -> Column:
    """Pairwise vec·vec as a vectorized Arrow-batch UDF — the scoring/verify
    dot on candidate pairs.  Bit-identical to the HOF fold: float64
    accumulator adds component j for the whole batch at step j (same left
    fold); degenerate inputs (NULL / wrong-length) yield NULL like a
    NULL-propagated fold.  Chosen over a flat native chain because the
    unrolled trees cost ~1-2 s of driver analysis/codegen per query and
    risk janino's 64 KB method limit inside join stages."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dot(va: pd.Series, vb: pd.Series) -> pd.Series:
        n = len(va)
        ok = np.array(
            [
                x is not None and y is not None and len(x) == dim and len(y) == dim
                for x, y in zip(va, vb)
            ],
            dtype=bool,
        )
        out = pd.array(np.zeros(n), dtype="Float64")
        out[~ok] = pd.NA
        if ok.any():
            A = np.stack(va[ok].to_numpy()).astype(np.float64)
            B = np.stack(vb[ok].to_numpy()).astype(np.float64)
            acc = np.zeros(A.shape[0], dtype=np.float64)
            for j in range(dim):
                acc += A[:, j] * B[:, j]
            out[ok] = acc
        return pd.Series(out)

    return _dot(a, b)


def arrow_norm(vec: Column, dim: int) -> Column:
    """‖vec‖ as a vectorized Arrow-batch UDF — same contract/parity notes as
    ``arrow_dot``."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _norm(v: pd.Series) -> pd.Series:
        n = len(v)
        ok = np.array([x is not None and len(x) == dim for x in v], dtype=bool)
        out = pd.array(np.zeros(n), dtype="Float64")
        out[~ok] = pd.NA
        if ok.any():
            X = np.stack(v[ok].to_numpy()).astype(np.float64)
            acc = np.zeros(X.shape[0], dtype=np.float64)
            for j in range(dim):
                x = X[:, j]
                acc += x * x
            out[ok] = np.sqrt(acc)
        return pd.Series(out)

    return _norm(vec)


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
            srp_band_signatures(
                F.col("_v"), dim, num_planes, bands, seed, EMBED_BAND_SEED_STRIDE
            ).alias("_sn"),
        )
        return sigged.select(
            id_out,
            "_v",
            F.col("_sn.nrm").alias("_n"),
            F.posexplode("_sn.sigs").alias("band", "bucket"),
        )

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
            arrow_dot(F.col("_qv"), F.col("_v"), dim)
            / (F.col("_qn") * F.col("_n")),
            6,
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
    # bit-identical to computing them per row)
    cent_vecs = [[float(x) for x in cent] for cent in centroids]
    cent_norms = [
        math.sqrt(sum(float(x) * float(x) for x in cent)) for cent in centroids
    ]
    dim = len(centroids[0])

    # Centroid distances run as vectorized Arrow-batch UDFs (one matrix
    # sweep per batch): a flat n_centroids×dim native expression exceeds
    # janino's 64 KB method limit (codegen falls back to interpreting the
    # giant tree), and transform-over-centroids is interpreted outright.
    # Bit-exactness: float64 accumulators add the j-th component term for
    # all centroids at step j — the identical left fold as dot()/norm() —
    # so distances, argmin assignment (ties → smallest cid, same as the
    # (d asc, cid asc) struct ordering) and probe sets match the native
    # forms exactly.  Degenerate rows (NULL / wrong-length vectors) get a
    # NULL assignment and drop out of the join, like a NULL join key.
    from pyspark.sql.functions import pandas_udf

    C_T = np.array(cent_vecs, dtype=np.float64)  # (m, dim)
    CN = np.array(cent_norms, dtype=np.float64)

    def _distances(v: "pd.Series"):
        ok = np.array([x is not None and len(x) == dim for x in v], dtype=bool)
        if not ok.any():
            return ok, None
        X = np.stack(v[ok].to_numpy()).astype(np.float64)
        acc = np.zeros(X.shape[0], dtype=np.float64)
        D = np.zeros((X.shape[0], len(C_T)), dtype=np.float64)
        for j in range(dim):
            x = X[:, j]
            acc += x * x
            D += x[:, None] * C_T[:, j][None, :]
        d = 1.0 - D / (np.sqrt(acc)[:, None] * CN[None, :])
        return ok, d

    @pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        ok, d = _distances(v)
        out = pd.Series(np.zeros(len(v), dtype=np.int64), dtype="Int64")
        out[~ok] = pd.NA
        if d is not None:
            out[ok] = np.argmin(d, axis=1)
        return out

    @pandas_udf("array<int>")
    def _probe_cids(v: pd.Series) -> pd.Series:
        ok, d = _distances(v)
        out = pd.Series([None] * len(v), dtype=object)
        if d is not None:
            idx = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
            out[ok] = pd.Series(
                [row for row in idx.astype(np.int32)], index=out.index[ok]
            )
        return out

    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("_cv")
    ).select("neighbor_id", "_cv", arrow_norm(F.col("_cv"), dim).alias("_cn"))
    assigned = c.select(
        "neighbor_id",
        "_cv",
        "_cn",
        _assign(F.col("_cv")).alias("centroid_id"),
    )

    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qv")
    ).select("query_id", "_qv", arrow_norm(F.col("_qv"), dim).alias("_qn"))
    probes = F.broadcast(
        q.select(
            "query_id",
            "_qv",
            "_qn",
            F.explode(_probe_cids(F.col("_qv"))).alias("centroid_id"),
        )
    )

    # (query, neighbor) pairs are unique by construction — a corpus row lives
    # in exactly one cell and a query probes nprobe distinct cells — so no
    # dedup (and no extra shuffle) is needed before ranking.
    scored = assigned.join(probes, "centroid_id").select(
        "query_id",
        "neighbor_id",
        F.round(
            arrow_dot(F.col("_qv"), F.col("_cv"), dim)
            / (F.col("_qn") * F.col("_cn")),
            6,
        ).alias("cosine"),
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w_rank)).where(
        F.col("rank") <= k
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    sample_mod: "int | None" = None,
    dim: "int | None" = None,
) -> "list[list[float]]":
    """Sampled k-means (Lloyd) bootstrap for ``ivf_topk`` centroids
    (VERDICT r4 #6) — completes the operator for corpora whose id-hash
    sample makes poor cell boundaries.  Returns ``n_centroids`` vectors to
    pass as ``ivf_topk(centroids=...)``.

    Deterministic, no RNG: seeding is the same id-hash
    TakeOrderedAndProject rule ``ivf_topk`` uses; each Lloyd iteration
    assigns the (sampled) corpus to its nearest centroid by cosine distance
    — the metric ``ivf_topk`` probes with, so training optimizes the
    quantizer that is actually used (cell means need no normalization:
    cosine is scale-invariant) — and recomputes cell means.  Empty cells
    keep their previous centroid.

    Scale shape: ``sample_mod=p`` trains on a deterministic mod-p id-hash
    sample (quantizer quality needs a sample, not the corpus); per
    iteration ONE distributed job — Arrow-batch assignment (the shared
    ``ivf_topk`` kernel), ``posexplode`` of the sample's components, and a
    map-side-combined (cell, component) sum — with only
    ``n_centroids × dim`` aggregate rows ever reaching the driver.  Driver
    state is O(n_centroids·dim); the corpus is never collected."""
    from pyspark.sql.functions import pandas_udf

    src = corpus.select(
        F.col(corpus_id).alias("_id"), F.col(corpus_vec).alias("_v")
    )
    if sample_mod is not None and sample_mod > 1:
        src = src.where(F.pmod(F.xxhash64("_id"), F.lit(sample_mod)) == 0)
    # seed hygiene: NULL embeddings (failed embed-job rows — the same rows
    # the assignment UDF skips) and wrong-dim vectors must not become
    # centroids; pin the dim from the first healthy row when not given
    src = src.where(F.col("_v").isNotNull())
    if dim is not None:
        src = src.where(F.size("_v") == dim)
    seed_rows = (
        src.orderBy(F.xxhash64(F.col("_id")).asc(), F.col("_id").asc())
        .limit(n_centroids)
        .collect()
    )
    if not seed_rows:
        raise ValueError("train_ivf_centroids: empty corpus/sample")
    if dim is None:
        dim = len(seed_rows[0]["_v"])
        seed_rows = [r for r in seed_rows if len(r["_v"]) == dim]
    if len(seed_rows) < n_centroids:
        raise ValueError(
            f"train_ivf_centroids: only {len(seed_rows)} usable seed rows "
            f"for n_centroids={n_centroids} — shrink n_centroids, widen the "
            "sample (sample_mod), or pass dim= to filter ragged vectors "
            "before seeding"
        )
    cents = [[float(x) for x in r["_v"]] for r in seed_rows]

    for _ in range(max(0, iters)):
        C_T = np.array(cents, dtype=np.float64)  # (m, dim)
        CN = np.sqrt((C_T * C_T).sum(axis=1))

        @pandas_udf("int")
        def _assign(v: pd.Series) -> pd.Series:
            ok = np.array(
                [x is not None and len(x) == dim for x in v], dtype=bool
            )
            out = pd.Series(np.zeros(len(v), dtype=np.int64), dtype="Int64")
            out[~ok] = pd.NA
            if ok.any():
                X = np.stack(v[ok].to_numpy()).astype(np.float64)
                norms = np.sqrt((X * X).sum(axis=1))
                d = 1.0 - (X @ C_T.T) / (norms[:, None] * CN[None, :])
                out[ok] = np.argmin(d, axis=1)
            return out

        assigned = src.select(_assign(F.col("_v")).alias("_cid"), "_v").where(
            F.col("_cid").isNotNull()
        )
        comp = assigned.select("_cid", F.posexplode("_v")).toDF(
            "_cid", "_pos", "_x"
        )
        rows = (
            comp.groupBy("_cid", "_pos")
            .agg(
                F.sum(F.col("_x").cast("double")).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .collect()
        )
        new = [list(c) for c in cents]
        for r in rows:
            new[r["_cid"]][r["_pos"]] = r["_s"] / r["_n"]
        cents = new
    return cents


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
