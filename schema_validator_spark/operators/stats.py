"""Column statistics — single-pass profile aggregation.

Engine-level operator (SURVEY.md §2.B): null-rate, min/max, distinct estimate
(HyperLogLog++ via ``approx_count_distinct``), numeric moments, and histogram
sketches, all computed in ONE ``groupBy().agg(...)`` so the table is scanned
once regardless of how many columns are profiled.  At 100 TB this is the only
shape that works: partial aggregation happens map-side, the shuffle carries a
few hundred bytes per column per partition.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.LongType, T.IntegerType, T.ShortType, T.ByteType,
    T.DoubleType, T.FloatType, T.DecimalType,
)


def profile(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    group_by: Sequence[str] = (),
    exact_distinct: bool = False,
) -> DataFrame:
    """One row per group with per-column stats:
    ``<col>_count, <col>_nulls, <col>_null_rate, <col>_min, <col>_max,
    <col>_distinct`` (+ ``_mean/_stddev`` for numerics).

    Column pruning: only profiled columns are read from the scan.
    """
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    columns = list(columns or [c for c in df.columns if c not in group_by])
    total = F.count(F.lit(1)).alias("row_count")
    aggs = [total]
    for c in columns:
        col = F.col(c)
        nulls = F.sum(col.isNull().cast("long"))
        aggs += [
            F.count(col).alias(f"{c}_count"),
            nulls.alias(f"{c}_nulls"),
            (nulls / F.count(F.lit(1))).alias(f"{c}_null_rate"),
            F.min(col).alias(f"{c}_min"),
            F.max(col).alias(f"{c}_max"),
            (
                F.countDistinct(col) if exact_distinct else F.approx_count_distinct(col)
            ).alias(f"{c}_distinct"),
        ]
        if isinstance(dtypes.get(c), _NUMERIC):
            aggs += [
                F.avg(col).alias(f"{c}_mean"),
                F.stddev(col).alias(f"{c}_stddev"),
            ]
    if group_by:
        return df.groupBy(*[F.col(g) for g in group_by]).agg(*aggs)
    return df.agg(*aggs)


def numeric_histogram(
    df: DataFrame, column: str, lo: float, hi: float, nbuckets: int = 20
) -> DataFrame:
    """Equi-width histogram via ``width_bucket`` + hash-agg count.

    Bucket 0 = below ``lo``, bucket ``nbuckets+1`` = above ``hi`` (width_bucket
    convention); NULLs are dropped.  Output: (bucket: int, cnt: long) — tiny,
    safe to collect for drift computation.
    """
    return (
        df.where(F.col(column).isNotNull())
        .select(
            F.width_bucket(
                F.col(column).cast("double"), F.lit(float(lo)), F.lit(float(hi)), F.lit(nbuckets)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def length_histogram(
    df: DataFrame, column: str, lo: float = 0.0, hi: float = 2000.0, nbuckets: int = 20
) -> DataFrame:
    """Text-length histogram (drift target for `text` columns)."""
    return numeric_histogram(
        df.select(F.length(F.col(column)).cast("double").alias(column)),
        column, lo, hi, nbuckets,
    )


def approx_quantiles(
    df: DataFrame, column: str, probabilities: Sequence[float], rel_err: float = 0.001
) -> list[float]:
    """KLL-style quantile sketch via percentile_approx (single pass)."""
    return df.approxQuantile(column, list(probabilities), rel_err)


def iqr_outliers(
    df: DataFrame,
    column: str,
    k: float = 1.5,
    exact: bool = True,
    rel_err: float = 0.001,
) -> DataFrame:
    """Tukey-fence outlier diagnostic — the numeric data-quality gate that
    catches corrupted feeds (unit changes, sentinel values, truncation) that
    min/max and null-rate miss.  q1/q3 of the column, fences
    q1 − k·IQR / q3 + k·IQR, and the row counts beyond each fence.
    Output (1 row): (col_name, q1, q3, lo_fence, hi_fence, n_rows, n_low,
    n_high, outlier_rate).  NULLs are excluded.

    ``exact=True`` uses the exact ``percentile`` aggregate — on integer
    columns the linear interpolation lands on binary-exact quarters, so the
    fences and counts are bit-reproducible by any engine (the oracle path).
    ``exact=False`` swaps in ``percentile_approx`` (one sketch pass) — the
    100 TB default, where an exact percentile's full sort is not worth a
    diagnostic.

    Scale shape: TWO aggregations (the fences must be literals before the
    count pass) — each map-side combined, each shipping O(1) state; no
    shuffle of the data itself."""
    col = F.col(column)
    src = df.where(col.isNotNull())
    if exact:
        qs = src.agg(
            F.percentile(col, 0.25).alias("q1"),
            F.percentile(col, 0.75).alias("q3"),
        ).first()
    else:
        qs = src.agg(
            F.percentile_approx(col, 0.25, int(1.0 / rel_err)).alias("q1"),
            F.percentile_approx(col, 0.75, int(1.0 / rel_err)).alias("q3"),
        ).first()
    if qs["q1"] is None:
        q1 = q3 = lo = hi = None
    else:
        q1, q3 = float(qs["q1"]), float(qs["q3"])
        iqr = q3 - q1
        lo, hi = q1 - k * iqr, q3 + k * iqr
    counts = src.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(
            F.sum((col < F.lit(lo)).cast("long")), F.lit(0)
        ).alias("n_low"),
        F.coalesce(
            F.sum((col > F.lit(hi)).cast("long")), F.lit(0)
        ).alias("n_high"),
    )
    return counts.select(
        F.lit(column).alias("col_name"),
        F.lit(q1).cast("double").alias("q1"),
        F.lit(q3).cast("double").alias("q3"),
        F.lit(lo).cast("double").alias("lo_fence"),
        F.lit(hi).cast("double").alias("hi_fence"),
        "n_rows",
        "n_low",
        "n_high",
        F.round(
            (F.col("n_low") + F.col("n_high"))
            / F.greatest(F.col("n_rows"), F.lit(1)),
            6,
        ).alias("outlier_rate"),
    )


#: Benford's-law expected first-digit probabilities log10(1 + 1/d) — Python
#: doubles embedded as literals on BOTH engine sides, so the comparison
#: arithmetic is identical.
import math as _math

BENFORD_P = {d: _math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def benford_check(df: DataFrame, column: str) -> DataFrame:
    """Benford's-law first-digit audit for a positive numeric column — the
    classic detector for fabricated, truncated, or unit-corrupted numeric
    feeds (natural multi-scale quantities follow log10(1+1/d); sentinel
    floods and capped values do not).  Output: 9 rows (digit, n,
    observed_p, expected_p, deviation), NULL and non-positive values
    excluded.  The first digit is the first SIGNIFICANT digit of the
    decimal string rendering — the first ``[1-9]`` character — so
    fractional values in (0, 1) report their leading significant digit
    (0.00123 → '1') instead of a spurious truncated-to-zero row, and the
    extraction is exact on every engine (no log10 float boundary at powers
    of ten, no engine-specific integer-cast rounding).

    100 TB shape: ONE map-side-combined aggregation to ≤ 9 digit counts;
    the share/deviation math runs in a 9-row projection (a tiny window
    computes the total — never a second scan)."""
    from pyspark.sql import Window

    # First significant digit from the value's own string rendering: a
    # bigint cast would truncate (0, 1) values to digit '0' (NULL
    # expected_p, a 10th row) and Spark's truncating double→bigint cast
    # diverges from round-half-away engines.  Any positive value's
    # rendering contains a nonzero digit, so the extract never misses.
    digit = F.regexp_extract(F.col(column).cast("string"), "[1-9]", 0)
    src = df.where(F.col(column).isNotNull() & (F.col(column) > 0))
    counts = src.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = F.sum("n").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    expected = F.lit(None).cast("double")
    for d in range(9, 0, -1):
        expected = F.when(
            F.col("digit") == str(d), F.lit(BENFORD_P[d])
        ).otherwise(expected)
    obs = F.col("n") / total
    return counts.select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        F.round(obs, 6).alias("observed_p"),
        expected.alias("expected_p"),
        F.round(F.abs(obs - expected), 6).alias("deviation"),
    )


def categorical_entropy(df: DataFrame, column: str) -> DataFrame:
    """Shannon entropy audit for an enum-ish column — the collapsed-feed
    detector: a language/source/status column whose entropy drops toward 0
    has degenerated to a constant (upstream default flooding), and one
    whose normalized entropy jumps toward 1 has lost its skew (id leakage
    into a category field).  Output (1 row): (col_name, n_rows,
    n_categories, entropy, normalized_entropy) with natural-log entropy and
    ``entropy / ln(n_categories)`` ∈ [0, 1] (NULL when one category).
    NULLs are excluded (their share is the profiler's null-rate signal).

    100 TB shape: ONE map-side-combined category-count aggregation, then
    the entropy fold over the (bounded, enum-sized) count rows in a second
    tiny aggregation — the column's raw values never shuffle.  Intended for
    enum-cardinality columns; a high-cardinality column's count table is
    itself large (use ``approx_count_distinct`` in the profile first)."""
    counts = (
        df.where(F.col(column).isNotNull())
        .groupBy(F.col(column).alias("_v"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    agg = counts.agg(
        F.coalesce(F.sum("_n"), F.lit(0)).cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_categories"),
        # -Σ n·ln(n) computed distributively; entropy folds from the two
        # sums: H = ln(N) − (Σ n·ln n)/N  (exact algebra, one pass)
        F.coalesce(
            F.sum(F.col("_n") * F.log(F.col("_n").cast("double"))), F.lit(0.0)
        ).alias("_sum_nlogn"),
    )
    n = F.col("n_rows").cast("double")
    h = F.when(
        F.col("n_rows") > 0, F.log(n) - F.col("_sum_nlogn") / n
    ).otherwise(F.lit(None))
    hmax = F.log(F.col("n_categories").cast("double"))
    return agg.select(
        F.lit(column).alias("col_name"),
        "n_rows",
        "n_categories",
        F.round(h, 6).alias("entropy"),
        F.when(F.col("n_categories") > 1, F.round(h / hmax, 6)).alias(
            "normalized_entropy"
        ),
    )
