"""Distribution-drift checks: PSI and KS (SURVEY.md §2.B).

Both operate on SKETCHES (histograms / quantile arrays) aggregated
distributively — the raw columns never leave the executors; only
O(buckets)-sized summaries reach the driver.  That's the 100 TB shape:
drift between a 50 TB baseline era and a 50 TB current era costs two
histogram aggregations + a driver-side fold over ≤ a few dozen buckets.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stats import approx_quantiles, numeric_histogram


def _hist_to_probs(hist: DataFrame, nbuckets: int) -> list[float]:
    rows = {r["bucket"]: r["cnt"] for r in hist.collect()}
    total = sum(rows.values()) or 1
    # width_bucket buckets: 0 (underflow) .. nbuckets+1 (overflow)
    return [rows.get(b, 0) / total for b in range(nbuckets + 2)]


def psi_from_histograms(
    expected: DataFrame, actual: DataFrame, nbuckets: int, eps: float = 1e-4
) -> float:
    """Population Stability Index: Σ (p−q)·ln(p/q) over buckets.
    Rule of thumb: <0.1 stable, 0.1–0.25 moderate, >0.25 major shift."""
    p = _hist_to_probs(expected, nbuckets)
    q = _hist_to_probs(actual, nbuckets)
    psi = 0.0
    for pi, qi in zip(p, q):
        pi, qi = max(pi, eps), max(qi, eps)
        psi += (pi - qi) * math.log(pi / qi)
    return psi


def psi(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    lo: float,
    hi: float,
    nbuckets: int = 20,
) -> float:
    return psi_from_histograms(
        numeric_histogram(baseline, column, lo, hi, nbuckets),
        numeric_histogram(current, column, lo, hi, nbuckets),
        nbuckets,
    )


def ks_statistic(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    npoints: int = 100,
    rel_err: float = 0.001,
) -> float:
    """Approximate two-sample Kolmogorov–Smirnov statistic from quantile
    sketches: max |ECDF_p − ECDF_q| evaluated on the merged quantile grid.
    Each side is one percentile_approx pass."""
    probs = [i / npoints for i in range(npoints + 1)]
    qa = approx_quantiles(baseline, column, probs, rel_err)
    qb = approx_quantiles(current, column, probs, rel_err)

    def ecdf(quantiles: Sequence[float], x: float) -> float:
        # fraction of quantile grid points <= x ≈ CDF(x)
        import bisect

        return bisect.bisect_right(quantiles, x) / len(quantiles)

    grid = sorted(set(qa) | set(qb))
    return max(abs(ecdf(qa, x) - ecdf(qb, x)) for x in grid) if grid else 0.0


def psi_single_pass(
    df: DataFrame,
    column: str,
    is_baseline,
    lo: float,
    hi: float,
    nbuckets: int = 20,
    eps: float = 1e-4,
) -> float:
    """PSI with ONE table scan: the two eras live in the same table, split by
    the ``is_baseline`` boolean Column, so a single
    ``groupBy(era, bucket).count()`` (map-side combined) replaces the two
    separate histogram jobs of ``psi``.  At 100 TB the eras are usually
    different partitions of one table — this is the shape that reads them
    once.  Arithmetic is identical to ``psi`` (same counts → same value).
    """
    bucket = F.width_bucket(
        F.col(column).cast("double"), F.lit(float(lo)), F.lit(float(hi)), F.lit(nbuckets)
    )
    rows = (
        df.where(F.col(column).isNotNull())
        .select(is_baseline.alias("_b"), bucket.alias("bucket"))
        # a NULL era marker belongs to neither histogram — excluding it here
        # (instead of letting Python truthiness fold None into the current
        # era) keeps the counts identical to the two-scan ``psi``
        .where(F.col("_b").isNotNull())
        .groupBy("_b", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()  # bounded: ≤ 2·(nbuckets+2) rows
    )
    bh = {r["bucket"]: r["cnt"] for r in rows if r["_b"]}
    ch = {r["bucket"]: r["cnt"] for r in rows if not r["_b"]}
    nb = sum(bh.values()) or 1
    nc = sum(ch.values()) or 1
    value = 0.0
    for b in range(nbuckets + 2):
        p = max(bh.get(b, 0) / nb, eps)
        q = max(ch.get(b, 0) / nc, eps)
        value += (p - q) * math.log(p / q)
    return value


def psi_multi(
    df: DataFrame,
    columns: "dict[str, tuple[float, float]]",
    is_baseline,
    nbuckets: int = 20,
    eps: float = 1e-4,
) -> "dict[str, float]":
    """PSI for MANY columns in ONE table scan: per row, an array of
    (col_name, bucket) entries is exploded and counted by
    (column, era, bucket) with map-side combine — at 100 TB you never pay
    one scan per monitored column.  ``columns`` maps column name →
    (lo, hi) histogram range; arithmetic per column is identical to
    ``psi_single_pass`` (same counts → same value).  Rows with a NULL era
    marker are excluded (same rule as psi_single_pass)."""
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.when(
                    F.col(c).isNotNull(),
                    F.width_bucket(
                        F.col(c).cast("double"),
                        F.lit(float(lo)),
                        F.lit(float(hi)),
                        F.lit(nbuckets),
                    ),
                ).alias("bucket"),
            )
            for c, (lo, hi) in columns.items()
        ]
    )
    rows = (
        df.select(is_baseline.alias("_b"), F.explode(entries).alias("e"))
        .where(F.col("_b").isNotNull() & F.col("e.bucket").isNotNull())
        .groupBy(F.col("e.col_name").alias("col_name"), "_b", F.col("e.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()  # bounded: ≤ n_columns · 2 · (nbuckets+2) rows
    )
    out = {}
    for c in columns:
        bh = {r["bucket"]: r["cnt"] for r in rows if r["col_name"] == c and r["_b"]}
        ch = {r["bucket"]: r["cnt"] for r in rows if r["col_name"] == c and not r["_b"]}
        nb = sum(bh.values()) or 1
        nc = sum(ch.values()) or 1
        value = 0.0
        for b in range(nbuckets + 2):
            p = max(bh.get(b, 0) / nb, eps)
            q = max(ch.get(b, 0) / nc, eps)
            value += (p - q) * math.log(p / q)
        out[c] = value
    return out


def ks_grid(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    lo: float,
    hi: float,
    nbuckets: int = 64,
) -> float:
    """Deterministic sketch KS: max |ECDF_b − ECDF_c| evaluated at FIXED
    equi-width bucket edges (same histogram sketch PSI uses).  Unlike the
    ``percentile_approx``-based ``ks_statistic``, the grid does not depend on
    a sketch algorithm's internals, so the value is exactly reproducible by
    any engine that can count — this is the oracle-checkable variant.  Each
    side costs one histogram aggregation; only O(nbuckets) counts reach the
    driver.  Pick integer-friendly lo/hi/width for cross-engine float parity.
    """
    bh = {r["bucket"]: r["cnt"] for r in numeric_histogram(baseline, column, lo, hi, nbuckets).collect()}
    ch = {r["bucket"]: r["cnt"] for r in numeric_histogram(current, column, lo, hi, nbuckets).collect()}
    nb = sum(bh.values()) or 1
    nc = sum(ch.values()) or 1
    ks, cb, cc = 0.0, 0, 0
    for b in range(nbuckets + 2):
        cb += bh.get(b, 0)
        cc += ch.get(b, 0)
        ks = max(ks, abs(cb / nb - cc / nc))
    return ks


def ks_exact(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    max_distinct: "int | None" = 2_000_000,
) -> DataFrame:
    """EXACT two-sample KS statistic: max |ECDF_b − ECDF_c| over the merged
    value grid, as a 1-row DataFrame (col_name, ks).

    Shape: per-side value counts (hash agg, map-side combined) → one global
    cumulative window over the DISTINCT values.  The single-partition sort
    touches only distinct values, not rows — fine up to millions of distinct
    values; beyond that use ``ks_statistic`` (quantile sketches) or
    ``ks_grid`` (fixed buckets), the scale paths.

    ``max_distinct`` ENFORCES that bound (VERDICT r4 #5): one cheap
    ``approx_count_distinct`` probe per side, and if the summed estimate
    exceeds the cap the call raises with a pointer to the scale paths
    instead of silently planning a one-partition sort of a high-cardinality
    double column.  ``max_distinct=None`` skips the probe (and the guard)
    for callers that know their column."""
    from pyspark.sql import Window

    if max_distinct is not None:
        nd = (
            baseline.agg(F.approx_count_distinct(column).alias("n")).first()["n"]
            + current.agg(F.approx_count_distinct(column).alias("n")).first()["n"]
        )
        if nd > max_distinct:
            raise ValueError(
                f"ks_exact: ~{nd} distinct {column!r} values exceed "
                f"max_distinct={max_distinct}; the exact ECDF merge sorts all "
                "distinct values in one partition. Use ks_grid (fixed-bucket "
                "histogram KS) or ks_statistic (quantile sketches), or pass "
                "max_distinct=None to force the exact path."
            )

    b = (
        baseline.where(F.col(column).isNotNull())
        .groupBy(F.col(column).alias("v"))
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    c = (
        current.where(F.col(column).isNotNull())
        .groupBy(F.col(column).alias("v"))
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    g = b.join(c, "v", "full_outer").select(
        "v",
        F.coalesce("c1", F.lit(0)).alias("c1"),
        F.coalesce("c2", F.lit(0)).alias("c2"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    whole = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    s = g.select(
        (F.sum("c1").over(w) / F.sum("c1").over(whole)).alias("e1"),
        (F.sum("c2").over(w) / F.sum("c2").over(whole)).alias("e2"),
    )
    return s.agg(
        F.round(F.max(F.abs(F.col("e1") - F.col("e2"))), 6).alias("ks")
    ).select(F.lit(column).alias("col_name"), "ks")


def drift_report(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    lo: float,
    hi: float,
    nbuckets: int = 20,
    psi_threshold: float = 0.25,
) -> dict:
    value = psi(baseline, current, column, lo, hi, nbuckets)
    return {
        "column": column,
        "psi": value,
        "drifted": value > psi_threshold,
        "threshold": psi_threshold,
    }
