"""Uniqueness / exact-dedup operators (SURVEY.md §2.B "uniqueness on url").

Two physical strategies, both one shuffle on the key:

- **hash-agg** (`duplicate_keys`, `dedup_exact` with `strategy="agg"`):
  groupBy(key) with map-side partial aggregation — the cheap path when the
  payload you keep is small (min_by on a tie-break column).
- **window** (`dedup_exact` with `strategy="window"`): row_number over
  partitionBy(key) — keeps the whole winning row without reconstructing it,
  at the cost of a sort within each hash partition.

Skew: a heavy-tail key (one url-host owning 20% of rows) makes one reducer
hot.  AQE skew-join splitting doesn't apply to aggregations, so
`duplicate_counts_salted` does an explicit two-phase (salt → partial count →
final) aggregation — the classic fix, and exactly what you'd ship at 100 TB.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Keys appearing more than once → (keys..., dup_count).  Hash agg with
    map-side combine; output is only the violating keys."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )


def duplicate_counts_salted(
    df: DataFrame, keys: Sequence[str], salt_buckets: int = 32
) -> DataFrame:
    """Two-phase salted count for skewed keys: partial count per (key, salt)
    — spreads a hot key over ``salt_buckets`` reducers — then a tiny final
    agg over the partial counts."""
    salt = (F.abs(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()))
            % salt_buckets).alias("_salt")
    partial = (
        df.select(*keys, salt)
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sum("_partial").alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )


def heavy_keys(
    df: DataFrame, keys: Sequence[str], min_share: float = 0.01, salt_buckets: int = 32
) -> DataFrame:
    """Heavy-hitter keys: keys owning ≥ ``min_share`` of all rows — the
    diagnostic that finds the hot url-host BEFORE it melts a reducer (feed
    the result into a skew salt or an explicit broadcast split).

    Shape: the same two-phase salted aggregation as
    ``duplicate_counts_salted`` (a hot key's partial counts spread over
    ``salt_buckets`` reducers), then the total row count is summed FROM the
    partials (no second scan) and broadcast into the share filter.
    Output: (keys..., key_count, share) — exact, deterministic."""
    salt = (
        F.abs(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()))
        % salt_buckets
    ).alias("_salt")
    partial = (
        df.select(*keys, salt)
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    counts = partial.groupBy(*keys).agg(F.sum("_partial").alias("key_count"))
    total = counts.agg(F.sum("key_count").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("key_count") >= F.col("_total") * F.lit(float(min_share)))
        .select(
            *keys,
            "key_count",
            F.round(F.col("key_count") / F.col("_total"), 6).alias("share"),
        )
    )


def dedup_exact(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Optional[Sequence] = None,
    strategy: str = "window",
) -> DataFrame:
    """Keep exactly one row per key.

    ``order_by``: columns (or Column exprs) ranking the keeper — smallest
    wins (e.g. ``[F.col("warc_ts")]`` keeps the earliest crawl; negate or
    invert for descending).  Plain columns only — ``.asc()/.desc()`` sort
    orders are not evaluable inside the agg strategy's min_by key.
    Defaults to arbitrary-but-deterministic (all non-key columns).

    window: one shuffle + per-partition sort, keeps whole rows.
    agg:    one shuffle, map-side partial min_by of a packed struct — cheaper
            wire format when rows are narrow.
    """
    if order_by is None:
        order_by = [F.col(c) for c in df.columns if c not in keys]
        if not order_by:
            order_by = [F.lit(1)]
    if strategy == "window":
        w = Window.partitionBy(*keys).orderBy(*order_by)
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    if strategy == "agg":
        payload = F.struct(*[F.col(c) for c in df.columns if c not in keys])
        rank = F.struct(*order_by)
        agg = df.groupBy(*keys).agg(F.min_by(payload, rank).alias("_row"))
        return agg.select(*keys, "_row.*")
    raise ValueError(f"unknown strategy {strategy!r}")


def duplicate_violations(
    df: DataFrame, keys: Sequence[str], code: str = "DUPLICATE_KEY"
) -> DataFrame:
    """Uniqueness violations as engine violation rows (key, code, message)."""
    dups = duplicate_keys(df, keys)
    key_repr = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    return dups.select(
        *keys,
        F.lit(code).alias("code"),
        F.format_string(
            "Uniqueness violation: key '%s' appears %s times",
            key_repr,
            F.col("dup_count").cast("string"),
        ).alias("message"),
        F.col("dup_count"),
    )
