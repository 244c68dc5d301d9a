"""Temporal joins Spark lacks as built-ins (builder-brief custom operators).

``asof_join``: each fact row is matched to the most recent dimension row for
its key at-or-before the fact timestamp — the join every event pipeline needs
against a slowly-changing dimension (user profile as of the click, price as
of the trade, robots.txt as of the fetch).

Spark has no ASOF JOIN; the naive formulation (equi-join on key + filter
dim_ts <= fact_ts + max-per-fact-row) multiplies every fact row by its key's
full dimension history before reducing.  This implementation uses the
merge-style UNION + window shape instead: tag dim and fact rows, sort each
key's timeline once, and carry the last seen dim payload forward with
``last(ignorenulls)`` — ONE shuffle on the key, zero row amplification,
state bounded by the window frame.  That is the plan you want at 10^12 fact
rows: cost is a sort within each key partition, not |fact| x |dim versions|.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_ts: str = "ts",
    dim_ts: str = "ts",
    payload_cols: "Sequence[str] | None" = None,
) -> DataFrame:
    """Backward as-of left join: for every fact row, the dim row with the
    largest ``dim_ts`` ≤ ``fact_ts`` for the same ``key`` (NULL payloads when
    no dim row precedes it).  A dim row AT the fact timestamp matches
    (``>=`` semantics, same as DuckDB's ``ASOF JOIN ... ON f.ts >= d.ts``).

    Ties between dim rows sharing (key, dim_ts) resolve deterministically to
    the greatest payload struct.  Output: all fact columns + the dim payload
    columns.
    """
    if payload_cols is None:
        payload_cols = [c for c in dim.columns if c not in (key, dim_ts)]
    payload = F.struct(*[F.col(c) for c in payload_cols])

    d = dim.select(
        F.col(key).alias("_k"),
        F.col(dim_ts).alias("_ts"),
        F.lit(0).alias("_src"),
        payload.alias("_p"),
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`:{t}" for c, t in fact.dtypes) + ">"
        ).alias("_row"),
    )
    f = fact.select(
        F.col(key).alias("_k"),
        F.col(fact_ts).alias("_ts"),
        F.lit(1).alias("_src"),
        F.lit(None).cast(d.schema["_p"].dataType.simpleString()).alias("_p"),
        F.struct(*[F.col(c) for c in fact.columns]).alias("_row"),
    )
    # timeline order: ts asc, dim-before-fact at equal ts (so an exactly
    # concurrent dim row is visible), duplicate-dim tie-break by payload so
    # the carried value is deterministic
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_src").asc(), F.col("_p").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = d.unionByName(f).withColumn(
        "_asof", F.last("_p", ignorenulls=True).over(w)
    )
    out_cols = [F.col("_row")[c].alias(c) for c in fact.columns] + [
        F.col("_asof")[c].alias(c) for c in payload_cols
    ]
    return merged.where(F.col("_src") == 1).select(*out_cols)


def range_join(
    fact: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1.0,
) -> DataFrame:
    """Interval (range) join: match each fact row to the interval(s) with
    ``lo <= value < hi`` — IP-to-geo, score band, latency bucket lookups.

    Spark executes a naive non-equi join as BroadcastNestedLoopJoin (every
    row scans every interval).  This uses the interval-bucketing trick
    instead: intervals explode to one entry per fixed-width bucket they
    overlap, facts compute their bucket, and the match becomes an EQUI-join
    on the bucket plus a residual range filter — hash join, broadcastable,
    AQE-skew-splittable.  Pick ``bucket_width`` near the median interval
    width: cost is O(intervals x buckets_per_interval) build entries and one
    probe per fact row.  Left-semantics: fact rows matching no interval are
    dropped (wrap with a left anti-join to find them).
    Output: fact columns + interval columns (minus lo/hi).
    """
    payload_cols = [c for c in intervals.columns if c not in (lo_col, hi_col)]
    w = float(bucket_width)
    iv = intervals.select(
        F.col(lo_col).cast("double").alias("_lo"),
        F.col(hi_col).cast("double").alias("_hi"),
        *[F.col(c) for c in payload_cols],
    ).where(F.col("_hi") > F.col("_lo"))
    entries = iv.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("_lo") / w).cast("long"),
                # hi is exclusive: a bucket is covered only if some x < hi
                # falls in it — subtract one bucket when hi lands exactly on
                # a boundary
                F.when(
                    F.col("_hi") == (F.floor(F.col("_hi") / w) * w),
                    F.floor(F.col("_hi") / w).cast("long") - 1,
                ).otherwise(F.floor(F.col("_hi") / w).cast("long")),
            )
        ).alias("_bucket"),
    )
    f = fact.withColumn("_v", F.col(value_col).cast("double")).withColumn(
        "_bucket", F.floor(F.col("_v") / w).cast("long")
    )
    joined = f.join(F.broadcast(entries), "_bucket").where(
        (F.col("_v") >= F.col("_lo")) & (F.col("_v") < F.col("_hi"))
    )
    return joined.select(*fact.columns, *payload_cols)
