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
