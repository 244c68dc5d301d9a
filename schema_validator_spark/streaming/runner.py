"""Structured-Streaming execution of constraint plans.

The reference is batch-only (single values, SURVEY.md §1), so streaming is an
engine-level extension: the SAME compiled plan applies unchanged to a
streaming DataFrame because it is one stateless projection — no rewrite, no
separate code path.  What streaming adds:

- ``validate_stream``: plan.apply on a readStream source (works because the
  compiled plan is a pure projection; Catalyst treats it identically).
- ``windowed_verdicts``: per-event-time-window pass/fail counts with a
  watermark so late data is bounded and state is evictable — the streaming
  analog of per-partition verdicts.
- ``write_validated``: foreachBatch sink writing validated rows + appending
  per-batch verdict/metrics rows to a manifest (lineage for streams mirrors
  the batch checkpoint manifest in sources/io.py); exactly-once via the
  streaming checkpoint + idempotent batch-id column.

At scale: the projection is stateless (no shuffle); the windowed agg shuffles
only the tiny per-window counters; watermark bounds state size regardless of
input volume.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.runner import VALID_COL, ValidationPlan


def validate_stream(plan: ValidationPlan, stream_df: DataFrame) -> DataFrame:
    """Apply a compiled constraint plan to a streaming DataFrame.

    The plan is a single stateless projection, so it is directly
    streaming-compatible (no state, no watermark required)."""
    return plan.apply(stream_df)


def windowed_verdicts(
    validated: DataFrame,
    ts_col: str,
    window_duration: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Event-time-windowed pass/fail verdicts with a watermark.

    Output per window: total/passed/failed counts + pass flag — the streaming
    unit of verdict, analogous to the batch per-partition verdict."""
    return (
        validated.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("total_rows"),
            F.sum(F.col(VALID_COL).cast("long")).alias("passed_rows"),
            F.sum((~F.col(VALID_COL)).cast("long")).alias("failed_rows"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "total_rows",
            "passed_rows",
            "failed_rows",
            (F.col("failed_rows") == 0).alias("pass"),
        )
    )


def windowed_profile(
    stream_df: DataFrame,
    columns: list,
    ts_col: str,
    window_duration: str = "1 minute",
    watermark: str = "5 minutes",
    exact_distinct: bool = False,
) -> DataFrame:
    """Streaming column-profile monitor: per event-time window, the same
    null-rate/min/max/distinct stats the batch profiler computes — the live
    feed a drift detector consumes (compare each window's histogram against
    the baseline era with operators.drift).  Watermark bounds state; the
    shuffle carries only per-window aggregate buffers.

    ``exact_distinct`` swaps the HLL sketch for ``count(DISTINCT)`` — only
    valid on the BATCH form (streaming aggregation can't do exact distinct);
    it exists so the batch form is bit-reproducible by an external oracle,
    exactly like ``operators.stats.profile``."""
    distinct_of = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("row_count")]
    for c in columns:
        col = F.col(c)
        nulls = F.sum(col.isNull().cast("long"))
        aggs += [
            F.count(col).alias(f"{c}_count"),
            nulls.alias(f"{c}_nulls"),
            (nulls / F.count(F.lit(1))).alias(f"{c}_null_rate"),
            F.min(col).alias(f"{c}_min"),
            F.max(col).alias(f"{c}_max"),
            distinct_of(col).alias(f"{c}_distinct"),
        ]
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("win"))
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "*",
        )
        .drop("win")
    )


def windowed_drift(
    stream_df: DataFrame,
    value_col: str,
    ts_col: str,
    baseline_probs: "list[float]",
    lo: float,
    hi: float,
    nbuckets: int,
    window_duration: str = "1 minute",
    watermark: "str | None" = "5 minutes",
    eps: float = 1e-4,
    psi_threshold: float = 0.25,
) -> DataFrame:
    """Streaming distribution-drift monitor: PSI of each event-time window's
    value histogram against a STATIC baseline distribution (e.g. yesterday's
    profiled era) — the live data-quality alarm on an ingest stream, closing
    the loop between ``windowed_profile`` and ``operators.drift``.

    Streaming forbids chained aggregations, so the per-window histogram is
    ONE aggregation of ``nbuckets + 2`` conditional counters (underflow +
    buckets + overflow, the same ``width_bucket`` grid as operators.drift)
    and the PSI folds over those counters in a stateless projection —
    append-mode safe behind the watermark.  ``baseline_probs`` supplies the
    nbuckets+2 baseline bucket probabilities; NULL values are excluded
    (same rule as ``psi``).  Arithmetic per window is identical to
    ``drift.psi_single_pass`` (same counts → same value).  Works identically
    on a batch frame (pass ``watermark=None``) — the oracle-checkable form.

    100 TB shape: the shuffle carries only per-window counter buffers
    (nbuckets + 2 longs); watermark bounds state regardless of stream
    volume; the PSI fold is a pure projection over one row per window."""
    if len(baseline_probs) != nbuckets + 2:
        raise ValueError(
            f"baseline_probs must have nbuckets + 2 = {nbuckets + 2} entries "
            f"(underflow + {nbuckets} buckets + overflow), got {len(baseline_probs)}"
        )
    bucket = F.width_bucket(
        F.col(value_col).cast("double"),
        F.lit(float(lo)),
        F.lit(float(hi)),
        F.lit(nbuckets),
    )
    src = stream_df.where(F.col(value_col).isNotNull()).withColumn("_bucket", bucket)
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum((F.col("_bucket") == b).cast("long")).alias(f"_c{b}")
        for b in range(nbuckets + 2)
    ]
    h = src.groupBy(F.window(F.col(ts_col), window_duration).alias("win")).agg(*aggs)
    total = F.col("n_rows").cast("double")
    psi = None
    for b in range(nbuckets + 2):
        p = max(float(baseline_probs[b]), eps)
        q = F.greatest(F.col(f"_c{b}") / total, F.lit(float(eps)))
        term = (F.lit(p) - q) * F.log(F.lit(p) / q)
        psi = term if psi is None else psi + term
    return h.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "n_rows",
        psi.alias("psi"),
        (psi > F.lit(float(psi_threshold))).alias("drifted"),
    )


def sessionized_verdicts(
    validated: DataFrame,
    key_cols: list,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: "str | None" = None,
) -> DataFrame:
    """Per-key SESSION-window verdicts (``F.session_window``): events within
    ``gap`` of the previous event merge into one session; a session's window
    closes ``gap`` after its last event.  The natural verdict unit for
    user/host activity bursts — crawl fetch sessions, user visits — where
    tumbling windows split or merge unrelated activity.

    Works identically on batch and streaming frames (pass ``watermark`` on a
    stream so closed sessions finalize and state evicts).  Batch semantics
    are exactly the gaps-and-islands rule — a new session starts when
    ts − prev_ts ≥ gap — which is how the driver's oracle replays it in SQL.
    Output per (session, keys): total/passed/failed counts + pass flag."""
    g = validated
    if watermark is not None:
        g = g.withWatermark(ts_col, watermark)
    return (
        g.groupBy(
            F.session_window(F.col(ts_col), gap).alias("win"), *key_cols
        )
        .agg(
            F.count(F.lit(1)).alias("total_rows"),
            F.sum(F.col(VALID_COL).cast("long")).alias("passed_rows"),
            F.sum((~F.col(VALID_COL)).cast("long")).alias("failed_rows"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            *key_cols,
            "total_rows",
            "passed_rows",
            "failed_rows",
            (F.col("failed_rows") == 0).alias("pass"),
        )
    )


def dedup_stream(
    stream_df: DataFrame,
    key_cols: list,
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup on ``key_cols`` (e.g. url) with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps a key in state only until the
    watermark passes it, so state size is O(keys per watermark window) — the
    only dedup shape that survives an unbounded stream.  Duplicates arriving
    within the watermark of their first occurrence are dropped; a re-crawl
    months later is a NEW row (by design — cross-era dedup is the batch
    fingerprint job's role, operators/uniqueness.py)."""
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def write_validated(
    validated: DataFrame,
    out_path: str,
    checkpoint_path: str,
    manifest_path: Optional[str] = None,
    trigger_once: bool = True,
    extra_batch_fn: Optional[Callable[[DataFrame, int], None]] = None,
):
    """foreachBatch sink: append validated rows; record per-batch verdict
    metrics to a manifest parquet (batch_id column makes replays idempotent —
    dedup on batch_id when reading the manifest).

    Returns the started StreamingQuery; with ``trigger_once`` the query
    processes all available input then stops (the batch-like incremental
    pattern used for backfills and tests)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            batch_df.write.mode("append").parquet(out_path)
            if manifest_path is not None:
                (
                    batch_df.agg(
                        F.count(F.lit(1)).alias("total_rows"),
                        F.sum(F.col(VALID_COL).cast("long")).alias("passed_rows"),
                        F.sum((~F.col(VALID_COL)).cast("long")).alias("failed_rows"),
                    )
                    .withColumn("batch_id", F.lit(batch_id))
                    .withColumn("completed_at", F.current_timestamp())
                    .write.mode("append")
                    .parquet(manifest_path)
                )
            if extra_batch_fn is not None:
                extra_batch_fn(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    writer = (
        validated.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
