"""Sinks + checkpoint-manifest resume (SURVEY.md §2.B, M3).

A validation run over a partitioned table is resumable: each completed input
partition appends a manifest row ``(partition_value, snapshot_id, status,
total/passed/failed, wall_ms)``.  On restart, done partitions are skipped via
an anti-join of the partition list against the manifest — no data re-read,
no duplicate verdicts.  Output writes use dynamic partition overwrite so a
partially-written partition from a crashed run is safely rewritten.

The manifest doubles as per-partition lineage + metrics (north rule).
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DDL = (
    "partition_value string, snapshot_id string, status string, "
    "total_rows long, passed_rows long, failed_rows long, "
    "wall_ms long, completed_at timestamp"
)


class CheckpointManifest:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def load(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], MANIFEST_DDL)

    def done_partitions(self, snapshot_id: str) -> list[str]:
        m = self.load()
        return [
            r["partition_value"]
            for r in m.where(
                (F.col("status") == "done") & (F.col("snapshot_id") == snapshot_id)
            )
            .select("partition_value")
            .distinct()
            .collect()
        ]

    def record(self, rows: list[dict]) -> None:
        df = self.spark.createDataFrame(
            [
                (
                    str(r["partition_value"]),
                    str(r["snapshot_id"]),
                    r.get("status", "done"),
                    int(r.get("total_rows", 0)),
                    int(r.get("passed_rows", 0)),
                    int(r.get("failed_rows", 0)),
                    int(r.get("wall_ms", 0)),
                )
                for r in rows
            ],
            "partition_value string, snapshot_id string, status string, "
            "total_rows long, passed_rows long, failed_rows long, wall_ms long",
        ).withColumn("completed_at", F.current_timestamp())
        df.write.mode("append").parquet(self.path)


def run_resumable(
    plan,
    df: DataFrame,
    partition_col: str,
    out_path: str,
    manifest: CheckpointManifest,
    snapshot_id: str = "snap-0",
    batch_partitions: Optional[int] = None,
) -> dict:
    """Validate a partitioned table resumably.

    1. Enumerate remaining partitions (distinct partition values anti-joined
       against the manifest — partition values are few; this collect is tiny).
    2. Validate ALL remaining partitions in ONE job (partition-pruned scan),
       writing verdict-annotated rows with dynamic partition overwrite.
    3. Aggregate per-partition verdicts from the written output and append
       manifest rows atomically after the write commits.

    Crash between (2) and (3) → partitions rewritten idempotently on resume.
    Returns {"processed": [...], "skipped": [...]}.
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    done = set(manifest.done_partitions(snapshot_id))
    all_parts = [
        str(r[0])
        for r in df.select(partition_col).distinct().collect()
    ]
    remaining = [p for p in all_parts if p not in done]
    if batch_partitions:
        remaining = remaining[:batch_partitions]
    if not remaining:
        return {"processed": [], "skipped": sorted(done)}

    t0 = time.time()
    subset = df.where(F.col(partition_col).cast("string").isin(remaining))
    validated = plan.apply(subset)
    validated.write.mode("overwrite").partitionBy(partition_col).parquet(out_path)

    verdicts = (
        spark.read.parquet(out_path)
        .where(F.col(partition_col).cast("string").isin(remaining))
        .groupBy(partition_col)
        .agg(
            F.count(F.lit(1)).alias("total_rows"),
            F.sum(F.col("valid").cast("long")).alias("passed_rows"),
            F.sum((~F.col("valid")).cast("long")).alias("failed_rows"),
        )
        .collect()
    )
    wall_ms = int((time.time() - t0) * 1000)
    manifest.record(
        [
            {
                "partition_value": str(r[partition_col]),
                "snapshot_id": snapshot_id,
                "status": "done",
                "total_rows": r["total_rows"],
                "passed_rows": r["passed_rows"],
                "failed_rows": r["failed_rows"],
                "wall_ms": wall_ms,
            }
            for r in verdicts
        ]
    )
    return {"processed": remaining, "skipped": sorted(done)}
