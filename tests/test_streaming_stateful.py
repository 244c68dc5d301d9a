"""Stateful streaming operator: running per-key verdict totals must
accumulate across micro-batches AND across query restarts (state restored
from the checkpoint)."""

import os
import shutil

from pyspark.sql import functions as F

from schema_validator_spark import ValidationPlan, schema
from schema_validator_spark.streaming.runner import validate_stream
from schema_validator_spark.streaming.stateful import running_verdicts


def _plan():
    s = schema()
    return ValidationPlan(s.object().field("v", s.string().min_length(3)))


def _write_batch(spark, src, rows, part):
    df = spark.createDataFrame(rows, "lang string, v string")
    df.write.mode("append").parquet(src)


def _run_once(spark, src, out_sink, ckpt):
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    validated = validate_stream(_plan(), stream)
    rv = running_verdicts(validated, "lang")
    rows = []  # foreachBatch runs on the driver — checkpoint-recoverable,
    # unlike the memory sink

    def sink(batch_df, batch_id):
        rows.extend(batch_df.collect())

    q = (
        rv.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {}
    for r in rows:  # later micro-batches overwrite: running totals
        out[r["key"]] = (r["total_rows"], r["passed_rows"], r["failed_rows"])
    return out


def test_running_verdicts_accumulate_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, src, [("en", "long enough"), ("en", "x"), ("de", "abc")], 0)
    got1 = _run_once(spark, src, "rv1", ckpt)
    assert got1["en"] == (2, 1, 1)
    assert got1["de"] == (1, 1, 0)

    # second query run, same checkpoint, new files only → counts CONTINUE
    _write_batch(spark, src, [("en", "also long"), ("fr", "y")], 1)
    got2 = _run_once(spark, src, "rv2", ckpt)
    assert got2["en"] == (3, 2, 1)   # restored 2,1,1 + new passing row
    assert got2["fr"] == (1, 0, 1)
    assert "de" not in got2          # update mode: untouched keys not re-emitted
