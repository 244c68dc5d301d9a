"""Structured-Streaming execution of constraint plans (streaming/runner.py)."""

import os

import pytest
from pyspark.sql import functions as F

from schema_validator_spark import ValidationPlan, schema
from schema_validator_spark.streaming.runner import (
    validate_stream,
    windowed_verdicts,
    write_validated,
)


@pytest.fixture()
def plan():
    s = schema()
    return ValidationPlan(
        s.object()
        .field("url", s.string().pattern(r"^https://.*$"))
        .field("text", s.string().min_length(5).optional())
    )


@pytest.fixture()
def source_dir(spark, tmp_path):
    path = str(tmp_path / "src")
    rows = [
        (i,
         ("https://ok.example/%d" % i) if i % 3 else "ftp://bad",
         "long enough text" if i % 4 else "x",
         "2024-01-01 00:0%d:00" % (i % 10))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id long, url string, text string, ts string")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(path)
    return path


def _read_stream(spark, source_dir):
    static = spark.read.parquet(source_dir)
    return spark.readStream.schema(static.schema).parquet(source_dir)


def test_stream_validate_and_sink(spark, plan, source_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    manifest = str(tmp_path / "manifest")

    stream = _read_stream(spark, source_dir)
    validated = validate_stream(plan, stream)
    q = write_validated(validated, out, ckpt, manifest_path=manifest)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() == 20
    # url fails on i % 3 == 0 (7 rows); text fails on i % 4 == 0 (5 rows)
    assert got.where("valid").count() == sum(
        1 for i in range(20) if i % 3 != 0 and i % 4 != 0
    )
    m = spark.read.parquet(manifest).collect()
    assert sum(r["total_rows"] for r in m) == 20
    assert {"batch_id", "passed_rows", "failed_rows"} <= set(m[0].asDict())

    # restart with same checkpoint: no new data -> no duplicate rows
    q2 = write_validated(
        validate_stream(plan, _read_stream(spark, source_dir)), out, ckpt,
        manifest_path=manifest,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 20


def test_windowed_verdicts(spark, plan, source_dir, tmp_path):
    out = str(tmp_path / "wout")
    ckpt = str(tmp_path / "wckpt")

    stream = _read_stream(spark, source_dir)
    verdicts = windowed_verdicts(
        validate_stream(plan, stream), "ts", "1 minute", "2 minutes"
    )
    q = (
        verdicts.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows the watermark has closed; with a single
    # micro-batch the final windows stay open, so just assert shape + totals
    rows = spark.read.parquet(out).collect()
    assert all(
        r["total_rows"] == r["passed_rows"] + r["failed_rows"] for r in rows
    )
    cols = {"window_start", "window_end", "total_rows", "passed_rows",
            "failed_rows", "pass"}
    got_cols = set(spark.read.parquet(out).columns)
    assert cols <= got_cols


def test_dedup_stream_bounded_state(spark, tmp_path):
    from schema_validator_spark.streaming.runner import dedup_stream

    src = str(tmp_path / "dsrc")
    rows = [
        (i, "https://ex.com/%d" % (i % 5), "2024-01-01 00:00:%02d" % i)
        for i in range(20)  # 20 rows, 5 distinct urls, all within the watermark
    ]
    df = spark.createDataFrame(rows, "id long, url string, ts string")
    df.withColumn("ts", F.to_timestamp("ts")).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "id long, url string, ts timestamp"
    ).parquet(src)
    deduped = dedup_stream(stream, ["url"], "ts", watermark="10 minutes")
    out = str(tmp_path / "dout")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "dchk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 5  # one survivor per url within the watermark
    assert got.select("url").distinct().count() == 5


def test_windowed_profile_stream(spark, tmp_path):
    from schema_validator_spark.streaming.runner import windowed_profile

    src = str(tmp_path / "psrc")
    rows = [
        (i, None if i % 5 == 0 else float(i), "2024-01-01 0%d:00:30" % (i % 3))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "id long, v double, ts string")
    df.withColumn("ts", F.to_timestamp("ts")).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("id long, v double, ts timestamp").parquet(src)
    # watermark 0s: with availableNow the final watermark = max event time,
    # so append mode emits every window whose END <= max ts (the last,
    # still-open window is correctly held back)
    prof = windowed_profile(
        stream, ["v"], "ts", window_duration="1 hour", watermark="0 seconds"
    )
    out = str(tmp_path / "pout")
    q = (
        prof.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "pchk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 2  # first two 1-hour windows closed; third held open
    r = got.orderBy("window_start").collect()[0]
    assert r["row_count"] == 10 and r["v_nulls"] == 2
    assert abs(r["v_null_rate"] - 0.2) < 1e-9


def test_windowed_drift_stream(spark, tmp_path):
    from schema_validator_spark.streaming.runner import windowed_drift

    src = str(tmp_path / "wdsrc")
    # hour 0 matches the uniform baseline (values spread over all 5 buckets);
    # hour 1 is fully collapsed into bucket 1 (major shift); hour 2 exists
    # only to flush the first two windows past the watermark
    rows = (
        [(i, float(i % 10) + 0.5, "2024-01-01 00:00:%02d" % i) for i in range(50)]
        + [(100 + i, 0.5, "2024-01-01 01:00:%02d" % i) for i in range(50)]
        + [(200, 5.0, "2024-01-01 02:00:00")]
    )
    df = spark.createDataFrame(rows, "id long, v double, ts string")
    df.withColumn("ts", F.to_timestamp("ts")).write.mode("overwrite").parquet(src)

    baseline = [0.0, 0.2, 0.2, 0.2, 0.2, 0.2, 0.0]  # uniform over buckets 1-5
    stream = spark.readStream.schema("id long, v double, ts timestamp").parquet(src)
    drift = windowed_drift(
        stream, "v", "ts", baseline, lo=0.0, hi=10.0, nbuckets=5,
        window_duration="1 hour", watermark="0 seconds",
    )
    out = str(tmp_path / "wdout")
    q = (
        drift.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "wdchk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["window_start"].hour: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {0, 1}  # third window still open, held back
    assert got[0]["n_rows"] == 50 and not got[0]["drifted"]
    assert got[0]["psi"] < 0.01  # matches baseline
    assert got[1]["drifted"] and got[1]["psi"] > 1.0  # collapsed distribution


def test_windowed_drift_batch_matches_reference_arithmetic(spark):
    import math

    from schema_validator_spark.streaming.runner import windowed_drift

    rows = [(i, float(i % 7), "2024-01-01 00:00:%02d" % (i % 60)) for i in range(40)]
    rows += [(1000, None, "2024-01-01 00:00:05")]  # NULL value excluded
    df = spark.createDataFrame(rows, "id long, v double, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    baseline = [0.0, 0.25, 0.25, 0.25, 0.25, 0.0]
    out = windowed_drift(
        df, "v", "ts", baseline, lo=0.0, hi=8.0, nbuckets=4,
        window_duration="1 hour", watermark=None,
    ).collect()
    assert len(out) == 1 and out[0]["n_rows"] == 40
    # replay psi_single_pass's fold exactly
    counts = [0] * 6
    for i in range(40):
        v = float(i % 7)
        counts[0 if v < 0 else 5 if v >= 8 else int(v // 2) + 1] += 1
    eps, psi = 1e-4, 0.0
    for b in range(6):
        p = max(baseline[b], eps)
        q = max(counts[b] / 40.0, eps)
        psi += (p - q) * math.log(p / q)
    assert abs(out[0]["psi"] - psi) < 1e-9
    assert out[0]["drifted"] == (psi > 0.25)


def test_windowed_drift_rejects_bad_baseline(spark):
    from schema_validator_spark.streaming.runner import windowed_drift

    df = spark.createDataFrame([(1, 1.0, "2024-01-01")], "id long, v double, ts string")
    with pytest.raises(ValueError):
        windowed_drift(df, "v", "ts", [0.5, 0.5], 0.0, 10.0, 5)


def test_violations_sample_partition_independent(spark):
    # deterministic triage sample: identical rows regardless of layout
    s = schema()
    pl = ValidationPlan(
        s.object().field("name", s.string().min_length(100))
    )
    df = spark.createDataFrame(
        [(i, "x") for i in range(200)], "id long, name string"
    )
    a = sorted(
        (r["id"], r["code"], r["rn"])
        for r in pl.violations_sample(pl.apply(df), ["id"], per_code=15).collect()
    )
    b = sorted(
        (r["id"], r["code"], r["rn"])
        for r in pl.violations_sample(
            pl.apply(df.repartition(17)), ["id"], per_code=15
        ).collect()
    )
    assert a == b and len(a) == 15


def test_stream_validate_with_row_checks(spark, tmp_path):
    # row-level checks are part of the stateless validation projection, so a
    # check-bearing plan must stream unchanged
    from schema_validator_spark import ValidationPlan, schema
    from schema_validator_spark.streaming.runner import validate_stream

    src = str(tmp_path / "csrc")
    rows = [(i, f"doc {i}", i % 10) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, text string, n long")
    df.write.mode("overwrite").parquet(src)

    s = schema()
    obj = (
        s.object()
        .field("text", s.string())
        .check("n_small", F.col("n") < 5)
    )
    stream = spark.readStream.schema("id long, text string, n long").parquet(src)
    validated = validate_stream(ValidationPlan(obj), stream)
    out = str(tmp_path / "cout")
    q = (
        validated.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cchk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 20
    assert got.where("valid").count() == 10  # n in 0..4 passes
    bad = got.where("NOT valid").select(F.explode("violations").alias("v"))
    assert bad.where("v.field = 'n_small'").count() == 10


def test_sessionized_verdicts_stream(spark, tmp_path):
    from schema_validator_spark import ValidationPlan, schema
    from schema_validator_spark.streaming.runner import sessionized_verdicts, validate_stream

    src = str(tmp_path / "ssrc")
    rows = [
        # user 1: two bursts 2h apart -> 2 sessions; second has a failure
        (1, "ok", "2024-01-01 00:00:00"),
        (1, "ok", "2024-01-01 00:10:00"),
        (1, "bad", "2024-01-01 02:30:00"),
        # user 2: one event -> one session
        (2, "ok", "2024-01-01 01:00:00"),
        # user 3: late watermark-advancing event — its own session stays in
        # state (append mode only emits sessions the watermark has passed)
        (3, "ok", "2024-01-01 06:00:00"),
    ]
    df = spark.createDataFrame(rows, "uid long, kind string, ts string")
    df.withColumn("ts", F.to_timestamp("ts")).write.mode("overwrite").parquet(src)

    s = schema()
    plan = ValidationPlan(s.object().field("kind", s.string().pattern(r"^ok$")))
    stream = spark.readStream.schema("uid long, kind string, ts timestamp").parquet(src)
    sess = sessionized_verdicts(
        validate_stream(plan, stream), ["uid"], "ts", gap="30 minutes",
        watermark="1 minute",
    )
    out = str(tmp_path / "sout")
    q = (
        sess.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "schk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["uid"], str(r["session_start"])): (r["total_rows"], r["pass"])
        for r in spark.read.parquet(out).collect()
    }
    assert got[(1, "2024-01-01 00:00:00")] == (2, True)
    assert got[(1, "2024-01-01 02:30:00")] == (1, False)
    assert got[(2, "2024-01-01 01:00:00")] == (1, True)
    assert not any(uid == 3 for uid, _ in got)  # unclosed session withheld


def test_windowed_drift_single_shuffle_no_python(spark):
    from schema_validator_spark.plans.inspect import plan_stats
    from schema_validator_spark.streaming.runner import windowed_drift

    df = spark.createDataFrame(
        [(1, 1.0, "2024-01-01 00:00:00")], "id long, v double, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    stats = plan_stats(
        windowed_drift(df, "v", "ts", [0.5, 0.25, 0.25, 0.0], 0.0, 2.0, 2,
                       watermark=None)
    )
    # one window-agg shuffle; counters + PSI fold all JVM-side
    assert stats["shuffles"] == 1 and stats["python_evals"] == 0


def test_stream_validate_then_drift_composition(spark, plan, tmp_path):
    """validate_stream → windowed_drift chained: the live 'violations per
    document' drift alarm a monitoring pipeline would wire — exercises a
    streaming plan with the validation projection BELOW the drift agg."""
    from schema_validator_spark.streaming.runner import (
        validate_stream,
        windowed_drift,
    )

    src = str(tmp_path / "vdsrc")
    rows = [
        (i,
         ("https://ok.example/%d" % i) if i < 50 else "ftp://bad",  # hour 1 all-invalid
         "long enough text",
         "2024-01-01 0%d:00:%02d" % (0 if i < 50 else 1, i % 50))
        for i in range(100)
    ] + [(200, "https://ok.example/x", "long enough text", "2024-01-01 02:00:00")]
    df = spark.createDataFrame(rows, "id long, url string, text string, ts string")
    df.withColumn("ts", F.to_timestamp("ts")).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "id long, url string, text string, ts timestamp"
    ).parquet(src)
    validated = validate_stream(plan, stream).select(
        "ts", F.size("violations").cast("double").alias("n_viol")
    )
    # baseline: everything valid (bucket 1 of [0,2)x2 grid = zero violations)
    drift = windowed_drift(
        validated, "n_viol", "ts", [0.0, 1.0, 0.0, 0.0], lo=0.0, hi=2.0,
        nbuckets=2, window_duration="1 hour", watermark="0 seconds",
    )
    out = str(tmp_path / "vdout")
    q = (
        drift.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "vdchk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["window_start"].hour: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {0, 1}
    assert not got[0]["drifted"]  # hour 0: all valid, matches baseline
    assert got[1]["drifted"]      # hour 1: every doc has a violation
