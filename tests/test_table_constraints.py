"""Schema-declared table constraints: unique() / ref() compiled by
ValidationPlan.table_violations + the run_full north-star job."""

from pyspark.sql import functions as F

from schema_validator_spark import ValidationPlan, schema
from schema_validator_spark.sources.webpages import generate_web_pages, lang_dim


def test_unique_and_ref_violations(spark):
    rows = [
        (0, "https://a.com/x", "en"),
        (1, "https://a.com/x", "de"),   # dup url
        (2, "https://b.com/y", "xx"),   # orphan lang
        (3, "https://c.com/z", "fr"),
        (4, None, "en"),                # NULL url: not a uniqueness key hit
    ]
    df = spark.createDataFrame(rows, "id long, url string, lang string")
    s = schema()
    obj = (
        s.object()
        .field("url", s.string().url().unique())
        .field("lang", s.string().pattern(r"^[a-z]{2}$"))
        .ref("lang", "lang_dim", "lang_code")
    )
    plan = ValidationPlan(obj)
    tv = plan.table_violations(df, dims={"lang_dim": lang_dim(spark)})
    got = {(r["field"], r["key"], r["code"]) for r in tv.collect()}
    assert got == {
        ("url", "https://a.com/x", "DUPLICATE_KEY"),
        ("lang", "xx", "REFERENTIAL_ERROR"),
    }
    msgs = {r["key"]: r["message"] for r in tv.collect()}
    assert "appears 2 times" in msgs["https://a.com/x"]
    assert "not found in lang_dim" in msgs["xx"]


def test_salted_unique_matches_plain(spark):
    """Salted two-phase counts must equal the plain hash-agg on the skewed
    web_pages generator (bighost owns ~20% of rows)."""
    web = generate_web_pages(spark, 3000)
    host = F.regexp_extract("url", r"://([^/]+)/", 1)
    df = web.select(host.alias("host"))
    s = schema()
    plain = ValidationPlan(
        s.object().field("host", s.string().unique())
    ).table_violations(df)
    salted = ValidationPlan(
        s.object().field("host", s.string().unique(skew_salt=16))
    ).table_violations(df)
    a = {(r["key"], r["message"]) for r in plain.collect()}
    b = {(r["key"], r["message"]) for r in salted.collect()}
    assert a == b and len(a) > 0


def test_run_full(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s = schema()
    obj = (
        s.object()
        .field("text", s.string().min_length(100).unique())
        .field("lang", s.string().pattern(r"^[a-z]{2}$"))
    )
    out = ValidationPlan(obj).run_full(docs, partition_cols=["lang"])
    assert set(out) == {"validated", "verdicts", "profile", "table_violations"}
    verd = out["verdicts"].collect()
    assert sum(r["total_rows"] for r in verd) == docs.count()
    prof = out["profile"].collect()[0]
    assert prof["text_nulls"] == 0
    assert out["table_violations"].count() == 0  # texts are distinct
    missing_dim = ValidationPlan(
        s.object().field("lang", s.string()).ref("lang", "dim", "code")
    )
    try:
        missing_dim.table_violations(docs)
        assert False, "expected ValueError for missing dim"
    except ValueError:
        pass


def test_row_level_checks(spark):
    rows = [
        (0, "hello", 5, 10),     # all pass
        (1, "hello", 4, 10),     # len mismatch
        (2, "hi", 2, 99),        # score out of range (custom code+message)
        (3, None, None, 10),     # NULL predicate = pass (SQL CHECK semantics)
    ]
    df = spark.createDataFrame(rows, "id long, text string, n long, score long")
    s = schema()
    obj = (
        s.object()
        .field("text", s.string().optional())
        .check("len_consistent", F.length("text") == F.col("n"))
        .check("score_range", "score <= 50", message="score too big", code="SCORE_HIGH")
    )
    plan = ValidationPlan(obj)
    out = plan.apply(df)
    valid = {r["id"]: r["valid"] for r in out.collect()}
    assert valid == {0: True, 1: False, 2: False, 3: True}
    viols = {
        (r["id"], r["field"]): (r["code"], r["message"], r["error_type"])
        for r in plan.violations(out, ["id"]).collect()
    }
    assert viols[(1, "len_consistent")] == (
        "CHECK_ERROR", "Check failed: 'len_consistent'", "Check"
    )
    assert viols[(2, "score_range")] == ("SCORE_HIGH", "score too big", "Check")
    assert (3, "len_consistent") not in viols  # NULL comparison passes


def test_checks_keep_single_projection_plan(spark):
    # checks must fuse into the one validation projection: no shuffle, no
    # extra scan, and a verdict-only consumer still prunes the struct
    # machinery (valid stays a pure-boolean conjunction)
    df = generate_web_pages(spark, 100)
    s = schema()
    obj = (
        s.object()
        .field("url", s.string().url())
        .check("text_present", F.col("text").isNotNull() | F.col("lang").isNull())
    )
    out = ValidationPlan(obj).apply(df)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p
    verdict_plan = (
        out.select("valid")._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "violations" not in verdict_plan and "named_struct" not in verdict_plan


def test_table_level_checks(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, v double")
    s = schema()
    obj = (
        s.object()
        .field("v", s.number())
        .table_check("min_rows", "count(*) >= 100", metric="count(*)")
        .table_check("avg_v_ok", F.avg("v") < 100.0)
        .table_check(
            "null_gate", "avg(CASE WHEN false THEN 1 END) > 0",
            message="gate unverifiable", code="GATE_NULL",
        )
    )
    tv = ValidationPlan(obj).table_violations(df)
    got = {r["field"]: (r["key"], r["code"], r["message"]) for r in tv.collect()}
    assert got["min_rows"] == ("10", "TABLE_CHECK_ERROR", "Table check failed: 'min_rows'")
    assert got["null_gate"] == (None, "GATE_NULL", "gate unverifiable")  # NULL pred = FAIL
    assert "avg_v_ok" not in got  # passing gate emits nothing
