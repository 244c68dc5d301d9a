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
