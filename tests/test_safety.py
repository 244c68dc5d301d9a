"""Decontamination + PII-redaction tests with planted ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_validator_spark.operators import safety
from schema_validator_spark.plans.inspect import plan_stats


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (1, "reach me at jane.doe+spam@mail.example.org thanks"),
        (2, "server is 192.168.10.254 and backup is 10.0.0.1"),
        (3, "call 555-867-5309 or 800.555.0199 today"),
        (4, "account 123456789012 is overdrawn"),
        (5, "plain text with no pii at all"),
        (6, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_redact_pii_counts_and_tokens(spark, pii_docs):
    out = {
        r["doc_id"]: r
        for r in safety.redact_pii(pii_docs.where("text is not null")).collect()
    }
    assert out[1]["n_email"] == 1 and "<EMAIL>" in out[1]["redacted"]
    assert "jane" not in out[1]["redacted"]
    assert out[2]["n_ip"] == 2 and out[2]["redacted"].count("<IP>") == 2
    assert out[3]["n_phone"] == 2 and out[3]["redacted"].count("<PHONE>") == 2
    assert out[4]["n_id"] == 1 and "<ID>" in out[4]["redacted"]
    assert out[5]["redacted"] == out[5]["text"]
    assert out[5]["n_email"] == out[5]["n_ip"] == 0


def test_redact_pii_is_single_projection(spark, pii_docs):
    stats = plan_stats(safety.redact_pii(pii_docs))
    assert stats["shuffles"] == 0
    assert stats["python_evals"] == 0


@pytest.fixture(scope="module")
def contamination_corpus(spark):
    bench_text = "the capital of france is paris and the capital of italy is rome"
    rows = [
        (10, bench_text),                                 # the benchmark doc itself
        (11, "trivia night said the capital of france is paris obviously"),  # leaked
        (12, "completely unrelated prose about spark shuffle behavior here"),
        (13, "rome is a city"),                           # too short to share a 5-gram
        (14, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contaminated_docs_flags_leaks(spark, contamination_corpus):
    bench = contamination_corpus.where(F.col("doc_id") == 10)
    hits = {
        r["doc_id"]: r
        for r in safety.contaminated_docs(
            contamination_corpus, bench, "doc_id", n_gram=5
        ).collect()
    }
    assert hits[10]["contaminated_frac"] == 1.0  # self-match
    assert 11 in hits and hits[11]["n_contaminated"] >= 1
    assert 12 not in hits and 13 not in hits and 14 not in hits


def test_decontaminate_removes_only_leaks(spark, contamination_corpus):
    bench = contamination_corpus.where(F.col("doc_id") == 10)
    kept = sorted(
        r["doc_id"]
        for r in safety.decontaminate(
            contamination_corpus, bench, "doc_id", n_gram=5
        ).collect()
    )
    assert kept == [12, 13, 14]


def test_contaminated_docs_broadcasts_benchmark(spark, contamination_corpus):
    bench = contamination_corpus.where(F.col("doc_id") == 10)
    bc = plan_stats(
        safety.contaminated_docs(contamination_corpus, bench, "doc_id")
    )
    assert bc["broadcasts"] >= 1
    sh = plan_stats(
        safety.contaminated_docs(
            contamination_corpus, bench, "doc_id", broadcast=False
        )
    )
    assert sh["broadcasts"] == 0
