"""Training-data safety operators: benchmark decontamination + PII redaction.

Two first-class steps of an LLM training-data pipeline that sit between
dedup and sampling:

- **decontamination** — remove corpus documents that share word n-grams with
  an evaluation benchmark, so test data never leaks into training data
  (the n-gram-overlap rule used by GPT-3/PaLM/Llama data cards; typically
  8-13 grams at crawl scale, smaller for short synthetic docs).
- **PII redaction** — replace emails / IPv4s / phone numbers / long digit
  runs with typed placeholder tokens (the C4/Dolma-style regex scrub).

Both are native Column pipelines (zero Python on the hot path) built from
dialect-portable regex primitives so each has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingled_docs

# RE2-and-Java-portable patterns (no lookaround, no backreferences; \d and
# \b mean the same ASCII thing in both engines).  Order matters: emails are
# redacted before IPs/phones so their digit runs can't be re-matched, and
# bare long digit runs are redacted last as the catch-all.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("id", r"\b\d{9,}\b", "<ID>"),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Append ``out_col`` (the scrubbed text) plus one ``n_<kind>`` count per
    PII pattern (counts measured on the ORIGINAL text, before any rewrite).

    Pure per-row projection: whole-stage codegen, zero shuffle, partitioning
    preserved — the 100 TB cost is exactly one scan.  DuckDB oracle:
    ``regexp_replace(..., 'g')`` chained in the same order and
    ``len(regexp_extract_all(...))`` for the counts.
    """
    t = F.col(text_col)
    counts = [
        F.regexp_count(t, F.lit(pat)).alias(f"n_{kind}")
        for kind, pat, _ in PII_PATTERNS
    ]
    red: Column = t
    for _, pat, token in PII_PATTERNS:
        red = F.regexp_replace(red, pat, token)
    return df.select("*", *counts, red.alias(out_col))


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    n_gram: int = 5,
    broadcast: bool = True,
) -> DataFrame:
    """Corpus documents sharing at least one word ``n_gram`` with the
    benchmark: (doc_id, n_contaminated, n_grams, contaminated_frac).

    Shape for 10^12 docs: the benchmark side reduces to its DISTINCT n-gram
    set (eval suites are tiny — thousands of docs), which is broadcast; the
    corpus side explodes its distinct grams and probes the broadcast hash
    table, so the only shuffle is the final per-doc count aggregation
    (map-side combined on the doc id).  ``broadcast=False`` switches to a
    shuffle-hash join for blocklists too large to broadcast (mirrors
    referential.py's strategy switch).  Degenerate (NULL/whitespace-only)
    docs can't be contaminated and are pruned by ``shingled_docs``.
    """
    bench_id = bench_id_col or id_col
    bench_text = bench_text_col or text_col
    bench_grams = (
        shingled_docs(benchmark, bench_id, bench_text, n_gram)
        .select(F.explode("_shingles").alias("_g"))
        .distinct()
    )
    corpus_grams = shingled_docs(corpus, id_col, text_col, n_gram).select(
        "_id", F.size("_shingles").alias("_n"), F.explode("_shingles").alias("_g")
    )
    if broadcast:
        joined = corpus_grams.join(F.broadcast(bench_grams), "_g", "inner")
    else:
        joined = corpus_grams.join(
            bench_grams.hint("SHUFFLE_HASH"), "_g", "inner"
        )
    return (
        joined.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_contaminated"),
            F.first("_n").alias("n_grams"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_contaminated",
            "n_grams",
            F.round(
                F.col("n_contaminated") / F.col("n_grams").cast("double"), 6
            ).alias("contaminated_frac"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_hits: int = 1,
    **kwargs,
) -> DataFrame:
    """The corpus with contaminated documents removed (left-anti join against
    ``contaminated_docs`` with at least ``min_hits`` shared n-grams).  The
    anti-join build side is the (tiny) contaminated id set, so Spark
    broadcast-selects it under AQE; corpus rows never shuffle."""
    hits = contaminated_docs(corpus, benchmark, id_col, text_col, **kwargs)
    bad = hits.where(F.col("n_contaminated") >= min_hits).select(id_col)
    return corpus.join(bad, id_col, "left_anti")
