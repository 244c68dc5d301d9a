"""End-to-end corpus-curation pipeline: every stage a user of the engine
would chain for a training-data build, run back-to-back on the synthetic
crawl substrate.  The point is integration — stage outputs must feed the
next stage's expected schema — plus basic conservation invariants at each
step (a cross-operator regression here is invisible to the per-operator
tests)."""

from __future__ import annotations

from pyspark.sql import functions as F

from schema_validator_spark import ValidationPlan, schema
from schema_validator_spark.operators import cleaning, dedup, sampling
from schema_validator_spark.operators.textquality import (
    quality_classifier,
    token_count_whitespace,
)
from schema_validator_spark.sources.webpages import (
    extract_text,
    generate_web_pages,
)


def test_full_curation_pipeline(spark):
    n = 3000
    pages = generate_web_pages(spark, n)

    # 1. validate the raw crawl (schema gate) and keep passing rows
    s = schema()
    plan = ValidationPlan(
        s.object()
        .field("url", s.string().url())
        .field("text", s.string().min_length(1).optional())
    )
    validated = plan.apply(pages)
    docs = (
        validated.where("valid")
        .where(F.col("text").isNotNull())
        .select(
            F.xxhash64("url", "warc_ts").alias("doc_id"),
            "url",
            F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("host"),
            extract_text(F.col("html")).alias("extracted"),
            "text",
        )
    )
    n_docs = docs.count()
    assert 0 < n_docs <= n

    # 2. cleaning gates: badwords + gopher quality
    gates = cleaning.badword_filter(docs, "doc_id", ("spamword",)).select(
        "doc_id", F.col("kept").alias("bw_ok")
    )
    gopher = cleaning.gopher_quality(
        docs, "doc_id", min_words=5, min_stop_hits=0
    ).select("doc_id", "gopher_pass")
    scored = quality_classifier(docs, "doc_id", hash_fn="xxhash64").select(
        "doc_id", "q_pass"
    )
    kept = (
        docs.join(gates, "doc_id")
        .join(gopher, "doc_id")
        .join(scored, "doc_id")
        .where("bw_ok AND gopher_pass")
        .select("doc_id", "url", "host", "text")
    )
    n_kept = kept.count()
    assert 0 < n_kept <= n_docs

    # 3. near-dup removal: minhash candidates -> clusters -> keep smallest id
    pairs = dedup.minhash_near_duplicates(
        kept, "doc_id", threshold=0.5, num_hashes=16, bands=4,
        hash_fn="xxhash64",
    ).select("id_a", "id_b")
    clusters = dedup.near_dup_clusters(pairs, max_iter=8)
    losers = clusters.where("id != cluster_id").select(
        F.col("id").alias("doc_id")
    )
    unique_docs = kept.join(losers, "doc_id", "left_anti")
    n_unique = unique_docs.count()
    assert 0 < n_unique <= n_kept

    # 4. per-host caps (the 20%-bighost skew target), leakage-safe split
    capped = sampling.cap_per_key(unique_docs, "host", "doc_id", k=50)
    split = sampling.split_by_group(
        capped, "host", {"train": 0.9, "eval": 0.1}
    )
    assert split.where("split IS NULL").count() == 0
    per_host = split.groupBy("host").agg(
        F.count(F.lit(1)).alias("c"),
        F.count_distinct("split").alias("splits"),
    )
    bad = per_host.where("c > 50 OR splits > 1").count()
    assert bad == 0  # caps exact, no host straddles the split

    # 5. pack the train split into token-budget sequences and shard
    train = split.where("split = 'train'").select(
        "doc_id",
        "text",
        token_count_whitespace(F.col("text")).cast("bigint").alias("n_tok"),
    )
    seqs = sampling.assemble_sequences(
        train, "doc_id", "n_tok", "text", budget=200, n_streams=4, sep=" "
    )
    n_train = train.count()
    agg = seqs.agg(
        F.sum("n_docs").alias("docs"), F.sum("n_tokens").alias("toks")
    ).first()
    assert agg["docs"] == n_train  # every train doc lands in exactly one bin
    shards = sampling.shard_corpus(train, "doc_id", n_shards=4)
    assert shards.count() == n_train
