"""Corpus-curation operators: hashed-feature quality classifier, sequence
packing, skew-proof per-key caps."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from schema_validator_spark.operators import sampling
from schema_validator_spark.operators.textquality import quality_classifier
from schema_validator_spark.plans.inspect import plan_stats, plan_string


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # identical text
        (3, "completely different content with other words entirely"),
        (4, ""),  # empty -> zero features
        (5, None),  # NULL -> zero features
        (6, "single"),  # one word -> one unigram, no bigrams
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_quality_classifier_deterministic_and_bounded(spark, docs):
    out = {r["doc_id"]: r for r in quality_classifier(docs, "doc_id").collect()}
    assert len(out) == 6  # empty/NULL docs survive with zero features
    # identical text -> identical score
    assert out[1]["score"] == out[2]["score"]
    assert out[1]["raw_score"] == out[2]["raw_score"]
    # 9 words -> 9 unigrams + 8 bigrams
    assert out[1]["n_features"] == 17
    assert out[6]["n_features"] == 1
    for r in out.values():
        assert -1.0 <= r["score"] <= 1.0
        assert r["q_pass"] == (r["score"] >= 0.0)
    assert out[4]["n_features"] == 0 and out[4]["score"] == 0.0
    assert out[5]["n_features"] == 0 and out[5]["score"] == 0.0
    # different text should (with overwhelming probability) score differently
    assert out[1]["raw_score"] != out[3]["raw_score"]


def test_quality_classifier_seed_changes_weights(spark, docs):
    a = quality_classifier(docs, "doc_id", seed="qc").where("doc_id = 1").first()
    b = quality_classifier(docs, "doc_id", seed="other").where("doc_id = 1").first()
    assert a["n_features"] == b["n_features"]
    assert a["raw_score"] != b["raw_score"]


def test_quality_classifier_xxhash64_fast_path(spark, docs):
    out = {
        r["doc_id"]: r
        for r in quality_classifier(docs, "doc_id", hash_fn="xxhash64").collect()
    }
    md5 = {r["doc_id"]: r for r in quality_classifier(docs, "doc_id").collect()}
    # same feature extraction, different weight family
    assert all(out[i]["n_features"] == md5[i]["n_features"] for i in out)
    assert all(-1.0 <= r["score"] <= 1.0 for r in out.values())
    assert out[1]["raw_score"] == out[2]["raw_score"]  # identical text
    with pytest.raises(ValueError, match="hash_fn"):
        quality_classifier(docs, "doc_id", hash_fn="sha1").collect()


def test_quality_classifier_no_python(spark, docs):
    stats = plan_stats(quality_classifier(docs, "doc_id"))
    assert stats["python_evals"] == 0


@pytest.fixture(scope="module")
def weight_table(spark):
    # 64-bucket integer-valued double weights: bucket b -> (b*7 % 21) - 10
    return spark.range(64).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * 7 % 21) - 10).cast("double").alias("weight"),
    )


def test_quality_classifier_weight_table(spark, docs, weight_table):
    out = {
        r["doc_id"]: r
        for r in quality_classifier(
            docs, "doc_id", weights=weight_table, n_buckets=64
        ).collect()
    }
    assert len(out) == 6
    # identical text -> identical score; score is mean bucket weight
    assert out[1]["raw_score"] == out[2]["raw_score"]
    assert out[1]["n_features"] == 17
    assert out[4]["n_features"] == 0 and out[4]["score"] == 0.0
    assert out[5]["n_features"] == 0 and out[5]["score"] == 0.0
    for r in out.values():
        if r["n_features"]:
            assert abs(r["score"] - round(r["raw_score"] / r["n_features"], 6)) < 1e-12
        assert r["q_pass"] == (r["score"] >= 0.0)
    # ground truth for doc 6 ("single"): one unigram, weight of its bucket
    from schema_validator_spark.operators.textquality import hashed_feature_bucket

    b = (
        spark.range(1)
        .select(hashed_feature_bucket(F.lit("single"), "qc", 64).alias("b"))
        .first()["b"]
    )
    expected_w = float((b * 7 % 21) - 10)
    assert out[6]["raw_score"] == expected_w


def test_quality_classifier_weight_table_unmatched_bucket_is_zero(spark, docs):
    # a weight table covering NO buckets -> every feature weighs 0.0
    empty_w = spark.range(0).select(
        F.col("id").alias("bucket"), F.col("id").cast("double").alias("weight")
    )
    out = {
        r["doc_id"]: r
        for r in quality_classifier(
            docs, "doc_id", weights=empty_w, n_buckets=64
        ).collect()
    }
    assert all(r["raw_score"] == 0.0 and r["score"] == 0.0 for r in out.values())
    assert out[1]["n_features"] == 17  # features still counted


def test_quality_classifier_weight_table_plan_shapes(spark, docs, weight_table):
    # default: the weight table is BROADCAST (never a sort-merge shuffle)
    stats = plan_stats(
        quality_classifier(docs, "doc_id", weights=weight_table, n_buckets=64)
    )
    assert stats["broadcasts"] == 1 and stats["python_evals"] == 0
    # opt-out: shuffle_hash hint, no broadcast exchange of the weights
    p = quality_classifier(
        docs, "doc_id", weights=weight_table, n_buckets=64,
        broadcast_weights=False,
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in p and "SortMergeJoin" not in p


@pytest.fixture(scope="module")
def sized_docs(spark):
    # 100 docs, token counts 1..100
    rows = [(i, (i % 100) + 1) for i in range(100)]
    return spark.createDataFrame(rows, "doc_id long, n_tok long")


def test_pack_sequences_invariants(spark, sized_docs):
    out = sampling.pack_sequences(
        sized_docs, "doc_id", "n_tok", budget=128, n_streams=4
    ).collect()
    assert len(out) == 100
    by_stream = {}
    for r in out:
        by_stream.setdefault(r["stream"], []).append(r)
    assert set(by_stream) <= set(range(4))
    for rows in by_stream.values():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            # bin/offset reproduce the exclusive running total exactly
            assert r["seq_bin"] == cum // 128
            assert r["bin_offset"] == cum % 128
            cum += r["n_tokens"]
        # bins are contiguous starting at 0
        bins = sorted({r["seq_bin"] for r in rows})
        assert bins == list(range(len(bins)))


def test_pack_sequences_oversized_doc_gets_own_bin_slot(spark):
    df = spark.createDataFrame(
        [(1, 500), (2, 10), (3, 10)], "doc_id long, n_tok long"
    )
    out = {
        r["doc_id"]: r
        for r in sampling.pack_sequences(
            df, "doc_id", "n_tok", budget=100, n_streams=1
        ).collect()
    }
    # whatever order the hash stream puts them in, every offset < budget
    assert all(r["bin_offset"] < 100 for r in out.values())
    # total bins spanned >= ceil(520/100)
    assert max(r["seq_bin"] for r in out.values()) >= 5


def test_cap_per_key_exact_and_matches_global_order(spark):
    rows = [(i, "hot" if i % 5 != 4 else f"cold{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    out = sampling.cap_per_key(df, "host", "doc_id", k=7, n_salts=4).collect()
    kept = {}
    for r in out:
        kept.setdefault(r["host"], []).append(r)
    assert len(kept["hot"]) == 7
    assert sorted(r["key_rank"] for r in kept["hot"]) == list(range(1, 8))
    for host, rs in kept.items():
        if host != "hot":
            assert len(rs) == 1 and rs[0]["key_rank"] == 1
    # ground truth: single global window in (salt, h, id) order
    h = sampling.hash24(F.col("doc_id"))
    expect = (
        df.withColumn("_h", h)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("host").orderBy(
                    F.pmod(F.col("_h"), F.lit(4)), "_h", "doc_id"
                )
            ),
        )
        .where("rk <= 7")
        .select("doc_id")
    )
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in expect.collect()}


def test_cap_per_key_rejects_bad_k(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, host string")
    with pytest.raises(ValueError):
        sampling.cap_per_key(df, "host", "doc_id", k=0)


def test_upsample_mixture_fractional_epochs(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.upsample_mixture(
        df, "doc_id", "lang", {"en": 2.5, "de": 1.0, "fr": 0.0}
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        lang = rs[0]["lang"]
        # epochs are contiguous 1..n and n matches the stratum weight
        assert sorted(r["epoch"] for r in rs) == list(range(1, len(rs) + 1))
        if lang == "en":
            assert len(rs) in (2, 3)
        else:
            assert lang == "de" and len(rs) == 1
    # weight-0 stratum dropped entirely
    assert all(rs[0]["lang"] != "fr" for rs in by_doc.values())
    # expected copies per en doc = 2.5; 100 docs -> binomial(100, .5)+200
    n_en = sum(len(rs) for rs in by_doc.values() if rs[0]["lang"] == "en")
    assert 220 <= n_en <= 280
    # deterministic across runs
    again = sampling.upsample_mixture(
        df, "doc_id", "lang", {"en": 2.5, "de": 1.0, "fr": 0.0}
    ).collect()
    assert {(r["doc_id"], r["epoch"]) for r in out} == {
        (r["doc_id"], r["epoch"]) for r in again
    }


def test_upsample_mixture_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    stats = plan_stats(sampling.upsample_mixture(df, "doc_id", "lang", {"en": 1.5}))
    assert stats["shuffles"] == 0 and stats["python_evals"] == 0


def test_upsample_mixture_rejects_negative_weight(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        sampling.upsample_mixture(df, "doc_id", "lang", {"en": -1.0})


def test_upsample_mixture_null_id_keeps_floor_copies(spark):
    # ADVICE r4: a NULL id must still get floor(w) deterministic copies
    # (the fractional-copy hash term coalesces to 0, matching the
    # CASE...ELSE 0 oracle shape) — not be silently dropped by NULL math.
    rows = [(None, "en"), (1, "en"), (None, "de")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.upsample_mixture(df, "doc_id", "lang", {"en": 2.5, "de": 0.5})
    got = [(r["doc_id"], r["lang"], r["epoch"]) for r in out.collect()]
    # NULL en id: exactly floor(2.5)=2 copies; NULL de id: floor(0.5)=0 -> dropped
    assert sorted(e for d, l, e in got if d is None and l == "en") == [1, 2]
    assert all(l != "de" or d is not None for d, l, e in got)


def test_split_by_group_no_group_straddles(spark):
    rows = [(i, f"host{i % 40}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    out = sampling.split_by_group(
        df, "host", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).collect()
    assert len(out) == 400
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], set()).add(r["split"])
    # the whole point: one split per group, never NULL when fractions sum to 1
    for splits in by_host.values():
        assert len(splits) == 1 and None not in splits
    names = {r["split"] for r in out}
    assert names <= {"train", "val", "test"}
    counts = {n: sum(1 for r in out if r["split"] == n) for n in names}
    assert counts.get("train", 0) > counts.get("val", 0)


def test_split_by_group_remainder_is_null_holdout(spark):
    rows = [(i, f"g{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    out = sampling.split_by_group(df, "g", {"train": 0.5}).collect()
    n_null = sum(1 for r in out if r["split"] is None)
    n_train = sum(1 for r in out if r["split"] == "train")
    assert n_null + n_train == 200 and n_null > 50 and n_train > 50


def test_split_by_group_zero_shuffle_and_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, g string")
    stats = plan_stats(sampling.split_by_group(df, "g", {"train": 1.0}))
    assert stats["shuffles"] == 0 and stats["python_evals"] == 0
    with pytest.raises(ValueError):
        sampling.split_by_group(df, "g", {"train": 0.9, "val": 0.2})
    with pytest.raises(ValueError):
        sampling.split_by_group(df, "g", {})


def test_shard_corpus_layout(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    out = sampling.shard_corpus(df, "doc_id", n_shards=8).collect()
    assert len(out) == 300
    shards = {}
    for r in out:
        shards.setdefault(r["shard"], []).append(r)
    assert set(shards) <= set(range(8))
    # positions are a contiguous 1..n ranking per shard
    for rows in shards.values():
        assert sorted(r["shard_pos"] for r in rows) == list(range(1, len(rows) + 1))
    # deterministic across runs
    again = sampling.shard_corpus(df, "doc_id", n_shards=8).collect()
    assert {(r["doc_id"], r["shard"], r["shard_pos"]) for r in out} == {
        (r["doc_id"], r["shard"], r["shard_pos"]) for r in again
    }
    # the layout is a shuffle: consecutive ids don't stay consecutive
    pos = {r["doc_id"]: (r["shard"], r["shard_pos"]) for r in out}
    same_shard_adjacent = sum(
        1 for i in range(299)
        if pos[i][0] == pos[i + 1][0] and abs(pos[i][1] - pos[i + 1][1]) == 1
    )
    assert same_shard_adjacent < 30


def test_assemble_sequences_matches_pack_and_orders_text(spark):
    rows = [(i, f"doc{i}", 30) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_tok long")
    packed = {
        r["doc_id"]: r
        for r in sampling.pack_sequences(
            df, "doc_id", "n_tok", budget=100, n_streams=4
        ).collect()
    }
    out = sampling.assemble_sequences(
        df, "doc_id", "n_tok", "text", budget=100, n_streams=4, sep="|"
    ).collect()
    # every doc's (stream, bin) assignment matches pack_sequences exactly
    assigned = {}
    for r in out:
        for t in r["seq_text"].split("|"):
            assigned[int(t[3:])] = (r["stream"], r["seq_bin"])
    assert len(assigned) == 40
    for i, (stream, seq_bin) in assigned.items():
        assert packed[i]["stream"] == stream and packed[i]["seq_bin"] == seq_bin
    # in-bin order is id order; totals add up
    for r in out:
        ids = [int(t[3:]) for t in r["seq_text"].split("|")]
        assert ids == sorted(ids)
        assert r["n_docs"] == len(ids) and r["n_tokens"] == 30 * len(ids)


def test_assemble_sequences_single_shuffle(spark):
    df = spark.createDataFrame(
        [(1, "a", 5)], "doc_id long, text string, n_tok long"
    )
    stats = plan_stats(
        sampling.assemble_sequences(df, "doc_id", "n_tok", "text", budget=10)
    )
    # window shuffle only: the (stream, bin) agg reuses hashpartitioning(stream)
    assert stats["shuffles"] == 1 and stats["python_evals"] == 0


def test_output_column_collisions_rejected(spark):
    df = spark.createDataFrame(
        [(1, "en", "x", 1)], "doc_id long, lang string, split string, epoch long"
    )
    with pytest.raises(ValueError, match="split"):
        sampling.split_by_group(df, "lang", {"train": 1.0})
    with pytest.raises(ValueError, match="epoch"):
        sampling.upsample_mixture(df, "doc_id", "lang", {"en": 1.0})
    df2 = spark.createDataFrame(
        [(1, "h", 2, 3)], "doc_id long, host string, shard long, key_rank long"
    )
    with pytest.raises(ValueError, match="shard"):
        sampling.shard_corpus(df2, "doc_id", n_shards=2)
    with pytest.raises(ValueError, match="key_rank"):
        sampling.cap_per_key(df2, "host", "doc_id", k=1)
    from schema_validator_spark.operators.dedup import dedup_against_catalog

    df3 = spark.createDataFrame(
        [(1, "t", "f")], "doc_id long, text string, fingerprint string"
    )
    with pytest.raises(ValueError, match="fingerprint"):
        dedup_against_catalog(df3, df3.select("fingerprint"), "doc_id")


# ---------------------------------------------------------------------------
# domain-level curation (webpages.domain_stats / domain_filter)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def crawl(spark):
    rows = [
        # healthy host (case-variant spelling, a port, a userinfo prefix all
        # collapse onto one host; every doc its own page)
        (1, "https://Good.Example.org/a", 10),
        (2, "https://good.example.org:8080/b", 20),
        (3, "https://u:PW@good.example.org/c", 30),
        # mirror host: 4 docs on 2 pages -> dup_share 0.5
        (4, "https://mirror.example.com/x", 5),
        (5, "https://mirror.example.com/x", 5),
        (6, "https://mirror.example.com/x", 5),
        (7, "https://mirror.example.com/y", 5),
        # singleton host -> fails min_docs
        (8, "https://tiny.example.net/only", 7),
        # schemeless value -> '' junk bucket
        (9, "not-a-url", 1),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string, nbytes long")


def test_domain_stats_values(spark, crawl):
    from schema_validator_spark.sources.webpages import domain_stats

    out = {
        r["host"]: r
        for r in domain_stats(
            crawl, "url", size_col="nbytes", min_docs=2, max_dup_share=0.4
        ).collect()
    }
    assert set(out) == {"good.example.org", "mirror.example.com", "tiny.example.net", ""}
    g = out["good.example.org"]
    assert (g["n_docs"], g["n_pages"], g["dup_share"], g["kept"]) == (3, 3, 0.0, True)
    assert (g["sum_size"], g["avg_size"]) == (60, 20.0)
    m = out["mirror.example.com"]
    assert (m["n_docs"], m["n_pages"], m["dup_share"], m["kept"]) == (4, 2, 0.5, False)
    assert (m["sum_size"], m["avg_size"]) == (20, 5.0)
    assert out["tiny.example.net"]["kept"] is False  # min_docs
    assert out[""]["n_docs"] == 1 and out[""]["kept"] is False


def test_domain_stats_approx_same_verdicts(spark, crawl):
    from schema_validator_spark.sources.webpages import domain_stats

    exact = domain_stats(crawl, "url", min_docs=2, max_dup_share=0.4)
    approx = domain_stats(crawl, "url", min_docs=2, max_dup_share=0.4, approx=True)
    e = {r["host"]: r for r in exact.collect()}
    a = {r["host"]: r for r in approx.collect()}
    assert set(e) == set(a)
    for h in e:  # HLL is exact at these cardinalities
        assert e[h]["n_docs"] == a[h]["n_docs"]
        assert e[h]["kept"] == a[h]["kept"]


def test_domain_filter_survivors_and_plan(spark, crawl):
    from schema_validator_spark.sources.webpages import domain_filter

    out = domain_filter(crawl, "url", min_docs=2, max_dup_share=0.4)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 3]
    assert out.columns == crawl.columns  # helper column dropped
    p = plan_string(out)
    assert "LeftSemi" in p and "CartesianProduct" not in p
    s = plan_stats(out)
    assert s["python_evals"] == 0


def test_host_of_edges(spark):
    from schema_validator_spark.sources.webpages import host_of

    df = spark.createDataFrame(
        [
            ("https://A.B.c/x",),
            ("http://u@H.example:80/p",),
            ("ftp://h1.example",),
            ("no-scheme.example/x",),
            ("https://[::1]:443/x",),  # bracketed IPv6: documented junk bucket
        ],
        "u string",
    )
    got = [r[0] for r in df.select(host_of(F.col("u"))).collect()]
    assert got == ["a.b.c", "h.example", "h1.example", "", "["]
