"""Table-level operator tests: stats, uniqueness, referential, drift —
hand-computed expected values on planted data (SURVEY.md §5 test plan #2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_validator_spark.operators import drift, referential, stats, uniqueness


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        # (id, url, score, lang)
        (1, "https://a.com/1", 10.0, "en"),
        (2, "https://a.com/2", 20.0, "de"),
        (3, "https://a.com/2", 30.0, "fr"),   # dup url
        (4, "https://a.com/3", None, "xx"),   # null score, orphan lang
        (5, "https://a.com/4", 40.0, None),   # null lang
        (6, "https://a.com/2", 50.0, "en"),   # dup url again
    ]
    return spark.createDataFrame(rows, "id long, url string, score double, lang string")


def test_profile(spark, planted):
    row = stats.profile(planted, ["score", "lang"], exact_distinct=True).collect()[0]
    assert row["row_count"] == 6
    assert row["score_nulls"] == 1
    assert abs(row["score_null_rate"] - 1 / 6) < 1e-9
    assert row["score_min"] == 10.0 and row["score_max"] == 50.0
    assert row["score_distinct"] == 5
    assert row["lang_distinct"] == 4  # en, de, fr, xx
    assert row["score_mean"] == 30.0


def test_profile_grouped(spark, planted):
    out = stats.profile(planted, ["score"], group_by=["lang"]).collect()
    by_lang = {r["lang"]: r for r in out}
    assert by_lang["en"]["row_count"] == 2
    assert by_lang["en"]["score_min"] == 10.0


def test_histogram(spark, planted):
    hist = {
        r["bucket"]: r["cnt"]
        for r in stats.numeric_histogram(planted, "score", 0, 50, 5).collect()
    }
    # buckets: 10→2, 20→3, 30→4, 40→5, 50→overflow edge (50 == hi → bucket 6)
    assert hist == {2: 1, 3: 1, 4: 1, 5: 1, 6: 1}


def test_duplicate_keys(spark, planted):
    dups = uniqueness.duplicate_keys(planted, ["url"]).collect()
    assert len(dups) == 1
    assert dups[0]["url"] == "https://a.com/2" and dups[0]["dup_count"] == 3
    salted = uniqueness.duplicate_counts_salted(planted, ["url"], 4).collect()
    assert len(salted) == 1 and salted[0]["dup_count"] == 3


def test_dedup_exact_both_strategies(spark, planted):
    for strategy in ("window", "agg"):
        kept = uniqueness.dedup_exact(
            planted, ["url"], order_by=[F.col("id")], strategy=strategy
        )
        assert kept.count() == 4
        keeper = kept.where(F.col("url") == "https://a.com/2").collect()
        assert len(keeper) == 1 and keeper[0]["id"] == 2  # earliest id wins


def test_duplicate_violations(spark, planted):
    v = uniqueness.duplicate_violations(planted, ["url"]).collect()[0]
    assert v["code"] == "DUPLICATE_KEY"
    assert "appears 3 times" in v["message"]


def test_referential_orphans(spark, planted):
    dim = spark.createDataFrame(
        [("en",), ("de",), ("fr",)], "lang_code string"
    )
    for strategy in ("broadcast", "shuffle_hash", "auto"):
        o = referential.orphans(planted, dim, ["lang"], ["lang_code"], strategy)
        got = [r["id"] for r in o.collect()]
        assert got == [4], f"{strategy}: {got}"  # NULL lang (id 5) is NOT an orphan
    v = referential.referential_violations(planted, dim, ["lang"], ["lang_code"])
    row = v.collect()[0]
    assert row["code"] == "REFERENTIAL_ERROR" and "'xx'" in row["message"]


def test_drift_psi_and_ks(spark):
    # era A: uniform 0..99; era B: shifted 50..149 — must flag drift;
    # era A vs era A must not.
    a = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    b = spark.range(1000).select((F.col("id") % 100 + 50).cast("double").alias("v"))
    assert drift.psi(a, a, "v", 0, 150, 15) < 0.01
    assert drift.psi(a, b, "v", 0, 150, 15) > 0.25
    assert drift.ks_statistic(a, a, "v") < 0.05
    assert drift.ks_statistic(a, b, "v") > 0.3
    rep = drift.drift_report(a, b, "v", 0, 150, 15)
    assert rep["drifted"] is True
    # single-pass era-split variant computes the IDENTICAL value (same
    # counts, same fold) from one scan
    u = a.select("v", F.lit(True).alias("is_b")).unionAll(
        b.select("v", F.lit(False).alias("is_b"))
    )
    assert drift.psi_single_pass(u, "v", F.col("is_b"), 0, 150, 15) == drift.psi(
        a, b, "v", 0, 150, 15
    )
    # fixed-grid KS: deterministic sketch variant flags the same shift
    assert drift.ks_grid(a, a, "v", 0, 150, 15) < 0.01
    assert drift.ks_grid(a, b, "v", 0, 150, 15) > 0.3


def test_ks_exact_manual(spark):
    from schema_validator_spark.operators.drift import ks_exact

    b = spark.createDataFrame([(v,) for v in [1, 1, 2, 3]], "x long")
    c = spark.createDataFrame([(v,) for v in [2, 3, 3, 4]], "x long")
    # ECDFs: b: 1→.5, 2→.75, 3→1.0, 4→1.0 ; c: 1→0, 2→.25, 3→.75, 4→1.0
    # max diff at v=1: 0.5
    row = ks_exact(b, c, "x").collect()[0]
    assert row["col_name"] == "x"
    assert abs(row["ks"] - 0.5) < 1e-9


def test_ks_exact_cardinality_guard(spark):
    # VERDICT r4 #5: pointing ks_exact at a high-cardinality column must
    # raise toward the scale paths instead of planning a one-partition sort
    from schema_validator_spark.operators.drift import ks_exact, ks_grid

    b = spark.range(0, 2000).selectExpr("id * 2 + 1 as x")  # 2000 distinct
    c = spark.range(0, 2000).selectExpr("id * 2 as x")      # disjoint 2000
    with pytest.raises(ValueError, match="ks_grid"):
        ks_exact(b, c, "x", max_distinct=1000)
    # max_distinct=None forces the exact path regardless
    row = ks_exact(b, c, "x", max_distinct=None).collect()[0]
    assert 0.0 < row["ks"] <= 1.0
    # default cap (2M) admits ordinary enum/metric columns untouched
    assert ks_exact(b, c, "x").collect()[0]["ks"] == row["ks"]


def test_salted_uniqueness_hot_key(spark):
    # heavy-tail key: one url-host owns half the rows (the skew the salted
    # two-phase agg exists for) — salted counts must equal the plain hash-agg
    # exactly, for every bucket width
    rows = [(i, "https://hot.example/page") for i in range(500)]
    rows += [(1000 + i, f"https://cold{i}.example/") for i in range(200)]
    rows += [(2000 + i, "https://warm.example/x") for i in range(3)]
    df = spark.createDataFrame(rows, "id long, url string")
    want = {
        r["url"]: r["dup_count"]
        for r in uniqueness.duplicate_keys(df, ["url"]).collect()
    }
    assert want == {"https://hot.example/page": 500, "https://warm.example/x": 3}
    for buckets in (2, 32):
        got = {
            r["url"]: r["dup_count"]
            for r in uniqueness.duplicate_counts_salted(df, ["url"], buckets).collect()
        }
        assert got == want


def test_heavy_keys(spark):
    rows = [(i, "hot") for i in range(80)] + [(100 + i, f"k{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, key string")
    got = {r["key"]: (r["key_count"], r["share"]) for r in
           uniqueness.heavy_keys(df, ["key"], min_share=0.05).collect()}
    assert got == {"hot": (80, 0.8)}  # 1% keys below the share floor excluded
    # floor at 0 returns everything, counts exact
    all_keys = uniqueness.heavy_keys(df, ["key"], min_share=0.0)
    assert all_keys.count() == 21


def test_psi_multi_matches_single_pass(spark):
    rows = [(i, float(i % 100), float((i * 7) % 150)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    era = F.col("id") < 200
    multi = drift.psi_multi(df, {"x": (0.0, 160.0), "y": (0.0, 160.0)}, era, nbuckets=16)
    for c in ("x", "y"):
        single = drift.psi_single_pass(df, c, era, 0.0, 160.0, 16)
        assert abs(multi[c] - single) < 1e-12, (c, multi[c], single)


def test_asof_join_semantics(spark):
    from schema_validator_spark.operators.temporal import asof_join

    fact = spark.createDataFrame(
        [
            (1, "2024-01-01 09:00:00", "e0"),  # before any dim row -> NULL
            (1, "2024-01-01 10:00:00", "e1"),  # after v1
            (1, "2024-01-01 11:00:00", "e2"),  # exactly at v2 -> matches v2
            (1, "2024-01-01 12:00:00", "e3"),  # after v2
            (2, "2024-01-01 10:00:00", "e4"),  # other key, no dim rows
        ],
        "uid long, ts string, ev string",
    ).withColumn("ts", F.to_timestamp("ts"))
    dim = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", "v1"), (1, "2024-01-01 11:00:00", "v2")],
        "uid long, ts string, profile string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["ev"]: r["profile"]
        for r in asof_join(fact, dim, "uid", "ts", "ts").collect()
    }
    assert got == {"e0": None, "e1": "v1", "e2": "v2", "e3": "v2", "e4": None}


def test_asof_join_single_shuffle_plan(spark):
    from schema_validator_spark.operators.temporal import asof_join
    from schema_validator_spark.plans.inspect import plan_stats

    fact = spark.range(100).select(
        (F.col("id") % 5).alias("uid"), F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.col("id").alias("event_id"),
    )
    dim = spark.range(10).select(
        (F.col("id") % 5).alias("uid"),
        F.timestamp_seconds(F.col("id") * 500).alias("ts"),
        F.col("id").alias("v"),
    )
    stats = plan_stats(asof_join(fact, dim, "uid", "ts", "ts"))
    # merge shape: ONE shuffle on the key (the window), never |fact|x|dim|
    assert stats["shuffles"] == 1, stats


def test_range_join_boundaries(spark):
    from schema_validator_spark.operators.temporal import range_join
    from schema_validator_spark.plans.inspect import plan_stats

    fact = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 4.9, 5.0, 19.9, 20.0, 44.9, 45.0, 499.9, 500.0, -1.0])],
        "id long, v double",
    )
    bands = spark.createDataFrame(
        [(b, float(b * b * 5), float((b + 1) * (b + 1) * 5)) for b in range(10)],
        "band long, lo double, hi double",
    )
    out = range_join(fact, bands, "v", bucket_width=10.0)
    got = dict((r["id"], r["band"]) for r in out.collect())
    # half-open [lo, hi): boundary values land in the UPPER band
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3, 7: 9}
    # 500.0 and -1.0 fall outside every band -> dropped
    assert 8 not in got and 9 not in got
    # equi-join on the bucket (hash, broadcastable), never a nested loop
    from schema_validator_spark.plans.inspect import plan_string

    p = plan_string(out)
    assert plan_stats(out)["broadcasts"] >= 1, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_range_join_shuffle_strategy_never_broadcasts(spark):
    """The big-interval arm: strategy='shuffle_hash' must not plan a
    BroadcastExchange anywhere (VERDICT r3: an unconditional broadcast of the
    exploded entries OOMs on a large interval table) and must return exactly
    the broadcast arm's rows."""
    from schema_validator_spark.operators.temporal import range_join
    from schema_validator_spark.plans.inspect import plan_stats, plan_string

    fact = spark.createDataFrame(
        [(i, float(i % 50)) for i in range(200)], "id long, v double"
    )
    bands = spark.createDataFrame(
        [(b, float(b * 10), float(b * 10 + 10)) for b in range(5)],
        "band long, lo double, hi double",
    )
    shuffled = range_join(fact, bands, "v", bucket_width=5.0, strategy="shuffle_hash")
    p = plan_string(shuffled)
    assert plan_stats(shuffled)["broadcasts"] == 0, p
    assert "BroadcastNestedLoopJoin" not in p, p
    bcast = range_join(fact, bands, "v", bucket_width=5.0, strategy="broadcast")
    assert sorted(map(tuple, shuffled.collect())) == sorted(map(tuple, bcast.collect()))


def test_range_join_auto_gates_on_exact_entry_count(spark):
    """strategy='auto' counts the exploded entries in closed form and only
    broadcasts below the cap; above it the same call plans a shuffle join."""
    from schema_validator_spark.operators.temporal import range_join
    from schema_validator_spark.plans.inspect import plan_stats

    fact = spark.createDataFrame([(1, 3.0)], "id long, v double")
    bands = spark.createDataFrame(
        [(b, float(b * 10), float(b * 10 + 10)) for b in range(4)],
        "band long, lo double, hi double",
    )  # width 5 -> 2 entries per band -> 8 entries total
    small = range_join(fact, bands, "v", bucket_width=5.0, broadcast_max_entries=8)
    assert plan_stats(small)["broadcasts"] >= 1
    big = range_join(fact, bands, "v", bucket_width=5.0, broadcast_max_entries=7)
    assert plan_stats(big)["broadcasts"] == 0
    with pytest.raises(ValueError, match="strategy"):
        range_join(fact, bands, "v", strategy="nested_loop")


def test_asof_join_sliced_matches_unsliced_under_planted_skew(spark):
    """Skew hardening (VERDICT r3): one hot key owning 80% of the facts.
    slice_width must (a) change no result row and (b) partition the window
    by (key, slice) so the hot key's history spreads over its time slices
    instead of piling into one reducer."""
    from schema_validator_spark.operators.temporal import asof_join
    from schema_validator_spark.plans.inspect import plan_string

    # hot key 0: 800 facts over 40 slices; cold keys 1..199 one fact each
    fact = spark.range(1000).select(
        F.when(F.col("id") < 800, F.lit(0)).otherwise(F.col("id") - 799).alias("uid"),
        (F.col("id") * 37.0).alias("ts"),
        F.col("id").alias("event_id"),
    )
    dim = spark.range(50).select(
        (F.col("id") % 10).alias("uid"),
        (F.col("id") * 600.0).alias("ts"),
        F.col("id").alias("v"),
    )
    plain = asof_join(fact, dim, "uid", "ts", "ts")
    sliced = asof_join(fact, dim, "uid", "ts", "ts", slice_width=1000.0)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, sliced.collect()))
    p = plan_string(sliced)
    # the data-sized window sorts within (key, slice) partitions, never (key)
    assert "hashpartitioning(_k" in p and "_slice" in p, p


def test_asof_join_tie_break_modes(spark):
    from schema_validator_spark.operators.temporal import asof_join

    fact = spark.createDataFrame([(1, 10.0, 100)], "uid long, ts double, event_id long")
    dim = spark.createDataFrame(
        [(1, 5.0, "a"), (1, 5.0, "b")], "uid long, ts double, profile string"
    )
    # payload tie-break: deterministic greatest struct
    row = asof_join(fact, dim, "uid", "ts", "ts").collect()[0]
    assert row["profile"] == "b"
    # 'any' must still produce ONE of the tied rows
    row = asof_join(fact, dim, "uid", "ts", "ts", tie_break="any").collect()[0]
    assert row["profile"] in ("a", "b")
    with pytest.raises(ValueError, match="tie_break"):
        asof_join(fact, dim, "uid", "ts", "ts", tie_break="max")


def test_vocab_topk_counts_and_order(spark):
    from schema_validator_spark.operators.textquality import vocab_topk

    rows = [
        (1, "The cat  sat on the mat"),
        (2, "the cat ran"),
        (3, None),
        (4, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = vocab_topk(df, "doc_id", k=3).collect()
    # 'the' 3x in 2 docs, 'cat' 2x in 2 docs, then alphabetical among 1x words
    assert [(r["word"], r["n_occurrences"], r["n_docs"]) for r in out] == [
        ("the", 3, 2),
        ("cat", 2, 2),
        ("mat", 1, 1),
    ]


def test_vocab_topk_take_ordered_plan(spark):
    from schema_validator_spark.operators.textquality import vocab_topk

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = vocab_topk(df, "doc_id", k=5)._jdf.queryExecution().sparkPlan().toString()
    # top-k must be a per-partition heap merge, not a global sort shuffle
    assert "TakeOrderedAndProject" in plan


def test_iqr_outliers(spark):
    # 1..100 plus two wild sentinels
    rows = [(i, i % 100 + 1) for i in range(100)] + [(1000, 10_000), (1001, -500)]
    df = spark.createDataFrame(rows, "id long, v long")
    r = stats.iqr_outliers(df, "v").collect()[0]
    # quartiles of 1..100,10000,-500 sorted: exact quarters
    assert r["q1"] < r["q3"] and r["lo_fence"] < r["q1"]
    assert r["n_rows"] == 102
    assert r["n_high"] == 1 and r["n_low"] == 1  # the two sentinels
    assert abs(r["outlier_rate"] - round(2 / 102, 6)) < 1e-9
    # approx path runs and returns the same shape
    ra = stats.iqr_outliers(df, "v", exact=False).collect()[0]
    assert ra["n_rows"] == 102 and ra["n_high"] >= 1
    # all-NULL column -> zero counts, NULL fences
    dn = spark.createDataFrame([(1, None)], "id long, v double")
    rn = stats.iqr_outliers(dn, "v").collect()[0]
    assert rn["n_rows"] == 0 and rn["q1"] is None and rn["n_low"] == 0


def test_benford_check(spark):
    import math

    # 1..9999 follows Benford-ish leading digits closely enough to sanity-
    # check shares; negatives/NULLs/zeros excluded
    rows = [(i, i) for i in range(1, 10000)] + [(100000, -5), (100001, None), (100002, 0)]
    df = spark.createDataFrame(rows, "id long, v long")
    out = {r["digit"]: r for r in stats.benford_check(df, "v").collect()}
    assert set(out) == {str(d) for d in range(1, 10)}
    assert sum(r["n"] for r in out.values()) == 9999
    # expected_p literals are the Benford values
    for d in range(1, 10):
        assert abs(out[str(d)]["expected_p"] - math.log10(1 + 1 / d)) < 1e-12
    # uniform-ish 1..9999 has each digit ~1111/9999
    assert abs(out["9"]["observed_p"] - 1111 / 9999) < 1e-3
    assert out["1"]["deviation"] > 0


def test_benford_check_fractional_values(spark):
    # values in (0, 1) must report their first SIGNIFICANT digit, never a
    # spurious '0' row with NULL expected_p (ADVICE r4: bigint cast
    # truncated them)
    rows = [
        (1, 0.00123),  # -> '1'
        (2, 0.5),      # -> '5'
        (3, 0.987),    # -> '9'
        (4, 123.4),    # -> '1'
        (5, 7.0),      # -> '7'
        (6, 1e-7),     # sci-notation rendering, still -> '1'
    ]
    df = spark.createDataFrame(rows, "id long, v double")
    out = {r["digit"]: r["n"] for r in stats.benford_check(df, "v").collect()}
    assert out == {"1": 3, "5": 1, "7": 1, "9": 1}
    # every emitted row carries a real expected_p (digit is always 1..9)
    for r in stats.benford_check(df, "v").collect():
        assert r["expected_p"] is not None


def test_categorical_entropy(spark):
    import math

    # 4 equally likely categories -> H = ln 4, normalized 1.0
    rows = [(i, ["a", "b", "c", "d"][i % 4]) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, cat string")
    r = stats.categorical_entropy(df, "cat").collect()[0]
    assert r["n_rows"] == 400 and r["n_categories"] == 4
    assert abs(r["entropy"] - math.log(4)) < 1e-6
    assert abs(r["normalized_entropy"] - 1.0) < 1e-6
    # constant column -> entropy 0, normalized NULL (one category)
    dc = spark.createDataFrame([(i, "x") for i in range(10)], "id long, cat string")
    rc = stats.categorical_entropy(dc, "cat").collect()[0]
    assert rc["entropy"] == 0.0 and rc["normalized_entropy"] is None
    # all NULL -> zero rows, NULL entropy
    dn = spark.createDataFrame([(1, None)], "id long, cat string")
    rn = stats.categorical_entropy(dn, "cat").collect()[0]
    assert rn["n_rows"] == 0 and rn["entropy"] is None
