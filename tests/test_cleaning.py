"""Web-text cleaning tests: C4 line filter, frequent-line removal, Gopher
quality gates — planted ground truth + plan-shape guards."""

from __future__ import annotations

import pytest

from schema_validator_spark.operators import cleaning
from schema_validator_spark.plans.inspect import plan_stats


@pytest.fixture(scope="module")
def web_docs(spark):
    boiler = "Subscribe to our newsletter for the very latest updates today."
    rows = [
        (
            1,
            "\n".join(
                [
                    "This is a perfectly fine first sentence with many words.",
                    "short one.",  # < 5 words
                    "no terminal punctuation on this long enough line",
                    "Lorem ipsum dolor sit amet consectetur adipiscing elit.",
                    'function f() { return "code"; }.',
                    "Another good sentence that should clearly survive the filter!",
                    boiler,
                ]
            ),
        ),
        (2, "\n".join([boiler, "A unique closing sentence lives only in document two."])),
        (3, "\n".join(["   ", boiler, "Document three also has its own private line here."])),
        (4, "One line only."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_clean_lines_c4_rules(spark, web_docs):
    out = {r["doc_id"]: r for r in cleaning.clean_lines(web_docs, "doc_id").collect()}
    d1 = out[1]
    assert d1["n_lines"] == 7
    # survivors: first sentence, "Another good sentence...", boilerplate line
    assert d1["n_kept"] == 3 and d1["kept"]
    kept_lines = d1["cleaned"].split("\n")
    assert kept_lines[0].startswith("This is a perfectly fine")
    assert all("lorem" not in ln.lower() for ln in kept_lines)
    assert all("{" not in ln for ln in kept_lines)
    assert not out[4]["kept"] and out[4]["n_kept"] == 0  # < 5 words


def test_clean_lines_zero_shuffle(spark, web_docs):
    stats = plan_stats(cleaning.clean_lines(web_docs, "doc_id"))
    assert stats["shuffles"] == 0
    assert stats["python_evals"] == 0


def test_remove_frequent_lines(spark, web_docs):
    out = {
        r["doc_id"]: r
        for r in cleaning.remove_frequent_lines(
            web_docs, "doc_id", min_df=3
        ).collect()
    }
    # the boilerplate line occurs in docs 1,2,3 -> removed everywhere
    assert out[1]["n_removed"] == 1 and "Subscribe" not in out[1]["cleaned"]
    assert out[2]["n_removed"] == 1 and out[2]["cleaned"].startswith("A unique")
    # doc 3: blank line is not content; order of surviving lines preserved
    assert out[3]["n_lines"] == 2 and out[3]["cleaned"].startswith("Document three")
    assert out[4]["n_removed"] == 0 and out[4]["cleaned"] == "One line only."
    # line order preserved in doc 1 (first survivor before last)
    assert out[1]["cleaned"].index("This is") < out[1]["cleaned"].index("code")


def test_remove_frequent_lines_all_boilerplate_doc(spark):
    rows = [(1, "same line."), (2, "same line."), (3, "same line.\nextra content here.")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in cleaning.remove_frequent_lines(df, "doc_id", min_df=2).collect()
    }
    assert out[1]["cleaned"] == "" and out[1]["n_removed"] == 1
    assert out[3]["cleaned"] == "extra content here."


def test_remove_frequent_lines_broadcast_strategy(spark, web_docs):
    bc = plan_stats(cleaning.remove_frequent_lines(web_docs, "doc_id"))
    assert bc["broadcasts"] >= 1
    sh = plan_stats(
        cleaning.remove_frequent_lines(web_docs, "doc_id", broadcast=False)
    )
    assert sh["broadcasts"] == 0


@pytest.fixture(scope="module")
def quality_docs(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and then runs far away "
        "because it was chased by a farmer who did not want foxes in the yard "
        "so the fox found a quiet den in the woods and stayed there for days "
        "while the farmer gave up the chase and went back home to tend the field"
    )
    bullets = "\n".join(["- item one here", "- item two here", "- item three here"])
    elly = "\n".join(["to be continued...", "and more...", "done"])
    rows = [
        (1, good),
        (2, "word " * 10),  # too few words
        (3, "#### ## # " + good),  # symbol-heavy but words dominate denominator
        (4, bullets),
        (5, elly),
        (6, "zzz qqq xxx " * 30),  # no stopwords
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_quality_rules(spark, quality_docs):
    out = {
        r["doc_id"]: r for r in cleaning.gopher_quality(quality_docs, "doc_id").collect()
    }
    assert out[1]["gopher_pass"]
    assert not out[2]["r_word_count"] and not out[2]["gopher_pass"]
    assert out[3]["symbol_ratio"] > 0
    assert out[4]["bullet_ratio"] == 1.0 and not out[4]["r_bullet_ratio"]
    assert out[5]["ellipsis_ratio"] > 0.3 and not out[5]["r_ellipsis_ratio"]
    assert out[6]["stop_hits"] == 0 and not out[6]["r_stop_hits"]


def test_gopher_mean_word_len_matches_manual(spark, quality_docs):
    row = cleaning.gopher_quality(quality_docs, "doc_id").where("doc_id = 1").first()
    text = quality_docs.where("doc_id = 1").first()["text"]
    words = [w for w in text.split() if w.isalpha()]
    manual = sum(len(w) for w in words) / len(words)
    assert abs(row["mean_word_len"] - manual) < 1e-6
    assert row["word_count"] == len(words)


def test_gopher_zero_shuffle(spark, quality_docs):
    stats = plan_stats(cleaning.gopher_quality(quality_docs, "doc_id"))
    assert stats["shuffles"] == 0
    assert stats["python_evals"] == 0


def test_dedup_paragraphs_first_occurrence(spark, web_docs):
    out = {
        r["doc_id"]: r
        for r in cleaning.dedup_paragraphs(web_docs, "doc_id").collect()
    }
    # the boilerplate line occurs in docs 1,2,3 -> kept ONLY in doc 1
    assert "Subscribe" in out[1]["cleaned"]
    assert "Subscribe" not in out[2]["cleaned"]
    assert "Subscribe" not in out[3]["cleaned"]
    assert out[2]["n_dropped"] == 1 and out[3]["n_dropped"] == 1
    # unique lines all survive; doc 4 untouched
    assert out[4]["n_dropped"] == 0 and out[4]["cleaned"] == "One line only."
    # order preserved within the surviving doc-1 lines
    assert out[1]["n_dropped"] == 0
    assert out[1]["cleaned"].index("This is") < out[1]["cleaned"].index("Subscribe")


def test_dedup_paragraphs_same_doc_repeat(spark):
    rows = [
        (1, "alpha line.\nalpha line.\nbeta line."),
        (2, "alpha line.\ngamma line."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in cleaning.dedup_paragraphs(df, "doc_id").collect()}
    # the in-doc repeat at pos 2 is dropped too (only (1, pos 0) survives)
    assert out[1]["cleaned"] == "alpha line.\nbeta line."
    assert out[1]["n_dropped"] == 1
    assert out[2]["cleaned"] == "gamma line." and out[2]["n_dropped"] == 1


def test_dedup_paragraphs_no_window_over_raw_lines(spark, web_docs):
    # winners come from an aggregation, not a per-line window sort
    plan = cleaning.dedup_paragraphs(web_docs, "doc_id")._jdf.queryExecution().sparkPlan().toString()
    assert "Window" not in plan


def test_fix_mojibake_roundtrip(spark):
    clean = "it’s a café résumé — “quoted… Größe «wörter» àêçñ – óú"
    damaged = clean.encode("utf-8").decode("cp1252")
    assert damaged != clean
    rows = [(1, damaged), (2, "plain ascii text."), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in cleaning.fix_mojibake(df, "doc_id").collect()}
    assert out[1]["fixed"] == clean and out[1]["changed"]
    # one artifact per non-ascii char in the clean string
    assert out[1]["n_artifacts"] == sum(1 for c in clean if ord(c) > 127)
    assert out[2]["fixed"] == "plain ascii text." and not out[2]["changed"]
    assert out[3]["fixed"] == "" and out[3]["n_artifacts"] == 0


def test_fix_mojibake_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    stats = plan_stats(cleaning.fix_mojibake(df, "doc_id"))
    assert stats["shuffles"] == 0 and stats["python_evals"] == 0


def test_badword_filter(spark):
    rows = [
        (1, "a perfectly Clean document about tables"),
        (2, "contains BLOCKED word once"),
        (3, "blocked twice: blocked!"),
        (4, "subword notblocked stays clean"),  # word boundary respected
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in cleaning.badword_filter(df, "doc_id", ("blocked",)).collect()
    }
    assert out[1]["kept"] and out[1]["n_badwords"] == 0
    assert not out[2]["kept"] and out[2]["n_badwords"] == 1
    assert not out[3]["kept"] and out[3]["n_badwords"] == 2
    assert out[4]["kept"]  # 'notblocked' is not a whole-word hit
    assert out[5]["kept"] and out[5]["n_badwords"] == 0
    # max_hits tolerance
    tol = {
        r["doc_id"]: r["kept"]
        for r in cleaning.badword_filter(df, "doc_id", ("blocked",), max_hits=1).collect()
    }
    assert tol[2] and not tol[3]
    with pytest.raises(ValueError):
        cleaning.badword_filter(df, "doc_id", ())


def test_badword_filter_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    stats = plan_stats(cleaning.badword_filter(df, "doc_id", ("a", "b")))
    assert stats["shuffles"] == 0 and stats["python_evals"] == 0
