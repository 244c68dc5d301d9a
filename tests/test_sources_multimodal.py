"""web_pages generator, checkpoint/resume, and multimodal-plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_validator_spark import ValidationPlan
from schema_validator_spark.operators import multimodal
from schema_validator_spark.sources import io as svio
from schema_validator_spark.sources import webpages


def test_web_pages_deterministic_and_partition_invariant(spark):
    a = webpages.generate_web_pages(spark, 500, 4).orderBy("url", "warc_ts")
    b = webpages.generate_web_pages(spark, 500, 13).orderBy("url", "warc_ts")
    assert a.collect() == b.collect()  # same rows regardless of partitioning


def test_web_pages_planted_features(spark):
    wp = webpages.generate_web_pages(spark, 3000, 8)
    assert wp.where("url = 'not-a-url'").count() > 0
    assert wp.where("url LIKE '  HTTPS://%'").count() > 0
    assert wp.where("text IS NULL").count() > 0
    assert wp.where("lang = 'xx'").count() > 0
    # heavy host owns ~20%
    big = wp.where("url LIKE 'https://bighost%'").count()
    assert 0.1 < big / 3000 < 0.3
    # era drift: second half longer texts
    from schema_validator_spark.operators import drift, stats
    first = wp.limit(0)  # placeholder to avoid unused import warnings


def test_web_pages_era_drift(spark):
    wp = webpages.generate_web_pages(spark, 4000, 8).withColumn(
        "text_len", F.length("text")
    )
    from schema_validator_spark.operators import drift

    a = wp.where(F.col("warc_ts") < F.timestamp_seconds(F.lit(1700000000 + 2000 * 7)))
    b = wp.where(F.col("warc_ts") >= F.timestamp_seconds(F.lit(1700000000 + 2000 * 7)))
    assert drift.psi(a, b, "text_len", 0, 1200, 20) > 0.25


def test_flagship_schema_over_web_pages(spark):
    wp = webpages.generate_web_pages(spark, 1000, 8)
    plan = ValidationPlan(webpages.web_page_schema())
    out = plan.apply(wp)
    bad = out.where(~F.col("valid"))
    codes = {r["code"] for r in plan.violations(out).select("code").distinct().collect()}
    assert "INVALID_URL" in codes
    # trim+lowercase applied: no url in output starts with space or uppercase
    assert out.where(F.col("url").rlike(r"^\s|[A-Z]")).count() == 0
    assert bad.count() > 0 and bad.count() < 100


def test_checkpoint_resume(spark, tmp_path):
    wp = webpages.generate_web_pages(spark, 600, 4).withColumn(
        "part", F.pmod(F.abs(F.xxhash64("url")), F.lit(3))
    )
    plan = ValidationPlan(webpages.web_page_schema())
    manifest = svio.CheckpointManifest(spark, str(tmp_path / "manifest"))
    out = str(tmp_path / "out")

    r1 = svio.run_resumable(plan, wp, "part", out, manifest, "snap-1", batch_partitions=2)
    assert len(r1["processed"]) == 2 and r1["skipped"] == []

    r2 = svio.run_resumable(plan, wp, "part", out, manifest, "snap-1")
    assert len(r2["processed"]) == 1
    assert sorted(r2["skipped"]) == sorted(r1["processed"])

    r3 = svio.run_resumable(plan, wp, "part", out, manifest, "snap-1")
    assert r3["processed"] == [] and len(r3["skipped"]) == 3

    # final output complete and correct
    done = spark.read.parquet(out)
    assert done.count() == 600
    m = manifest.load()
    assert m.where("status = 'done'").count() == 3
    assert m.agg(F.sum("total_rows")).collect()[0][0] == 600


def test_multimodal_features(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = multimodal.media_table_from_text(docs, "doc_id")
    assert media.schema.simpleString().startswith(
        "struct<media_id:bigint,media_type:string,payload:binary"
    )
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r["feature"]) == 4 for r in rows)
    # deterministic: same payload → same hash
    again = {r["media_id"]: r["content_hash"] for r in multimodal.extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["content_hash"] for r in rows)


def test_multimodal_real_decode_raises(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(2)
    media = multimodal.media_table_from_text(docs, "doc_id")
    with pytest.raises(Exception, match="NotImplementedError|media decoding"):
        multimodal.extract_features(media, fake=False).collect()


def test_frame_sampling_fanout(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    media = multimodal.media_table_from_text(docs, "doc_id")
    frames = multimodal.sample_frames(media, every_n_bytes=64)
    per_doc = {r["media_id"]: r["cnt"] for r in
               frames.groupBy("media_id").agg(F.count("*").alias("cnt")).collect()}
    sizes = {r["media_id"]: r["n"] for r in
             media.select("media_id", F.length("payload").alias("n")).collect()}
    for mid, n in sizes.items():
        assert per_doc[mid] == max((n + 63) // 64, 1)


def test_resize_media_stub(spark):
    from schema_validator_spark.operators import multimodal as MM

    df = spark.createDataFrame(
        [(1, "a" * 1000), (2, "b" * 10), (3, None)], "doc_id long, text string"
    )
    media = MM.media_table_from_text(df, "doc_id")
    rows = {
        r["media_id"]: r for r in MM.resize_media(media, target_bytes=256).collect()
    }
    assert rows[1]["orig_bytes"] == 1000 and rows[1]["resized_bytes"] == 256
    assert rows[2]["orig_bytes"] == 10 and rows[2]["resized_bytes"] == 10
    assert rows[3]["orig_bytes"] == 0 and rows[3]["resized_bytes"] == 0
    import hashlib

    assert rows[1]["resized_hash"] == hashlib.md5(b"a" * 256).hexdigest()


def _has_pillow():
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has_pillow(), reason="Pillow not installed")
def test_multimodal_real_decode_with_pillow(spark):
    # real path: a genuine PNG through decode + resize (runs wherever Pillow
    # exists; the sandbox exercises the fake path + the NotImplementedError)
    import io as _io

    from PIL import Image

    buf = _io.BytesIO()
    Image.new("RGB", (32, 16), (255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame([(1, "image/png", png, None)], multimodal.MEDIA_SCHEMA_DDL)
    feats = multimodal.extract_features(df, fake=False).collect()[0]
    assert feats["n_bytes"] == len(png)
    f = feats["feature"]
    assert abs(f[0] - 1.0) < 1e-6 and f[1] == 0.0 and f[2] == 0.0  # pure red
    assert abs(f[3] - 2.0) < 1e-6  # 32/16 aspect
    resized = multimodal.resize_media(df, target_bytes=8, fake=False).collect()[0]
    assert resized["orig_bytes"] == len(png) and resized["resized_bytes"] > 0


def _has_pyav():
    try:
        import av  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has_pyav(), reason="PyAV not installed")
def test_multimodal_real_frames_with_pyav(spark):
    # real path: encode a 3-frame mpeg4 clip with PyAV itself, then demux +
    # keyframe-decode it through sample_frames(fake=False) (runs wherever
    # PyAV exists; the sandbox exercises the fake path + NotImplementedError)
    import io as _io

    import av
    import numpy as np

    buf = _io.BytesIO()
    with av.open(buf, "w", format="avi") as container:
        stream = container.add_stream("mpeg4", rate=4)
        stream.width, stream.height, stream.pix_fmt = 32, 16, "yuv420p"
        for shade in (0, 128, 255):
            img = np.full((16, 32, 3), shade, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(img, format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    clip = buf.getvalue()
    df = spark.createDataFrame(
        [(1, "video/avi", clip, None)], multimodal.MEDIA_SCHEMA_DDL
    )
    frames = multimodal.sample_frames(df, fake=False).collect()
    assert len(frames) >= 1  # at least the first keyframe decodes
    assert all(r["media_id"] == 1 and len(r["frame_hash"]) == 32 for r in frames)
    feats = multimodal.extract_features(df, fake=False).collect()[0]
    assert feats["n_bytes"] == len(clip) and len(feats["feature"]) == 4
    assert abs(feats["feature"][3] - 2.0) < 1e-6  # 32/16 aspect


def test_extract_text_byte_identical(spark):
    # the north-rule per-row invariant: text extracted from the html column
    # is byte-identical to the text the page was rendered from
    web = webpages.generate_web_pages(spark, 2000)
    mismatches = (
        web.select(
            F.coalesce("text", F.lit("")).alias("want"),
            webpages.extract_text(F.col("html")).alias("got"),
        )
        .where(F.col("want") != F.col("got"))
        .count()
    )
    assert mismatches == 0


def test_extract_text_strips_script_style_entities(spark):
    html = (
        "<html><!-- hidden > comment\nacross lines --><head><style>h1 {color: red}</style>"
        "<script type='x'>if (a < b && c > d) { alert('&amp;'); }</script>"
        "</head><body>\n  <h1>Title</h1>\n"
        "<p>A &amp; B&nbsp;&lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>"
        "</body></html>"
    )
    df = spark.createDataFrame([(1, html.encode())], "id long, html binary")
    got = df.select(webpages.extract_text(F.col("html")).alias("t")).collect()[0]["t"]
    assert got == "Title A & B <tag> \"q\" 's'"


def test_extract_text_whitespace_class_matches_duckdb(spark):
    """The collapse uses an explicit [ \\t\\n\\r\\f\\x0B]+ class, not \\s:
    Java's \\s swallows \\x0B while RE2/DuckDB's does not, so a document
    containing a vertical tab is exactly where the two engines would diverge
    (ADVICE r3).  Replay the same chain in DuckDB and require byte equality."""
    import duckdb

    html = "<p>a \x0b b</p><p>x\x0b\ty</p>"
    df = spark.createDataFrame([(1, html.encode())], "id long, html binary")
    got = df.select(webpages.extract_text(F.col("html")).alias("t")).collect()[0]["t"]
    want = duckdb.sql(
        "SELECT trim(regexp_replace(regexp_replace(?, '<[^>]*>', ' ', 'g'),"
        " '[ \t\n\r\f\x0B]+', ' ', 'g'))",
        params=[html],
    ).fetchone()[0]
    assert got == want == "a b x y"


def test_normalize_url_cases(spark):
    cases = [
        ("  HTTPS://WWW.Example.COM:443/Path/Page?utm_source=x&b=2&a=1#frag  ",
         "https://www.example.com/Path/Page?a=1&b=2"),
        ("http://Host.org:80", "http://host.org/"),
        ("http://host.org:8080/x", "http://host.org:8080/x"),  # non-default port kept
        ("https://h.example/?utm_campaign=z", "https://h.example/"),
        ("not a url", "not a url"),  # schemeless: trimmed, untouched
        ("ftp://Files.Example.com/A?b=1", "ftp://files.example.com/A?b=1"),
        ("https://h.example/p?", "https://h.example/p"),
        ("https://h.example/p?a=1&a=0", "https://h.example/p?a=0&a=1"),
        # userinfo is case-sensitive: preserved, while the host lowercases;
        # the authority splits at the LAST '@'
        ("https://User.Name@Host.COM/x", "https://User.Name@host.com/x"),
        ("http://A@B@Host.org:80/x", "http://A@B@host.org/x"),
        # bracket-safe default-port strip on IPv6 hosts
        ("https://[2001:DB8::1]:443/x", "https://[2001:db8::1]/x"),
        ("http://[FE80::80]/x", "http://[fe80::80]/x"),  # :80 inside brackets kept
        # '+' and %-escape case in query values pass through untouched
        ("https://h.example/p?c=%2F&B=x+y", "https://h.example/p?B=x+y&c=%2F"),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "url string")
    got = [
        r["n"]
        for r in df.select(webpages.normalize_url(F.col("url")).alias("n")).collect()
    ]
    assert got == [c[1] for c in cases]


def test_normalize_url_dedups_crawl_variants(spark):
    # the point of the operator: crawl variants of one page collapse to one key
    variants = [
        "https://news.example.com/story/42",
        "HTTPS://News.Example.Com:443/story/42#comments",
        "https://news.example.com/story/42?utm_source=feed&utm_medium=rss",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "url string")
    n = df.select(webpages.normalize_url(F.col("url")).alias("k")).distinct().count()
    assert n == 1


def test_html_stats_counts_and_ratio(spark):
    from schema_validator_spark.sources.webpages import html_stats

    html = (
        '<html><body><h1>T</h1><h2>s</h2>'
        '<a href="x">one</a><A HREF="y">two</A>'
        '<p>some body text here</p><p>more</p>'
        '<script>var x;</script></body></html>'
    )
    df = spark.createDataFrame(
        [(1, bytearray(html, "utf-8"))], "doc_id long, html binary"
    )
    r = html_stats(df, "doc_id").collect()[0]
    assert r["n_links"] == 2        # case-insensitive
    assert r["n_headers"] == 2
    assert r["n_scripts"] == 1
    assert r["n_paragraphs"] == 2
    assert r["html_bytes"] == len(html.encode())
    assert r["text_chars"] == len("T s one two some body text here more")
    assert 0 < r["text_ratio"] < 1


def test_html_stats_zero_shuffle(spark):
    from schema_validator_spark.plans.inspect import plan_stats
    from schema_validator_spark.sources.webpages import html_stats

    df = spark.createDataFrame([(1, bytearray(b"<p>x</p>"))], "doc_id long, html binary")
    stats = plan_stats(html_stats(df, "doc_id"))
    assert stats["shuffles"] == 0 and stats["python_evals"] == 0


def test_html_stats_null_html_is_zero_not_null(spark):
    from schema_validator_spark.sources.webpages import html_stats

    df = spark.createDataFrame([(1, None)], "doc_id long, html binary")
    r = html_stats(df, "doc_id").collect()[0]
    assert r["n_links"] == 0 and r["n_paragraphs"] == 0
    assert r["html_bytes"] == 0 and r["text_chars"] == 0
    assert r["text_ratio"] == 0.0
