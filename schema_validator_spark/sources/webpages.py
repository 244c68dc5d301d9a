"""Synthetic Common-Crawl-style ``web_pages`` source.

Shape fixed by BASELINE.json ``input_hint``:
``web_pages(url string, warc_ts timestamp, html binary, text string, lang string)``.

Two constructors:

- ``generate_web_pages(spark, n_rows)`` — fully distributed, closed-form from
  ``spark.range`` (no driver data, no RNG state → identical at any scale and
  any partitioning; scales to 10^12 ids).  Planted features per FIXTURES.md:
  pattern-failing urls, urls needing trim+lowercase, duplicate urls, a
  heavy-tail host owning ~20% of rows (skew), NULL text/lang, out-of-dimension
  langs, and two "eras" with shifted text-length distribution (drift).
- ``lang_dim(spark)`` — the 10-row referential dimension.

In production this table is an Iceberg table; ``read_web_pages`` falls back
to parquet when no Iceberg catalog is configured (dev/sandbox).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["en", "de", "fr", "es", "zh", "ja", "ru", "pt", "it", "nl"]
_VOCAB = (
    "the quick brown fox jumps over lazy dog web page crawl data spark "
    "validate schema text token index fetch parse render link anchor title"
).split()


def generate_web_pages(
    spark: SparkSession, n_rows: int, num_partitions: int | None = None
) -> DataFrame:
    """Deterministic synthetic web_pages, closed-form per id."""
    df = spark.range(0, n_rows, numPartitions=num_partitions)
    i = F.col("id")
    h = F.abs(F.xxhash64(i))  # deterministic per-id entropy

    # host: one heavy host owns ~20% of rows (skew target), the rest zipf-ish
    host = (
        F.when(F.pmod(i, 5) == 0, F.lit("bighost.example.com"))
        .otherwise(F.concat(F.lit("host-"), F.pmod(h, 997).cast("string"), F.lit(".example.org")))
    )
    path = F.concat(F.lit("/page/"), F.pmod(h, 100000).cast("string"))
    clean_url = F.concat(F.lit("https://"), host, path)

    # planted anomalies (deterministic slots)
    url = (
        F.when(F.pmod(i, 101) == 7, F.lit("not-a-url"))  # pattern violation ~1%
        .when(  # needs trim + lowercase ~2%
            F.pmod(i, 53) == 3,
            F.concat(F.lit("  HTTPS://"), F.upper(host), path, F.lit(" ")),
        )
        .when(F.pmod(i, 211) == 5, F.concat(F.lit("https://"), host, F.lit("/page/"), F.pmod(F.abs(F.xxhash64(i - 1)), 100000).cast("string")))  # duplicate of neighbour's url ~0.5%
        .otherwise(clean_url)
    )

    # two eras with shifted text-length distribution (drift target):
    # era 0 (first half): 20-60 words; era 1: 40-120 words
    era = (i >= n_rows // 2).cast("int")
    n_words = (
        F.lit(20) + F.pmod(h, 41) + era * (F.lit(20) + F.pmod(h, 60))
    )
    word_idx = F.sequence(F.lit(0), n_words - 1)
    text_body = F.concat_ws(
        " ",
        F.transform(
            word_idx,
            lambda j: F.element_at(
                F.array(*[F.lit(w) for w in _VOCAB]),
                (F.pmod(F.abs(F.xxhash64(i, j)), len(_VOCAB)) + 1).cast("int"),
            ),
        ),
    )
    text = F.when(F.pmod(i, 97) == 11, F.lit(None).cast("string")).otherwise(text_body)

    lang = (
        F.when(F.pmod(i, 89) == 13, F.lit(None).cast("string"))  # nulls
        .when(F.pmod(i, 79) == 17, F.lit("xx"))  # out-of-dimension junk
        .otherwise(
            F.element_at(
                F.array(*[F.lit(lang) for lang in LANGS]),
                (F.pmod(h, 5) + 1).cast("int"),  # top-5 langs dominate
            )
        )
    )

    warc_ts = F.timestamp_seconds(F.lit(1700000000) + i * 7)
    html = F.encode(
        F.concat(F.lit("<html><body>"), F.coalesce(text, F.lit("")), F.lit("</body></html>")),
        "UTF-8",
    )
    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def html_stats(df: DataFrame, id_col: str, html_col: str = "html") -> DataFrame:
    r"""Structural crawl-quality signals straight off the raw HTML — the
    jusText/trafilatura-style boilerplate discriminators computed WITHOUT a
    DOM parser: tag-open counts (links, headers, scripts, paragraphs), raw
    markup size, extracted-text length, and the text-to-markup ratio
    (navigation/chrome pages score low; content pages high).  Output:
    (id, n_links, n_headers, n_scripts, n_paragraphs, html_bytes,
    text_chars, text_ratio).

    100 TB shape: ONE zero-shuffle codegen projection over the html bytes;
    every regex is dialect-neutral (case-insensitive tag-opens with an
    explicit delimiter class, never ``\s``) so an external engine replays
    the counts exactly.  text_chars reuses ``extract_text``'s byte-checked
    chain."""
    # NULL html (fetch failure rows) must report zeros, not NULL counts
    raw = F.coalesce(F.decode(F.col(html_col), "UTF-8"), F.lit(""))
    txt = F.coalesce(extract_text(F.col(html_col)), F.lit(""))
    html_bytes = F.coalesce(
        F.octet_length(F.col(html_col)), F.lit(0)
    ).cast("bigint")

    def tag_count(pat: str):
        return F.regexp_count(raw, F.lit(pat)).cast("bigint")

    return df.select(
        F.col(id_col),
        tag_count(r"(?i)<a[ \t\n\r>]").alias("n_links"),
        tag_count(r"(?i)<h[1-6][ \t\n\r>]").alias("n_headers"),
        tag_count(r"(?i)<script[ \t\n\r>]").alias("n_scripts"),
        tag_count(r"(?i)<p[ \t\n\r>]").alias("n_paragraphs"),
        html_bytes.alias("html_bytes"),
        F.length(txt).cast("bigint").alias("text_chars"),
        F.round(
            F.length(txt) / F.greatest(html_bytes, F.lit(1)), 6
        ).alias("text_ratio"),
    )


def extract_text(html):
    """Extracted text from a raw ``html`` binary column — the north-rule
    per-row invariant ("byte-identical extracted text per url") made an
    operator.  Pure native expressions (whole-stage codegen, zero Python):

    1. UTF-8 decode
    2. drop <!-- comments --> (non-greedy DOTALL — a comment may span lines
       and contain '>' which would otherwise leak text past the tag strip)
    3. drop <script>/<style> blocks (non-greedy, case-insensitive, DOTALL)
    4. strip remaining tags
    5. unescape the 6 core entities (&amp; LAST so '&amp;lt;' → '&lt;')
    6. collapse whitespace runs to one space, trim

    Every regex is dialect-neutral (identical semantics in Java regex and
    RE2), so an external engine replays the extraction byte-for-byte — the
    driver's ``extract_text`` oracle query does exactly that in DuckDB.
    For the deterministic ``generate_web_pages`` corpus the output is
    byte-identical to the ``text`` column it was rendered from
    (tests/test_sources_multimodal.py::test_extract_text_byte_identical).
    """
    s = F.decode(html, "UTF-8")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, r"(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    s = F.regexp_replace(s, r"<[^>]*>", " ")
    for ent, ch in [
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ]:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    # explicit class, NOT \s: Java's \s includes \x0B (vertical tab) but
    # RE2/DuckDB's does not — the one dialect divergence that would break
    # the byte-identical oracle (ADVICE r3)
    return F.trim(F.regexp_replace(s, r"[ \t\n\r\f\x0B]+", " "))


def normalize_url(url):
    """Canonical crawl-dedup form of a URL — the key the north rule's
    uniqueness check SHOULD run on (raw crawl URLs differ by case, fragment,
    default port and tracking params while naming the same page):

    - trim; lowercase scheme and host (path/query case preserved)
    - userinfo (``user:pw@host``) passes through case-preserved — it is
      case-sensitive per RFC 3986; only the host after the LAST ``@`` is
      lowercased
    - strip the fragment
    - drop the scheme's default port (:80 http, :443 https) — bracket-safe
      for IPv6 hosts: ``[::1]:443`` → ``[::1]``, while a bare ``[2001:db8::80]``
      keeps its trailing hex group (the ``]`` breaks the suffix match)
    - empty path → "/"
    - drop ``utm_``-prefixed query params, sort the rest byte-wise
      (``+`` and %-escapes in values pass through untouched, case preserved)

    Native expressions only, every regex dialect-neutral (Java regex ≡ RE2),
    no LIKE wildcards — so an external engine replays it byte-for-byte (the
    ``normalize_url`` driver query re-implements the chain in DuckDB, and a
    Hypothesis property test drives random grammar-built URLs through BOTH
    engines asserting byte equality).
    A value without a ``scheme://`` prefix is returned trimmed, unchanged.
    """
    u = F.regexp_replace(F.trim(url), r"#.*", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    # authority splits at the LAST '@' (greedy .*@): userinfo keeps its
    # case, only host:port is lowercased
    raw_auth = F.regexp_extract(rest, r"^([^/?]*)", 1)
    userinfo = F.regexp_extract(raw_auth, r"^(.*@)", 1)
    hostport = F.lower(F.regexp_replace(raw_auth, r"^.*@", ""))
    hostport = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring(hostport, 1, F.length(hostport) - 3),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring(hostport, 1, F.length(hostport) - 4),
    ).otherwise(hostport)
    host = F.concat(userinfo, hostport)
    # path+query = rest minus the raw (pre-normalization) authority prefix
    raw_host = raw_auth
    pathq = F.substring(rest, F.length(raw_host) + 1, F.length(rest))
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & (F.substring(p, 1, 4) != "utm_"),
        )
    )
    q_norm = F.array_join(params, "&")
    normalized = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q_norm == "", F.lit("")).otherwise(F.concat(F.lit("?"), q_norm)),
    )
    return F.when(scheme == "", F.trim(url)).otherwise(normalized)


def host_of(url):
    """Lowercased host of an absolute URL (authority minus userinfo/port) —
    the grouping key for domain-level curation.  Userinfo splits at the LAST
    ``@`` (same rule as :func:`normalize_url`); the port is excluded because
    the character class stops at ``:``.  Dialect-neutral regex (Java ≡ RE2 ≡
    DuckDB) so oracles replay it byte-for-byte.  Bracketed IPv6 literals are
    out of scope (not registrable domains): the ``:`` stop yields just ``[``
    for them, one junk bucket a caller can drop.  No scheme → '' (Spark's
    regexp_extract no-match convention; DuckDB oracles must COALESCE)."""
    return F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/:?#]+)", 1)
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    size_col: "str | None" = None,
    min_docs: int = 2,
    max_dup_share: float = 0.5,
    approx: bool = False,
) -> DataFrame:
    """Per-host curation aggregates + keep verdict — the domain-level
    filtering step of web-corpus pipelines (CCNet's URL filtering,
    RefinedWeb/FineWeb domain blocklists): hosts that are mostly duplicated
    pages (mirrors, scraped boilerplate, session-id spam) or too small to
    judge get ``kept = false``.

    Output: (host, n_docs, n_pages, dup_share, kept [, sum_size, avg_size])
    where ``n_pages`` counts distinct URLs and ``dup_share`` is
    ``1 - n_pages/n_docs`` (0 = every doc its own page).  The verdict is
    evaluated on the UNROUNDED share; the emitted ``dup_share``/``avg_size``
    are rounded to 6 places for cross-engine comparability.

    100 TB shape: ONE hash aggregation keyed by host — partial (map-side)
    aggregation means a hot host (20% of the crawl on one domain is normal)
    arrives at its reducer as per-partition partials, never raw rows.  The
    output is ∝ #domains (~10⁸), orders of magnitude under the row count.
    ``approx=True`` swaps the exact distinct-URL count (an Expand-based
    two-phase agg: one extra pass, still partial-aggregated) for HLL
    ``approx_count_distinct`` — same single-agg plan, no Expand; use it when
    URLs-per-host is unbounded and ±2% on dup_share is acceptable (the
    verdict threshold is a heuristic anyway).  Not oracle-comparable.
    """
    host = host_of(F.col(url_col)).alias("host")
    cols = [host, F.col(url_col).alias("_url")]
    if size_col is not None:
        cols.append(F.col(size_col).alias("_size"))
    base = df.select(*cols)
    n_pages = (
        F.approx_count_distinct("_url") if approx else F.countDistinct("_url")
    ).alias("n_pages")
    aggs = [F.count(F.lit(1)).alias("n_docs"), n_pages]
    if size_col is not None:
        aggs.append(F.sum("_size").alias("sum_size"))
    stats = base.groupBy("host").agg(*aggs)
    share = F.lit(1.0) - F.col("n_pages").cast("double") / F.col("n_docs")
    out = stats.select(
        "host",
        "n_docs",
        "n_pages",
        F.round(share, 6).alias("dup_share"),
        ((F.col("n_docs") >= F.lit(min_docs)) & (share <= F.lit(max_dup_share))).alias(
            "kept"
        ),
        *(
            [
                F.col("sum_size").cast("bigint").alias("sum_size"),
                F.round(F.col("sum_size").cast("double") / F.col("n_docs"), 6).alias(
                    "avg_size"
                ),
            ]
            if size_col is not None
            else []
        ),
    )
    return out


def domain_filter(
    df: DataFrame,
    url_col: str = "url",
    min_docs: int = 2,
    max_dup_share: float = 0.5,
    approx: bool = False,
) -> DataFrame:
    """Keep only rows whose host passes :func:`domain_stats` — two passes
    over the corpus (aggregate, then LEFT SEMI join on the ∝-#domains kept
    set), never a by-host window over the raw rows (that would shuffle the
    full 100 TB by host and sort the hot domain's rows into one task).  AQE
    broadcasts the kept-host set when it is small; otherwise a shuffle-hash
    semi join whose build side is bounded by #kept-domains per task."""
    good = (
        domain_stats(
            df,
            url_col=url_col,
            min_docs=min_docs,
            max_dup_share=max_dup_share,
            approx=approx,
        )
        .where(F.col("kept"))
        .select("host")
    )
    tagged = df.withColumn("_host", host_of(F.col(url_col)))
    return (
        tagged.join(good, tagged["_host"] == good["host"], "left_semi")
        .drop("_host")
    )


def lang_dim(spark: SparkSession) -> DataFrame:
    names = {
        "en": "English", "de": "German", "fr": "French", "es": "Spanish",
        "zh": "Chinese", "ja": "Japanese", "ru": "Russian", "pt": "Portuguese",
        "it": "Italian", "nl": "Dutch",
    }
    return spark.createDataFrame(
        [(k, v) for k, v in names.items()], "lang_code string, lang_name string"
    )


def read_web_pages(
    spark: SparkSession,
    location: str,
    snapshot_id: "int | None" = None,
    as_of_timestamp: "int | None" = None,
) -> DataFrame:
    """Iceberg table if the identifier resolves in a configured catalog,
    else parquet path (sandbox).

    ``snapshot_id`` / ``as_of_timestamp`` pin the Iceberg snapshot — the
    checkpoint manifest (sources/io.py) records the snapshot a partition was
    validated against, so resume re-reads the SAME data even while the table
    keeps ingesting.  When a pin was requested, an Iceberg read failure is
    re-raised rather than falling back — a bad/expired snapshot id must NOT
    silently read live parquet data and defeat resume reproducibility.  The
    parquet fallback (sandbox: no Iceberg catalog) applies only to unpinned
    reads."""
    pinned = snapshot_id is not None or as_of_timestamp is not None
    try:
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of_timestamp is not None:
            reader = reader.option("as-of-timestamp", str(as_of_timestamp))
        return reader.load(location)
    except Exception:
        if pinned:
            raise
        return spark.read.parquet(location)


def web_page_schema():
    """The flagship constraint schema for web_pages (SURVEY.md §7 M0):
    url trim+lowercase+URL-pattern, text min_length, lang 2-letter code,
    warc_ts required."""
    from ..schema import schema

    s = schema()
    return (
        s.object()
        .field("url", s.string().trim().to_lowercase().url())
        .field("text", s.string().min_length(20).optional())
        .field("lang", s.string().pattern(r"^[a-z]{2}$").optional())
    )
