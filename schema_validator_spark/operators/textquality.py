"""Text-analysis operators for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All native Column expressions (whole-stage codegen; zero Python on the hot
path) and deliberately built from cross-engine-deterministic primitives
(regexp counts, md5) so every operator has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists (public knowledge; enough for an n-gram
# heuristic — NOT a real langid model)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "von", "mit", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "des", "une", "dans", "que"],
    "es": ["el", "la", "los", "de", "que", "es", "en", "un", "por", "con"],
}

_WORD_RE = r"[A-Za-z]+"
# BPE-ish tokenization: word pieces OR digit runs OR single non-space symbols
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _stopword_hits(text: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pat))


def language_scores(text: Column) -> list[tuple[str, Column]]:
    """Stopword-hit rate per language, normalized by word count."""
    wc = F.greatest(F.regexp_count(text, F.lit(_WORD_RE)), F.lit(1))
    return [
        (lang, (_stopword_hits(text, words) / wc))
        for lang, words in STOPWORDS.items()
    ]


def language_id(text: Column, min_score: float = 0.05) -> Column:
    """Argmax language by stopword-hit rate; 'und' (undetermined) when no
    language clears ``min_score``.  Deterministic tie-break: score desc, then
    language code asc (matches the SQL oracle's exact semantics)."""
    scores = language_scores(text)
    best = None
    for lang, score in sorted(scores):  # asc lang order; strict > keeps earlier
        if best is None:
            best, best_lang = score, F.lit(lang)
        else:
            cond = score > best
            best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
            best = F.when(cond, score).otherwise(best)
    return F.when(best >= min_score, best_lang).otherwise(F.lit("und"))


def token_count_whitespace(text: Column) -> Column:
    """Whitespace-delimited token count."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def token_count_bpe_ish(text: Column) -> Column:
    """Sub-word-ish token count: alpha runs + digit runs + symbols."""
    return F.regexp_count(text, F.lit(BPE_ISH_RE))


def quality_features(text: Column) -> dict[str, Column]:
    """Raw quality signals (all native, all SQL-oracle-able)."""
    n_chars = F.length(text)
    safe_chars = F.greatest(n_chars, F.lit(1))
    words = F.regexp_count(text, F.lit(_WORD_RE))
    safe_words = F.greatest(words, F.lit(1))
    return {
        "n_chars": n_chars,
        "n_words": words,
        "mean_word_len": F.regexp_count(text, F.lit(r"[A-Za-z]")) / safe_words,
        "punct_ratio": F.regexp_count(text, F.lit(r"[^A-Za-z0-9\s]")) / safe_chars,
        "upper_ratio": F.regexp_count(text, F.lit(r"[A-Z]")) / safe_chars,
        "digit_ratio": F.regexp_count(text, F.lit(r"[0-9]")) / safe_chars,
        "stopword_ratio": _stopword_hits(text, STOPWORDS["en"]) / safe_words,
        "space_ratio": F.regexp_count(text, F.lit(r"\s")) / safe_chars,
    }


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality score: long-enough, word-like, sane punctuation,
    some stopwords.  A Gopher-rules-flavoured linear blend."""
    f = quality_features(text)
    length_ok = F.least(f["n_words"] / F.lit(50.0), F.lit(1.0))
    word_shape = F.when(
        (f["mean_word_len"] >= 3) & (f["mean_word_len"] <= 10), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    punct_ok = F.when(f["punct_ratio"] <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.least(f["stopword_ratio"] / F.lit(0.06), F.lit(1.0))
    return F.round(
        0.4 * length_ok + 0.2 * word_shape + 0.2 * punct_ok + 0.2 * stop_ok, 4
    )


def _hashed_feature_value(feature: Column, seed: str, hash_fn: str) -> Column:
    """Shared (seed|feature) hash for the hashing-trick helpers below — ONE
    definition so the oracle-parity-critical md5 15-nibble rule (mirrored
    by ``_md5_60bit_sql`` in __spark_entry__.py) cannot desynchronize
    between the weight and bucket paths.

    ``hash_fn``: ``"md5"`` (default) is the cross-engine family every
    external oracle can replay; ``"xxhash64"`` is the fast production path
    (one native 64-bit hash instead of md5 + hex-string conv — the minhash
    fast/oracle split, deterministic within Spark only)."""
    if hash_fn == "md5":
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + "|"), feature)), 1, 15), 16, 10
        ).cast("bigint")
    if hash_fn == "xxhash64":
        return F.xxhash64(F.concat(F.lit(seed + "|"), feature))
    raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")


def hashed_feature_weight(
    feature: Column, seed: str, hash_fn: str = "md5"
) -> Column:
    """Integer weight in [-1000, 1000] for a hashed text feature: hash of
    (seed|feature) mod 2001, shifted.  A seeded stand-in for a trained
    fastText-style weight table — a real model would broadcast its bucket →
    weight map and join, but the hashing-trick plumbing is identical.
    Integer weights keep the per-document SUM bit-identical across engines
    (float sums are order-dependent; bigint sums are not).  Hash families:
    see ``_hashed_feature_value``."""
    h = _hashed_feature_value(feature, seed, hash_fn)
    return (F.pmod(h, F.lit(2001)) - F.lit(1000)).cast("bigint")


def hashed_feature_bucket(
    feature: Column, seed: str, n_buckets: int, hash_fn: str = "md5"
) -> Column:
    """Hashing-trick bucket id in [0, n_buckets) for a text feature — the
    key a trained fastText/linear model's exported weight table is joined
    on.  Same two hash families as ``hashed_feature_weight``; the md5
    family is replayable by any engine (DuckDB mirror: 15-nibble conv then
    ``% n_buckets``)."""
    h = _hashed_feature_value(feature, seed, hash_fn)
    return F.pmod(h, F.lit(int(n_buckets))).cast("bigint")


def quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    seed: str = "qc",
    threshold: float = 0.0,
    hash_fn: str = "md5",
    weights: "DataFrame | None" = None,
    weight_bucket_col: str = "bucket",
    weight_col: str = "weight",
    n_buckets: int = 1 << 20,
    broadcast_weights: bool = True,
) -> DataFrame:
    """fastText-style linear quality classifier over hashed word features:
    ``score = Σ w[h(f)] / (1000 · n_features) ∈ [-1, 1]`` with features =
    word unigrams + bigrams of the whitespace-normalized lowercase text.
    Output: (id, n_features, raw_score, score, q_pass).

    This is the model-scoring step of a training-data pipeline (CCNet's
    quality LM / fastText filters in public recipes).  Two weight sources:

    * ``weights=None`` (default): seeded ``hashed_feature_weight`` integer
      weights — the deterministic, every-engine-replayable family (the
      oracle substrate).  ``raw_score`` is an exact BIGINT sum and
      ``score = raw_score / (1000 · n_features)``.
    * ``weights=DataFrame(bucket, weight)``: a TRAINED weight table (e.g. a
      fastText export hashed into ``n_buckets`` buckets).  Features map to
      ``hashed_feature_bucket(f, seed, n_buckets, hash_fn)`` and the table
      joins on that bucket — ``broadcast_weights=True`` broadcasts it (a
      model export is ≤ millions of rows — always broadcastable), else a
      ``shuffle_hash`` hint keeps giant tables from sort-merge planning.
      Unmatched buckets weigh 0.0 (an untrained bucket is a no-op, the
      fastText convention).  ``raw_score`` is a DOUBLE sum and
      ``score = raw_score / n_features`` (mean bucket weight).  Weight
      tables with integer-valued weights stay bit-exact across engines
      (double addition of integers < 2^53 is associative).

    Scale shape (the minhash-signature pattern, CLAUDE.md): the normalized
    string and the word array are each materialized in their OWN projection
    (never re-evaluated per feature); the bigram transform references only
    the materialized ``_words``; features are then POSEXPLODED so md5/conv
    run as native per-row expressions inside whole-stage codegen — never
    inside an interpreted HOF lambda — and reduce via ONE
    map-side-combinable groupBy(id).  Integer sums → exact on every engine;
    the single double division + round happens once per doc.  Docs whose
    normalized text is empty score 0.0 with n_features = 0 (explode_outer
    keeps them alive)."""
    norm = df.select(
        F.col(id_col),
        F.regexp_replace(
            F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " "
        ).alias("_norm"),
    )
    w = F.col("_words")
    words = norm.select(
        id_col,
        F.when(F.col("_norm") == "", F.array().cast("array<string>"))
        .otherwise(F.split("_norm", " "))
        .alias("_words"),
    )
    # sequence(1, size-1) only under the size>=2 guard: Spark's sequence
    # DESCENDS when start > stop, so sequence(1, 0) would be [1, 0].
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(
                " ", F.try_element_at(w, i), F.try_element_at(w, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = words.select(id_col, F.concat(w, bigrams).alias("_feats"))
    exploded = feats.select(id_col, F.explode_outer("_feats").alias("_f"))
    if weights is None:
        weighted = exploded.select(
            id_col,
            "_f",
            hashed_feature_weight(F.col("_f"), seed, hash_fn).alias("_w"),
        )
        agg = weighted.groupBy(id_col).agg(
            F.count("_f").alias("n_features"),
            F.coalesce(F.sum("_w"), F.lit(0)).cast("bigint").alias("raw_score"),
        )
        score = F.when(F.col("n_features") == 0, F.lit(0.0)).otherwise(
            F.round(
                F.col("raw_score") / (F.lit(1000.0) * F.col("n_features")), 6
            )
        )
    else:
        bucketed = exploded.select(
            id_col,
            "_f",
            hashed_feature_bucket(
                F.col("_f"), seed, n_buckets, hash_fn
            ).alias("_bucket"),
        )
        wtab = weights.select(
            F.col(weight_bucket_col).cast("bigint").alias("_bucket"),
            F.col(weight_col).cast("double").alias("_wt"),
        )
        # a weight table MUST be one row per bucket — a duplicated bucket
        # (e.g. a concatenated shard export) would silently multiply every
        # feature landing in it through the join, inflating n_features and
        # raw_score.  Collapse deterministically (max weight wins) instead
        # of trusting the export; unique tables pass through unchanged.
        wtab = wtab.groupBy("_bucket").agg(F.max("_wt").alias("_wt"))
        if broadcast_weights:
            joined = bucketed.join(F.broadcast(wtab), "_bucket", "left")
        else:
            joined = bucketed.join(wtab.hint("shuffle_hash"), "_bucket", "left")
        weighted = joined.select(
            id_col, "_f", F.coalesce(F.col("_wt"), F.lit(0.0)).alias("_w")
        )
        agg = weighted.groupBy(id_col).agg(
            F.count("_f").alias("n_features"),
            F.coalesce(F.sum("_w"), F.lit(0.0)).alias("raw_score"),
        )
        score = F.when(F.col("n_features") == 0, F.lit(0.0)).otherwise(
            F.round(F.col("raw_score") / F.col("n_features"), 6)
        )
    return agg.select(
        id_col,
        "n_features",
        "raw_score",
        score.alias("score"),
        (score >= F.lit(float(threshold))).alias("q_pass"),
    )


def fingerprint_exact(text: Column) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text.
    Identical in DuckDB: md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(normalized)


def fingerprint_winnow(
    text: Column, k: int = 16, normalized: "Column | None" = None
) -> Column:
    """Winnowing-style robust fingerprint: minimum md5 over the document's
    character k-grams (min-hash of the k-gram set).  Local edits leave most
    k-grams intact, so near-identical docs usually share the fingerprint.
    Built from sequence/transform/array_min — fully native + SQL-expressible.

    HOT-PATH CALLERS MUST PASS ``normalized``: a column holding
    ``regexp_replace(lower(trim(text)), '\\s+', ' ')`` materialized in its
    OWN projection.  transform() is evaluated interpreted and re-runs a
    lambda's free sub-expressions per element, so inlining the regex here
    costs one regexp_replace per k-GRAM (~350/doc on crawl pages) instead
    of one per doc — see dedup._normalized_words for the full analysis.
    """
    if normalized is None:
        normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    n = F.length(normalized)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.md5(F.substr(normalized, i, F.lit(k))),
    )
    return F.array_min(grams)


def text_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All text-quality columns appended in one projection."""
    t = F.col(text_col)
    feats = quality_features(t)
    return df.select(
        "*",
        language_id(t).alias("lang_pred"),
        token_count_whitespace(t).alias("tokens_ws"),
        token_count_bpe_ish(t).alias("tokens_bpe"),
        quality_score(t).alias("quality"),
        fingerprint_exact(t).alias("fingerprint"),
        F.round(feats["punct_ratio"], 4).alias("punct_ratio"),
        F.round(feats["stopword_ratio"], 4).alias("stopword_ratio"),
    )


def vocab_topk(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 1000,
) -> DataFrame:
    """Corpus vocabulary audit: the ``k`` most frequent whitespace words with
    occurrence and document frequencies — the input to tokenizer training,
    stopword curation, and boilerplate-phrase review.  Output:
    (word, n_occurrences, n_docs), deterministically ordered by
    (n_occurrences desc, word asc) with ties broken by the word itself so
    every engine returns the identical k rows.

    100 TB shape: words are materialized ONCE per doc in their own
    projection (the interpreted-HOF rule), exploded, and counted in one
    hash aggregation — Zipf-hot words (``the``) are absorbed by map-side
    partial aggregation, never a single-reducer pile-up.  The top-k is
    ``orderBy(...).limit(k)``, which Spark plans as TakeOrderedAndProject:
    a per-partition heap of k rows merged on the driver — no global sort
    shuffle of the (huge) vocabulary."""
    words = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    staged = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_id"), words.alias("_words")
    )
    exploded = staged.select("_id", F.explode("_words").alias("word")).where(
        F.col("word") != ""
    )
    counts = exploded.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct("_id").alias("n_docs"),
    )
    return counts.orderBy(F.col("n_occurrences").desc(), F.col("word").asc()).limit(k)


def intra_doc_repetition(
    text: Column, n_gram: int = 3, words: "Column | None" = None
) -> Column:
    """Gopher-style within-document repetition: 1 − distinct/total word
    n-grams.  High values flag boilerplate/spam (repeated phrases).  Native
    array expressions, zero shuffle — a pure per-row signal.

    HOT-PATH CALLERS MUST PASS ``words``: the whitespace-normalized
    lowercase word array materialized in its OWN projection — interpreted
    transform() re-runs free sub-expressions per element, so inlining the
    split costs one regex per GRAM instead of per doc (see
    dedup._normalized_words)."""
    if words is None:
        words = F.split(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "), " ")
    count = F.size(words)
    grams = F.when(
        count >= n_gram,
        F.transform(
            F.sequence(F.lit(1), count - (n_gram - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n_gram)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return F.round(
        F.lit(1.0) - distinct / F.greatest(total, F.lit(1)).cast("double"), 6
    )


def duplicate_ngram_fraction(
    df: DataFrame, id_col: str, text_col: str = "text", n_gram: int = 3
) -> DataFrame:
    """RefinedWeb-style cross-document duplication signal: per doc, the
    fraction of its DISTINCT word n-grams that appear in at least one OTHER
    document.  Docs built from boilerplate score near 1.0; unique prose near
    0.0.

    Scale shape: explode → count-over-window partitioned by shingle →
    groupBy(doc): TWO shuffles (shingle, then doc id) instead of the
    groupBy+join-back formulation's three — the sort-merge join there sorts
    the full exploded corpus by shingle anyway, so the window does the same
    work minus one exchange (measured 23% faster at sf0.1).  A hot shingle's
    rows land on one reducer either way; WindowExec spills its buffered
    partition to disk, same pressure point as the SMJ sort.  (The one-pass
    collect_list alternative explodes on hot shingles — never.)
    Output: (doc_id, dup_ngram_frac, n_ngrams)."""
    from pyspark.sql import Window

    from .dedup import shingled_docs

    sh = shingled_docs(df, id_col, text_col, n_gram)
    ex = sh.select("_id", F.explode("_shingles").alias("_g"))
    ann = ex.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy("_g"))
    )
    return (
        ann.groupBy("_id")
        .agg(
            F.round(
                F.sum((F.col("_df") > 1).cast("long"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("dup_ngram_frac"),
            F.count(F.lit(1)).alias("n_ngrams"),
        )
        .select(F.col("_id").alias("doc_id"), "dup_ngram_frac", "n_ngrams")
    )


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    chunk_chars: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split documents into fixed-width character chunks with overlap — the
    standard pre-tokenization step of a training-data pipeline (chunk_chars
    approximates a token budget; overlap preserves cross-boundary context).

    Native shape: per row, a character-offset ``sequence`` is transformed to
    ``substr`` windows and exploded — one codegen projection, no Python, no
    shuffle; chunk rows inherit the scan's partitioning.  Stride =
    chunk_chars − overlap (must be positive).  Empty/NULL docs yield one
    empty chunk so every input id survives (exactly one chunk when
    len ≤ chunk_chars).  Output: (id, chunk_no, chunk, chunk_len).
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(t)
    # number of chunks: 1 + ceil(max(n - chunk_chars, 0) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - F.lit(chunk_chars), F.lit(0)) / F.lit(stride)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.substr(t, i * stride + 1, F.lit(chunk_chars)),
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_no", "chunk"),
    )
    return out.select(
        id_col,
        "chunk_no",
        "chunk",
        F.length("chunk").alias("chunk_len"),
    )
