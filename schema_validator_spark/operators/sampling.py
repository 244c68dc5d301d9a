"""Deterministic sampling for corpus curation.

Training-data pipelines constantly subsample: per-language quotas, quality
strata, eval holdouts.  ``df.sample()`` is seed-dependent per partitioning
and not reproducible across engines, so these operators derive the sampling
decision from a HASH OF THE ROW KEY — every engine that can md5 agrees on
which rows survive, re-runs are idempotent, and the decision never depends
on partition layout.  All native Column expressions (no shuffle, no Python):
at 100 TB a sample is a filter pushed right against the scan.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Denominator of the sampling hash: first 6 md5 nibbles → 24 bits.
_HASH_MOD = 1 << 24


def _reject_collisions(df: DataFrame, op: str, *names: str) -> None:
    """Output-column guard: silently overwriting a user column with
    ``withColumn`` corrupts downstream logic invisibly (the keep_best
    lesson) — refuse loudly instead."""
    clash = [n for n in names if n in df.columns]
    if clash:
        raise ValueError(
            f"{op} produces column(s) {clash} which already exist in the "
            "input — rename or drop them first"
        )


def hash24(key: Column, salt: str = "") -> Column:
    """First 6 hex nibbles of md5(salt|key) as a BIGINT in [0, 2^24) —
    deterministic across engines (DuckDB mirror: nibble arithmetic)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 6),
        16,
        10,
    ).cast("bigint")


def sample_hash(key: Column, salt: str = "") -> Column:
    """Uniform-ish value in [0, 1) derived from md5(salt|key) — deterministic
    across engines (DuckDB mirror: first 6 hex nibbles via conv)."""
    return hash24(key, salt) / F.lit(float(_HASH_MOD))


def sample_deterministic(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep rows whose key-hash falls below ``rate``.  Reproducible: the same
    key always makes the same decision, so incremental re-runs sample
    consistently and joins between two same-salt samples line up."""
    return df.where(sample_hash(F.col(key_col), salt) < rate)


def sample_stratified(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language quotas: keep 100%
    of low-resource languages, 10% of English).  One filter expression — no
    shuffle, no per-stratum jobs; Catalyst pushes supported predicates to the
    scan."""
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(rate)
    return df.where(sample_hash(F.col(key_col), salt) < rate)


def sample_to_token_budget(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    token_col: str,
    budgets: Mapping[str, float],
    salt: str = "",
) -> DataFrame:
    """Corpus mixing: sample each stratum (source, language, …) down to a
    TOKEN budget — the pipeline step that turns raw crawls into a training
    mix ("100B tokens of web, 20B of code…").

    Scale shape: ONE aggregate computes per-stratum token totals (bounded
    collect — one row per stratum), the keep rate ``min(budget/total, 1)``
    becomes a constant in the same pushed hash-filter ``sample_stratified``
    uses — zero shuffle on the data path, expected kept tokens ≈ budget.
    (An exact-budget variant would need a per-stratum cumulative-sum window
    — a skewed shuffle of the whole corpus for a tolerance nobody needs;
    hash-rate sampling concentrates tightly around the budget at corpus
    scale.)  Strata without a budget are dropped."""
    totals = {
        r[strata_col]: r["_t"]
        for r in df.groupBy(strata_col)
        .agg(F.sum(F.col(token_col)).alias("_t"))
        .collect()  # bounded: one row per stratum
    }
    rates = {
        s: min(float(b) / float(totals[s]), 1.0)
        for s, b in budgets.items()
        if totals.get(s)
    }
    return sample_stratified(df, key_col, strata_col, rates, 0.0, salt)


def upsample_mixture(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    weights: Mapping[str, float],
    salt: str = "",
) -> DataFrame:
    """Domain mixing with REPETITION: repeat each stratum's rows by a
    fractional weight (e.g. wiki ×3.5, web ×0.8) — the physical-epochs step
    that turns DoReMi/Llama-style domain weights into an actual corpus.
    Every row gets ``floor(w)`` copies, plus one more iff its id-hash falls
    below ``frac(w)`` — so the expected copy count per stratum is exactly
    ``w``, a weight < 1 degrades to a deterministic downsample, and a weight
    of 0 (or an absent stratum) drops the stratum.  Output: input columns +
    ``epoch`` (1-based copy index).  Same id → same decision, across re-runs
    and engines (integer threshold compare on the 24-bit md5 hash).

    100 TB shape: zero shuffle — a pushed drop-stratum filter plus a
    ``sequence``/``explode`` fan-out in one codegen projection; partitioning
    is preserved, and the fan-out is bounded by ``ceil(max(w))`` per row."""
    _reject_collisions(df, "upsample_mixture", "epoch")
    base = F.lit(0)
    thr = F.lit(0)
    for value, w in sorted(weights.items()):
        w = float(w)
        if w < 0:
            raise ValueError(f"negative weight for stratum {value!r}")
        is_v = F.col(strata_col) == value
        base = F.when(is_v, F.lit(int(w))).otherwise(base)
        thr = F.when(is_v, F.lit(int((w - int(w)) * _HASH_MOD))).otherwise(thr)
    # coalesce: a NULL id must still yield floor(w) deterministic copies
    # (NULL hash would NULL the whole count and silently drop the row,
    # diverging from the CASE...ELSE 0 shape every SQL engine writes).
    n_copies = base + F.coalesce(
        (hash24(F.col(id_col), salt) < thr).cast("int"), F.lit(0)
    )
    staged = df.withColumn("_n_copies", n_copies).where(F.col("_n_copies") >= 1)
    exploded = staged.withColumn(
        "epoch", F.explode(F.sequence(F.lit(1), F.col("_n_copies")))
    )
    return exploded.withColumn("epoch", F.col("epoch").cast("bigint")).drop(
        "_n_copies"
    )


def split_by_group(
    df: DataFrame,
    group_col: str,
    fractions: Mapping[str, float],
    salt: str = "",
) -> DataFrame:
    """Leakage-safe train/val/test split: the split decision hashes the
    GROUP (host, source, near-dup ``cluster_id``) rather than the row, so
    correlated rows — near-duplicates, same-site boilerplate — can never
    straddle the split and leak eval data into training.  ``fractions`` maps
    split name → fraction of the hash range, assigned in insertion order;
    the sum must be ≤ 1 and any remainder gets a NULL split (an explicit
    holdout).  Output: input columns + ``split``.

    100 TB shape: zero shuffle — one chained-threshold projection over the
    24-bit group hash, reproducible across runs/engines, pushable as a scan
    filter when a single split is selected downstream."""
    _reject_collisions(df, "split_by_group", "split")
    total = 0.0
    expr = None
    for name, frac in fractions.items():
        frac = float(frac)
        if frac < 0:
            raise ValueError(f"negative fraction for split {name!r}")
        total += frac
        cond = hash24(F.col(group_col), salt) < F.lit(int(total * _HASH_MOD))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total}, must be <= 1")
    if expr is None:
        raise ValueError("fractions must name at least one split")
    return df.withColumn("split", expr)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_streams: int = 32,
    salt: str = "",
) -> DataFrame:
    """Pack documents into fixed token-budget training sequences (sequence
    packing, the standard pre-training batching step): each doc is appended
    to the current bin of its stream; a doc whose exclusive running total
    crosses the budget opens the next bin.  Docs are never split, so a bin
    may overflow by less than one doc — the scalable approximation of
    first-fit packing, whose exact form is inherently sequential.
    Output: (id, stream, seq_bin, bin_offset, n_tokens); ``(stream,
    seq_bin)`` is the global bin key, ``bin_offset`` the doc's token start
    within its bin.

    100 TB shape: ONE shuffle.  Docs hash into ``n_streams`` INDEPENDENT
    packing streams (deterministic md5 of the id, so re-runs and engines
    agree); within a stream the running total is a window cumsum in id
    order.  Parallelism = n_streams — size it to ~4x the executor-core
    count at scale (32 fits the test box); each reducer streams its
    partition through one running counter, state O(1).  All-integer math →
    bit-identical bins on every engine (the double division in floor() is
    exact below 2^53 total tokens per stream)."""
    from pyspark.sql import Window

    stream = F.pmod(hash24(F.col(id_col), salt), F.lit(n_streams))
    staged = df.select(
        F.col(id_col),
        stream.alias("stream"),
        F.col(token_col).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("stream")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return staged.select(
        id_col,
        "stream",
        F.floor(prev / F.lit(budget)).cast("bigint").alias("seq_bin"),
        F.pmod(prev, F.lit(budget)).cast("bigint").alias("bin_offset"),
        "n_tokens",
    )


def assemble_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    text_col: str,
    budget: int,
    n_streams: int = 32,
    sep: str = "\n\n",
    salt: str = "",
) -> DataFrame:
    """Materialize ``pack_sequences``' bins into actual training sequences:
    the same md5-stream binning (identical stream/bin assignment for the
    same inputs), then each bin's documents concatenated in id order with
    ``sep`` between them (the EOS-token slot).  Output per bin:
    (stream, seq_bin, n_docs, n_tokens, seq_text).  Rows with a NULL text
    are excluded (pack metadata for them is still available from
    ``pack_sequences``).

    100 TB shape: ONE shuffle of the corpus text — the window partitions by
    stream, and the per-(stream, bin) aggregation reuses that hash
    partitioning (stream ⊆ grouping keys), so the text payload moves
    exactly once.  Per-bin state is bounded by budget/min-doc-tokens docs;
    the ordered concat sorts only within a bin (array_sort over ≤ that
    many structs)."""
    from pyspark.sql import Window

    stream = F.pmod(hash24(F.col(id_col), salt), F.lit(n_streams))
    staged = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_i"),
        F.col(text_col).alias("_t"),
        stream.alias("stream"),
        F.col(token_col).cast("bigint").alias("_tok"),
    )
    w = (
        Window.partitionBy("stream")
        .orderBy("_i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("_tok").over(w), F.lit(0))
    binned = staged.withColumn(
        "seq_bin", F.floor(prev / F.lit(budget)).cast("bigint")
    )
    docs_sorted = F.array_sort(F.collect_list(F.struct("_i", "_t")))
    return binned.groupBy("stream", "seq_bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("_tok").alias("n_tokens"),
        F.array_join(
            F.transform(docs_sorted, lambda s: s.getField("_t")), sep
        ).alias("seq_text"),
    )


def shard_corpus(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic corpus shuffle into ``n_shards`` training shards —
    the "globally shuffle, then write shards" step before sequence packing.
    Every row gets (shard, shard_pos): shard = md5₂₄(id) % n_shards,
    shard_pos = the row's 1-based rank within its shard in (hash, id)
    order.  The md5 order IS the shuffle: adjacent input docs land in
    unrelated shards/positions, yet re-runs and engines reproduce the
    exact same layout (unlike ``orderBy(rand())``).
    Output: input columns + shard, shard_pos.

    100 TB shape: ONE shuffle on the shard key; each reducer ranks only
    its own shard (uniform by construction — the hash has no hot keys, so
    no salting needed; size n_shards to ≥ the cluster's write parallelism
    and this is also the physical write layout)."""
    from pyspark.sql import Window

    _reject_collisions(df, "shard_corpus", "shard", "shard_pos")
    h = hash24(F.col(id_col), salt)
    staged = df.withColumn("_h", h).withColumn(
        "shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("bigint")
    )
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return staged.withColumn(
        "shard_pos", F.row_number().over(w).cast("bigint")
    ).drop("_h")


def cap_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    k: int,
    n_salts: int = 16,
    salt: str = "",
) -> DataFrame:
    """Keep at most ``k`` rows per key (per-domain / per-host caps, the
    crawl-balancing step) — EXACT and skew-proof, in a deterministic
    pseudo-random order so the kept subset is stable across runs and
    engines.  Output: input columns + ``key_rank`` (1-based rank within the
    key; only rows with rank ≤ k survive).

    A plain ``row_number() over (partition by key)`` piles a hot key's
    entire row set onto one reducer — the planted 20%-host crawl tail makes
    that a straggler (the asof_join lesson).  Salted two-phase instead:

    1. each row gets a deterministic sub-bucket ``_salt = h % n_salts``
       (h = md5₂₄ of the id); counts per (key, salt) aggregate with
       map-side combine — the hot key becomes n_salts count rows;
    2. per-key salt offsets are an exclusive cumsum over those ≤ n_salts
       rows (a tiny window), joined back on (key, salt); global rank =
       offset + row_number within (key, salt) ordered by (h, id).

    The rank is exact for the total order (salt, h, id) per key, and no
    reducer ever sorts more than one (key, salt) slice ≈ hot-key/n_salts
    rows.  Raise ``n_salts`` with cluster size; k ≥ 1 required."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    _reject_collisions(df, "cap_per_key", "key_rank")
    staged = df.withColumn("_h", hash24(F.col(id_col), salt)).withColumn(
        "_salt", F.pmod(F.col("_h"), F.lit(n_salts))
    )
    counts = staged.groupBy(key_col, "_salt").agg(F.count(F.lit(1)).alias("_n"))
    w_off = (
        Window.partitionBy(key_col)
        .orderBy("_salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        key_col,
        "_salt",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
    )
    w_in = Window.partitionBy(key_col, "_salt").orderBy("_h", id_col)
    ranked = staged.join(offsets, [key_col, "_salt"]).withColumn(
        "key_rank", (F.col("_off") + F.row_number().over(w_in)).cast("bigint")
    )
    return ranked.where(F.col("key_rank") <= k).drop("_h", "_salt", "_off")
