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


def sample_hash(key: Column, salt: str = "") -> Column:
    """Uniform-ish value in [0, 1) derived from md5(salt|key) — deterministic
    across engines (DuckDB mirror: first 6 hex nibbles via conv)."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 6), 16, 10)
    return h.cast("bigint") / F.lit(float(_HASH_MOD))


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
