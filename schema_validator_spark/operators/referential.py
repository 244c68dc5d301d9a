"""Referential-integrity checks (SURVEY.md §2.B).

Orphan detection = left-anti join of the fact table against the dimension.
Join strategy is the whole game at scale:

- ``broadcast`` (default for real dimension tables): dim ships to every
  executor, NO shuffle of the 100 TB fact side.
- ``shuffle_hash``: both sides hash-partition on the key; avoids sorting the
  fact side (vs sort-merge).  Right choice when the dim outgrows the
  broadcast threshold.
- ``auto``: let Catalyst/AQE decide (dim under
  ``spark.sql.autoBroadcastJoinThreshold`` broadcasts anyway).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dim_keyed(dim: DataFrame, fact_keys, dim_keys) -> DataFrame:
    return dim.select(
        *[F.col(d).alias(f) for f, d in zip(fact_keys, dim_keys)]
    ).dropDuplicates(list(fact_keys))


def orphans(
    fact: DataFrame,
    dim: DataFrame,
    fact_keys: Sequence[str],
    dim_keys: Sequence[str] | None = None,
    strategy: str = "broadcast",
) -> DataFrame:
    """Fact rows whose key has no match in the dimension.  NULL keys are NOT
    orphans (SQL semantics: null FK = absent reference, caught by null-rate
    stats instead)."""
    dim_keys = list(dim_keys or fact_keys)
    fact_keys = list(fact_keys)
    keyed = _dim_keyed(dim, fact_keys, dim_keys)
    if strategy == "broadcast":
        keyed = F.broadcast(keyed)
    elif strategy == "shuffle_hash":
        keyed = keyed.hint("shuffle_hash")
    elif strategy != "auto":
        raise ValueError(f"unknown strategy {strategy!r}")
    non_null = fact
    for k in fact_keys:
        non_null = non_null.where(F.col(k).isNotNull())
    return non_null.join(keyed, on=fact_keys, how="left_anti")


def referential_violations(
    fact: DataFrame,
    dim: DataFrame,
    fact_keys: Sequence[str],
    dim_keys: Sequence[str] | None = None,
    strategy: str = "broadcast",
    code: str = "REFERENTIAL_ERROR",
) -> DataFrame:
    """Orphans rendered as violation rows (fact keys + code + message)."""
    o = orphans(fact, dim, fact_keys, dim_keys, strategy)
    key_repr = F.concat_ws("|", *[F.col(k).cast("string") for k in fact_keys])
    return o.select(
        *fact_keys,
        F.lit(code).alias("code"),
        F.format_string(
            "Referential violation: key '%s' not found in dimension", key_repr
        ).alias("message"),
    )
