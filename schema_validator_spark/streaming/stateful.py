"""Custom stateful streaming operator: running per-key verdict totals via
``applyInPandasWithState`` (the task-level primitive for state Spark's
built-in windowed aggs can't express — here, unbounded running counters per
key that survive micro-batches AND query restarts through the checkpoint).

Scale shape: state is partitioned by the grouping key (one shuffle), each
group's state is a 3-tuple of longs — millions of keys cost megabytes; the
Arrow-batched pandas hook touches only the keys present in each micro-batch.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..plans.runner import VALID_COL

_STATE_SCHEMA = StructType(
    [
        StructField("total", LongType()),
        StructField("passed", LongType()),
        StructField("failed", LongType()),
    ]
)

_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("total_rows", LongType()),
        StructField("passed_rows", LongType()),
        StructField("failed_rows", LongType()),
        StructField("pass", BooleanType()),
    ]
)


def _update(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    total, passed, failed = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        ok = int(pdf["_valid"].sum())
        n = len(pdf)
        total += n
        passed += ok
        failed += n - ok
    state.update((total, passed, failed))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "total_rows": [total],
            "passed_rows": [passed],
            "failed_rows": [failed],
            "pass": [failed == 0],
        }
    )


def running_verdicts(validated: DataFrame, key_col: str) -> DataFrame:
    """Cumulative per-key pass/fail counters over a validated STREAM: emits
    one row per key per micro-batch with running totals; state persists in
    the streaming checkpoint, so a restarted query continues the counts.

    Input: any streaming DataFrame produced by ``validate_stream`` (must
    carry ``valid``).  Output: (key, total_rows, passed_rows, failed_rows,
    pass) in update mode."""
    keyed = validated.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(VALID_COL).alias("_valid"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
