"""Physical-plan inspection helpers — make the 100 TB questions askable in
code: how many shuffles does this plan pay, does the small side broadcast,
did column pruning reach the scan?

These power the repo's plan-shape regression tests (tests/test_plan_shapes.py)
and are public so downstream pipelines can gate deploys on the same
properties ("this nightly job must never grow a second shuffle").
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    """The executed physical plan as text (same content as
    ``df.explain()`` prints, returned instead of printed)."""
    return df._jdf.queryExecution().executedPlan().toString()


def plan_stats(df: DataFrame) -> dict:
    """Counts of the plan operators that dominate cost at scale.

    ``shuffles`` counts real data exchanges only — broadcast and reused
    exchanges are separate entries (a ReusedExchange is a pointer, not a
    second shuffle; a BroadcastExchange ships the small side, not the data).
    ``python_evals`` counts row/Arrow Python operators — anything > 0 means
    part of the plan fell out of the JVM.
    """
    p = plan_string(df)
    return {
        "shuffles": (
            p.count("Exchange")
            - p.count("BroadcastExchange")
            - p.count("ReusedExchange")
        ),
        "broadcasts": p.count("BroadcastExchange"),
        "reused_exchanges": p.count("ReusedExchange"),
        "scans": p.count("FileScan"),
        "python_evals": p.count("EvalPython"),
        "generates": p.count("Generate"),
        "sorts": p.count("Sort "),
        "codegen_stages": p.count("WholeStageCodegen") + p.count("*("),
    }
