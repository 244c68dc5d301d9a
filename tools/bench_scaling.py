"""Scaling-efficiency benchmark (north rule: ≥0.8 efficiency from N → 4N).

Sandbox stand-in for N vs 4N executors: the SAME flagship validation job at
``local[8]`` and ``local[32]`` over the SAME on-disk input.  Each level runs
in its own subprocess (fresh JVM) so the parallelism setting is honest.

Writes BENCH/BASELINE.md with docs/sec at both levels + efficiency.

Usage: python tools/bench_scaling.py [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
DATA = "/tmp/spark_graft_bench/web_pages"
REPEATS = 3

_WORKER = r"""
import json, sys, time
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from schema_validator_spark.session import get_spark
from schema_validator_spark import ValidationPlan
from schema_validator_spark.sources.webpages import web_page_schema

cpus = int(sys.argv[1]); data = sys.argv[2]; repeats = int(sys.argv[3])
spark = get_spark(app_name=f"scaling-{cpus}", cpus=cpus)
df = spark.read.parquet(data)
plan = ValidationPlan(web_page_schema())
out = plan.apply(df).agg(F.count(F.lit(1)).alias("n"),
                         F.sum(F.col("valid").cast("long")).alias("ok"))
n = None
best = float("inf")
for _ in range(repeats):
    t0 = time.time()
    row = out.collect()[0]
    best = min(best, time.time() - t0)
    n = row["n"]
print(json.dumps({"cpus": cpus, "rows": n, "sec": best,
                  "docs_per_sec": n / best}))
"""


def _gen():
    if os.path.exists(DATA):
        return
    sys.path.insert(0, ".")
    from schema_validator_spark.session import get_spark
    from schema_validator_spark.sources.webpages import generate_web_pages

    spark = get_spark(app_name="scaling-gen", cpus=32)
    generate_web_pages(spark, N_ROWS, num_partitions=64).write.mode(
        "overwrite"
    ).parquet(DATA)
    spark.stop()


def _run(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _WORKER, str(cpus), DATA, str(REPEATS)],
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    _gen()
    lo = _run(8)
    hi = _run(32)
    eff = hi["docs_per_sec"] / (4 * lo["docs_per_sec"])
    report = {
        "local8": lo,
        "local32": hi,
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    print(json.dumps(report))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE.md — scaling evidence (north rule)

The reference library publishes no benchmark numbers (no bench harness, no
criterion dep — see SURVEY.md §6), so the authoritative target is the north
rule's scaling criterion: ≥0.8 throughput scaling efficiency from N to 4N
executors.  Sandbox stand-in (no real cluster available): the SAME flagship
constraint-validation job — full web_pages object schema (url trim+lowercase+
pattern, text min_length, lang pattern) compiled to a single-pass projection +
verdict agg — run at two parallelism levels over the same on-disk parquet
({lo["rows"]:,} rows), each level in a fresh JVM, best of {REPEATS} runs.

| config | rows | wall (s) | validated docs/sec |
|---|---|---|---|
| local[8]  (N)  | {lo["rows"]:,} | {lo["sec"]:.2f} | {lo["docs_per_sec"]:,.0f} |
| local[32] (4N) | {hi["rows"]:,} | {hi["sec"]:.2f} | {hi["docs_per_sec"]:,.0f} |

**Scaling efficiency (N→4N) = {hi["docs_per_sec"]:,.0f} / (4 × {lo["docs_per_sec"]:,.0f})
= {eff:.3f}** (target ≥ 0.8).

Caveats: single-machine stand-in — both levels share memory bandwidth and the
parquet scan is I/O-bound at the margins, so this under-states true multi-node
scaling (no shuffle crosses a network here; conversely, 32 threads contend for
one memory bus).  The job itself is embarrassingly parallel by construction
(per-partition projection + map-side partial agg; the only shuffle is the tiny
verdict agg), which is exactly the plan shape that scales to 1000 executors.

Reproduce: `python tools/bench_scaling.py {N_ROWS}`.
Per-query timings at sf0.1: `python bench.py` (BENCH_r{{N}}.json).
""")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
