"""Scaling-efficiency benchmark (north rule: ≥0.8 efficiency from N → 4N).

Sandbox stand-in for N vs 4N executors: the SAME job at ``local[8]`` and
``local[32]`` over the SAME on-disk input, each level in its own subprocess
(fresh JVM) so the parallelism setting is honest.

The measured job is the real north-rule workload, one pass over web_pages:
full constraint-plan validation (url trim+lowercase+pattern, text min_length,
lang pattern) + per-lang verdict aggregation + single-pass column profile
(null-rate/min/max/approx-distinct on url,text,lang) + uniqueness dup-count on
url (one hash-shuffle).  Input is sized so the job runs tens of seconds at
local[8] — scheduling overhead must not dominate or the comparison measures
nothing.

Writes BENCH/BASELINE.md with docs/sec at both levels + efficiency.

Usage: python tools/bench_scaling.py [n_rows]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
DATA = "/tmp/spark_graft_bench/web_pages"
MARKER = os.path.join(os.path.dirname(DATA), f"rows_{N_ROWS}")
REPEATS = 5

_WORKER = r"""
import json, sys, time
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from schema_validator_spark.session import get_spark
from schema_validator_spark import ValidationPlan
from schema_validator_spark.operators.stats import profile
from schema_validator_spark.operators.uniqueness import duplicate_keys
from schema_validator_spark.sources.webpages import web_page_schema

cpus = int(sys.argv[1]); data = sys.argv[2]; repeats = int(sys.argv[3])
spark = get_spark(app_name=f"scaling-{cpus}", cpus=cpus)
df = spark.read.parquet(data)
plan = ValidationPlan(web_page_schema())

def job():
    v = plan.apply(df)
    verdicts = v.groupBy("lang").agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.col("valid").cast("long")).alias("ok"),
    ).collect()
    prof = profile(df, columns=["url", "text", "lang"]).collect()
    n_dup = duplicate_keys(df, ["url"]).count()
    return sum(r["total"] for r in verdicts)

n = None
best = float("inf")
for _ in range(repeats):
    t0 = time.time()
    n = job()
    best = min(best, time.time() - t0)
print(json.dumps({"cpus": cpus, "rows": n, "sec": best,
                  "docs_per_sec": n / best}))
"""


def _gen():
    if os.path.exists(MARKER) and os.path.exists(os.path.join(DATA, "_SUCCESS")):
        return
    sys.path.insert(0, ".")
    from schema_validator_spark.session import get_spark
    from schema_validator_spark.sources.webpages import generate_web_pages

    spark = get_spark(app_name="scaling-gen", cpus=32)
    generate_web_pages(spark, N_ROWS, num_partitions=128).write.mode(
        "overwrite"
    ).parquet(DATA)
    spark.stop()
    open(MARKER, "w").write(str(N_ROWS))


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
executors.  Sandbox stand-in (no real cluster available): the SAME job at two
parallelism levels over the same on-disk parquet ({lo["rows"]:,} rows), each
level in a fresh JVM, best of {REPEATS} runs.

The measured job is the full north-rule single-pass workload over web_pages:
constraint-plan validation (url trim+lowercase+URL pattern, text min_length,
lang pattern — one whole-stage-codegen projection), per-lang verdict
aggregation, single-pass column profile (null-rate/min/max/HLL-distinct on
url/text/lang), and uniqueness dup-count on url (one hash shuffle with
map-side partial aggregation).

| config | rows | wall (s) | validated docs/sec |
|---|---|---|---|
| local[8]  (N)  | {lo["rows"]:,} | {lo["sec"]:.2f} | {lo["docs_per_sec"]:,.0f} |
| local[32] (4N) | {hi["rows"]:,} | {hi["sec"]:.2f} | {hi["docs_per_sec"]:,.0f} |

**Scaling efficiency (N→4N) = {hi["docs_per_sec"]:,.0f} / (4 × {lo["docs_per_sec"]:,.0f})
= {eff:.3f}** (target ≥ 0.8).

Caveats: single-machine stand-in — both levels share one memory bus and the OS
page cache, so the 4N level is bandwidth-constrained in ways a real 4N-executor
cluster is not (conversely no network shuffle cost exists here).  The job shape
itself is what scales: a stateless projection + map-side-combined aggregations
whose shuffle carries only per-key counters.

Reproduce: `python tools/bench_scaling.py {N_ROWS}`.
Per-query timings at sf0.1: `python bench.py` (BENCH_r{{N}}.json).
""")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
