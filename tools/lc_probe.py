"""A/B probe for the local-cluster scaling pair (north-rule shape).

Runs the bench_scaling local-cluster pair (1 vs 4 executors, 2 cores each)
in fresh JVMs, optionally overriding session knobs via env, and prints the
raw efficiency.  Used to disambiguate code regressions from box noise
(CLAUDE.md: never conclude a regression from one run).

Usage: python tools/lc_probe.py [label] [repeats]
  env SPARK_GRAFT_AQE_INITIAL_FACTOR — forwarded to the worker JVMs.
"""

from __future__ import annotations

import json
import subprocess
import sys

label = sys.argv[1] if len(sys.argv) > 1 else "probe"
repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 4

sys.path.insert(0, ".")
sys.argv = sys.argv[:1]  # bench_scaling parses sys.argv at import time
from tools.bench_scaling import _WORKER, _lc_cfg, DATA  # noqa: E402


def run(cfg):
    out = subprocess.run(
        [sys.executable, "-c", _WORKER, json.dumps(cfg), DATA, str(repeats)],
        capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


lo = run(_lc_cfg(1, 2))
print(json.dumps(lo), flush=True)
hi = run(_lc_cfg(4, 2))
print(json.dumps(hi), flush=True)
eff = hi["docs_per_sec"] / (4 * lo["docs_per_sec"])
per_phase = {k: round(lo["phases"][k] / (4 * hi["phases"][k]), 3)
             for k in lo["phases"]}
print(json.dumps({"label": label, "lc_eff": round(eff, 3),
                  "per_phase": per_phase}), flush=True)
