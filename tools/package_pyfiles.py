"""Build the --py-files zip for cluster submission (north rule: launched via
``spark-submit --py-files`` on multi-executor clusters).

Usage:
    python tools/package_pyfiles.py [out.zip]
    spark-submit --py-files dist/schema_validator_spark.zip your_job.py

The zip contains only the package sources (no tests/tools) so executors'
Python workers can import ``schema_validator_spark`` for the pandas-UDF
stages; everything else in the plan is JVM-side Column expressions and needs
no shipping.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "schema_validator_spark"


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, ROOT))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "dist", f"{PKG}.zip")
    print(build(out))
