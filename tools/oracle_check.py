"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()`` entry
exists, the same query in DuckDB over the same parquet tables; compares row
count, sorted column names, and (order-insensitively) the values themselves.

Both sides are canonicalized THROUGH PANDAS (``toPandas()`` / ``.df()``),
mirroring the driver's canonicalizer: DuckDB HUGEINT materializes as float64
(``21.0`` vs Spark's ``21`` — a value mismatch the old ``fetchall()`` path
silently converted to int), and list-valued cells break the driver's
``sort_values`` — both classes are caught here now.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and format stably
        return repr(v + 0.0)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


_SPARK_TYPE_CLASS = [
    ("bigint", "int"), ("int", "int"), ("smallint", "int"), ("tinyint", "int"),
    ("double", "float"), ("float", "float"), ("decimal", "float"),
    ("string", "str"), ("boolean", "bool"), ("timestamp", "ts"),
    ("date", "ts"), ("array", "array"), ("binary", "bytes"),
]
_DUCK_TYPE_CLASS = [
    # HUGEINT/UBIGINT deliberately map to their own class: the driver's pandas
    # path renders them float64, so they can never safely match a Spark type.
    ("HUGEINT", "hugeint"), ("UBIGINT", "hugeint"),
    ("BIGINT", "int"), ("INTEGER", "int"),
    ("SMALLINT", "int"), ("TINYINT", "int"),
    ("DOUBLE", "float"), ("FLOAT", "float"), ("DECIMAL", "float"), ("NUMBER", "float"),
    ("VARCHAR", "str"), ("STRING", "str"), ("BOOLEAN", "bool"), ("bool", "bool"),
    ("TIMESTAMP", "ts"), ("DATETIME", "ts"), ("DATE", "ts"),
    ("list", "array"), ("[]", "array"), ("BLOB", "bytes"),
]


def _type_class(name, table):
    if name.endswith("[]") or name.startswith("array") or name.startswith("list"):
        return "array"
    for prefix, cls in table:
        if name.startswith(prefix) or name.endswith(prefix):
            return cls
    return name


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm(r[i]) for i in order))
    out.sort()
    return out


def _pandas_rows(pdf):
    """Materialize a pandas frame the way the driver's canonicalizer sees it:
    ``values.tolist()`` converts numpy scalars to native Python (int64→int,
    float64→float, NaN stays float-NaN — exactly the rendering that made
    DuckDB HUGEINT sums hash-mismatch Spark bigints)."""
    return [tuple(r) for r in pdf.values.tolist()]


def main():
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = set(a for a in args if "/" not in a)

    import __spark_entry__ as entrymod
    from schema_validator_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            spdf = sdf.toPandas()
            srows = _pandas_rows(spdf)
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
            dcols = list(dpdf.columns)
            drows = _pandas_rows(dpdf)
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        # the driver's pandas sort_values cannot factorize list cells
        for side, rows_ in (("spark", srows), ("duck", drows)):
            if rows_ and any(isinstance(v, (list, tuple)) or hasattr(v, "tolist")
                             for v in rows_[0]):
                problems.append(
                    f"{side} result has array-valued column "
                    "(driver canonicalizer fails on lists)"
                )
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        else:
            # normalized dtype comparison (the driver checks schema too):
            # int-class vs float-class vs str etc. must line up per column
            stypes = {n: _type_class(t, _SPARK_TYPE_CLASS) for n, t in sdf.dtypes}
            # DB-API description collapses numerics; DESCRIBE gives real types
            desc = con.execute("DESCRIBE " + oracles[name]).fetchall()
            dtypes_ = {
                r[0]: _type_class(str(r[1]), _DUCK_TYPE_CLASS) for r in desc
            }
            for cname in scols:
                if stypes.get(cname) != dtypes_.get(cname):
                    problems.append(
                        f"dtype[{cname}] spark={stypes.get(cname)} duck={dtypes_.get(cname)}"
                    )
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            a, b = _canon(srows, scols), _canon(drows, dcols)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y]
                problems.append(
                    f"values differ ({len(diff)} rows); first: spark={diff[0][0]} duck={diff[0][1]}"
                    if diff
                    else "values differ (set mismatch)"
                )
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
        else:
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failing: {failures}" if failures else "\nall OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
