"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB over the same
parquet tables, then compares: row count, column names, and values
(column-name-sorted, row-sorted, exact for ints/strings, tiny-epsilon report
for floats — the engine's determinism contract targets EXACT float equality,
so any nonzero float delta is flagged).

Usage: python tools/check_parity.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from flink_parent_spark.queries.catalog import all_oracles, all_queries  # noqa: E402
from flink_parent_spark.session import get_spark  # noqa: E402
from flink_parent_spark.tables import TABLE_NAMES, table_path  # noqa: E402


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{table_path(sf_dir, name)}'"
        )
    return con


def normalize(rows, cols):
    """Sort columns by name, then rows; stringify for stable compare."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(v)
            elif hasattr(v, "isoformat"):
                vals.append(v.isoformat())
            elif isinstance(v, list):
                vals.append(tuple(v))
            else:
                vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def compare(name, spark_df, duck_rel) -> list[str]:
    issues = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = list(duck_rel.columns)
    d_rows = duck_rel.fetchall()
    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
        issues.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return issues
    if len(s_rows) != len(d_rows):
        issues.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    sc, sn = normalize(s_rows, [c.lower() for c in s_cols])
    dc, dn = normalize(d_rows, [c.lower() for c in d_cols])
    n_bad = 0
    max_float_delta = 0.0
    for i, (a, b) in enumerate(zip(sn, dn)):
        for j, (x, y) in enumerate(zip(a, b)):
            if isinstance(x, float) or isinstance(y, float):
                if x is None or y is None:
                    ok = x is None and y is None
                    delta = math.inf if not ok else 0.0
                else:
                    delta = abs(float(x) - float(y))
                    ok = delta == 0.0
                if not ok:
                    max_float_delta = max(max_float_delta, delta)
                    n_bad += 1
                    if n_bad <= 3:
                        issues.append(f"row {i} col {sc[j]}: spark={x!r} duck={y!r} d={delta}")
            elif x != y:
                n_bad += 1
                if n_bad <= 3:
                    issues.append(f"row {i} col {sc[j]}: spark={x!r} duck={y!r}")
    if n_bad > 3:
        issues.append(f"... {n_bad} mismatched cells total (max float delta {max_float_delta})")
    elif n_bad and max_float_delta:
        issues.append(f"(max float delta {max_float_delta})")
    return issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    queries, oracles = all_queries(), all_oracles()
    spark = get_spark("parity")
    con = duck_connect(sf_dir)
    n_pass = n_fail = n_noracle = 0
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                cnt = df.count()
                n_noracle += 1
                print(f"  [rows-only] {name}: {cnt} rows ({time.time()-t0:.1f}s)")
                continue
            issues = compare(name, df, con.sql(oracles[name]))
        except Exception as e:
            issues = [f"EXCEPTION: {type(e).__name__}: {e}"]
        dt = time.time() - t0
        if issues:
            n_fail += 1
            print(f"  [FAIL] {name} ({dt:.1f}s)")
            for msg in issues[:6]:
                print(f"         {msg}")
        else:
            n_pass += 1
            print(f"  [ok]   {name} ({dt:.1f}s)")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only @ {sf_dir}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
