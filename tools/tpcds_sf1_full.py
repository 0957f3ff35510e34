"""Run ALL real TPC-DS texts value-exactly against DuckDB at the
SF1-equivalent generated volume (tpcds_data.BENCH_SCALE ≈ the reference's
test_tpcds.sh SF=1 validation scale).

The default pytest suite checks all 103 texts at qualification scale and
seven heavy ones at SF1-equivalent; this tool is the full-volume sweep —
run it when the generator or a query text changes:

    python tools/tpcds_sf1_full.py            # all 103
    python tools/tpcds_sf1_full.py q64 q23a   # a subset

Prints per-query pass/fail + seconds (Spark side), then a summary line.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402


def main() -> None:
    from flink_parent_spark.queries.tpcds_data import BENCH_SCALE, ensure_tpcds
    from flink_parent_spark.queries.tpcds_real import (
        TPCDS_SQL,
        oracle_sql_at_scale,
        run_tpcds_at_scale,
    )
    from flink_parent_spark.session import get_spark
    from tools.check_parity import compare

    ensure_tpcds(BENCH_SCALE)
    spark = get_spark("tpcds-sf1-full")
    names = [f"tpcds_{a}" for a in sys.argv[1:]] or sorted(
        TPCDS_SQL, key=lambda n: (len(n), n)
    )
    con = duckdb.connect()
    n_pass = n_fail = 0
    t_spark = 0.0
    for name in names:
        t0 = time.time()
        try:
            sdf = run_tpcds_at_scale(spark, name, BENCH_SCALE)
            sdf.persist()
            sdf.count()
            dt = time.time() - t0
            t_spark += dt
            issues = compare(
                name, sdf, con.sql(oracle_sql_at_scale(name, BENCH_SCALE))
            )
            sdf.unpersist()
        except Exception as e:  # noqa: BLE001
            issues = [f"EXCEPTION: {e}"]
            dt = time.time() - t0
        if issues:
            n_fail += 1
            print(f"  [FAIL] {name} ({dt:.1f}s)")
            for i in issues[:4]:
                print(f"         {i}")
        else:
            n_pass += 1
            print(f"  [ok]   {name} ({dt:.1f}s)")
    print(
        f"\n{n_pass} pass, {n_fail} fail @ SF1-equivalent "
        f"(scale={BENCH_SCALE}, spark total {t_spark:.0f}s)"
    )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
