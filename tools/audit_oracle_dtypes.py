#!/usr/bin/env python
"""Audit every oracle's output column types for cross-engine hash hazards.

DuckDB widens SUM over integers to HUGEINT (and may keep DECIMAL where the
Spark side produces BIGINT/DOUBLE); an external comparer that hashes typed
values then reports a mismatch even when the numbers are equal. This scans
all registered oracles with DESCRIBE and flags any HUGEINT/DECIMAL output —
the fix is a final CAST in the oracle (and, for shared-dialect queries, in
the query itself).

Usage: python tools/audit_oracle_dtypes.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import flink_parent_spark.queries.catalog as catalog  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = []
    oracles = catalog.all_oracles()
    for name, sql in oracles.items():
        try:
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as ex:  # noqa: BLE001
            bad.append((name, "DESCRIBE-ERR", str(ex)[:120]))
            continue
        for col, typ, *_ in desc:
            if typ.upper().startswith(("HUGEINT", "UHUGEINT", "INT128", "DECIMAL")):
                bad.append((name, col, typ))
    for b in bad:
        print("  [flag]", *b)
    print(f"{len(oracles)} oracles audited, {len(bad)} flagged @ {sf_dir}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
