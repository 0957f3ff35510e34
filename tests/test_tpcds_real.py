"""Real-TPC-DS harness tests: generator determinism and battery structure
(the value correctness of every tpcds_q* runs in test_oracle_parity)."""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import tempfile


def _md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def test_generator_is_deterministic():
    """Regenerating on any machine must yield byte-identical parquet —
    the cross-engine value contract depends on both engines reading the
    same data the driver's machine regenerates from the same seed."""
    from flink_parent_spark.queries.tpcds_data import _generate, ensure_tpcds

    cached = ensure_tpcds()
    scratch = os.path.join(tempfile.gettempdir(), "fps_tpcds_determinism")
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    try:
        _generate(scratch)
        for t in ("store_sales", "catalog_returns", "date_dim", "item"):
            assert _md5(os.path.join(cached, f"{t}.parquet")) == _md5(
                os.path.join(scratch, f"{t}.parquet")
            ), f"{t} not byte-identical across generations"
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_battery_covers_all_103():
    """The registered battery carries every base TPC-DS query number 1..99
    plus the four b-variants — the reference harness's 103-query set
    (TpcdsTestProgram.java:75-86)."""
    from flink_parent_spark.queries.catalog import all_oracles, all_queries

    qs, os_ = all_queries(), all_oracles()
    base = {int(m.group(1)) for q in qs if (m := re.fullmatch(r"tpcds_q(\d+)", q))}
    assert base == set(range(1, 100))
    for v in ("tpcds_q14b", "tpcds_q23b", "tpcds_q24b", "tpcds_q39b"):
        assert v in qs
    # every entry is oracle-backed (value-checked, not rows-only)
    missing = [q for q in qs if q.startswith("tpcds_q") and q not in os_]
    assert not missing


def test_scaled_generator_counts_and_dir_isolation():
    """The scale knob grows facts linearly into a per-scale directory,
    leaving the qualification dataset untouched (test_tpcds.sh:22 SF=1
    posture: correctness at qualification scale, volume demonstrated at
    the scaled dataset)."""
    import pyarrow.parquet as pq

    from flink_parent_spark.queries.tpcds_data import ensure_tpcds, tpcds_dir

    base, scaled = ensure_tpcds(), ensure_tpcds(3.0)
    assert base != scaled and tpcds_dir(3.0).endswith("_sf3")
    n = {
        d: pq.read_metadata(os.path.join(d, "store_sales.parquet")).num_rows
        for d in (base, scaled)
    }
    # avg 3 lines/ticket: 3x tickets -> ~3x lines (exact ratio varies with
    # the rng draw of lines-per-ticket)
    assert 2.8 < n[scaled] / n[base] < 3.2
    # stores/warehouses stay at the spec's SF1 cardinalities
    for t in ("store", "warehouse"):
        assert pq.read_metadata(
            os.path.join(scaled, f"{t}.parquet")
        ).num_rows == pq.read_metadata(os.path.join(base, f"{t}.parquet")).num_rows


import pytest as _pytest


@_pytest.mark.parametrize(
    "name",
    [
        # the four bench headline texts...
        "tpcds_q3", "tpcds_q14", "tpcds_q64", "tpcds_q67",
        # ...plus the remaining heaviest plan families: CTE chain, widest
        # join count, order-fulfilment EXISTS/NOT EXISTS
        "tpcds_q23", "tpcds_q72", "tpcds_q95",
    ],
)
def test_bench_queries_value_parity_at_sf1_equivalent(name, spark):
    """The four bench headline TPC-DS texts are value-exact against the
    DuckDB oracle AT THE SF1-EQUIVALENT VOLUME too (~3M store_sales
    lines) — scaled throughput numbers in BENCH come from queries whose
    answers are verified at that same scale."""
    import duckdb

    from flink_parent_spark.queries.tpcds_data import BENCH_SCALE, ensure_tpcds
    from flink_parent_spark.queries.tpcds_real import (
        oracle_sql_at_scale,
        run_tpcds_at_scale,
    )
    from tools.check_parity import compare

    ensure_tpcds(BENCH_SCALE)
    df = run_tpcds_at_scale(spark, name, BENCH_SCALE)
    con = duckdb.connect()
    try:
        issues = compare(name, df, con.sql(oracle_sql_at_scale(name, BENCH_SCALE)))
    finally:
        con.close()
    assert not issues, f"{name}@sf1-equivalent: " + "; ".join(issues[:5])
