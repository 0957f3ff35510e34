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
