"""Streaming-operator fuzz battery: registration contract.

The VALUES of every `streamfuzz_*` entry are checked by
tests/test_oracle_parity.py (which runs every registered query against
its DuckDB oracle at sf0.001) and were additionally verified at sf0.01;
this file pins the battery's SHAPE so a generator change that silently
drops entries or oracles is caught."""

from __future__ import annotations

from flink_parent_spark.queries.catalog import all_oracles, all_queries
from flink_parent_spark.queries.stream_fuzz import SHAPES


def test_every_shape_registers_its_count():
    queries = all_queries()
    oracles = all_oracles()
    for shape, (_seed, n, _reg) in SHAPES.items():
        for i in range(n):
            name = f"streamfuzz_{shape}_{i}"
            assert name in queries, name
            # every entry is value-oracle-checked (no rows-only holes)
            assert name in oracles, name
        assert f"streamfuzz_{shape}_{n}" not in queries  # count is exact


def test_battery_size_and_decimal_contract():
    oracles = all_oracles()
    fuzz = {k: v for k, v in oracles.items() if k.startswith("streamfuzz_")}
    assert len(fuzz) == sum(n for (_s, n, _r) in SHAPES.values()) == 37
    # every generated double-summing aggregate goes through the
    # decimal-accumulation contract (integer running sums, like the
    # session oracle's SUM(new_session), are exact without it)
    for name, sql in fuzz.items():
        if "sum_value" in sql:
            assert "DECIMAL(30,6)" in sql, name
