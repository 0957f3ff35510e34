"""Mirror of the driver's correctness gate at sf0.001: every registered query
with an oracle must match DuckDB exactly (rows, columns, values — floats
bit-exact per the determinism contract in queries/registry.py)."""

from __future__ import annotations

import pytest

from flink_parent_spark.queries.catalog import all_oracles, all_queries
from tools.check_parity import compare

from tests.conftest import SF_DIR

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only contract (non-SQL-expressible op)
        return
    issues = compare(name, df, duck.sql(ORACLES[name]))
    assert not issues, f"{name}: " + "; ".join(issues[:5])
