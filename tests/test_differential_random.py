"""Seeded random differential testing: Spark vs DuckDB on identical SQL.

The grammar lives in `flink_parent_spark.queries.diff_grammar` (moved
there in round 9 so a rotating sample of the texts can also be registered
into the driver's correctness gate — see queries/differential_gate.py);
this battery runs EVERY generated text of every family verbatim on both
engines over the same sf0.001 parquet and requires bit-exact matches
under the engine's decimal-accumulation contract. Seeds and counts are
pinned in diff_grammar.FAMILIES, so the texts are byte-stable across
rounds.

Family rationale (why each exists) is documented in diff_grammar's
docstrings; the short version: base = filter/join/group-agg composition,
window = OVER functions over a total order, subq = EXISTS/IN/correlated
scalar, setop = UNION/INTERSECT/EXCEPT under an agg, scalar = per-row
expression semantics, outer = LEFT/RIGHT/FULL ON-vs-WHERE placement.
"""

from __future__ import annotations

import duckdb
import pytest

from flink_parent_spark.queries.diff_grammar import FAMILIES, family_texts
from tools.check_parity import compare, duck_connect

import os

# r12: overridable so the same pinned battery can run as a scale-stress
# leg (FPS_DIFF_SF_DIR=/root/testdata/sf0.1 python -m pytest this-file)
SF_DIR = os.environ.get("FPS_DIFF_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck() -> duckdb.DuckDBPyConnection:
    return duck_connect(SF_DIR)


@pytest.fixture(scope="module")
def sql_tables(spark):
    from flink_parent_spark.tables import load_tables

    t = load_tables(spark, SF_DIR)
    for name in ("lineitem", "orders"):
        t[name].createOrReplaceTempView(name)
    return t


_CASES = [
    (fam, i) for fam, (_seed, n, _gen) in FAMILIES.items() for i in range(n)
]


@pytest.mark.parametrize(
    "fam,i", _CASES, ids=[f"{fam}_{i}" for fam, i in _CASES]
)
def test_random_query_matches_duckdb(spark, duck, sql_tables, fam, i):
    sql = family_texts(fam)[i]
    issues = compare(f"r{fam}_{i}", spark.sql(sql), duck.sql(sql))
    assert not issues, f"{sql}\n" + "\n".join(issues)


def test_grammar_is_byte_stable():
    """Regenerating a family twice yields identical texts (fixed seeds) —
    the property both this battery and the gate rotation depend on."""
    for fam in FAMILIES:
        assert family_texts(fam) == family_texts(fam)
