"""Seeded random differential testing: Spark vs DuckDB on identical SQL.

A small grammar (filter / join / group-by / aggregate over lineitem ⋈
orders) generates query TEXTS from a fixed seed; each text runs verbatim
on BOTH engines over the same sf0.001 parquet and must match bit-exactly
under the engine's decimal-accumulation contract (dsum: SUM over
DECIMAL(30,6), cast DOUBLE — order-independent, so exact across engines).

This is the fuzzing analog of the reference's planner ITCase batteries
(flink-table-planner-blink/src/test/.../runtime/batch/sql/): hand-written
oracles check the operators we thought about; random composition checks
the interactions we didn't. The grammar deliberately stays inside the
cross-engine-exact fragment: equality/range predicates, equi-joins,
COUNT/MIN/MAX/COUNT DISTINCT, and decimal-contract sums — any mismatch is
a real semantics bug, never float-association noise.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from tools.check_parity import compare, duck_connect

SF_DIR = "/root/testdata/sf0.001"
N_QUERIES = 40
SEED = 0xF1DE

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
KEY_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]
ORDER_KEYS = ["o_orderstatus", "o_orderpriority"]
SUM_EXPRS = [
    "l_quantity",
    "l_extendedprice",
    "l_extendedprice * (1 - l_discount)",
    "l_extendedprice * (1 - l_discount) * (1 + l_tax)",
    "l_quantity + l_tax",
]
OPS = ["<", "<=", "=", ">=", ">", "<>"]


def _pred(rng: random.Random, joined: bool) -> str:
    kind = rng.choice(["num", "str", "date"] + (["onum", "ostr"] if joined else []))
    if kind == "num":
        col = rng.choice(NUM_COLS)
        lit = {
            "l_quantity": rng.randint(1, 50),
            "l_extendedprice": rng.randint(1000, 50000),
            "l_discount": round(rng.randint(0, 10) / 100, 2),
            "l_tax": round(rng.randint(0, 8) / 100, 2),
        }[col]
        return f"{col} {rng.choice(OPS)} {lit}"
    if kind == "str":
        col, dom = rng.choice(
            [("l_returnflag", ["A", "N", "R"]), ("l_linestatus", ["O", "F"])]
        )
        return f"{col} = '{rng.choice(dom)}'"
    if kind == "date":
        d = f"199{rng.randint(2, 8)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
        return f"l_shipdate {rng.choice(['<', '>=', '>'])} TIMESTAMP '{d} 00:00:00'"
    if kind == "onum":
        return f"o_totalprice {rng.choice(OPS)} {rng.randint(10000, 400000)}"
    return f"o_orderstatus = '{rng.choice(['O', 'F', 'P'])}'"


def gen_query(rng: random.Random) -> str:
    joined = rng.random() < 0.5
    frm = "lineitem"
    if joined:
        frm += " JOIN orders ON l_orderkey = o_orderkey"
    keys = rng.sample(
        KEY_COLS + (ORDER_KEYS if joined else []), k=rng.randint(0, 2)
    )
    aggs = ["COUNT(*) AS cnt"]
    for i in range(rng.randint(1, 3)):
        a = rng.choice(["dsum", "min", "max", "cntd"])
        if a == "dsum":
            e = rng.choice(SUM_EXPRS)
            aggs.append(
                f"CAST(SUM(CAST(({e}) AS DECIMAL(30,6))) AS DOUBLE) AS s{i}"
            )
        elif a in ("min", "max"):
            c = rng.choice(NUM_COLS + KEY_COLS + ["l_shipdate"])
            aggs.append(f"{a.upper()}({c}) AS {a}{i}")
        else:
            c = rng.choice(KEY_COLS + ["l_orderkey"])
            aggs.append(f"COUNT(DISTINCT {c}) AS d{i}")
    preds = [_pred(rng, joined) for _ in range(rng.randint(0, 2))]
    sql = "SELECT " + ", ".join(keys + aggs) + " FROM " + frm
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    if keys:
        sql += " GROUP BY " + ", ".join(keys)
        if rng.random() < 0.3:
            sql += f" HAVING COUNT(*) > {rng.randint(0, 5)}"
    return sql


def _queries() -> list[str]:
    rng = random.Random(SEED)
    return [gen_query(rng) for _ in range(N_QUERIES)]


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


@pytest.mark.parametrize("i", range(N_QUERIES))
def test_random_query_matches_duckdb(spark, duck, sql_tables, i):
    sql = _queries()[i]
    issues = compare(f"rand_{i}", spark.sql(sql), duck.sql(sql))
    assert not issues, f"{sql}\n" + "\n".join(issues)
