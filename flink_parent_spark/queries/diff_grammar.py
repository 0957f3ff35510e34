"""Seeded random differential-testing grammar: Spark-vs-DuckDB SQL texts.

A small grammar generates query TEXTS from fixed seeds; each text runs
verbatim on BOTH engines over the same parquet and must match bit-exactly
under the engine's decimal-accumulation contract (dsum: SUM over
DECIMAL(30,6), routed decimal -> STRING -> DOUBLE — order-independent
and conversion-exact, so identical across engines).

r12 hardening: the sf0.1 scale-stress leg showed DuckDB's direct
decimal->double cast goes 1 ulp off the correctly-rounded value once the
scale-6 integer representation exceeds 2^53 (its int128->double
conversion rounds twice; Spark's BigDecimal.doubleValue() is correctly
rounded — the engine was right, the oracle conversion drifted). A 2 dp
decimal rescale is no fix either: DuckDB truncates rescale ties where
Spark rounds HALF_UP. Every sum emission therefore routes the exact
decimal through STRING: decimal->string is exact on both engines, and
string->double parsing is correctly rounded on both (strtod /
Double.parseDouble), so bit-exactness holds at every SF and every
magnitude. Seeds and draw sequences are unchanged — only the emission
template moved, so family/index identities are stable even though text
bytes changed this round.

This is the fuzzing analog of the reference's planner ITCase batteries
(flink-table-planner-blink/src/test/.../runtime/batch/sql/): hand-written
oracles check the operators we thought about; random composition checks
the interactions we didn't. The grammar deliberately stays inside the
cross-engine-exact fragment: equality/range predicates, equi-joins,
COUNT/MIN/MAX/COUNT DISTINCT, and decimal-contract sums — any mismatch is
a real semantics bug, never float-association noise.

Eleven families (seed, count pinned per family so texts are byte-stable
across rounds):

- base   (0xF1DE, 40): filter / equi-join / group-by / aggregates
- window (0xB0BA, 15): OVER functions over a total order
- subq   (0x5EED, 15): EXISTS / IN / correlated scalar-agg subqueries
- setop  (0xCAFE, 10): UNION [ALL] / INTERSECT / EXCEPT under an agg
- scalar (0x5CA1A, 20): per-row expression semantics (string/CASE/date/int)
- outer  (0x0E7E4, 15): LEFT/RIGHT/FULL with ON-vs-WHERE placement
- cte    (0xC7E0, 10): WITH-clause multi-reference composition
- nullx  (0x9011, 10): NULLIF/COALESCE/CASE three-valued-logic semantics
- datex  (0xDA7E, 10): date_trunc/EXTRACT/DATE casts/timestamp ranges
- havsub (0x4A75, 10): scalar subqueries in HAVING/WHERE group predicates
- joinx  (0x901F, 10): multi-way join trees with drawn per-edge types

Consumed by tests/test_differential_random.py (the full battery, pytest)
and queries/differential_gate.py (a rotating 10-text sample promoted into
the driver's 50-entry gate prefix each round).
"""

from __future__ import annotations

import random

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
                f"CAST(CAST(SUM(CAST(({e}) AS DECIMAL(30,6))) AS STRING) "
                f"AS DOUBLE) AS s{i}"
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


# The synthetic lineitem does NOT enforce the TPC-H (l_orderkey,
# l_linenumber) primary key, so no short column list is a total order.
# Instead the ORDER BY covers every column any generated window function
# reads — rows that still tie are identical in all read columns, so
# LAG/ROWS-frame outputs are deterministic as a multiset even though the
# tie order itself is arbitrary.
TOTAL_ORDER = (
    "l_orderkey, l_linenumber, l_quantity, l_extendedprice, "
    "l_discount, l_tax, l_shipdate"
)


def gen_window_query(rng: random.Random) -> str:
    part = rng.choice(["l_returnflag", "l_linestatus", "l_returnflag, l_linestatus"])
    fns: list[str] = []
    for i in range(rng.randint(1, 3)):
        kind = rng.choice(["rownum", "rank", "drank", "lag", "lead", "rsum"])
        if kind == "rownum":
            fns.append(
                f"ROW_NUMBER() OVER (PARTITION BY {part} "
                f"ORDER BY {TOTAL_ORDER}) AS w{i}"
            )
        elif kind in ("rank", "drank"):
            fn = "RANK" if kind == "rank" else "DENSE_RANK"
            key = rng.choice(["l_quantity", "l_extendedprice", "l_shipdate"])
            fns.append(
                f"{fn}() OVER (PARTITION BY {part} ORDER BY {key}) AS w{i}"
            )
        elif kind in ("lag", "lead"):
            col = rng.choice(NUM_COLS)
            off = rng.randint(1, 3)
            fns.append(
                f"CAST({kind.upper()}({col}, {off}) OVER (PARTITION BY {part} "
                f"ORDER BY {TOTAL_ORDER}) AS DOUBLE) AS w{i}"
            )
        else:
            e = rng.choice(SUM_EXPRS)
            fns.append(
                f"CAST(CAST(SUM(CAST(({e}) AS DECIMAL(30,6))) OVER ("
                f"PARTITION BY {part} ORDER BY {TOTAL_ORDER} "
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
                f"AS STRING) AS DOUBLE) AS w{i}"
            )
    pred = _pred(rng, joined=False)
    return (
        f"SELECT l_orderkey, l_linenumber, {', '.join(fns)} "
        f"FROM lineitem WHERE {pred}"
    )


def gen_subquery_query(rng: random.Random) -> str:
    kind = rng.choice(["exists", "not_exists", "in", "not_in", "scalar"])
    opred = f"o_totalprice {rng.choice(OPS)} {rng.randint(50000, 300000)}"
    lpred = _pred(rng, joined=False)
    if kind in ("exists", "not_exists"):
        neg = "NOT " if kind == "not_exists" else ""
        return (
            f"SELECT o_orderstatus, COUNT(*) AS cnt, "
            f"CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS STRING) "
            f"AS DOUBLE) AS s0 "
            f"FROM orders WHERE {opred} AND {neg}EXISTS ("
            f"SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
            f"AND {lpred}) GROUP BY o_orderstatus"
        )
    if kind in ("in", "not_in"):
        neg = "NOT " if kind == "not_in" else ""
        # l_orderkey is non-null, so NOT IN has no three-valued surprise
        return (
            f"SELECT o_orderpriority, COUNT(*) AS cnt "
            f"FROM orders WHERE {opred} AND o_orderkey {neg}IN ("
            f"SELECT l_orderkey FROM lineitem WHERE {lpred}) "
            f"GROUP BY o_orderpriority"
        )
    # scalar: a CORRELATED scalar-aggregate subquery per row (exact
    # fragment: MAX/MIN/COUNT over decimals, no float association), with
    # the generated outer and inner predicates both live
    inner = rng.choice(
        [
            "COALESCE(MAX(l_extendedprice), 0)",
            "COALESCE(MIN(l_extendedprice), 0) * 20",
            "COUNT(*) * 10000",
        ]
    )
    return (
        f"SELECT o_orderstatus, COUNT(*) AS cnt, MAX(o_totalprice) AS m0 "
        f"FROM orders WHERE {opred} AND o_totalprice > ("
        f"SELECT {inner} FROM lineitem "
        f"WHERE l_orderkey = o_orderkey AND {lpred}) "
        f"GROUP BY o_orderstatus"
    )


def gen_setop_query(rng: random.Random) -> str:
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    proj = rng.choice(
        [
            "l_returnflag AS a, l_linestatus AS b",
            "l_returnflag AS a, CAST(l_linenumber AS STRING) AS b",
            "l_orderkey % 97 AS a, l_linenumber AS b",
        ]
    )
    p1, p2 = _pred(rng, False), _pred(rng, False)
    inner = (
        f"SELECT {proj} FROM lineitem WHERE {p1} "
        f"{op} SELECT {proj} FROM lineitem WHERE {p2}"
    )
    # aggregate on top so UNION ALL (a bag) still compares order-free with
    # exact values
    return f"SELECT a, b, COUNT(*) AS cnt FROM ({inner}) t GROUP BY a, b"


# a non-trivial string to slice: flag || orderkey-mod || status
_STR = "(l_returnflag || CAST(l_orderkey % 100 AS STRING) || l_linestatus)"


def _scalar_expr(rng: random.Random, i: int) -> str:
    kind = rng.choice(["strfn", "casewhen", "datefn", "intarith", "nest"])
    if kind == "strfn":
        e = rng.choice(
            [
                f"UPPER({_STR})",
                f"LOWER({_STR})",
                f"SUBSTR({_STR}, {rng.randint(1, 3)}, {rng.randint(1, 4)})",
                f"REPLACE({_STR}, '{rng.choice(['A', 'N', 'R', '1'])}', 'x')",
                f"LENGTH({_STR})",
                f"REVERSE({_STR})",
                f"REPEAT(l_linestatus, {rng.randint(1, 3)})",
                f"LPAD(l_returnflag, {rng.randint(2, 5)}, '.')",
                f"INSTR({_STR}, '{rng.choice(['A1', 'N', '9F', 'zz'])}')",
            ]
        )
    elif kind == "casewhen":
        lo, hi = sorted(rng.sample(range(5, 50), 2))
        e = (
            f"CASE WHEN l_quantity < {lo} THEN 'lo' "
            f"WHEN l_quantity < {hi} THEN 'mid' ELSE 'hi' END"
        )
    elif kind == "datefn":
        e = rng.choice(
            [
                "EXTRACT(YEAR FROM l_shipdate)",
                "EXTRACT(MONTH FROM l_shipdate)",
                "EXTRACT(DAY FROM l_shipdate)",
                # CAST: DuckDB's date_trunc at >= day granularity returns
                # DATE while Spark keeps TIMESTAMP — pin the common type
                "CAST(DATE_TRUNC('month', l_shipdate) AS TIMESTAMP)",
                "CAST(DATE_TRUNC('year', l_shipdate) AS TIMESTAMP)",
            ]
        )
    elif kind == "intarith":
        e = rng.choice(
            [
                f"(l_orderkey * {rng.randint(3, 11)} + l_linenumber) % {rng.randint(7, 997)}",
                f"ABS(l_linenumber - {rng.randint(1, 7)})",
                f"GREATEST(l_linenumber, {rng.randint(1, 6)})",
                f"LEAST(l_linenumber * 2, {rng.randint(2, 9)})",
            ]
        )
    else:
        e = rng.choice(
            [
                f"LENGTH(REPLACE({_STR}, 'A', 'xx'))",
                f"SUBSTR(UPPER({_STR}), 2, 3)",
                f"CASE WHEN INSTR({_STR}, 'N') > 0 THEN REVERSE({_STR}) "
                f"ELSE {_STR} END",
                f"CAST(LENGTH({_STR}) * {rng.randint(2, 5)} AS STRING) || '_' "
                f"|| l_returnflag",
            ]
        )
    return f"{e} AS e{i}"


def gen_scalar_query(rng: random.Random) -> str:
    exprs = [_scalar_expr(rng, i) for i in range(rng.randint(2, 4))]
    pred = _pred(rng, joined=False)
    return (
        f"SELECT l_orderkey, l_linenumber, {', '.join(exprs)} "
        f"FROM lineitem WHERE {pred}"
    )


def gen_outer_join_query(rng: random.Random) -> str:
    jt = rng.choice(["LEFT", "RIGHT", "FULL"])
    on = "l_orderkey = o_orderkey"
    # an extra ON-clause predicate makes the join genuinely null-generating
    # on matched keys too (the classic ON-vs-WHERE semantics trap)
    if rng.random() < 0.5:
        on += f" AND o_totalprice > {rng.randint(50000, 200000)}"
    keys = rng.sample(["l_returnflag", "l_linestatus", "o_orderstatus"], k=rng.randint(1, 2))
    aggs = [
        "COUNT(*) AS cnt",
        "COUNT(o_orderkey) AS cnt_right",  # null-aware count
        "COUNT(l_orderkey) AS cnt_left",
    ]
    if rng.random() < 0.7:
        e = rng.choice(SUM_EXPRS)
        aggs.append(
            f"CAST(CAST(SUM(CAST(({e}) AS DECIMAL(30,6))) AS STRING) "
            f"AS DOUBLE) AS s0"
        )
    aggs.append(f"MIN({rng.choice(['o_totalprice', 'l_quantity'])}) AS m0")
    where = ""
    if rng.random() < 0.4:
        # WHERE on the preserved side only (a null-side WHERE would just
        # re-derive an inner join — less interesting)
        side = "l" if jt == "LEFT" else "o"
        where = " WHERE " + (
            _pred(rng, joined=False) if side == "l"
            else f"o_orderpriority = '{rng.choice(['1-URGENT', '2-HIGH', '3-MEDIUM'])}'"
        )
    return (
        f"SELECT {', '.join(keys)}, {', '.join(aggs)} "
        f"FROM lineitem {jt} JOIN orders ON {on}{where} "
        f"GROUP BY {', '.join(keys)}"
    )


def gen_cte_query(rng: random.Random) -> str:
    """WITH-clause composition: a per-key aggregate CTE consumed twice —
    re-aggregated AND joined back — the multi-reference shape that
    exercises CTE planning (inlining vs reuse) without leaving the exact
    fragment."""
    key = rng.choice(KEY_COLS)
    e = rng.choice(SUM_EXPRS)
    pred = _pred(rng, joined=False)
    agg2 = rng.choice(
        [
            "MIN(k_cnt) AS m0, MAX(k_cnt) AS m1",
            "CAST(CAST(SUM(CAST(k_sum AS DECIMAL(30,6))) AS STRING) "
            "AS DOUBLE) AS s0, COUNT(*) AS c0",
            "COUNT(*) AS c0, MIN(k_sum) AS m0",
        ]
    )
    hav = f" HAVING COUNT(*) >= {rng.randint(1, 3)}" if rng.random() < 0.4 else ""
    return (
        f"WITH per_key AS ("
        f"SELECT {key} AS k, COUNT(*) AS k_cnt, "
        f"CAST(CAST(SUM(CAST(({e}) AS DECIMAL(30,6))) AS STRING) "
        f"AS DOUBLE) AS k_sum "
        f"FROM lineitem WHERE {pred} GROUP BY {key}{hav}) "
        f"SELECT a.k, a.k_cnt, {agg2.replace('k_cnt', 'b.k_cnt').replace('k_sum', 'b.k_sum')} "
        f"FROM per_key a JOIN per_key b ON a.k = b.k "
        f"GROUP BY a.k, a.k_cnt"
    )


def gen_null_expr_query(rng: random.Random) -> str:
    """Null-semantics fuzz: NULLIF / COALESCE / IS [NOT] NULL /
    null-generating CASE, aggregated with null-skipping COUNT(expr) vs
    COUNT(*) — the three-valued-logic fragment the scalar family avoids
    by construction. Integer/string only: exact across engines."""
    # (expr, is_string): the COALESCE default below must match the
    # expression's type — a VARCHAR nullable with an integer default is
    # outside the "exact across engines" contract (Spark coerces, the
    # DuckDB binder rejects).
    nullable, is_str = rng.choice(
        [
            (f"NULLIF(l_linenumber, {rng.randint(1, 5)})", False),
            ("NULLIF(l_returnflag, 'A')", True),
            (f"CASE WHEN l_quantity > {rng.randint(10, 40)} THEN l_linenumber END", False),
            ("CASE WHEN l_linestatus = 'O' THEN NULL ELSE l_linenumber END", False),
        ]
    )
    key = rng.choice(KEY_COLS[:2])
    aggs = [
        "COUNT(*) AS cnt",
        f"COUNT({nullable}) AS cnt_nn",  # null-skipping
        f"COUNT(*) - COUNT({nullable}) AS cnt_null",
    ]
    if is_str:
        co = rng.choice(
            [
                f"COALESCE({nullable}, '~')",
                f"COALESCE({nullable}, l_linestatus, '~')",
            ]
        )
    else:
        co = rng.choice(
            [
                f"COALESCE({nullable}, -1)",
                f"COALESCE({nullable}, l_linenumber, -1)",
            ]
        )
    if rng.random() < 0.7:
        aggs.append(f"MIN({co}) AS m0")
        aggs.append(f"MAX({co}) AS m1")
    pred = rng.choice(
        [
            f"{nullable} IS NULL",
            f"{nullable} IS NOT NULL",
            _pred(rng, joined=False),
        ]
    )
    return (
        f"SELECT {key}, {', '.join(aggs)} FROM lineitem "
        f"WHERE {pred} GROUP BY {key}"
    )


def gen_datetime_query(rng: random.Random) -> str:
    """Date/time-semantics fuzz: date_trunc bucketing, EXTRACT parts,
    CAST-to-DATE, timestamp-range predicates — the temporal fragment the
    scalar family only brushes. Stays inside the cross-engine-exact
    subset: trunc units year..hour (identical origins), parts
    YEAR/QUARTER/MONTH/DAY (no DOW — the engines number weekdays
    differently), MIN/MAX/COUNT over timestamps (order-independent)."""
    # the synthetic lineitem carries only l_shipdate (no commit/receipt
    # dates); the draw is kept for rng-sequence stability if columns land
    ts_col = rng.choice(["l_shipdate", "l_shipdate", "l_shipdate"])
    unit = rng.choice(["year", "quarter", "month", "day", "hour"])
    part = rng.choice(["YEAR", "QUARTER", "MONTH", "DAY"])
    # explicit TIMESTAMP cast: DuckDB's date_trunc returns DATE for
    # day-or-coarser units while Spark always returns TIMESTAMP
    keys = [f"CAST(date_trunc('{unit}', {ts_col}) AS TIMESTAMP) AS bucket"]
    group = ["1"]
    if rng.random() < 0.5:
        keys.append(f"EXTRACT({part} FROM l_shipdate) AS p0")
        group.append("2")
    aggs = [
        "COUNT(*) AS cnt",
        f"MIN({ts_col}) AS t_min",
        "MAX(CAST(l_shipdate AS DATE)) AS d_max",
    ]
    if rng.random() < 0.6:
        e = rng.choice(SUM_EXPRS)
        aggs.append(f"CAST(CAST(SUM(CAST(({e}) AS DECIMAL(30,6))) AS STRING) "
            f"AS DOUBLE) AS s0")
    lo_y = rng.randint(1992, 1996)
    hi_y = lo_y + rng.randint(1, 2)
    preds = [
        f"{ts_col} >= TIMESTAMP '{lo_y}-01-01 00:00:00'",
        f"{ts_col} < TIMESTAMP '{hi_y}-07-01 00:00:00'",
    ]
    if rng.random() < 0.5:
        preds.append(_pred(rng, joined=False))
    return (
        f"SELECT {', '.join(keys)}, {', '.join(aggs)} FROM lineitem "
        f"WHERE {' AND '.join(preds)} GROUP BY {', '.join(group)}"
    )


def gen_having_subquery_query(rng: random.Random) -> str:
    """HAVING/WHERE against scalar subqueries: group predicates compared
    to aggregates computed over a differently-filtered scan of the same
    table — the decorrelated-scalar-subquery planning the subq family's
    correlated shapes don't cover. Division is avoided (int '/' differs
    across engines); scale comparisons use multiplication, which is
    exact."""
    key = rng.choice(KEY_COLS)
    pred = _pred(rng, joined=False)
    pred2 = _pred(rng, joined=False)
    k = rng.randint(2, 9)
    shape = rng.choice(["hav_cnt", "hav_minmax", "where_scalar"])
    if shape == "hav_cnt":
        return (
            f"SELECT {key}, COUNT(*) AS cnt FROM lineitem WHERE {pred} "
            f"GROUP BY {key} "
            f"HAVING COUNT(*) * {k} > "
            f"(SELECT COUNT(*) FROM lineitem WHERE {pred2})"
        )
    if shape == "hav_minmax":
        op = rng.choice(["<=", ">="])
        agg = rng.choice(["MIN", "MAX"])
        return (
            f"SELECT {key}, COUNT(*) AS cnt, {agg}(l_quantity) AS q "
            f"FROM lineitem WHERE {pred} GROUP BY {key} "
            f"HAVING {agg}(l_quantity) {op} "
            f"(SELECT {agg}(l_quantity) + {rng.randint(-5, 5)} "
            f"FROM lineitem WHERE {pred2})"
        )
    # where_scalar: scalar subquery in the row-level predicate
    return (
        f"SELECT {key}, COUNT(*) AS cnt, MIN(l_extendedprice) AS m0 "
        f"FROM lineitem WHERE {pred} AND l_quantity > "
        f"(SELECT MIN(l_quantity) + {rng.randint(0, 10)} "
        f"FROM lineitem WHERE {pred2}) "
        f"GROUP BY {key}"
    )


def _family(seed: int, n: int, gen) -> list[str]:
    rng = random.Random(seed)
    return [gen(rng) for _ in range(n)]


# Canonical (seed, count, generator) per family — the single source of
def gen_multijoin_query(rng: random.Random) -> str:
    """Multi-way join trees (the reference's {Inner,Outer}JoinITCase
    multi-table shapes, and Catalyst's join-reordering surface): customer
    ⋈ orders ⋈ lineitem with drawn per-edge join types (INNER/LEFT, and
    occasionally RIGHT on the fact edge), an optional nation dim edge,
    drawn filters, and grouped aggregates through the decimal contract.
    COUNT(col) on nullable sides pins the null-extension semantics."""
    t1 = rng.choice(["INNER", "LEFT", "LEFT"])
    t2 = rng.choice(["INNER", "LEFT", "RIGHT"])
    with_nation = rng.random() < 0.5
    on1 = "c_custkey = o_custkey"
    if rng.random() < 0.4:
        on1 += f" AND o_totalprice > {rng.randint(20000, 150000)}"
    on2 = "o_orderkey = l_orderkey"
    if rng.random() < 0.3:
        on2 += f" AND l_quantity < {rng.randint(10, 45)}"
    key_pool = ["c_mktsegment", "o_orderstatus", "l_returnflag"]
    if with_nation:
        key_pool.append("n_name")
    keys = rng.sample(key_pool, k=rng.randint(1, 2))
    aggs = [
        "COUNT(*) AS cnt",
        "COUNT(o_orderkey) AS cnt_o",
        "COUNT(l_orderkey) AS cnt_l",
    ]
    e = rng.choice(
        ["l_extendedprice * (1 - l_discount)", "o_totalprice", "l_quantity"]
    )
    aggs.append(f"CAST(CAST(SUM(CAST(({e}) AS DECIMAL(30,6))) AS STRING) "
            f"AS DOUBLE) AS s0")
    aggs.append(
        f"MIN({rng.choice(['o_totalprice', 'l_extendedprice', 'c_acctbal'])}) AS m0"
    )
    joins = (
        f"customer {t1} JOIN orders ON {on1} "
        f"{t2} JOIN lineitem ON {on2}"
    )
    if with_nation:
        joins += " INNER JOIN nation ON c_nationkey = n_nationkey"
    where = ""
    if rng.random() < 0.5:
        where = " WHERE " + rng.choice(
            [
                f"c_mktsegment = '{rng.choice(['BUILDING', 'MACHINERY', 'AUTOMOBILE'])}'",
                f"c_acctbal > {rng.randint(0, 5000)}",
            ]
        )
    return (
        f"SELECT {', '.join(keys)}, {', '.join(aggs)} "
        f"FROM {joins}{where} GROUP BY {', '.join(keys)}"
    )


# truth; the pytest battery and the gate rotation both read this.
FAMILIES: dict[str, tuple[int, int, object]] = {
    "base": (0xF1DE, 40, gen_query),
    "window": (0xB0BA, 15, gen_window_query),
    "subq": (0x5EED, 15, gen_subquery_query),
    "setop": (0xCAFE, 10, gen_setop_query),
    "scalar": (0x5CA1A, 20, gen_scalar_query),
    "outer": (0x0E7E4, 15, gen_outer_join_query),
    # round-9 families: CTE multi-reference composition; three-valued
    # null semantics (NULLIF/COALESCE/null-generating CASE + COUNT(expr))
    "cte": (0xC7E0, 10, gen_cte_query),
    "nullx": (0x9011, 10, gen_null_expr_query),
    # round-10 families: temporal semantics (date_trunc/EXTRACT/DATE
    # casts/timestamp ranges); scalar subqueries in HAVING/WHERE
    "datex": (0xDA7E, 10, gen_datetime_query),
    "havsub": (0x4A75, 10, gen_having_subquery_query),
    # round-11 family: multi-way join trees with drawn per-edge types
    "joinx": (0x901F, 10, gen_multijoin_query),
}


def family_texts(name: str) -> list[str]:
    seed, n, gen = FAMILIES[name]
    return _family(seed, n, gen)


def all_texts() -> dict[str, list[str]]:
    """Every generated text, keyed by family (165 total)."""
    return {name: family_texts(name) for name in FAMILIES}
