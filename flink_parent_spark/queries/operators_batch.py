"""Batch relational-operator queries: OVER windows, Top-N, dedup, grouping
sets, set ops, UNNEST/lateral, pivot, semi/anti/cross joins.

Mirrors the reference's per-operator ITCase coverage
(flink-table-planner-blink/src/test/scala/.../runtime/batch/sql/ —
OverWindowITCase, RankITCase, SetOperatorsITCase, UnnestITCase,
GroupingSetsITCase, …), re-expressed Spark-first. DataFrame-API entries
exercise the operator library (flink_parent_spark.operators) — the Table-API
surface — with hand-written DuckDB oracles; plain-SQL entries use the common
dialect verbatim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_parent_spark.operators.rank import dedup_keep_first, dedup_keep_last, top_n
from flink_parent_spark.queries.registry import df_query, dsum, sql_query
from flink_parent_spark.tables import load_tables

# --- OVER windows (batch; BufferDataOverWindowOperator + frames parity) -----

sql_query(
    "over_running_agg",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) OVER (
                PARTITION BY l_suppkey
                ORDER BY l_shipdate, l_orderkey, l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_revenue,
           COUNT(*) OVER (
                PARTITION BY l_suppkey
                ORDER BY l_shipdate, l_orderkey, l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cnt
    FROM lineitem
    WHERE l_suppkey <= 3
    """,
)

sql_query(
    "over_sliding_rows_frame",
    """
    SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS sum_last3,
           CAST(MIN(o_totalprice) OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE)
             AS min_neighborhood
    FROM orders
    WHERE o_custkey < 100
    """,
)

sql_query(
    "over_range_interval_frame",
    """
    SELECT o_orderkey,
           COUNT(*) OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate
                RANGE BETWEEN INTERVAL '90' DAY PRECEDING AND CURRENT ROW)
             AS orders_90d
    FROM orders
    WHERE o_custkey < 100
    """,
)

sql_query(
    "over_rank_functions",
    """
    SELECT o_orderkey, o_custkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           ROW_NUMBER() OVER w AS rn,
           NTILE(4) OVER w AS quartile,
           LEAD(o_orderkey, 1) OVER w AS next_orderkey,
           LAG(o_orderkey, 1) OVER w AS prev_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_ok,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_ok
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)

# --- Top-N / dedup (rank-pattern parity: StreamExecRank / Deduplicate) ------


@df_query(
    "topn_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def topn_orders_per_customer(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return top_n(
        t["orders"],
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        3,
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rn")


@df_query(
    "dedup_keep_last_event_per_user",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM (
      SELECT event_id, user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def dedup_keep_last_event_per_user(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return dedup_keep_last(t["events"], ["user_id"], ["ts", "event_id"]).select(
        "event_id", "user_id", "event_type", "value"
    )


@df_query(
    "dedup_keep_first_event_per_user",
    oracle="""
    SELECT event_id, user_id, event_type, ts FROM (
      SELECT event_id, user_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def dedup_keep_first_event_per_user(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return dedup_keep_first(t["events"], ["user_id"], ["ts", "event_id"]).select(
        "event_id", "user_id", "event_type", "ts"
    )


# --- Grouping sets / rollup / cube (DecomposeGroupingSetsRule parity) -------

sql_query(
    "grouping_sets_lineitem",
    f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
           {dsum('l_quantity', 'sum_qty')}, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)

sql_query(
    "rollup_region_nation_revenue",
    f"""
    SELECT r_name, n_name, {dsum('o_totalprice', 'revenue')}, COUNT(*) AS n_orders
    FROM region, nation, customer, orders
    WHERE r_regionkey = n_regionkey
      AND n_nationkey = c_nationkey
      AND c_custkey = o_custkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)

sql_query(
    "cube_returnflag_linestatus",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           {dsum('l_extendedprice', 'sum_price')}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)

# --- Set operations (§2.7) --------------------------------------------------

sql_query(
    "setop_union_all",
    """
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer WHERE c_acctbal > 9000
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier WHERE s_acctbal > 9000
    """,
)

sql_query(
    "setop_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)

sql_query(
    "setop_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)

sql_query(
    "setop_intersect_all",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_custkey < 40
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)

sql_query(
    "setop_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)

sql_query(
    "setop_except_all",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_custkey < 40
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)

# --- Joins: semi / anti / cross / theta (§2.3) ------------------------------


@df_query(
    "semi_join_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 100000)
    """,
)
def semi_join_customers_with_orders(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 100000)
    return (
        t["customer"]
        .join(big, t["customer"].c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


@df_query(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_customers_without_orders(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey, "left_anti")
        .select("c_custkey", "c_acctbal")
    )


sql_query(
    "cross_join_region_nation",
    """
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    WHERE n.n_regionkey <> r.r_regionkey
    """,
)

sql_query(
    "theta_join_nation_pairs",
    """
    SELECT n1.n_name AS nation_a, n2.n_name AS nation_b
    FROM nation n1 JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
    """,
)

sql_query(
    "full_outer_join_balances",
    f"""
    SELECT COALESCE(c.k, s.k) AS nationkey, c.cust_total, s.supp_total
    FROM (SELECT c_nationkey AS k, {dsum('c_acctbal', 'cust_total')}
          FROM customer WHERE c_acctbal > 8000 GROUP BY c_nationkey) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS k, {dsum('s_acctbal', 'supp_total')}
          FROM supplier GROUP BY s_nationkey) s
      ON c.k = s.k
    """,
)

# --- UNNEST / lateral / correlate (§2.2) ------------------------------------

sql_query(
    "unnest_tokens_per_lang",
    """
    SELECT lang, tok, COUNT(*) AS n
    FROM documents
    LATERAL VIEW explode(split(text, ' ')) t AS tok
    WHERE doc_id < 100
    GROUP BY lang, tok
    """,
    oracle="""
    SELECT lang, tok, COUNT(*) AS n
    FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
          FROM documents WHERE doc_id < 100) t
    GROUP BY lang, tok
    """,
)

sql_query(
    "posexplode_first_tokens",
    """
    SELECT doc_id, pos, tok
    FROM documents
    LATERAL VIEW posexplode(split(text, ' ')) t AS pos, tok
    WHERE doc_id < 20 AND pos < 3
    """,
    oracle="""
    SELECT doc_id, pos - 1 AS pos, toks[pos] AS tok
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
          WHERE doc_id < 20) d,
         LATERAL (SELECT unnest(generate_series(1, 3)) AS pos) g
    WHERE pos <= len(toks)
    """,
)

sql_query(
    "lateral_correlated_subquery",
    """
    SELECT p.p_partkey, p.p_retailprice, t.max_qty
    FROM part p,
         LATERAL (SELECT MAX(l_quantity) AS max_qty
                  FROM lineitem WHERE l_partkey = p.p_partkey) t
    WHERE p.p_partkey < 50
    """,
)

# --- Pivot (row-to-column; reference: manual CASE WHEN in blink) ------------


@df_query(
    "pivot_status_by_flag",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END
                         AS DECIMAL(30,6))) AS DOUBLE) AS qty_open,
           CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END
                         AS DECIMAL(30,6))) AS DOUBLE) AS qty_filled
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_status_by_flag(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double"))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
    )


sql_query(
    "over_distribution_functions",
    """
    SELECT o_orderkey,
           ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 9) AS cume,
           COUNT(*) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate
                          RANGE BETWEEN CURRENT ROW
                                    AND INTERVAL '60' DAY FOLLOWING)
             AS orders_next_60d
    FROM orders
    WHERE o_custkey < 60
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)

sql_query(
    "scalar_subquery_in_select",
    """
    SELECT r_regionkey, r_name,
           (SELECT COUNT(*) FROM nation WHERE n_regionkey = r_regionkey)
             AS n_nations,
           (SELECT MAX(n_name) FROM nation WHERE n_regionkey = r_regionkey)
             AS max_nation,
           (SELECT COUNT(*) FROM nation) AS total_nations
    FROM region
    """,
)

sql_query(
    "grouping_id_sets",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
    """,
)

sql_query(
    "explode_struct_array_inline",
    """
    SELECT n_regionkey, pos_name, pos_key
    FROM nation
    LATERAL VIEW INLINE(ARRAY(STRUCT(n_name AS pos_name, n_nationkey AS pos_key),
                              STRUCT(UPPER(n_name) AS pos_name,
                                     n_nationkey * 100 AS pos_key))) t
    """,
    oracle="""
    SELECT n_regionkey, n_name AS pos_name, n_nationkey AS pos_key FROM nation
    UNION ALL
    SELECT n_regionkey, UPPER(n_name), n_nationkey * 100 FROM nation
    """,
)

sql_query(
    "limit_offset_pagination",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
)

sql_query(
    "topn_with_ties",
    """
    SELECT l_returnflag, l_quantity, cnt, rnk FROM (
      SELECT l_returnflag, l_quantity, COUNT(*) AS cnt,
             RANK() OVER (PARTITION BY l_returnflag ORDER BY COUNT(*) DESC,
                          l_quantity) AS rnk
      FROM lineitem GROUP BY l_returnflag, l_quantity) t
    WHERE rnk <= 3
    """,
)

sql_query(
    "window_join_hourly_activity",
    """
    WITH v AS (
      SELECT user_id, date_trunc('hour', ts) AS w, COUNT(*) AS n_views
      FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ), c AS (
      SELECT user_id, date_trunc('hour', ts) AS w, COUNT(*) AS n_clicks
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    )
    SELECT v.user_id, v.w AS window_start, v.n_views, c.n_clicks
    FROM v JOIN c ON v.user_id = c.user_id AND v.w = c.w
    """,
)

sql_query(
    "fn_map_functions",
    """
    SELECT doc_id,
           MAP_KEYS(MAP(lang, 1, source, 2))[1] AS second_key,
           MAP_VALUES(MAP(lang, 1, source, 2))[0] AS first_val,
           SIZE(MAP(lang, 1, source, 2)) AS map_size,
           ELEMENT_AT(MAP(lang, 10, source, 20), source) AS src_val,
           MAP_CONTAINS_KEY(MAP(lang, 1), 'en') AS has_en
    FROM documents WHERE doc_id < 25
    """,
    oracle="""
    SELECT doc_id,
           map_keys(MAP([lang, source], [1, 2]))[2] AS second_key,
           map_values(MAP([lang, source], [1, 2]))[1] AS first_val,
           cardinality(MAP([lang, source], [1, 2])) AS map_size,
           element_at(MAP([lang, source], [10, 20]), source)[1] AS src_val,
           lang = 'en' AS has_en
    FROM documents WHERE doc_id < 25
    """,
)

# --- Aggregate function coverage (§2.4 built-ins) ---------------------------

sql_query(
    "agg_min_max_by_listagg",
    """
    SELECT n_regionkey,
           MIN_BY(n_name, n_nationkey) AS first_nation,
           MAX_BY(n_name, n_nationkey) AS last_nation,
           LISTAGG(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS all_nations
    FROM nation
    GROUP BY n_regionkey
    """,
    oracle="""
    SELECT n_regionkey,
           MIN_BY(n_name, n_nationkey) AS first_nation,
           MAX_BY(n_name, n_nationkey) AS last_nation,
           STRING_AGG(n_name, ',' ORDER BY n_name) AS all_nations
    FROM nation
    GROUP BY n_regionkey
    """,
)

sql_query(
    "agg_distinct_mixed",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
             AS sum_distinct_qty,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag
    """,
)

# stddev/variance via explicit decimal sums: order-independent & identical
# across engines (the built-in streaming variance kernels differ per engine).
sql_query(
    "agg_stddev_var_decimal",
    """
    SELECT l_returnflag,
           CAST(SQRT((sx2 - sx * sx / n) / (n - 1)) AS DOUBLE) AS stddev_samp_qty,
           CAST((sx2 - sx * sx / n) / n AS DOUBLE) AS var_pop_qty
    FROM (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sx2,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM lineitem GROUP BY l_returnflag) t
    """,
)

sql_query(
    "agg_collect_sorted",
    """
    SELECT r_regionkey,
           ARRAY_SORT(COLLECT_LIST(n_name)) AS nations
    FROM region JOIN nation ON r_regionkey = n_regionkey
    GROUP BY r_regionkey
    """,
    oracle="""
    SELECT r_regionkey, LIST_SORT(LIST(n_name)) AS nations
    FROM region JOIN nation ON r_regionkey = n_regionkey
    GROUP BY r_regionkey
    """,
)

# --- VALUES inline relation (§2.1 Values operator) --------------------------

sql_query(
    "values_inline",
    """
    SELECT t.id, t.name, n.n_name
    FROM (VALUES (0, 'zero'), (1, 'one'), (2, 'two')) AS t(id, name)
    JOIN nation n ON n.n_nationkey = t.id
    """,
)

# --- JSON functions over event props (§2.8 conditional/misc) ----------------

sql_query(
    "json_extract_props",
    """
    SELECT event_type,
           COUNT(*) AS n,
           SUM(CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT)) AS sum_k
    FROM events
    GROUP BY event_type
    """,
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           -- CAST: DuckDB SUM(BIGINT) yields HUGEINT; Spark side is BIGINT
           CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
