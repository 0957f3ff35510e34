"""TPC-DS-style query battery adapted to the fixture star schema.

The reference's second end-to-end correctness harness runs all 103 TPC-DS
queries (flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:75-86,
test-scripts/test_tpcds.sh). The fixture set has no TPC-DS tables, so this
battery reproduces the *query shapes* that distinguish TPC-DS from TPC-H —
channel unions with rollup, year-over-year self-joins over CTEs, percentile
gating, CASE-pivoted cross-tabs, repeat-buyer cohorts with scalar-subquery
thresholds, moving-window trend analysis, channel INTERSECTs, and
multi-distinct aggregates — over the TPC-H-ish fixture tables.

Every query is written in the Spark/DuckDB-common dialect (used verbatim as
its own oracle) with the decimal-accumulation contract for float sums.

Scale notes: the shapes are chosen so Catalyst's standard machinery carries
them at 100 TB — dimension joins broadcast, CASE-pivots fold into one
aggregation pass, rollups expand map-side (Expand), the year-over-year
self-join joins two already-aggregated (tiny) CTEs, and the multi-distinct
aggregate relies on Catalyst's RewriteDistinctAggregates expansion. Two
queries use unpartitioned windows — `monthly_moving_avg` over year-month
aggregates (bounded cardinality, fine at any scale) and
`top_percentile_customers` whose global PERCENT_RANK sorts the per-customer
aggregate; at 100 TB the gate would switch to approx_percentile of the same
aggregate (one pass, no global sort) at the cost of exactness.
"""

from __future__ import annotations

from flink_parent_spark.queries.registry import dsum, sql_query

# --- channel union + rollup (TPC-DS Q5/Q77 shape) ---------------------------
sql_query(
    "tpcds_channel_union_rollup",
    f"""
    WITH channels AS (
      SELECT 'urgent' AS channel, EXTRACT(YEAR FROM o_orderdate) AS o_year,
             o_totalprice AS amount
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      UNION ALL
      SELECT 'standard' AS channel, EXTRACT(YEAR FROM o_orderdate) AS o_year,
             o_totalprice AS amount
      FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    )
    SELECT channel, o_year, {dsum('amount', 'total_amount')},
           COUNT(*) AS n_orders
    FROM channels
    GROUP BY ROLLUP (channel, o_year)
    """,
)

# --- year-over-year ratio via CTE self-join (TPC-DS Q74/Q11 shape) ----------
sql_query(
    "tpcds_yoy_nation_revenue",
    f"""
    WITH yearly AS (
      SELECT n_name, EXTRACT(YEAR FROM o_orderdate) AS o_year,
             {dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
      FROM lineitem, orders, customer, nation
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n_nationkey
      GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
    )
    SELECT cur.n_name, cur.o_year,
           cur.revenue AS cur_revenue, prev.revenue AS prev_revenue,
           cur.revenue / prev.revenue AS yoy_ratio
    FROM yearly cur JOIN yearly prev
      ON cur.n_name = prev.n_name AND cur.o_year = prev.o_year + 1
    WHERE prev.revenue > 0
    """,
)

# --- percentile-gated customers (TPC-DS Q38/Q97 flavor) ---------------------
# Exact PERCENT_RANK semantics without an unpartitioned window over the
# customer set (which funnels every row through one task at scale): global
# rank = rows in lower revenue buckets (cumulative window over the tiny
# bucket-count relation) + ROW_NUMBER partitioned by bucket (distributed).
# (revenue, o_custkey) is a total order, so rank == row_number and
# pr = (rank-1)/(n-1) reproduces PERCENT_RANK exactly.
sql_query(
    "tpcds_top_percentile_customers",
    f"""
    WITH per_cust AS (
      SELECT o_custkey, {dsum('o_totalprice', 'revenue')}
      FROM orders GROUP BY o_custkey
    ), n AS (
      SELECT COUNT(*) AS n FROM per_cust
    ), b AS (
      SELECT o_custkey, revenue,
             CAST(FLOOR(revenue / 50000.0) AS BIGINT) AS bkt
      FROM per_cust
    ), bc AS (
      SELECT bkt, COUNT(*) AS c FROM b GROUP BY bkt
    ), bcum AS (
      SELECT bkt, c, SUM(c) OVER (ORDER BY bkt) AS cum FROM bc
    ), ranked AS (
      SELECT b.o_custkey, b.revenue,
             (bcum.cum - bcum.c)
             + ROW_NUMBER() OVER (PARTITION BY b.bkt
                                  ORDER BY b.revenue, b.o_custkey) AS rnk
      FROM b JOIN bcum ON b.bkt = bcum.bkt
    )
    SELECT o_custkey, revenue
    FROM ranked, n
    WHERE CAST(rnk - 1 AS DOUBLE) / CAST(n.n - 1 AS DOUBLE) >= 0.95
    """,
)

# --- CASE-pivoted quarterly cross-tab (TPC-DS Q62/Q77 shape) ----------------
sql_query(
    "tpcds_quarter_case_pivot",
    f"""
    SELECT n_name,
           {dsum("CASE WHEN EXTRACT(QUARTER FROM o_orderdate) = 1 THEN o_totalprice ELSE 0 END", 'q1_rev')},
           {dsum("CASE WHEN EXTRACT(QUARTER FROM o_orderdate) = 2 THEN o_totalprice ELSE 0 END", 'q2_rev')},
           {dsum("CASE WHEN EXTRACT(QUARTER FROM o_orderdate) = 3 THEN o_totalprice ELSE 0 END", 'q3_rev')},
           {dsum("CASE WHEN EXTRACT(QUARTER FROM o_orderdate) = 4 THEN o_totalprice ELSE 0 END", 'q4_rev')}
    FROM orders, customer, nation
    WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)

# --- repeat-buyer cohort with scalar-subquery threshold (Q23 shape) ---------
sql_query(
    "tpcds_repeat_buyers",
    f"""
    WITH per_cust AS (
      SELECT o_custkey,
             COUNT(DISTINCT EXTRACT(YEAR FROM o_orderdate) * 12
                            + EXTRACT(MONTH FROM o_orderdate)) AS active_months,
             {dsum('o_totalprice', 'revenue')}
      FROM orders GROUP BY o_custkey
    ), avg_rev AS (
      SELECT CAST(SUM(CAST(revenue AS DECIMAL(30,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS v
      FROM per_cust
    )
    SELECT p.o_custkey, p.active_months, p.revenue
    FROM per_cust p, avg_rev a
    WHERE p.active_months >= 3 AND p.revenue > 1.5 * a.v
    """,
)

# --- monthly trend with explicit moving average (TPC-DS Q47 shape) ----------
sql_query(
    "tpcds_monthly_moving_avg",
    f"""
    WITH monthly AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
             EXTRACT(MONTH FROM o_orderdate) AS o_month,
             {dsum('o_totalprice', 'revenue')}
      FROM orders
      GROUP BY EXTRACT(YEAR FROM o_orderdate), EXTRACT(MONTH FROM o_orderdate)
    )
    SELECT o_year, o_month, revenue,
           LAG(revenue) OVER w AS prev_revenue,
           revenue - COALESCE(LAG(revenue) OVER w, revenue) AS mom_delta,
           (revenue + COALESCE(LAG(revenue) OVER w, 0)
                    + COALESCE(LAG(revenue, 2) OVER w, 0))
             / (1 + CASE WHEN LAG(revenue) OVER w IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN LAG(revenue, 2) OVER w IS NULL THEN 0 ELSE 1 END)
             AS ma3
    FROM monthly
    WINDOW w AS (ORDER BY o_year, o_month)
    """,
)

# --- channel INTERSECT (TPC-DS Q8/Q38 set-op flavor) ------------------------
sql_query(
    "tpcds_channel_intersect",
    """
    SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    """,
)

# --- multi-distinct aggregate per year (TPC-DS Q14 flavor) ------------------
sql_query(
    "tpcds_multi_distinct_year",
    f"""
    SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           {dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem, orders
    WHERE l_orderkey = o_orderkey
    GROUP BY EXTRACT(YEAR FROM o_orderdate)
    """,
)

# --- rolling-average rank within segment (TPC-DS Q67/Q47 composition) -------
sql_query(
    "tpcds_rolling_rank",
    f"""
    WITH monthly AS (
      SELECT c_mktsegment, EXTRACT(YEAR FROM o_orderdate) AS o_year,
             EXTRACT(MONTH FROM o_orderdate) AS o_month,
             {dsum('o_totalprice', 'revenue')}
      FROM orders, customer
      WHERE o_custkey = c_custkey
      GROUP BY c_mktsegment, EXTRACT(YEAR FROM o_orderdate),
               EXTRACT(MONTH FROM o_orderdate)
    ), avgd AS (
      SELECT c_mktsegment, o_year, o_month, revenue,
             CAST(SUM(CAST(revenue AS DECIMAL(30,6))) OVER w AS DOUBLE)
               / COUNT(*) OVER w AS moving_avg
      FROM monthly
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY o_year, o_month
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    )
    SELECT c_mktsegment, o_year, o_month, revenue, moving_avg, rnk
    FROM (
      SELECT *, CAST(RANK() OVER (PARTITION BY c_mktsegment
                                  ORDER BY moving_avg DESC) AS INT) AS rnk
      FROM avgd) r
    WHERE rnk <= 3
    """,
)
