"""TPC-DS-style query battery adapted to the fixture star schema.

NOTE (round 6): the REAL queries now exist too — `tpcds_real.py` registers
all 103 (99 base numbers + 14b/23b/24b/39b) as actual dialect-adjusted
query texts over the real TPC-DS schema from `tpcds_data.py`, each
value-checked against DuckDB. This shape battery remains as the
fixture-schema counterpart (same idioms exercised against the gate's
TPC-H-ish tables, useful because it scales with sf_dir).

The reference's second end-to-end correctness harness runs all 103 TPC-DS
queries (flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:75-86,
test-scripts/test_tpcds.sh). This battery reproduces the *query shapes*
that distinguish TPC-DS from TPC-H —
channel unions with rollup, year-over-year self-joins over CTEs, percentile
gating, CASE-pivoted cross-tabs, repeat-buyer cohorts with scalar-subquery
thresholds, moving-window trend analysis, channel INTERSECTs,
multi-distinct aggregates, returns-style anti joins, correlated EXISTS /
scalar-subquery gates, windowed share-of-total, cumulative cross-channel
FULL OUTER comparison (Q51), consecutive-month islands (Q54), same-day
multi-channel self-joins (Q64), NTILE quartiles (Q49), CASE matrices
(Q66), and YoY-decline self-joins (Q75) — plus a round-5 widening with
correlated-average price gates (Q6), bucketed scalar-subquery stat rows
(Q9/Q88/Q90), multi-supplier-unreturned semi/anti pairs (Q16/Q94),
coefficient-of-variation stats (Q17), frequent-items x best-customers
funnels (Q23), channel growth-rate comparison (Q31), ticket-size cohorts
(Q34/Q73), best/worst opposite-ranked joins (Q44), balanced-channel items
(Q58), quarterly YoY pivots (Q59), below-average supplier-part pairs
(Q65), returns-excluded ratios (Q78/Q93), and within-class revenue share
(Q98/Q12/Q20), scalar-max top selection (Q15/Q55), price-band + EXISTS
activity gates (Q37/Q82), OR-of-ANDs predicate pushdown (Q41), IN-list OR
IN-subquery disjunctions (Q45), per-ticket totals joined to detail (Q68),
date-arithmetic join gates (Q72), returns loss matrices (Q91), excess
discount vs per-part average (Q92), and shipping-delay bucket matrices
(Q99), above-nation-average spenders (Q30/Q81), order-count demographic
distributions (Q35), brand-vs-own-average monthly trends (Q53/Q63),
INTERSECT-gated revenue (Q8), OR-of-AND demographic average bands (Q13),
before/after date-split ratios (Q21), product-hierarchy ROLLUP averages
(Q22), variance-gated consecutive-month pairs (Q39), channel unions with
class accounting (Q76), and returns-adjusted channel profit ROLLUPs
(Q80), multi-measure demographic ROLLUPs (Q18/Q27), sale-return-resale
temporal chains (Q25/Q29), margin ROLLUPs ranked within grouping level
via GROUPING() (Q36), category-restricted channel re-aggregation
(Q33/Q56/Q60), promo-share scalar ratios (Q61), rollup-then-rank top-N
(Q67), EXCEPT-gated counts (Q87), week-over-week ISO-week pivots (Q2),
all-channel INTERSECT membership with an above-average gate (Q14), and
distinct-count bucket rows (Q28), channel growth races over per-customer
yearly CTEs (Q4/Q74's full form), LAG/LEAD deviation-from-average trend
scans (Q57/Q47's full form), single-pass day-bucket pivots (Q43),
order-to-ship latency bucket matrices (Q50), and EXISTS + double
NOT-EXISTS demographic gates (Q69) — 75 shapes over the TPC-H-ish
fixture tables. The remaining reference queries reuse shapes already
represented here (e.g. Q42/Q52 = Q55's dim group-by, Q19/Q24/Q26 = the
Q7/Q13 demographic-average family, Q32 = Q92, Q46/Q79 = Q68, Q48 = Q13/
Q41, Q70/Q86 = Q36's GROUPING() rank, Q71 = Q5/Q76 channel unions,
Q83-Q85 = Q91's returns matrices, Q89 = Q53, Q95 = Q94's EXISTS chain)
or need TPC-DS-only tables (catalog page, web site, inventory)
absent from the fixtures.

Every query is written in the Spark/DuckDB-common dialect (used verbatim as
its own oracle) with the decimal-accumulation contract for float sums.

Scale notes: the shapes are chosen so Catalyst's standard machinery carries
them at 100 TB — dimension joins broadcast, CASE-pivots fold into one
aggregation pass, rollups expand map-side (Expand), the year-over-year
self-join joins two already-aggregated (tiny) CTEs, and the multi-distinct
aggregate relies on Catalyst's RewriteDistinctAggregates expansion. Two
queries use unpartitioned windows — `monthly_moving_avg` and
`cumulative_channel_cross` over year-month aggregates (bounded
cardinality, fine at any scale) and `top_percentile_customers` whose
global PERCENT_RANK sorts the per-customer aggregate; at 100 TB the gate
would switch to approx_percentile of the same aggregate (one pass, no
global sort) at the cost of exactness.
"""

from __future__ import annotations

from flink_parent_spark.queries.registry import davg, dsum, sql_query

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


# --- returns analysis via anti join (TPC-DS Q93/returns flavor) -------------
# "Returned" lineitems are l_returnflag = 'R'; customers whose orders never
# had a returned item. Anti join distributes as a broadcast/shuffled-hash
# anti per Catalyst; the returned-orders side is pre-aggregated (DISTINCT
# orderkey) so the probe is small.
sql_query(
    "tpcds_returns_anti_join",
    f"""
    WITH returned_orders AS (
      SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT c_custkey, c_mktsegment, COUNT(*) AS n_clean_orders,
           {dsum('o_totalprice', 'clean_revenue')}
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderkey NOT IN (SELECT l_orderkey FROM returned_orders)
    GROUP BY c_custkey, c_mktsegment
    HAVING COUNT(*) >= 3
    """,
)

# --- correlated EXISTS per channel (TPC-DS Q10 shape) -----------------------
sql_query(
    "tpcds_correlated_exists_channel",
    """
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '5-LOW')
    """,
)

# --- windowed share-of-total (TPC-DS Q67 flavor) ----------------------------
# Nation revenue as a share of its region's total: the share window runs
# over the already-aggregated nation relation (25 rows at any scale).
sql_query(
    "tpcds_share_of_total_window",
    f"""
    WITH nat AS (
      SELECT r_name, n_name, {dsum('o_totalprice', 'revenue')}
      FROM orders, customer, nation, region
      WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
        AND n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    )
    SELECT r_name, n_name, revenue,
           revenue / CAST(SUM(CAST(revenue AS DECIMAL(30,6)))
                          OVER (PARTITION BY r_name) AS DOUBLE) AS region_share
    FROM nat
    """,
)

# --- correlated scalar-subquery quantity gate (TPC-DS Q25 / TPC-H Q17) ------
sql_query(
    "tpcds_inventory_correlated_subquery",
    f"""
    SELECT p_brand, COUNT(*) AS n_small_orders,
           {dsum('l_extendedprice', 'small_order_revenue')}
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_quantity < (
      SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(30,6))) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE))
      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    GROUP BY p_brand
    """,
)

# --- cross-channel ratio per nation (TPC-DS Q90 shape) ----------------------
sql_query(
    "tpcds_cross_channel_ratio",
    """
    WITH per_nation AS (
      SELECT n_name,
             COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 END) AS urgent_cnt,
             COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 END) AS standard_cnt
      FROM orders, customer, nation
      WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, urgent_cnt, standard_cnt,
           CAST(urgent_cnt AS DOUBLE) / CAST(standard_cnt AS DOUBLE)
             AS urgent_ratio
    FROM per_nation WHERE standard_cnt > 0
    """,
)

# --- GROUPING SETS with grouping id over channels (TPC-DS Q80 flavor) -------
sql_query(
    "tpcds_grouping_sets_channel",
    f"""
    WITH channels AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'urgent' ELSE 'standard' END AS channel,
             EXTRACT(YEAR FROM o_orderdate) AS o_year, o_totalprice
      FROM orders
    )
    SELECT channel, o_year,
           CAST(GROUPING(channel) AS INT) AS g_channel,
           CAST(GROUPING(o_year) AS INT) AS g_year,
           {dsum('o_totalprice', 'revenue')}, COUNT(*) AS n_orders
    FROM channels
    GROUP BY GROUPING SETS ((channel, o_year), (channel), (o_year), ())
    """,
)

# --- lifetime-value buckets per segment (TPC-DS Q3/Q65 flavor) --------------
sql_query(
    "tpcds_customer_ltv_buckets",
    f"""
    WITH per_cust AS (
      SELECT c_custkey, c_mktsegment, {dsum('o_totalprice', 'revenue')}
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey, c_mktsegment
    )
    SELECT c_mktsegment,
           CAST(FLOOR(revenue / 250000.0) AS BIGINT) AS ltv_bucket,
           COUNT(*) AS n_customers,
           {dsum('revenue', 'bucket_revenue')}
    FROM per_cust
    GROUP BY c_mktsegment, CAST(FLOOR(revenue / 250000.0) AS BIGINT)
    """,
)

# --- cumulative channel comparison via FULL OUTER JOIN (TPC-DS Q51) ---------
sql_query(
    "tpcds_cumulative_channel_cross",
    f"""
    WITH urgent AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) * 12
             + EXTRACT(MONTH FROM o_orderdate) AS midx,
             {dsum('o_totalprice', 'rev')}
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY 1
    ), standard AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) * 12
             + EXTRACT(MONTH FROM o_orderdate) AS midx,
             {dsum('o_totalprice', 'rev')}
      FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      GROUP BY 1
    ), joined AS (
      SELECT COALESCE(u.midx, s.midx) AS midx, u.rev AS u_rev, s.rev AS s_rev
      FROM urgent u FULL OUTER JOIN standard s ON u.midx = s.midx
    ), cum AS (
      SELECT midx,
             SUM(COALESCE(u_rev, 0)) OVER w AS cum_urgent,
             SUM(COALESCE(s_rev, 0)) OVER w AS cum_standard
      FROM joined WINDOW w AS (ORDER BY midx)
    )
    SELECT midx, cum_urgent, cum_standard
    FROM cum WHERE cum_urgent > cum_standard
    """,
)

# --- top items per channel with rank ties (TPC-DS Q98 flavor) ---------------
sql_query(
    "tpcds_top_items_per_channel",
    f"""
    WITH item_rev AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'urgent' ELSE 'standard' END AS channel,
             p_brand, {dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
      FROM lineitem, orders, part
      WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
      GROUP BY 1, p_brand
    )
    SELECT channel, p_brand, revenue, rnk FROM (
      SELECT channel, p_brand, revenue,
             CAST(RANK() OVER (PARTITION BY channel
                               ORDER BY revenue DESC, p_brand) AS INT) AS rnk
      FROM item_rev) t
    WHERE rnk <= 3
    """,
)

# --- above-segment-average returns (TPC-DS Q1 shape) ------------------------
sql_query(
    "tpcds_above_avg_returns",
    """
    WITH per_cust AS (
      SELECT c_custkey, c_mktsegment, COUNT(*) AS n_returns
      FROM lineitem, orders, customer
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_mktsegment
    ), seg_avg AS (
      SELECT c_mktsegment,
             CAST(SUM(n_returns) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS v
      FROM per_cust GROUP BY c_mktsegment
    )
    SELECT p.c_custkey, p.c_mktsegment, p.n_returns
    FROM per_cust p JOIN seg_avg a ON p.c_mktsegment = a.c_mktsegment
    WHERE CAST(p.n_returns AS DOUBLE) > 1.2 * a.v
    """,
)

# --- customers active in >= 3 consecutive months (TPC-DS Q54 flavor) --------
# Islands: month_index - dense_rank is constant within a consecutive run.
sql_query(
    "tpcds_consecutive_months_active",
    """
    WITH months AS (
      SELECT DISTINCT o_custkey,
             EXTRACT(YEAR FROM o_orderdate) * 12
             + EXTRACT(MONTH FROM o_orderdate) AS midx
      FROM orders
    ), runs AS (
      SELECT o_custkey, midx,
             midx - DENSE_RANK() OVER (PARTITION BY o_custkey
                                       ORDER BY midx) AS grp
      FROM months
    )
    SELECT o_custkey, COUNT(*) AS run_months,
           MIN(midx) AS run_start, MAX(midx) AS run_end
    FROM runs
    GROUP BY o_custkey, grp
    HAVING COUNT(*) >= 3
    """,
)

# --- same-day multi-channel customers (TPC-DS Q64 flavor) -------------------
sql_query(
    "tpcds_same_day_multichannel",
    """
    SELECT DISTINCT u.o_custkey, u.o_orderdate
    FROM orders u JOIN orders s
      ON u.o_custkey = s.o_custkey AND u.o_orderdate = s.o_orderdate
    WHERE u.o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND s.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    """,
)

# --- revenue quartiles within segment via NTILE (TPC-DS Q49 flavor) ---------
sql_query(
    "tpcds_quantile_by_segment",
    f"""
    WITH per_cust AS (
      SELECT c_custkey, c_mktsegment, {dsum('o_totalprice', 'revenue')}
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey, c_mktsegment
    ), tiled AS (
      SELECT c_mktsegment, revenue,
             NTILE(4) OVER (PARTITION BY c_mktsegment
                            ORDER BY revenue, c_custkey) AS quartile
      FROM per_cust
    )
    SELECT c_mktsegment, quartile, COUNT(*) AS n_customers,
           {dsum('revenue', 'quartile_revenue')}
    FROM tiled GROUP BY c_mktsegment, quartile
    """,
)

# --- supplier revenue matrix by region (TPC-DS Q66 flavor) ------------------
sql_query(
    "tpcds_supplier_region_matrix",
    f"""
    SELECT s_name,
           {dsum("CASE WHEN r_name = 'AMERICA' THEN l_extendedprice ELSE 0 END", 'america_rev')},
           {dsum("CASE WHEN r_name = 'ASIA' THEN l_extendedprice ELSE 0 END", 'asia_rev')},
           {dsum("CASE WHEN r_name = 'EUROPE' THEN l_extendedprice ELSE 0 END", 'europe_rev')},
           {dsum("CASE WHEN r_name NOT IN ('AMERICA','ASIA','EUROPE') THEN l_extendedprice ELSE 0 END", 'other_rev')}
    FROM lineitem, supplier, nation, region
    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
    GROUP BY s_name
    """,
)

# --- priority funnel with share of total (TPC-DS Q96 flavor) ----------------
sql_query(
    "tpcds_order_priority_funnel",
    """
    WITH counts AS (
      SELECT o_orderpriority, COUNT(*) AS n
      FROM orders GROUP BY o_orderpriority
    ), total AS (SELECT SUM(n) AS t FROM counts)
    SELECT o_orderpriority, n,
           CAST(n AS DOUBLE) / CAST(t AS DOUBLE) AS share
    FROM counts, total
    """,
)

# --- brands with year-over-year decline (TPC-DS Q75 shape) ------------------
sql_query(
    "tpcds_brand_yoy_decline",
    f"""
    WITH yearly AS (
      SELECT p_brand, EXTRACT(YEAR FROM o_orderdate) AS o_year,
             {dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
      FROM lineitem, orders, part
      WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
      GROUP BY p_brand, EXTRACT(YEAR FROM o_orderdate)
    )
    SELECT cur.p_brand, cur.o_year, cur.revenue AS cur_revenue,
           prev.revenue AS prev_revenue,
           cur.revenue - prev.revenue AS delta
    FROM yearly cur JOIN yearly prev
      ON cur.p_brand = prev.p_brand AND cur.o_year = prev.o_year + 1
    WHERE cur.revenue < prev.revenue
    """,
)

# ---------------------------------------------------------------------------
# Round-5 widening (25 -> 41 shapes). Same contract as above: every query is
# written once in the Spark/DuckDB-common dialect and used verbatim as its
# own oracle; double accumulation goes through the decimal contract.
# Reference inventory: TpcdsTestProgram.java:75-86 runs queries 1..99.

# --- parts priced >= 1.2x their type average (TPC-DS Q6 shape) --------------
# Correlated-scalar-subquery gate rewritten as a join against the (tiny)
# per-type average relation; at 100 TB the per-type aggregate broadcasts.
sql_query(
    "tpcds_q6_above_avg_priced_parts",
    """
    WITH type_avg AS (
      SELECT p_type,
             CAST(SUM(CAST(p_retailprice AS DECIMAL(30,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_price
      FROM part GROUP BY p_type
    )
    SELECT p.p_type, COUNT(*) AS n_premium_parts,
           MIN(p.p_retailprice) AS min_premium_price
    FROM part p JOIN type_avg a ON p.p_type = a.p_type
    WHERE p.p_retailprice > 1.2 * a.avg_price
    GROUP BY p.p_type
    HAVING COUNT(*) >= 2
    """,
)

# --- bucketed scalar-subquery stats in one row (TPC-DS Q9 shape) ------------
# Q9 selects 5 CASE branches each backed by scalar subqueries over quantity
# ranges; the single-row cross joins are broadcast-trivial at any scale.
sql_query(
    "tpcds_q9_bucketed_scalar_counts",
    """
    SELECT b1.n AS n_q_0_10, b2.n AS n_q_10_25, b3.n AS n_q_25_40,
           b4.n AS n_q_40_plus, b1.avg_price AS avg_price_0_10,
           b4.avg_price AS avg_price_40_plus
    FROM
      (SELECT COUNT(*) AS n,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE) AS avg_price
       FROM lineitem WHERE l_quantity < 10) b1,
      (SELECT COUNT(*) AS n FROM lineitem
       WHERE l_quantity >= 10 AND l_quantity < 25) b2,
      (SELECT COUNT(*) AS n FROM lineitem
       WHERE l_quantity >= 25 AND l_quantity < 40) b3,
      (SELECT COUNT(*) AS n,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE) AS avg_price
       FROM lineitem WHERE l_quantity >= 40) b4
    """,
)

# --- multi-supplier orders never returned (TPC-DS Q16/Q94 shape) ------------
# EXISTS(a second supplier on the order) + NOT EXISTS(a returned line):
# both compile to semi/anti joins on l_orderkey sharing one shuffle key.
sql_query(
    "tpcds_q16_multi_supplier_unreturned",
    f"""
    SELECT COUNT(DISTINCT l1.l_orderkey) AS n_orders,
           {dsum('l1.l_extendedprice', 'total_revenue')}
    FROM lineitem l1
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_returnflag = 'R'
      )
    """,
)

# --- quantity coefficient of variation per part (TPC-DS Q17 shape) ----------
# Q17's mean/stddev ratio; stddev is derived from decimal-exact (n, sum,
# sumsq) so both engines do the identical final IEEE arithmetic.
sql_query(
    "tpcds_q17_quantity_cov",
    """
    WITH stats AS (
      SELECT l_partkey, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS s,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sq
      FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 5
    )
    SELECT l_partkey, n, s / CAST(n AS DOUBLE) AS mean_qty,
           SQRT((sq - s * s / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
           / (s / CAST(n AS DOUBLE)) AS cov_qty
    FROM stats
    WHERE s > 0
    """,
)

# --- frequent parts x best customers (TPC-DS Q23 shape) ---------------------
sql_query(
    "tpcds_q23_frequent_best_customers",
    f"""
    WITH frequent_parts AS (
      SELECT l_partkey FROM lineitem
      GROUP BY l_partkey HAVING COUNT(DISTINCT l_orderkey) >= 4
    ), best_customers AS (
      SELECT o_custkey FROM orders
      GROUP BY o_custkey
      HAVING SUM(CAST(o_totalprice AS DECIMAL(30,6))) >= 500000
    )
    SELECT {dsum('l_extendedprice * (1 - l_discount)', 'frequent_best_revenue')},
           COUNT(*) AS n_lines
    FROM lineitem li
    JOIN orders o ON li.l_orderkey = o.o_orderkey
    JOIN frequent_parts fp ON li.l_partkey = fp.l_partkey
    JOIN best_customers bc ON o.o_custkey = bc.o_custkey
    """,
)

# --- channel growth-rate comparison across quarters (TPC-DS Q31 shape) ------
sql_query(
    "tpcds_q31_channel_growth_compare",
    f"""
    WITH q AS (
      SELECT n_name,
             EXTRACT(YEAR FROM o_orderdate) * 4
             + EXTRACT(QUARTER FROM o_orderdate) AS qidx,
             {dsum("CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN o_totalprice ELSE 0 END", 'urgent_rev')},
             {dsum("CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN o_totalprice ELSE 0 END", 'std_rev')}
      FROM orders, customer, nation
      WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
      GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate) * 4
               + EXTRACT(QUARTER FROM o_orderdate)
    )
    SELECT cur.n_name, cur.qidx,
           cur.urgent_rev / prev.urgent_rev AS urgent_growth,
           cur.std_rev / prev.std_rev AS std_growth
    FROM q cur JOIN q prev
      ON cur.n_name = prev.n_name AND cur.qidx = prev.qidx + 1
    WHERE prev.urgent_rev > 0 AND prev.std_rev > 0
      AND cur.urgent_rev / prev.urgent_rev > cur.std_rev / prev.std_rev
    """,
)

# --- ticket-size cohort (TPC-DS Q34/Q73 shape) ------------------------------
sql_query(
    "tpcds_q34_ticket_size_cohort",
    """
    WITH ticket AS (
      SELECT l_orderkey, COUNT(*) AS n_lines
      FROM lineitem GROUP BY l_orderkey
      HAVING COUNT(*) BETWEEN 5 AND 7
    )
    SELECT c_custkey, c_name, COUNT(*) AS n_big_tickets,
           MAX(t.n_lines) AS max_lines
    FROM ticket t
    JOIN orders ON t.l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    HAVING COUNT(*) >= 2
    """,
)

# --- best and worst parts by avg discount (TPC-DS Q44 shape) ----------------
# Two opposite-direction ranked subqueries joined on rank position.
sql_query(
    "tpcds_q44_best_worst_parts",
    """
    WITH per_part AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_disc
      FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 3
    ), best AS (
      SELECT l_partkey AS best_part, avg_disc AS best_disc,
             ROW_NUMBER() OVER (ORDER BY avg_disc ASC, l_partkey) AS rnk
      FROM per_part
    ), worst AS (
      SELECT l_partkey AS worst_part, avg_disc AS worst_disc,
             ROW_NUMBER() OVER (ORDER BY avg_disc DESC, l_partkey) AS rnk
      FROM per_part
    )
    SELECT b.rnk AS rnk, b.best_part, b.best_disc, w.worst_part, w.worst_disc
    FROM best b JOIN worst w ON b.rnk = w.rnk
    WHERE b.rnk <= 10
    """,
)

# --- items with balanced revenue across channels (TPC-DS Q58 shape) ---------
sql_query(
    "tpcds_q58_balanced_channel_parts",
    f"""
    WITH ch AS (
      SELECT l_partkey,
             {dsum("CASE WHEN o_orderpriority = '1-URGENT' THEN l_extendedprice ELSE 0 END", 'c1')},
             {dsum("CASE WHEN o_orderpriority = '2-HIGH' THEN l_extendedprice ELSE 0 END", 'c2')},
             {dsum("CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN l_extendedprice ELSE 0 END", 'c3')}
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_partkey
    )
    SELECT l_partkey, c1, c2, c3,
           (c1 + c2 + c3) / 3.0 AS avg_channel_rev
    FROM ch
    WHERE c1 > 0 AND c2 > 0 AND c3 > 0
      AND c1 BETWEEN 0.5 * ((c1 + c2 + c3) / 3.0) AND 1.5 * ((c1 + c2 + c3) / 3.0)
      AND c2 BETWEEN 0.5 * ((c1 + c2 + c3) / 3.0) AND 1.5 * ((c1 + c2 + c3) / 3.0)
      AND c3 BETWEEN 0.5 * ((c1 + c2 + c3) / 3.0) AND 1.5 * ((c1 + c2 + c3) / 3.0)
    """,
)

# --- monthly pivot with year-over-year join (TPC-DS Q59 shape) --------------
sql_query(
    "tpcds_q59_monthly_yoy_pivot",
    f"""
    WITH m AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
             {dsum("CASE WHEN EXTRACT(MONTH FROM o_orderdate) <= 3 THEN o_totalprice ELSE 0 END", 'm_q1')},
             {dsum("CASE WHEN EXTRACT(MONTH FROM o_orderdate) BETWEEN 4 AND 6 THEN o_totalprice ELSE 0 END", 'm_q2')},
             {dsum("CASE WHEN EXTRACT(MONTH FROM o_orderdate) BETWEEN 7 AND 9 THEN o_totalprice ELSE 0 END", 'm_q3')},
             {dsum("CASE WHEN EXTRACT(MONTH FROM o_orderdate) >= 10 THEN o_totalprice ELSE 0 END", 'm_q4')}
      FROM orders GROUP BY EXTRACT(YEAR FROM o_orderdate)
    )
    SELECT cur.o_year, cur.m_q1 / prev.m_q1 AS q1_ratio,
           cur.m_q2 / prev.m_q2 AS q2_ratio,
           cur.m_q3 / prev.m_q3 AS q3_ratio,
           cur.m_q4 / prev.m_q4 AS q4_ratio
    FROM m cur JOIN m prev ON cur.o_year = prev.o_year + 1
    WHERE prev.m_q1 > 0 AND prev.m_q2 > 0 AND prev.m_q3 > 0 AND prev.m_q4 > 0
    """,
)

# --- supplier-part pairs far below the supplier's average (TPC-DS Q65) ------
sql_query(
    "tpcds_q65_low_revenue_pairs",
    """
    WITH pair AS (
      SELECT l_suppkey, l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS rev
      FROM lineitem GROUP BY l_suppkey, l_partkey
    ), supp_avg AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(rev AS DECIMAL(30,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_rev
      FROM pair GROUP BY l_suppkey
    )
    SELECT s_name, p.l_partkey, p.rev, a.avg_rev
    FROM pair p
    JOIN supp_avg a ON p.l_suppkey = a.l_suppkey
    JOIN supplier ON p.l_suppkey = s_suppkey
    WHERE p.rev <= 0.5 * a.avg_rev
    """,
)

# --- kept-vs-total ratio per customer-year, returns excluded (Q78 shape) ----
sql_query(
    "tpcds_q78_unreturned_ratio",
    f"""
    SELECT o_custkey, EXTRACT(YEAR FROM o_orderdate) AS o_year,
           {dsum("CASE WHEN l_returnflag <> 'R' THEN l_extendedprice ELSE 0 END", 'kept_rev')},
           {dsum('l_extendedprice', 'total_rev')},
           COUNT(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate)
    HAVING SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) > 0
    """,
)

# --- many scalar counts as one wide row (TPC-DS Q88 shape) ------------------
sql_query(
    "tpcds_q88_hour_bucket_counts",
    """
    SELECT h1.n AS n_h0_3, h2.n AS n_h3_6, h3.n AS n_h6_9, h4.n AS n_h9_12,
           h5.n AS n_h12_15, h6.n AS n_h15_18, h7.n AS n_h18_21, h8.n AS n_h21_24
    FROM
      (SELECT COUNT(*) AS n FROM events WHERE EXTRACT(HOUR FROM ts) < 3) h1,
      (SELECT COUNT(*) AS n FROM events WHERE EXTRACT(HOUR FROM ts) BETWEEN 3 AND 5) h2,
      (SELECT COUNT(*) AS n FROM events WHERE EXTRACT(HOUR FROM ts) BETWEEN 6 AND 8) h3,
      (SELECT COUNT(*) AS n FROM events WHERE EXTRACT(HOUR FROM ts) BETWEEN 9 AND 11) h4,
      (SELECT COUNT(*) AS n FROM events WHERE EXTRACT(HOUR FROM ts) BETWEEN 12 AND 14) h5,
      (SELECT COUNT(*) AS n FROM events WHERE EXTRACT(HOUR FROM ts) BETWEEN 15 AND 17) h6,
      (SELECT COUNT(*) AS n FROM events WHERE EXTRACT(HOUR FROM ts) BETWEEN 18 AND 20) h7,
      (SELECT COUNT(*) AS n FROM events WHERE EXTRACT(HOUR FROM ts) >= 21) h8
    """,
)

# --- am/pm activity ratio (TPC-DS Q90 shape) --------------------------------
sql_query(
    "tpcds_q90_am_pm_ratio",
    """
    SELECT CAST(am.n AS DOUBLE) / CAST(pm.n AS DOUBLE) AS am_pm_ratio,
           am.n AS n_am, pm.n AS n_pm
    FROM
      (SELECT COUNT(*) AS n FROM events WHERE EXTRACT(HOUR FROM ts) < 12) am,
      (SELECT COUNT(*) AS n FROM events WHERE EXTRACT(HOUR FROM ts) >= 12) pm
    WHERE pm.n > 0
    """,
)

# --- effective revenue after returns (TPC-DS Q93 shape) ---------------------
sql_query(
    "tpcds_q93_effective_sales",
    f"""
    SELECT o_custkey,
           {dsum("CASE WHEN l_returnflag = 'R' THEN 0 ELSE l_extendedprice * (1 - l_discount) END", 'effective_rev')}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_custkey
    HAVING SUM(CAST(CASE WHEN l_returnflag = 'R' THEN 0
                    ELSE l_extendedprice * (1 - l_discount) END
                    AS DECIMAL(30,6))) >= 100000
    """,
)

# --- revenue share within part type via window (TPC-DS Q98/Q12/Q20 shape) ---
sql_query(
    "tpcds_q98_revenue_share_in_type",
    f"""
    WITH per_part AS (
      SELECT p_type, p_partkey,
             {dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_type, p_partkey
    )
    SELECT p_type, p_partkey, revenue,
           revenue * 100.0
           / CAST(SUM(CAST(revenue AS DECIMAL(30,6)))
                  OVER (PARTITION BY p_type) AS DOUBLE) AS revenue_ratio
    FROM per_part
    """,
)

# --- top nations matching the max revenue (TPC-DS Q15/Q55 flavor) -----------
sql_query(
    "tpcds_q15_top_nation_by_scalar_max",
    """
    WITH per_nation AS (
      SELECT n_name,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
      FROM orders, customer, nation
      WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, revenue
    FROM per_nation
    WHERE revenue = (SELECT MAX(revenue) FROM per_nation)
    """,
)

# --- price-band parts with recent-activity EXISTS gate (TPC-DS Q37/Q82) -----
sql_query(
    "tpcds_q37_priceband_active_parts",
    """
    SELECT p.p_partkey, p.p_name, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice BETWEEN 1200 AND 1400
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_partkey = p.p_partkey
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      )
    """,
)

# --- OR-of-ANDs predicate pushdown (TPC-DS Q41 shape) -----------------------
sql_query(
    "tpcds_q41_predicate_maze",
    """
    SELECT DISTINCT p_name
    FROM part
    WHERE (p_brand LIKE 'Brand#1%' AND p_size BETWEEN 1 AND 15
           AND p_retailprice < 1200)
       OR (p_brand LIKE 'Brand#3%' AND p_size BETWEEN 20 AND 40
           AND p_retailprice > 1500)
       OR (p_type LIKE '%BRASS%' AND p_size >= 45)
    """,
)

# --- IN-list OR IN-subquery disjunction (TPC-DS Q45 shape) ------------------
sql_query(
    "tpcds_q45_inlist_or_insubquery",
    f"""
    SELECT n_name, {dsum('o_totalprice', 'revenue')}, COUNT(*) AS n_orders
    FROM orders, customer, nation
    WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
      AND (c_custkey % 97 IN (3, 5, 11, 13)
           OR c_custkey IN (SELECT o_custkey FROM orders
                            GROUP BY o_custkey HAVING COUNT(*) >= 12))
    GROUP BY n_name
    """,
)

# --- per-ticket aggregate joined back to customer detail (TPC-DS Q68) -------
sql_query(
    "tpcds_q68_ticket_totals_detail",
    """
    WITH ticket AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS ext_total,
             CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS disc_total
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT c_name, c_custkey, t.l_orderkey, t.ext_total, t.disc_total
    FROM ticket t
    JOIN orders ON t.l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE t.ext_total > 400000
    """,
)

# --- date-arithmetic join gate (TPC-DS Q72 flavor) --------------------------
# Fixture has no commit/receipt dates; the Q72 shape — a join predicate on
# date arithmetic across tables — is expressed as ship-lag > 90 days.
sql_query(
    "tpcds_q72_ship_lag_gate",
    f"""
    SELECT n_name, COUNT(*) AS n_late_lines,
           {dsum('l_extendedprice', 'late_revenue')}
    FROM lineitem, orders, customer, nation
    WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND c_nationkey = n_nationkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY n_name
    """,
)

# --- monthly returns loss matrix by priority (TPC-DS Q91 shape) -------------
sql_query(
    "tpcds_q91_returns_loss_matrix",
    f"""
    SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
           EXTRACT(MONTH FROM o_orderdate) AS o_month,
           {dsum("CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') AND l_returnflag = 'R' THEN l_extendedprice ELSE 0 END", 'urgent_loss')},
           {dsum("CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') AND l_returnflag = 'R' THEN l_extendedprice ELSE 0 END", 'std_loss')}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY EXTRACT(YEAR FROM o_orderdate), EXTRACT(MONTH FROM o_orderdate)
    HAVING SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) > 0
    """,
)

# --- excess discount vs 1.3x part average (TPC-DS Q92 shape) ----------------
sql_query(
    "tpcds_q92_excess_discount",
    f"""
    WITH part_avg AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_disc
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {dsum('l.l_extendedprice * l.l_discount', 'excess_discount_amount')},
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part_avg a ON l.l_partkey = a.l_partkey
    WHERE l.l_discount > 1.3 * a.avg_disc
    """,
)

# --- shipping-delay bucket matrix (TPC-DS Q99 shape) ------------------------
sql_query(
    "tpcds_q99_ship_delay_buckets",
    """
    SELECT o_orderpriority,
           SUM(CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY
                    THEN 1 ELSE 0 END) AS d_0_30,
           SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
                     AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END) AS d_31_60,
           SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                     AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
                    THEN 1 ELSE 0 END) AS d_61_90,
           SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                    THEN 1 ELSE 0 END) AS d_over_90
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)

# --- customers above their nation's average spend (TPC-DS Q30/Q81 shape) ----
sql_query(
    "tpcds_q30_above_nation_avg_spend",
    f"""
    WITH per_cust AS (
      SELECT c_custkey, c_nationkey, {dsum('o_totalprice', 'spend')}
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey, c_nationkey
    ), nat_avg AS (
      SELECT c_nationkey,
             CAST(SUM(CAST(spend AS DECIMAL(30,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_spend
      FROM per_cust GROUP BY c_nationkey
    )
    SELECT p.c_custkey, p.spend, a.avg_spend
    FROM per_cust p JOIN nat_avg a ON p.c_nationkey = a.c_nationkey
    WHERE p.spend > 1.2 * a.avg_spend
    """,
)

# --- store-count bucketed customer distribution (TPC-DS Q35 shape) ----------
sql_query(
    "tpcds_q35_order_count_demographics",
    """
    WITH per_cust AS (
      SELECT c_custkey, c_mktsegment, c_nationkey, COUNT(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey, c_mktsegment, c_nationkey
    )
    SELECT c_mktsegment, c_nationkey,
           COUNT(*) AS n_customers,
           MIN(n_orders) AS min_orders, MAX(n_orders) AS max_orders,
           CAST(SUM(CAST(n_orders AS DECIMAL(30,6))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avg_orders
    FROM per_cust
    GROUP BY c_mktsegment, c_nationkey
    HAVING COUNT(*) >= 3
    """,
)

# --- manufacturer monthly rank trend (TPC-DS Q53/Q63 shape) -----------------
sql_query(
    "tpcds_q53_brand_monthly_vs_avg",
    f"""
    WITH monthly AS (
      SELECT p_brand, EXTRACT(YEAR FROM o_orderdate) * 12
             + EXTRACT(MONTH FROM o_orderdate) AS midx,
             {dsum('l_extendedprice', 'rev')}
      FROM lineitem, orders, part
      WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
      GROUP BY p_brand, EXTRACT(YEAR FROM o_orderdate) * 12
               + EXTRACT(MONTH FROM o_orderdate)
    ), with_avg AS (
      SELECT p_brand, midx, rev,
             CAST(SUM(CAST(rev AS DECIMAL(30,6)))
                  OVER (PARTITION BY p_brand) AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY p_brand) AS brand_avg
      FROM monthly
    )
    SELECT p_brand, midx, rev, brand_avg, rev / brand_avg AS ratio
    FROM with_avg
    WHERE brand_avg > 0 AND rev / brand_avg > 1.5
    """,
)

# --- INTERSECT-gated nation revenue (TPC-DS Q8 shape) -----------------------
sql_query(
    "tpcds_q8_intersect_gated_revenue",
    f"""
    WITH big_cust_nations AS (
      SELECT DISTINCT c_nationkey AS nk FROM customer WHERE c_acctbal > 5000
      INTERSECT
      SELECT DISTINCT s_nationkey AS nk FROM supplier WHERE s_acctbal > 5000
    )
    SELECT n_name, {dsum('o_totalprice', 'revenue')}
    FROM orders, customer, nation
    WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
      AND c_nationkey IN (SELECT nk FROM big_cust_nations)
    GROUP BY n_name
    """,
)

# --- OR-of-ANDs demographic average buckets (TPC-DS Q13 shape) --------------
sql_query(
    "tpcds_q13_or_band_averages",
    """
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avg_price
    FROM lineitem, orders, customer
    WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND ((c_mktsegment = 'BUILDING' AND l_quantity BETWEEN 10 AND 30
            AND l_discount BETWEEN 0.02 AND 0.06)
        OR (c_mktsegment = 'MACHINERY' AND l_quantity BETWEEN 20 AND 40
            AND l_discount BETWEEN 0.04 AND 0.08)
        OR (c_mktsegment = 'AUTOMOBILE' AND l_quantity BETWEEN 1 AND 15
            AND l_discount BETWEEN 0.00 AND 0.03))
    """,
)

# --- before/after date-split ratio per supplier-part (TPC-DS Q21 shape) -----
sql_query(
    "tpcds_q21_before_after_split",
    """
    WITH split_qty AS (
      SELECT l_suppkey, l_partkey,
             CAST(SUM(CAST(CASE WHEN l_shipdate < TIMESTAMP '1995-06-01 00:00:00'
                      THEN l_quantity ELSE 0 END AS DECIMAL(30,6))) AS DOUBLE) AS qty_before,
             CAST(SUM(CAST(CASE WHEN l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
                      THEN l_quantity ELSE 0 END AS DECIMAL(30,6))) AS DOUBLE) AS qty_after
      FROM lineitem GROUP BY l_suppkey, l_partkey
    )
    SELECT l_suppkey, l_partkey, qty_before, qty_after
    FROM split_qty
    WHERE qty_before > 0 AND qty_after > 0
      AND 3 * qty_after >= 2 * qty_before
      AND 2 * qty_after <= 3 * qty_before
    """,
)

# --- product-hierarchy ROLLUP averages (TPC-DS Q22 shape) -------------------
sql_query(
    "tpcds_q22_hierarchy_rollup_avg",
    """
    SELECT p_type, p_brand, p_size,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY ROLLUP (p_type, p_brand, p_size)
    """,
)

# --- high-variance parts active in consecutive months (TPC-DS Q39 shape) ----
sql_query(
    "tpcds_q39_cov_consecutive_months",
    """
    WITH monthly AS (
      SELECT l_partkey,
             EXTRACT(YEAR FROM l_shipdate) * 12
             + EXTRACT(MONTH FROM l_shipdate) AS midx,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS s,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sq
      FROM lineitem
      GROUP BY l_partkey, EXTRACT(YEAR FROM l_shipdate) * 12
               + EXTRACT(MONTH FROM l_shipdate)
      HAVING COUNT(*) >= 2
    ), cov AS (
      SELECT l_partkey, midx,
             SQRT((sq - s * s / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
             / (s / CAST(n AS DOUBLE)) AS c
      FROM monthly WHERE s > 0
    )
    SELECT a.l_partkey, a.midx AS m1, b.midx AS m2, a.c AS cov1, b.c AS cov2
    FROM cov a JOIN cov b
      ON a.l_partkey = b.l_partkey AND b.midx = a.midx + 1
    WHERE a.c > 0.5 AND b.c > 0.5
    """,
)

# --- channel union with per-column null accounting (TPC-DS Q76 shape) -------
sql_query(
    "tpcds_q76_null_class_union",
    f"""
    WITH all_ch AS (
      SELECT 'returned' AS channel, EXTRACT(YEAR FROM l_shipdate) AS s_year,
             l_extendedprice AS price
      FROM lineitem WHERE l_returnflag = 'R'
      UNION ALL
      SELECT 'kept' AS channel, EXTRACT(YEAR FROM l_shipdate) AS s_year,
             l_extendedprice AS price
      FROM lineitem WHERE l_returnflag <> 'R'
    )
    SELECT channel, s_year, COUNT(*) AS n, {dsum('price', 'total_price')}
    FROM all_ch
    GROUP BY channel, s_year
    """,
)

# --- per-channel profit after returns with ROLLUP (TPC-DS Q80 shape) --------
sql_query(
    "tpcds_q80_channel_profit_rollup",
    f"""
    WITH profit AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                  THEN 'urgent' ELSE 'standard' END AS channel,
             n_name,
             CASE WHEN l_returnflag = 'R' THEN -l_extendedprice * (1 - l_discount)
                  ELSE l_extendedprice * (1 - l_discount) END AS net
      FROM lineitem, orders, customer, nation
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n_nationkey
    )
    SELECT channel, n_name, {dsum('net', 'net_profit')}, COUNT(*) AS n_lines
    FROM profit
    GROUP BY ROLLUP (channel, n_name)
    """,
)

# --- multi-measure demographic ROLLUP (TPC-DS Q18/Q27 shape) ----------------
sql_query(
    "tpcds_q18_multi_measure_rollup",
    """
    SELECT c_mktsegment, n_name,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
           COUNT(*) AS n_lines
    FROM lineitem, orders, customer, nation
    WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND c_nationkey = n_nationkey
    GROUP BY ROLLUP (c_mktsegment, n_name)
    """,
)

# --- sold, returned, then re-sold chain (TPC-DS Q25/Q29 shape) --------------
sql_query(
    "tpcds_q25_sale_return_resale_chain",
    f"""
    WITH sold AS (
      SELECT l_partkey, MIN(l_shipdate) AS first_sale
      FROM lineitem WHERE l_returnflag <> 'R' GROUP BY l_partkey
    ), returned AS (
      SELECT l_partkey, MIN(l_shipdate) AS first_return
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey
    ), resold AS (
      SELECT l.l_partkey, {dsum('l.l_extendedprice', 'resale_revenue')},
             COUNT(*) AS n_resales
      FROM lineitem l
      JOIN returned r ON l.l_partkey = r.l_partkey
      WHERE l.l_returnflag <> 'R' AND l.l_shipdate > r.first_return
      GROUP BY l.l_partkey
    )
    SELECT s.l_partkey, s.first_sale, r.first_return,
           re.resale_revenue, re.n_resales
    FROM sold s
    JOIN returned r ON s.l_partkey = r.l_partkey
    JOIN resold re ON s.l_partkey = re.l_partkey
    WHERE s.first_sale < r.first_return
    """,
)

# --- margin ROLLUP ranked within grouping level (TPC-DS Q36 shape) ----------
sql_query(
    "tpcds_q36_margin_rollup_rank",
    """
    WITH rolled AS (
      SELECT p_type, p_brand,
             GROUPING(p_type) AS g_type, GROUPING(p_brand) AS g_brand,
             CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
               AS discount_ratio
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY ROLLUP (p_type, p_brand)
    )
    SELECT p_type, p_brand, g_type, g_brand, discount_ratio,
           RANK() OVER (PARTITION BY g_type, g_brand, p_type
                        ORDER BY discount_ratio DESC, p_brand) AS rank_in_parent
    FROM rolled
    """,
)

# --- category-restricted channel re-aggregation (TPC-DS Q33/Q56/Q60) --------
sql_query(
    "tpcds_q60_category_channel_reagg",
    f"""
    WITH cat_parts AS (
      SELECT p_partkey FROM part WHERE p_type LIKE '%BRASS%'
    ), by_channel AS (
      SELECT l_partkey, 'urgent' AS channel,
             {dsum('l_extendedprice', 'rev')}
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN cat_parts cp ON l_partkey = cp.p_partkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY l_partkey
      UNION ALL
      SELECT l_partkey, 'standard' AS channel,
             {dsum('l_extendedprice', 'rev')}
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN cat_parts cp ON l_partkey = cp.p_partkey
      WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      GROUP BY l_partkey
    )
    SELECT l_partkey, {dsum('rev', 'total_rev')}, COUNT(*) AS n_channels
    FROM by_channel
    GROUP BY l_partkey
    HAVING COUNT(*) = 2
    """,
)

# --- promo-share scalar ratio (TPC-DS Q61 shape) ----------------------------
sql_query(
    "tpcds_q61_promo_share",
    """
    SELECT CAST(promo.r AS DOUBLE) / CAST(total.r AS DOUBLE) AS promo_share,
           promo.r AS promo_rev, total.r AS total_rev
    FROM
      (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS r
       FROM lineitem WHERE l_discount >= 0.05) promo,
      (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS r
       FROM lineitem) total
    WHERE total.r > 0
    """,
)

# --- rollup revenue ranked, top rows (TPC-DS Q67 shape) ---------------------
sql_query(
    "tpcds_q67_rollup_topn",
    """
    WITH rolled AS (
      SELECT p_type, p_brand,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY ROLLUP (p_type, p_brand)
    )
    SELECT p_type, p_brand, rev, rnk
    FROM (
      SELECT p_type, p_brand, rev,
             ROW_NUMBER() OVER (ORDER BY rev DESC,
                                p_type NULLS FIRST,
                                p_brand NULLS FIRST) AS rnk
      FROM rolled) x
    WHERE rnk <= 25
    """,
)

# --- EXCEPT-gated customer count (TPC-DS Q87 shape) -------------------------
sql_query(
    "tpcds_q87_except_count",
    """
    SELECT COUNT(*) AS n_urgent_only FROM (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      EXCEPT
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    ) u
    """,
)

# --- weekly revenue with week-over-week join (TPC-DS Q2 shape) --------------
# (YEAR, ISO-WEEK) pairs agree between Spark and DuckDB; the year-boundary
# mixing of ISO week 1 is identical in both engines.
sql_query(
    "tpcds_q2_weekly_wow",
    f"""
    WITH weekly AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) * 100
             + EXTRACT(WEEK FROM o_orderdate) AS widx,
             {dsum("CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN o_totalprice ELSE 0 END", 'urgent_rev')},
             {dsum("CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN o_totalprice ELSE 0 END", 'std_rev')}
      FROM orders
      GROUP BY EXTRACT(YEAR FROM o_orderdate) * 100
               + EXTRACT(WEEK FROM o_orderdate)
    )
    SELECT cur.widx, cur.urgent_rev / prev.urgent_rev AS urgent_wow,
           cur.std_rev / prev.std_rev AS std_wow
    FROM weekly cur JOIN weekly prev ON cur.widx = prev.widx + 1
    WHERE prev.urgent_rev > 0 AND prev.std_rev > 0
    """,
)

# --- parts in ALL channels, above-average gate (TPC-DS Q14 shape) -----------
sql_query(
    "tpcds_q14_cross_channel_above_avg",
    """
    WITH c1 AS (SELECT DISTINCT l_partkey FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderpriority = '1-URGENT'),
    c2 AS (SELECT DISTINCT l_partkey FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderpriority = '2-HIGH'),
    c3 AS (SELECT DISTINCT l_partkey FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')),
    all_ch AS (
      SELECT l_partkey FROM c1
      INTERSECT SELECT l_partkey FROM c2
      INTERSECT SELECT l_partkey FROM c3
    ), per_part AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS rev
      FROM lineitem GROUP BY l_partkey
    ), overall AS (
      SELECT CAST(SUM(CAST(rev AS DECIMAL(30,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_rev
      FROM per_part
    )
    SELECT p.l_partkey, p.rev
    FROM per_part p
    JOIN all_ch a ON p.l_partkey = a.l_partkey, overall o
    WHERE p.rev > o.avg_rev
    """,
)

# --- distinct-count buckets as one wide row (TPC-DS Q28 shape) --------------
sql_query(
    "tpcds_q28_distinct_bucket_row",
    """
    SELECT b1.n AS n_lo, b1.nd AS nd_lo, b2.n AS n_mid, b2.nd AS nd_mid,
           b3.n AS n_hi, b3.nd AS nd_hi
    FROM
      (SELECT COUNT(*) AS n, COUNT(DISTINCT l_partkey) AS nd
       FROM lineitem WHERE l_quantity < 15) b1,
      (SELECT COUNT(*) AS n, COUNT(DISTINCT l_partkey) AS nd
       FROM lineitem WHERE l_quantity >= 15 AND l_quantity < 35) b2,
      (SELECT COUNT(*) AS n, COUNT(DISTINCT l_partkey) AS nd
       FROM lineitem WHERE l_quantity >= 35) b3
    """,
)

# --- multi-channel YoY growth comparison (TPC-DS Q4/Q11 full shape) ---------
# Q4 keeps customers whose growth in one channel outpaces growth in another;
# the fixture's two "channels" are urgent-priority vs standard-priority spend.
sql_query(
    "tpcds_q4_channel_growth_race",
    f"""
    WITH yearly AS (
      SELECT o_custkey, EXTRACT(YEAR FROM o_orderdate) AS o_year,
             {dsum("CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN o_totalprice ELSE 0 END", 'urgent_rev')},
             {dsum("CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN o_totalprice ELSE 0 END", 'std_rev')}
      FROM orders
      GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate)
    )
    SELECT cur.o_custkey, cur.o_year,
           cur.urgent_rev / prev.urgent_rev AS urgent_growth,
           cur.std_rev / prev.std_rev AS std_growth
    FROM yearly cur
    JOIN yearly prev
      ON cur.o_custkey = prev.o_custkey AND cur.o_year = prev.o_year + 1
    WHERE prev.urgent_rev > 0 AND prev.std_rev > 0
      AND cur.urgent_rev / prev.urgent_rev > cur.std_rev / prev.std_rev
    """,
)

# --- deviation-from-average with LAG/LEAD neighbors (TPC-DS Q57/Q47 shape) --
# Monthly nation revenue where the month deviates >10% from the nation-year
# average, reported with the neighboring months' revenue (LAG/LEAD over the
# per-month aggregate — tiny after aggregation, scales at 100 TB).
sql_query(
    "tpcds_q57_monthly_deviation",
    f"""
    WITH monthly AS (
      SELECT n_name, EXTRACT(YEAR FROM o_orderdate) AS o_year,
             EXTRACT(MONTH FROM o_orderdate) AS o_month,
             {dsum('o_totalprice', 'rev')}
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate),
               EXTRACT(MONTH FROM o_orderdate)
    ), with_avg AS (
      SELECT m.n_name, m.o_year, m.o_month, m.rev, y.avg_rev,
             LAG(m.rev) OVER (PARTITION BY m.n_name
                              ORDER BY m.o_year, m.o_month) AS prev_rev,
             LEAD(m.rev) OVER (PARTITION BY m.n_name
                               ORDER BY m.o_year, m.o_month) AS next_rev
      FROM monthly m
      JOIN (SELECT n_name, o_year, {davg('rev', 'avg_rev')}
            FROM monthly GROUP BY n_name, o_year) y
        ON m.n_name = y.n_name AND m.o_year = y.o_year
    )
    SELECT n_name, o_year, o_month, rev, avg_rev, prev_rev, next_rev
    FROM with_avg
    WHERE ABS(rev - avg_rev) > 0.1 * avg_rev
    """,
)

# --- 7-bucket day pivot per nation (TPC-DS Q43 shape) -----------------------
# Q43 pivots store sales into weekday columns; EXTRACT(DOW) disagrees between
# engines (Sunday=0 vs 1), so the 7 buckets key on MOD(DOY, 7), which both
# engines compute identically — the shape (single-pass CASE pivot into a wide
# row per dimension value) is what Q43 exercises.
sql_query(
    "tpcds_q43_day_bucket_pivot",
    f"""
    SELECT n_name,
           {dsum("CASE WHEN MOD(EXTRACT(DOY FROM o_orderdate), 7) = 0 THEN o_totalprice ELSE 0 END", 'd0_rev')},
           {dsum("CASE WHEN MOD(EXTRACT(DOY FROM o_orderdate), 7) = 1 THEN o_totalprice ELSE 0 END", 'd1_rev')},
           {dsum("CASE WHEN MOD(EXTRACT(DOY FROM o_orderdate), 7) = 2 THEN o_totalprice ELSE 0 END", 'd2_rev')},
           {dsum("CASE WHEN MOD(EXTRACT(DOY FROM o_orderdate), 7) = 3 THEN o_totalprice ELSE 0 END", 'd3_rev')},
           {dsum("CASE WHEN MOD(EXTRACT(DOY FROM o_orderdate), 7) = 4 THEN o_totalprice ELSE 0 END", 'd4_rev')},
           {dsum("CASE WHEN MOD(EXTRACT(DOY FROM o_orderdate), 7) = 5 THEN o_totalprice ELSE 0 END", 'd5_rev')},
           {dsum("CASE WHEN MOD(EXTRACT(DOY FROM o_orderdate), 7) = 6 THEN o_totalprice ELSE 0 END", 'd6_rev')}
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)

# --- order-to-ship delay bucket matrix (TPC-DS Q50 shape) -------------------
# Q50 buckets sale->return latency into 30/60/90/120/120+ day columns per
# store; the fixture analog buckets order->ship latency in whole months
# (computed via YEAR*12+MONTH arithmetic, identical in both engines) per
# return flag. Integer counts, so the pivot is exact.
sql_query(
    "tpcds_q50_ship_delay_matrix",
    """
    WITH delays AS (
      SELECT l_returnflag,
             (EXTRACT(YEAR FROM l_shipdate) - EXTRACT(YEAR FROM o_orderdate)) * 12
             + (EXTRACT(MONTH FROM l_shipdate) - EXTRACT(MONTH FROM o_orderdate))
             AS mdelay
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT l_returnflag,
           SUM(CASE WHEN mdelay <= 0 THEN 1 ELSE 0 END) AS same_month,
           SUM(CASE WHEN mdelay = 1 THEN 1 ELSE 0 END) AS one_month,
           SUM(CASE WHEN mdelay = 2 THEN 1 ELSE 0 END) AS two_months,
           SUM(CASE WHEN mdelay = 3 THEN 1 ELSE 0 END) AS three_months,
           SUM(CASE WHEN mdelay >= 4 THEN 1 ELSE 0 END) AS four_plus
    FROM delays
    GROUP BY l_returnflag
    """,
)

# --- EXISTS + double NOT EXISTS demographic gate (TPC-DS Q69 shape) ---------
sql_query(
    "tpcds_q69_exists_notexists_gate",
    f"""
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           {davg('c_acctbal', 'avg_bal')}
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '2-HIGH')
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '5-LOW')
    GROUP BY c_mktsegment
    """,
)
