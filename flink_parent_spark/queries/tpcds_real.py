"""REAL TPC-DS query texts on the real TPC-DS schema.

The reference's TPC-DS harness runs the actual published queries against
the real tables (`flink-end-to-end-tests/flink-tpcds-test/src/main/java/
org/apache/flink/table/tpcds/TpcdsTestProgram.java:75-86`, all 103 at
SF=1 per `test-scripts/test_tpcds.sh:22`). The `tpcds_style` battery
proves the operator shapes; THIS module closes the remaining parity gap by
registering real query texts (public TPC-DS specification), each named
`tpcds_qNN`, over the deterministic dataset from `tpcds_data.py`.

One SQL text per query, run VERBATIM on both engines: Spark gets the
TPC-DS tables as temp views; the DuckDB oracle is the same text behind a
spliced WITH-prelude defining each table as read_parquet over the SAME
files. Dialect adjustments (applied uniformly, each preserving the query's
semantics):
- decimal aggregates are emitted through the engine's cross-engine float
  contract: exact DECIMAL accumulation, CAST to DOUBLE at the output —
  AVG(decimal) becomes SUM(CAST .. AS DECIMAL(30,6))/COUNT (registry.py
  dsum/davg discipline); divisions run in DOUBLE (IEEE-identical), never
  in DECIMAL (engines disagree on result scale);
- every ORDER BY under a LIMIT is extended to a total order (tie-break
  columns appended, explicit NULLS FIRST on nullable keys) so the LIMIT
  cuts the same rows in both engines;
- parameter values (the spec's substitution variables) are chosen to hit
  the generated data's domains.

Scale posture: these are plain declarative star joins / rollups / window
queries — Catalyst broadcasts the dims, partial-aggregates before every
shuffle, and prunes scans; the same plans run unchanged on a full-size
store_sales.
"""

from __future__ import annotations

from flink_parent_spark.queries.registry import register
from flink_parent_spark.queries.tpcds_data import (
    TPCDS_TABLES,
    ensure_tpcds,
)

# the dataset must exist before EITHER engine runs (the driver may run the
# DuckDB oracle first); generation is a one-time ~3 s at import
_DIR = ensure_tpcds()

_ORACLE_PRELUDE = ", ".join(
    f"{t} AS (SELECT * FROM read_parquet('{_DIR}/{t}.parquet'))"
    for t in TPCDS_TABLES
)


def _spark_runner(sql: str):
    def run(spark, sf_dir):
        d = ensure_tpcds()
        for t in TPCDS_TABLES:
            # unconditional re-register: `customer` (and any same-named
            # fixture view a previous query registered via load_tables)
            # must resolve to the TPC-DS table here — load_tables applies
            # the same always-replace discipline on its side
            spark.read.parquet(f"{d}/{t}.parquet").createOrReplaceTempView(t)
        return spark.sql(sql)

    return run


# name -> raw query text: the scaled-bench and scaled-parity entry points
# re-run the SAME texts against a bigger generated dataset
TPCDS_SQL: dict[str, str] = {}


def tpcds_query(name: str, sql: str) -> None:
    """Register a real TPC-DS query: one text, both engines."""
    sql = sql.strip().rstrip(";")
    stripped = sql.lstrip()
    if stripped[:4].upper() == "WITH":
        oracle = f"WITH {_ORACLE_PRELUDE}, {stripped[4:]}"
    else:
        oracle = f"WITH {_ORACLE_PRELUDE} {sql}"
    run = _spark_runner(sql)
    run.__name__ = f"q_{name}"
    run.__doc__ = sql
    TPCDS_SQL[name] = sql
    register(name, run, oracle)


def run_tpcds_at_scale(spark, name: str, scale: float):
    """Run a registered TPC-DS text against the `scale`-multiplied dataset
    (generated lazily, once per machine, into its own directory — the
    qualification dataset the oracles read stays untouched). This is the
    bench's SF1-equivalent path (test_tpcds.sh:22 runs the reference at
    SF=1): same texts, same plans, real volume.

    The 24 scan DataFrames are memoized on the session per dataset
    directory (logical plans only — the generated dataset is immutable
    once its _COMPLETE marker exists, version+scale keyed): rebuilding
    them costs a parquet footer read + py4j round-trips per table, paid
    twice per bench entry. Views still (re)register every call."""
    d = ensure_tpcds(scale)
    cache: dict = getattr(spark, "_fps_tpcds_plans", None) or {}
    dfs = cache.get(d)
    if dfs is None:
        dfs = {t: spark.read.parquet(f"{d}/{t}.parquet") for t in TPCDS_TABLES}
        cache[d] = dfs
        spark._fps_tpcds_plans = cache  # noqa: SLF001 - session-scoped memo
    for t, df in dfs.items():
        df.createOrReplaceTempView(t)
    return spark.sql(TPCDS_SQL[name])


def oracle_sql_at_scale(name: str, scale: float) -> str:
    """The DuckDB oracle text for a scaled run: same query, WITH-prelude
    pointing at the scaled directory. Callers must ensure_tpcds(scale)
    before executing it."""
    from flink_parent_spark.queries.tpcds_data import tpcds_dir  # noqa: PLC0415

    d = tpcds_dir(scale)
    prelude = ", ".join(
        f"{t} AS (SELECT * FROM read_parquet('{d}/{t}.parquet'))"
        for t in TPCDS_TABLES
    )
    sql = TPCDS_SQL[name]
    stripped = sql.lstrip()
    if stripped[:4].upper() == "WITH":
        return f"WITH {prelude}, {stripped[4:]}"
    return f"WITH {prelude} {sql}"


# -- the queries -------------------------------------------------------------

tpcds_query("tpcds_q3", """
SELECT dt.d_year,
       item.i_brand_id AS brand_id,
       item.i_brand AS brand,
       CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS sum_agg
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manufact_id = 128
  AND dt.d_moy = 11
GROUP BY dt.d_year, item.i_brand_id, item.i_brand
ORDER BY dt.d_year, sum_agg DESC, brand_id
LIMIT 100
""")

tpcds_query("tpcds_q7", """
SELECT i_item_id,
       AVG(ss_quantity) AS agg1,
       CAST(SUM(CAST(ss_list_price AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(ss_list_price) AS agg2,
       CAST(SUM(CAST(ss_coupon_amt AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(ss_coupon_amt) AS agg3,
       CAST(SUM(CAST(ss_sales_price AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(ss_sales_price) AS agg4
FROM store_sales, customer_demographics, date_dim, item, promotion
WHERE ss_sold_date_sk = d_date_sk
  AND ss_item_sk = i_item_sk
  AND ss_cdemo_sk = cd_demo_sk
  AND ss_promo_sk = p_promo_sk
  AND cd_gender = 'M'
  AND cd_marital_status = 'S'
  AND cd_education_status = 'College'
  AND (p_channel_email = 'N' OR p_channel_event = 'N')
  AND d_year = 2000
GROUP BY i_item_id
ORDER BY i_item_id
LIMIT 100
""")

tpcds_query("tpcds_q13", """
SELECT AVG(ss_quantity) AS agg1,
       CAST(SUM(CAST(ss_ext_sales_price AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(ss_ext_sales_price) AS agg2,
       CAST(SUM(CAST(ss_ext_wholesale_cost AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(ss_ext_wholesale_cost) AS agg3,
       CAST(SUM(ss_ext_wholesale_cost) AS DOUBLE) AS agg4
FROM store_sales, store, customer_demographics, household_demographics,
     customer_address, date_dim
WHERE s_store_sk = ss_store_sk
  AND ss_sold_date_sk = d_date_sk AND d_year = 2001
  AND ((ss_hdemo_sk = hd_demo_sk
        AND cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'M'
        AND cd_education_status = 'Advanced Degree'
        AND ss_sales_price BETWEEN 100.00 AND 150.00
        AND hd_dep_count = 3)
    OR (ss_hdemo_sk = hd_demo_sk
        AND cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'S'
        AND cd_education_status = 'College'
        AND ss_sales_price BETWEEN 50.00 AND 100.00
        AND hd_dep_count = 1)
    OR (ss_hdemo_sk = hd_demo_sk
        AND cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'W'
        AND cd_education_status = '2 yr Degree'
        AND ss_sales_price BETWEEN 150.00 AND 200.00
        AND hd_dep_count = 1))
  AND ((ss_addr_sk = ca_address_sk
        AND ca_country = 'United States'
        AND ca_state IN ('TX', 'OH', 'IL')
        AND ss_net_profit BETWEEN 100 AND 200)
    OR (ss_addr_sk = ca_address_sk
        AND ca_country = 'United States'
        AND ca_state IN ('SD', 'GA', 'TN')
        AND ss_net_profit BETWEEN 150 AND 300)
    OR (ss_addr_sk = ca_address_sk
        AND ca_country = 'United States'
        AND ca_state IN ('TX', 'GA', 'IL')
        AND ss_net_profit BETWEEN 50 AND 250))
""")

tpcds_query("tpcds_q15", """
SELECT ca_zip, CAST(SUM(cs_sales_price) AS DOUBLE) AS sum_sales
FROM catalog_sales, customer, customer_address, date_dim
WHERE cs_bill_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND (substr(ca_zip, 1, 5) IN ('10042', '10113', '10157', '10200',
                                '10244', '10288', '10317', '10362', '10399')
       OR ca_state IN ('TN', 'GA', 'OH')
       OR cs_sales_price > 500)
  AND cs_sold_date_sk = d_date_sk
  AND d_qoy = 2 AND d_year = 2001
GROUP BY ca_zip
ORDER BY ca_zip
LIMIT 100
""")

tpcds_query("tpcds_q19", """
SELECT i_brand_id AS brand_id, i_brand AS brand, i_manufact_id, i_manufact,
       CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS ext_price
FROM date_dim, store_sales, item, customer, customer_address, store
WHERE d_date_sk = ss_sold_date_sk
  AND ss_item_sk = i_item_sk
  AND i_manager_id = 8
  AND d_moy = 11
  AND d_year = 1998
  AND ss_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND substr(ca_zip, 1, 5) <> substr(s_zip, 1, 5)
  AND ss_store_sk = s_store_sk
GROUP BY i_brand, i_brand_id, i_manufact_id, i_manufact
ORDER BY ext_price DESC, i_brand, i_brand_id, i_manufact_id, i_manufact
LIMIT 100
""")

tpcds_query("tpcds_q21", """
SELECT w_warehouse_name, i_item_id,
       SUM(CASE WHEN d_date < DATE '2000-03-11'
                THEN inv_quantity_on_hand ELSE 0 END) AS inv_before,
       SUM(CASE WHEN d_date >= DATE '2000-03-11'
                THEN inv_quantity_on_hand ELSE 0 END) AS inv_after
FROM inventory, warehouse, item, date_dim
WHERE i_current_price BETWEEN 0.99 AND 31.49
  AND i_item_sk = inv_item_sk
  AND inv_warehouse_sk = w_warehouse_sk
  AND inv_date_sk = d_date_sk
  AND d_date BETWEEN DATE '2000-02-10' AND DATE '2000-04-10'
GROUP BY w_warehouse_name, i_item_id
HAVING (CASE WHEN SUM(CASE WHEN d_date < DATE '2000-03-11'
                           THEN inv_quantity_on_hand ELSE 0 END) > 0
             THEN CAST(SUM(CASE WHEN d_date >= DATE '2000-03-11'
                                THEN inv_quantity_on_hand ELSE 0 END)
                       AS DOUBLE)
                  / SUM(CASE WHEN d_date < DATE '2000-03-11'
                             THEN inv_quantity_on_hand ELSE 0 END)
             ELSE NULL END)
        BETWEEN CAST(2 AS DOUBLE) / 3 AND CAST(3 AS DOUBLE) / 2
ORDER BY w_warehouse_name, i_item_id
LIMIT 100
""")

tpcds_query("tpcds_q42", """
SELECT dt.d_year, item.i_category_id, item.i_category,
       CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS sum_sales
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manager_id = 1
  AND dt.d_moy = 11
  AND dt.d_year = 2000
GROUP BY dt.d_year, item.i_category_id, item.i_category
ORDER BY sum_sales DESC, dt.d_year, item.i_category_id, item.i_category
LIMIT 100
""")

tpcds_query("tpcds_q43", """
SELECT s_store_name, s_store_id,
       CAST(SUM(CASE WHEN d_day_name = 'Sunday'
                THEN ss_sales_price ELSE NULL END) AS DOUBLE) AS sun_sales,
       CAST(SUM(CASE WHEN d_day_name = 'Monday'
                THEN ss_sales_price ELSE NULL END) AS DOUBLE) AS mon_sales,
       CAST(SUM(CASE WHEN d_day_name = 'Tuesday'
                THEN ss_sales_price ELSE NULL END) AS DOUBLE) AS tue_sales,
       CAST(SUM(CASE WHEN d_day_name = 'Wednesday'
                THEN ss_sales_price ELSE NULL END) AS DOUBLE) AS wed_sales,
       CAST(SUM(CASE WHEN d_day_name = 'Thursday'
                THEN ss_sales_price ELSE NULL END) AS DOUBLE) AS thu_sales,
       CAST(SUM(CASE WHEN d_day_name = 'Friday'
                THEN ss_sales_price ELSE NULL END) AS DOUBLE) AS fri_sales,
       CAST(SUM(CASE WHEN d_day_name = 'Saturday'
                THEN ss_sales_price ELSE NULL END) AS DOUBLE) AS sat_sales
FROM date_dim, store_sales, store
WHERE d_date_sk = ss_sold_date_sk
  AND s_store_sk = ss_store_sk
  AND s_gmt_offset = -5
  AND d_year = 2000
GROUP BY s_store_name, s_store_id
ORDER BY s_store_name, s_store_id, sun_sales, mon_sales, tue_sales,
         wed_sales, thu_sales, fri_sales, sat_sales
LIMIT 100
""")

tpcds_query("tpcds_q52", """
SELECT dt.d_year, item.i_brand_id AS brand_id, item.i_brand AS brand,
       CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS ext_price
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manager_id = 1
  AND dt.d_moy = 11
  AND dt.d_year = 2000
GROUP BY dt.d_year, item.i_brand_id, item.i_brand
ORDER BY dt.d_year, ext_price DESC, brand_id
LIMIT 100
""")

tpcds_query("tpcds_q55", """
SELECT i_brand_id AS brand_id, i_brand AS brand,
       CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS ext_price
FROM date_dim, store_sales, item
WHERE d_date_sk = ss_sold_date_sk
  AND ss_item_sk = i_item_sk
  AND i_manager_id = 28
  AND d_moy = 11
  AND d_year = 1999
GROUP BY i_brand, i_brand_id
ORDER BY ext_price DESC, brand_id
LIMIT 100
""")

tpcds_query("tpcds_q96", """
SELECT COUNT(*) AS cnt
FROM store_sales, household_demographics, time_dim, store
WHERE ss_sold_time_sk = time_dim.t_time_sk
  AND ss_hdemo_sk = household_demographics.hd_demo_sk
  AND ss_store_sk = s_store_sk
  AND time_dim.t_hour = 20
  AND time_dim.t_minute >= 30
  AND household_demographics.hd_dep_count = 7
  AND store.s_store_name = 'ese'
ORDER BY cnt
LIMIT 100
""")

tpcds_query("tpcds_q98", """
SELECT i_item_id, i_item_desc, i_category, i_class, i_current_price,
       CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS itemrevenue,
       CAST(SUM(ss_ext_sales_price) AS DOUBLE) * 100
         / CAST(SUM(SUM(ss_ext_sales_price))
                OVER (PARTITION BY i_class) AS DOUBLE) AS revenueratio
FROM store_sales, item, date_dim
WHERE ss_item_sk = i_item_sk
  AND i_category IN ('Sports', 'Books', 'Home')
  AND ss_sold_date_sk = d_date_sk
  AND d_date BETWEEN DATE '1999-02-22' AND DATE '1999-03-24'
GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio
""")

tpcds_query("tpcds_q25", """
SELECT i_item_id, i_item_desc, s_store_id, s_store_name,
       CAST(SUM(ss_net_profit) AS DOUBLE) AS store_sales_profit,
       CAST(SUM(sr_net_loss) AS DOUBLE) AS store_returns_loss,
       CAST(SUM(cs_net_profit) AS DOUBLE) AS catalog_sales_profit
FROM store_sales, store_returns, catalog_sales,
     date_dim d1, date_dim d2, date_dim d3, store, item
WHERE d1.d_year = 2001
  AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk
  AND s_store_sk = ss_store_sk
  AND ss_customer_sk = sr_customer_sk
  AND ss_item_sk = sr_item_sk
  AND ss_ticket_number = sr_ticket_number
  AND sr_returned_date_sk = d2.d_date_sk
  AND d2.d_year IN (2001, 2002)
  AND sr_customer_sk = cs_bill_customer_sk
  AND sr_item_sk = cs_item_sk
  AND cs_sold_date_sk = d3.d_date_sk
  AND d3.d_year IN (2001, 2002)
GROUP BY i_item_id, i_item_desc, s_store_id, s_store_name
ORDER BY i_item_id, i_item_desc, s_store_id, s_store_name
LIMIT 100
""")

tpcds_query("tpcds_q26", """
SELECT i_item_id,
       AVG(cs_quantity) AS agg1,
       CAST(SUM(CAST(cs_list_price AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(cs_list_price) AS agg2,
       CAST(SUM(CAST(cs_ext_discount_amt AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(cs_ext_discount_amt) AS agg3,
       CAST(SUM(CAST(cs_sales_price AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(cs_sales_price) AS agg4
FROM catalog_sales, customer_demographics, date_dim, item, promotion
WHERE cs_sold_date_sk = d_date_sk
  AND cs_item_sk = i_item_sk
  AND cs_bill_cdemo_sk = cd_demo_sk
  AND cs_promo_sk = p_promo_sk
  AND cd_gender = 'M'
  AND cd_marital_status = 'S'
  AND cd_education_status = 'College'
  AND (p_channel_email = 'N' OR p_channel_event = 'N')
  AND d_year = 2000
GROUP BY i_item_id
ORDER BY i_item_id
LIMIT 100
""")

tpcds_query("tpcds_q27", """
SELECT i_item_id, s_state, CAST(GROUPING(s_state) AS INT) AS g_state,
       AVG(ss_quantity) AS agg1,
       CAST(SUM(CAST(ss_list_price AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(ss_list_price) AS agg2,
       CAST(SUM(CAST(ss_coupon_amt AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(ss_coupon_amt) AS agg3,
       CAST(SUM(CAST(ss_sales_price AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(ss_sales_price) AS agg4
FROM store_sales, customer_demographics, date_dim, store, item
WHERE ss_sold_date_sk = d_date_sk
  AND ss_item_sk = i_item_sk
  AND ss_store_sk = s_store_sk
  AND ss_cdemo_sk = cd_demo_sk
  AND cd_gender = 'M'
  AND cd_marital_status = 'S'
  AND cd_education_status = 'College'
  AND d_year = 2002
  AND s_state IN ('TN', 'SD', 'TX', 'GA', 'OH', 'IL')
GROUP BY ROLLUP (i_item_id, s_state)
ORDER BY i_item_id NULLS FIRST, s_state NULLS FIRST
LIMIT 100
""")

tpcds_query("tpcds_q28", """
SELECT *
FROM (SELECT CAST(SUM(CAST(ss_list_price AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(ss_list_price) AS b1_lp,
             COUNT(ss_list_price) AS b1_cnt,
             COUNT(DISTINCT ss_list_price) AS b1_cntd
      FROM store_sales
      WHERE ss_quantity BETWEEN 0 AND 5
        AND (ss_list_price BETWEEN 8 AND 8 + 10
             OR ss_coupon_amt BETWEEN 459 AND 459 + 1000
             OR ss_wholesale_cost BETWEEN 57 AND 57 + 20)) b1,
     (SELECT CAST(SUM(CAST(ss_list_price AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(ss_list_price) AS b2_lp,
             COUNT(ss_list_price) AS b2_cnt,
             COUNT(DISTINCT ss_list_price) AS b2_cntd
      FROM store_sales
      WHERE ss_quantity BETWEEN 6 AND 10
        AND (ss_list_price BETWEEN 90 AND 90 + 10
             OR ss_coupon_amt BETWEEN 2323 AND 2323 + 1000
             OR ss_wholesale_cost BETWEEN 31 AND 31 + 20)) b2,
     (SELECT CAST(SUM(CAST(ss_list_price AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(ss_list_price) AS b3_lp,
             COUNT(ss_list_price) AS b3_cnt,
             COUNT(DISTINCT ss_list_price) AS b3_cntd
      FROM store_sales
      WHERE ss_quantity BETWEEN 11 AND 15
        AND (ss_list_price BETWEEN 142 AND 142 + 10
             OR ss_coupon_amt BETWEEN 12214 AND 12214 + 1000
             OR ss_wholesale_cost BETWEEN 79 AND 79 + 20)) b3,
     (SELECT CAST(SUM(CAST(ss_list_price AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(ss_list_price) AS b4_lp,
             COUNT(ss_list_price) AS b4_cnt,
             COUNT(DISTINCT ss_list_price) AS b4_cntd
      FROM store_sales
      WHERE ss_quantity BETWEEN 16 AND 20
        AND (ss_list_price BETWEEN 135 AND 135 + 10
             OR ss_coupon_amt BETWEEN 6071 AND 6071 + 1000
             OR ss_wholesale_cost BETWEEN 38 AND 38 + 20)) b4,
     (SELECT CAST(SUM(CAST(ss_list_price AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(ss_list_price) AS b5_lp,
             COUNT(ss_list_price) AS b5_cnt,
             COUNT(DISTINCT ss_list_price) AS b5_cntd
      FROM store_sales
      WHERE ss_quantity BETWEEN 21 AND 25
        AND (ss_list_price BETWEEN 122 AND 122 + 10
             OR ss_coupon_amt BETWEEN 836 AND 836 + 1000
             OR ss_wholesale_cost BETWEEN 17 AND 17 + 20)) b5,
     (SELECT CAST(SUM(CAST(ss_list_price AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(ss_list_price) AS b6_lp,
             COUNT(ss_list_price) AS b6_cnt,
             COUNT(DISTINCT ss_list_price) AS b6_cntd
      FROM store_sales
      WHERE ss_quantity BETWEEN 26 AND 30
        AND (ss_list_price BETWEEN 154 AND 154 + 10
             OR ss_coupon_amt BETWEEN 7326 AND 7326 + 1000
             OR ss_wholesale_cost BETWEEN 7 AND 7 + 20)) b6
LIMIT 100
""")

tpcds_query("tpcds_q36", """
SELECT CAST(SUM(ss_net_profit) AS DOUBLE)
         / CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS gross_margin,
       i_category, i_class,
       CAST(GROUPING(i_category) + GROUPING(i_class) AS INT) AS lochierarchy,
       RANK() OVER (
         PARTITION BY GROUPING(i_category) + GROUPING(i_class),
                      CASE WHEN GROUPING(i_class) = 0 THEN i_category END
         ORDER BY CAST(SUM(ss_net_profit) AS DOUBLE)
                    / CAST(SUM(ss_ext_sales_price) AS DOUBLE) ASC,
                  i_class NULLS FIRST
       ) AS rank_within_parent
FROM store_sales, date_dim d1, item, store
WHERE d1.d_year = 2001
  AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk
  AND s_store_sk = ss_store_sk
  AND s_state IN ('TN', 'SD', 'TX', 'GA', 'OH', 'IL')
GROUP BY ROLLUP (i_category, i_class)
ORDER BY lochierarchy DESC,
         CASE WHEN lochierarchy = 0 THEN i_category END NULLS FIRST,
         rank_within_parent,
         i_category NULLS FIRST, i_class NULLS FIRST
LIMIT 100
""")

tpcds_query("tpcds_q46", """
SELECT c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number,
       amt, profit
FROM (SELECT ss_ticket_number, ss_customer_sk, ca_city AS bought_city,
             CAST(SUM(ss_coupon_amt) AS DOUBLE) AS amt,
             CAST(SUM(ss_net_profit) AS DOUBLE) AS profit
      FROM store_sales, date_dim, store, household_demographics,
           customer_address
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND store_sales.ss_addr_sk = customer_address.ca_address_sk
        AND (household_demographics.hd_dep_count = 4
             OR household_demographics.hd_vehicle_count = 3)
        AND date_dim.d_dow IN (6, 0)
        AND date_dim.d_year IN (1999, 2000, 2001)
        AND store.s_city IN ('Fairview', 'Midway')
      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
     customer, customer_address current_addr
WHERE ss_customer_sk = c_customer_sk
  AND customer.c_current_addr_sk = current_addr.ca_address_sk
  AND current_addr.ca_city <> bought_city
ORDER BY c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number
LIMIT 100
""")

tpcds_query("tpcds_q48", """
SELECT SUM(ss_quantity) AS total_quantity
FROM store_sales, store, customer_demographics, customer_address, date_dim
WHERE s_store_sk = ss_store_sk
  AND ss_sold_date_sk = d_date_sk AND d_year = 2000
  AND ((cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'M'
        AND cd_education_status = '4 yr Degree'
        AND ss_sales_price BETWEEN 100.00 AND 150.00)
    OR (cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'D'
        AND cd_education_status = '2 yr Degree'
        AND ss_sales_price BETWEEN 50.00 AND 100.00)
    OR (cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'S'
        AND cd_education_status = 'College'
        AND ss_sales_price BETWEEN 150.00 AND 200.00))
  AND ((ss_addr_sk = ca_address_sk
        AND ca_country = 'United States'
        AND ca_state IN ('TN', 'OH', 'TX')
        AND ss_net_profit BETWEEN 0 AND 2000)
    OR (ss_addr_sk = ca_address_sk
        AND ca_country = 'United States'
        AND ca_state IN ('SD', 'GA', 'IL')
        AND ss_net_profit BETWEEN 150 AND 3000)
    OR (ss_addr_sk = ca_address_sk
        AND ca_country = 'United States'
        AND ca_state IN ('TX', 'GA', 'IL')
        AND ss_net_profit BETWEEN 50 AND 25000))
""")

tpcds_query("tpcds_q50", """
SELECT s_store_name, s_store_id, s_city, s_state, s_zip,
       SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk <= 30)
                THEN 1 ELSE 0 END) AS d30,
       SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 30)
                 AND (sr_returned_date_sk - ss_sold_date_sk <= 60)
                THEN 1 ELSE 0 END) AS d31_60,
       SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 60)
                 AND (sr_returned_date_sk - ss_sold_date_sk <= 90)
                THEN 1 ELSE 0 END) AS d61_90,
       SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 90)
                 AND (sr_returned_date_sk - ss_sold_date_sk <= 120)
                THEN 1 ELSE 0 END) AS d91_120,
       SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 120)
                THEN 1 ELSE 0 END) AS d_gt_120
FROM store_sales, store_returns, store, date_dim d1, date_dim d2
WHERE d2.d_year = 2001
  AND d2.d_moy = 8
  AND ss_ticket_number = sr_ticket_number
  AND ss_item_sk = sr_item_sk
  AND ss_customer_sk = sr_customer_sk
  AND ss_sold_date_sk = d1.d_date_sk
  AND sr_returned_date_sk = d2.d_date_sk
  AND ss_store_sk = s_store_sk
GROUP BY s_store_name, s_store_id, s_city, s_state, s_zip
ORDER BY s_store_name, s_store_id, s_city, s_state, s_zip
LIMIT 100
""")

tpcds_query("tpcds_q9", """
SELECT CASE WHEN (SELECT COUNT(*) FROM store_sales
                  WHERE ss_quantity BETWEEN 1 AND 20) > 25000
            THEN (SELECT CAST(SUM(CAST(ss_ext_discount_amt AS DECIMAL(30,6)))
                              AS DOUBLE) / COUNT(ss_ext_discount_amt)
                  FROM store_sales WHERE ss_quantity BETWEEN 1 AND 20)
            ELSE (SELECT CAST(SUM(CAST(ss_net_paid AS DECIMAL(30,6)))
                              AS DOUBLE) / COUNT(ss_net_paid)
                  FROM store_sales WHERE ss_quantity BETWEEN 1 AND 20)
       END AS bucket1,
       CASE WHEN (SELECT COUNT(*) FROM store_sales
                  WHERE ss_quantity BETWEEN 21 AND 40) > 22000
            THEN (SELECT CAST(SUM(CAST(ss_ext_discount_amt AS DECIMAL(30,6)))
                              AS DOUBLE) / COUNT(ss_ext_discount_amt)
                  FROM store_sales WHERE ss_quantity BETWEEN 21 AND 40)
            ELSE (SELECT CAST(SUM(CAST(ss_net_paid AS DECIMAL(30,6)))
                              AS DOUBLE) / COUNT(ss_net_paid)
                  FROM store_sales WHERE ss_quantity BETWEEN 21 AND 40)
       END AS bucket2,
       CASE WHEN (SELECT COUNT(*) FROM store_sales
                  WHERE ss_quantity BETWEEN 41 AND 60) > 30000
            THEN (SELECT CAST(SUM(CAST(ss_ext_discount_amt AS DECIMAL(30,6)))
                              AS DOUBLE) / COUNT(ss_ext_discount_amt)
                  FROM store_sales WHERE ss_quantity BETWEEN 41 AND 60)
            ELSE (SELECT CAST(SUM(CAST(ss_net_paid AS DECIMAL(30,6)))
                              AS DOUBLE) / COUNT(ss_net_paid)
                  FROM store_sales WHERE ss_quantity BETWEEN 41 AND 60)
       END AS bucket3,
       CASE WHEN (SELECT COUNT(*) FROM store_sales
                  WHERE ss_quantity BETWEEN 61 AND 80) > 18000
            THEN (SELECT CAST(SUM(CAST(ss_ext_discount_amt AS DECIMAL(30,6)))
                              AS DOUBLE) / COUNT(ss_ext_discount_amt)
                  FROM store_sales WHERE ss_quantity BETWEEN 61 AND 80)
            ELSE (SELECT CAST(SUM(CAST(ss_net_paid AS DECIMAL(30,6)))
                              AS DOUBLE) / COUNT(ss_net_paid)
                  FROM store_sales WHERE ss_quantity BETWEEN 61 AND 80)
       END AS bucket4,
       CASE WHEN (SELECT COUNT(*) FROM store_sales
                  WHERE ss_quantity BETWEEN 81 AND 100) > 20000
            THEN (SELECT CAST(SUM(CAST(ss_ext_discount_amt AS DECIMAL(30,6)))
                              AS DOUBLE) / COUNT(ss_ext_discount_amt)
                  FROM store_sales WHERE ss_quantity BETWEEN 81 AND 100)
            ELSE (SELECT CAST(SUM(CAST(ss_net_paid AS DECIMAL(30,6)))
                              AS DOUBLE) / COUNT(ss_net_paid)
                  FROM store_sales WHERE ss_quantity BETWEEN 81 AND 100)
       END AS bucket5
FROM reason
WHERE r_reason_sk = 1
""")

tpcds_query("tpcds_q51", """
WITH web_v1 AS (
  SELECT ws_item_sk AS item_sk, d_date,
         SUM(SUM(ws_sales_price))
           OVER (PARTITION BY ws_item_sk ORDER BY d_date
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cume_sales
  FROM web_sales, date_dim
  WHERE ws_sold_date_sk = d_date_sk
    AND d_month_seq BETWEEN 1200 AND 1211
    AND ws_item_sk IS NOT NULL
  GROUP BY ws_item_sk, d_date),
store_v1 AS (
  SELECT ss_item_sk AS item_sk, d_date,
         SUM(SUM(ss_sales_price))
           OVER (PARTITION BY ss_item_sk ORDER BY d_date
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cume_sales
  FROM store_sales, date_dim
  WHERE ss_sold_date_sk = d_date_sk
    AND d_month_seq BETWEEN 1200 AND 1211
    AND ss_item_sk IS NOT NULL
  GROUP BY ss_item_sk, d_date)
SELECT item_sk, d_date,
       CAST(web_sales AS DOUBLE) AS web_sales,
       CAST(store_sales AS DOUBLE) AS store_sales,
       CAST(web_cumulative AS DOUBLE) AS web_cumulative,
       CAST(store_cumulative AS DOUBLE) AS store_cumulative
FROM (SELECT item_sk, d_date, web_sales, store_sales,
             MAX(web_sales)
               OVER (PARTITION BY item_sk ORDER BY d_date
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS web_cumulative,
             MAX(store_sales)
               OVER (PARTITION BY item_sk ORDER BY d_date
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS store_cumulative
      FROM (SELECT CASE WHEN web.item_sk IS NOT NULL
                        THEN web.item_sk ELSE store.item_sk END AS item_sk,
                   CASE WHEN web.d_date IS NOT NULL
                        THEN web.d_date ELSE store.d_date END AS d_date,
                   web.cume_sales AS web_sales,
                   store.cume_sales AS store_sales
            FROM web_v1 web FULL OUTER JOIN store_v1 store
                 ON (web.item_sk = store.item_sk
                     AND web.d_date = store.d_date)) x) y
WHERE web_cumulative > store_cumulative
ORDER BY item_sk, d_date
LIMIT 100
""")

tpcds_query("tpcds_q59", """
WITH wss AS (
  SELECT d_week_seq, ss_store_sk,
         SUM(CASE WHEN d_day_name = 'Sunday'
                  THEN ss_sales_price ELSE NULL END) AS sun_sales,
         SUM(CASE WHEN d_day_name = 'Monday'
                  THEN ss_sales_price ELSE NULL END) AS mon_sales,
         SUM(CASE WHEN d_day_name = 'Tuesday'
                  THEN ss_sales_price ELSE NULL END) AS tue_sales,
         SUM(CASE WHEN d_day_name = 'Wednesday'
                  THEN ss_sales_price ELSE NULL END) AS wed_sales,
         SUM(CASE WHEN d_day_name = 'Thursday'
                  THEN ss_sales_price ELSE NULL END) AS thu_sales,
         SUM(CASE WHEN d_day_name = 'Friday'
                  THEN ss_sales_price ELSE NULL END) AS fri_sales,
         SUM(CASE WHEN d_day_name = 'Saturday'
                  THEN ss_sales_price ELSE NULL END) AS sat_sales
  FROM store_sales, date_dim
  WHERE d_date_sk = ss_sold_date_sk
  GROUP BY d_week_seq, ss_store_sk)
SELECT s_store_name1, s_store_id1, d_week_seq1,
       CAST(sun_sales1 AS DOUBLE) / CAST(sun_sales2 AS DOUBLE) AS sun_r,
       CAST(mon_sales1 AS DOUBLE) / CAST(mon_sales2 AS DOUBLE) AS mon_r,
       CAST(tue_sales1 AS DOUBLE) / CAST(tue_sales2 AS DOUBLE) AS tue_r,
       CAST(wed_sales1 AS DOUBLE) / CAST(wed_sales2 AS DOUBLE) AS wed_r,
       CAST(thu_sales1 AS DOUBLE) / CAST(thu_sales2 AS DOUBLE) AS thu_r,
       CAST(fri_sales1 AS DOUBLE) / CAST(fri_sales2 AS DOUBLE) AS fri_r,
       CAST(sat_sales1 AS DOUBLE) / CAST(sat_sales2 AS DOUBLE) AS sat_r
FROM (SELECT s_store_name AS s_store_name1, wss.d_week_seq AS d_week_seq1,
             s_store_id AS s_store_id1, sun_sales AS sun_sales1,
             mon_sales AS mon_sales1, tue_sales AS tue_sales1,
             wed_sales AS wed_sales1, thu_sales AS thu_sales1,
             fri_sales AS fri_sales1, sat_sales AS sat_sales1
      FROM wss, store, date_dim d
      WHERE d.d_week_seq = wss.d_week_seq
        AND ss_store_sk = s_store_sk
        AND d_month_seq BETWEEN 1200 AND 1211) y,
     (SELECT s_store_name AS s_store_name2, wss.d_week_seq AS d_week_seq2,
             s_store_id AS s_store_id2, sun_sales AS sun_sales2,
             mon_sales AS mon_sales2, tue_sales AS tue_sales2,
             wed_sales AS wed_sales2, thu_sales AS thu_sales2,
             fri_sales AS fri_sales2, sat_sales AS sat_sales2
      FROM wss, store, date_dim d
      WHERE d.d_week_seq = wss.d_week_seq
        AND ss_store_sk = s_store_sk
        AND d_month_seq BETWEEN 1212 AND 1223) x
WHERE s_store_id1 = s_store_id2
  AND d_week_seq1 = d_week_seq2 - 52
ORDER BY s_store_name1, s_store_id1, d_week_seq1
LIMIT 100
""")

tpcds_query("tpcds_q62", """
SELECT substr(w_warehouse_name, 1, 20) AS wh, sm_type, web_name,
       SUM(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk <= 30)
                THEN 1 ELSE 0 END) AS d30,
       SUM(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 30)
                 AND (ws_ship_date_sk - ws_sold_date_sk <= 60)
                THEN 1 ELSE 0 END) AS d31_60,
       SUM(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 60)
                 AND (ws_ship_date_sk - ws_sold_date_sk <= 90)
                THEN 1 ELSE 0 END) AS d61_90,
       SUM(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 90)
                 AND (ws_ship_date_sk - ws_sold_date_sk <= 120)
                THEN 1 ELSE 0 END) AS d91_120,
       SUM(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 120)
                THEN 1 ELSE 0 END) AS d_gt_120
FROM web_sales, warehouse, ship_mode, web_site, date_dim
WHERE d_month_seq BETWEEN 1200 AND 1211
  AND ws_ship_date_sk = d_date_sk
  AND ws_warehouse_sk = w_warehouse_sk
  AND ws_ship_mode_sk = sm_ship_mode_sk
  AND ws_web_site_sk = web_site_sk
GROUP BY substr(w_warehouse_name, 1, 20), sm_type, web_name
ORDER BY wh NULLS FIRST, sm_type, web_name
LIMIT 100
""")

tpcds_query("tpcds_q65", """
SELECT s_store_name, i_item_desc, sc.revenue, i_current_price,
       i_wholesale_cost, i_brand
FROM store, item,
     (SELECT ss_store_sk,
             CAST(SUM(CAST(revenue AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(revenue) AS ave
      FROM (SELECT ss_store_sk, ss_item_sk,
                   CAST(SUM(ss_sales_price) AS DOUBLE) AS revenue
            FROM store_sales, date_dim
            WHERE ss_sold_date_sk = d_date_sk
              AND d_month_seq BETWEEN 1200 AND 1211
            GROUP BY ss_store_sk, ss_item_sk) sa
      GROUP BY ss_store_sk) sb,
     (SELECT ss_store_sk, ss_item_sk,
             CAST(SUM(ss_sales_price) AS DOUBLE) AS revenue
      FROM store_sales, date_dim
      WHERE ss_sold_date_sk = d_date_sk
        AND d_month_seq BETWEEN 1200 AND 1211
      GROUP BY ss_store_sk, ss_item_sk) sc
WHERE sb.ss_store_sk = sc.ss_store_sk
  AND sc.revenue <= 0.1 * sb.ave
  AND s_store_sk = sc.ss_store_sk
  AND i_item_sk = sc.ss_item_sk
ORDER BY s_store_name, i_item_desc, s_store_id
LIMIT 100
""")

tpcds_query("tpcds_q68", """
SELECT c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number,
       extended_price, extended_tax, list_price
FROM (SELECT ss_ticket_number, ss_customer_sk, ca_city AS bought_city,
             CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS extended_price,
             CAST(SUM(ss_ext_list_price) AS DOUBLE) AS list_price,
             CAST(SUM(ss_ext_tax) AS DOUBLE) AS extended_tax
      FROM store_sales, date_dim, store, household_demographics,
           customer_address
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND store_sales.ss_addr_sk = customer_address.ca_address_sk
        AND date_dim.d_dom BETWEEN 1 AND 2
        AND (household_demographics.hd_dep_count = 4
             OR household_demographics.hd_vehicle_count = 3)
        AND date_dim.d_year IN (1999, 2000, 2001)
        AND store.s_city IN ('Midway', 'Fairview')
      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
     customer, customer_address current_addr
WHERE ss_customer_sk = c_customer_sk
  AND customer.c_current_addr_sk = current_addr.ca_address_sk
  AND current_addr.ca_city <> bought_city
ORDER BY c_last_name, ss_ticket_number
LIMIT 100
""")

tpcds_query("tpcds_q73", """
SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
       ss_ticket_number, cnt
FROM (SELECT ss_ticket_number, ss_customer_sk, COUNT(*) AS cnt
      FROM store_sales, date_dim, store, household_demographics
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND date_dim.d_dom BETWEEN 1 AND 2
        AND (household_demographics.hd_buy_potential = '>10000'
             OR household_demographics.hd_buy_potential = 'Unknown')
        AND household_demographics.hd_vehicle_count > 0
        AND CASE WHEN household_demographics.hd_vehicle_count > 0
                 THEN CAST(household_demographics.hd_dep_count AS DOUBLE)
                      / household_demographics.hd_vehicle_count
                 ELSE NULL END > 1
        AND date_dim.d_year IN (1999, 2000, 2001)
        AND store.s_county IN ('Williamson County', 'Ziebach County',
                               'Walker County', 'Barrow County')
      GROUP BY ss_ticket_number, ss_customer_sk) dj, customer
WHERE ss_customer_sk = c_customer_sk
  AND cnt BETWEEN 1 AND 5
ORDER BY cnt DESC, c_last_name ASC, ss_ticket_number
""")

tpcds_query("tpcds_q79", """
SELECT c_last_name, c_first_name,
       substr(s_city, 1, 30) AS city30, ss_ticket_number, amt, profit
FROM (SELECT ss_ticket_number, ss_customer_sk, store.s_city,
             CAST(SUM(ss_coupon_amt) AS DOUBLE) AS amt,
             CAST(SUM(ss_net_profit) AS DOUBLE) AS profit
      FROM store_sales, date_dim, store, household_demographics
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND (household_demographics.hd_dep_count = 6
             OR household_demographics.hd_vehicle_count > 2)
        AND date_dim.d_dow = 1
        AND date_dim.d_year IN (1999, 2000, 2001)
        AND store.s_number_employees BETWEEN 200 AND 295
      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk,
               store.s_city) ms, customer
WHERE ss_customer_sk = c_customer_sk
ORDER BY c_last_name, c_first_name, city30, profit, ss_ticket_number
LIMIT 100
""")

tpcds_query("tpcds_q82", """
SELECT i_item_id, i_item_desc, i_current_price
FROM item, inventory, date_dim, store_sales
WHERE i_current_price BETWEEN 62 AND 62 + 30
  AND inv_item_sk = i_item_sk
  AND d_date_sk = inv_date_sk
  AND d_date BETWEEN DATE '2000-05-25' AND DATE '2000-07-24'
  AND i_manufact_id BETWEEN 100 AND 400
  AND inv_quantity_on_hand BETWEEN 100 AND 500
  AND ss_item_sk = i_item_sk
GROUP BY i_item_id, i_item_desc, i_current_price
ORDER BY i_item_id
LIMIT 100
""")

tpcds_query("tpcds_q86", """
SELECT CAST(SUM(ws_net_paid) AS DOUBLE) AS total_sum,
       i_category, i_class,
       CAST(GROUPING(i_category) + GROUPING(i_class) AS INT) AS lochierarchy,
       RANK() OVER (
         PARTITION BY GROUPING(i_category) + GROUPING(i_class),
                      CASE WHEN GROUPING(i_class) = 0 THEN i_category END
         ORDER BY CAST(SUM(ws_net_paid) AS DOUBLE) DESC,
                  i_class NULLS FIRST
       ) AS rank_within_parent
FROM web_sales, date_dim d1, item
WHERE d1.d_month_seq BETWEEN 1200 AND 1211
  AND d1.d_date_sk = ws_sold_date_sk
  AND i_item_sk = ws_item_sk
GROUP BY ROLLUP (i_category, i_class)
ORDER BY lochierarchy DESC,
         CASE WHEN lochierarchy = 0 THEN i_category END NULLS FIRST,
         rank_within_parent,
         i_category NULLS FIRST, i_class NULLS FIRST
LIMIT 100
""")

tpcds_query("tpcds_q88", """
SELECT *
FROM (SELECT COUNT(*) AS h8_30_to_9
      FROM store_sales, household_demographics, time_dim, store
      WHERE ss_sold_time_sk = time_dim.t_time_sk
        AND ss_hdemo_sk = household_demographics.hd_demo_sk
        AND ss_store_sk = s_store_sk
        AND time_dim.t_hour = 8 AND time_dim.t_minute >= 30
        AND ((household_demographics.hd_dep_count = 4
              AND household_demographics.hd_vehicle_count <= 4 + 2)
          OR (household_demographics.hd_dep_count = 2
              AND household_demographics.hd_vehicle_count <= 2 + 2)
          OR (household_demographics.hd_dep_count = 0
              AND household_demographics.hd_vehicle_count <= 0 + 2))
        AND store.s_store_name = 'ese') s1,
     (SELECT COUNT(*) AS h9_to_9_30
      FROM store_sales, household_demographics, time_dim, store
      WHERE ss_sold_time_sk = time_dim.t_time_sk
        AND ss_hdemo_sk = household_demographics.hd_demo_sk
        AND ss_store_sk = s_store_sk
        AND time_dim.t_hour = 9 AND time_dim.t_minute < 30
        AND ((household_demographics.hd_dep_count = 4
              AND household_demographics.hd_vehicle_count <= 4 + 2)
          OR (household_demographics.hd_dep_count = 2
              AND household_demographics.hd_vehicle_count <= 2 + 2)
          OR (household_demographics.hd_dep_count = 0
              AND household_demographics.hd_vehicle_count <= 0 + 2))
        AND store.s_store_name = 'ese') s2,
     (SELECT COUNT(*) AS h9_30_to_10
      FROM store_sales, household_demographics, time_dim, store
      WHERE ss_sold_time_sk = time_dim.t_time_sk
        AND ss_hdemo_sk = household_demographics.hd_demo_sk
        AND ss_store_sk = s_store_sk
        AND time_dim.t_hour = 9 AND time_dim.t_minute >= 30
        AND ((household_demographics.hd_dep_count = 4
              AND household_demographics.hd_vehicle_count <= 4 + 2)
          OR (household_demographics.hd_dep_count = 2
              AND household_demographics.hd_vehicle_count <= 2 + 2)
          OR (household_demographics.hd_dep_count = 0
              AND household_demographics.hd_vehicle_count <= 0 + 2))
        AND store.s_store_name = 'ese') s3,
     (SELECT COUNT(*) AS h10_to_10_30
      FROM store_sales, household_demographics, time_dim, store
      WHERE ss_sold_time_sk = time_dim.t_time_sk
        AND ss_hdemo_sk = household_demographics.hd_demo_sk
        AND ss_store_sk = s_store_sk
        AND time_dim.t_hour = 10 AND time_dim.t_minute < 30
        AND ((household_demographics.hd_dep_count = 4
              AND household_demographics.hd_vehicle_count <= 4 + 2)
          OR (household_demographics.hd_dep_count = 2
              AND household_demographics.hd_vehicle_count <= 2 + 2)
          OR (household_demographics.hd_dep_count = 0
              AND household_demographics.hd_vehicle_count <= 0 + 2))
        AND store.s_store_name = 'ese') s4,
     (SELECT COUNT(*) AS h10_30_to_11
      FROM store_sales, household_demographics, time_dim, store
      WHERE ss_sold_time_sk = time_dim.t_time_sk
        AND ss_hdemo_sk = household_demographics.hd_demo_sk
        AND ss_store_sk = s_store_sk
        AND time_dim.t_hour = 10 AND time_dim.t_minute >= 30
        AND ((household_demographics.hd_dep_count = 4
              AND household_demographics.hd_vehicle_count <= 4 + 2)
          OR (household_demographics.hd_dep_count = 2
              AND household_demographics.hd_vehicle_count <= 2 + 2)
          OR (household_demographics.hd_dep_count = 0
              AND household_demographics.hd_vehicle_count <= 0 + 2))
        AND store.s_store_name = 'ese') s5,
     (SELECT COUNT(*) AS h11_to_11_30
      FROM store_sales, household_demographics, time_dim, store
      WHERE ss_sold_time_sk = time_dim.t_time_sk
        AND ss_hdemo_sk = household_demographics.hd_demo_sk
        AND ss_store_sk = s_store_sk
        AND time_dim.t_hour = 11 AND time_dim.t_minute < 30
        AND ((household_demographics.hd_dep_count = 4
              AND household_demographics.hd_vehicle_count <= 4 + 2)
          OR (household_demographics.hd_dep_count = 2
              AND household_demographics.hd_vehicle_count <= 2 + 2)
          OR (household_demographics.hd_dep_count = 0
              AND household_demographics.hd_vehicle_count <= 0 + 2))
        AND store.s_store_name = 'ese') s6,
     (SELECT COUNT(*) AS h11_30_to_12
      FROM store_sales, household_demographics, time_dim, store
      WHERE ss_sold_time_sk = time_dim.t_time_sk
        AND ss_hdemo_sk = household_demographics.hd_demo_sk
        AND ss_store_sk = s_store_sk
        AND time_dim.t_hour = 11 AND time_dim.t_minute >= 30
        AND ((household_demographics.hd_dep_count = 4
              AND household_demographics.hd_vehicle_count <= 4 + 2)
          OR (household_demographics.hd_dep_count = 2
              AND household_demographics.hd_vehicle_count <= 2 + 2)
          OR (household_demographics.hd_dep_count = 0
              AND household_demographics.hd_vehicle_count <= 0 + 2))
        AND store.s_store_name = 'ese') s7,
     (SELECT COUNT(*) AS h12_to_12_30
      FROM store_sales, household_demographics, time_dim, store
      WHERE ss_sold_time_sk = time_dim.t_time_sk
        AND ss_hdemo_sk = household_demographics.hd_demo_sk
        AND ss_store_sk = s_store_sk
        AND time_dim.t_hour = 12 AND time_dim.t_minute < 30
        AND ((household_demographics.hd_dep_count = 4
              AND household_demographics.hd_vehicle_count <= 4 + 2)
          OR (household_demographics.hd_dep_count = 2
              AND household_demographics.hd_vehicle_count <= 2 + 2)
          OR (household_demographics.hd_dep_count = 0
              AND household_demographics.hd_vehicle_count <= 0 + 2))
        AND store.s_store_name = 'ese') s8
""")

tpcds_query("tpcds_q97", """
WITH ssci AS (
  SELECT ss_customer_sk AS customer_sk, ss_item_sk AS item_sk
  FROM store_sales, date_dim
  WHERE ss_sold_date_sk = d_date_sk
    AND d_month_seq BETWEEN 1200 AND 1211
  GROUP BY ss_customer_sk, ss_item_sk),
csci AS (
  SELECT cs_bill_customer_sk AS customer_sk, cs_item_sk AS item_sk
  FROM catalog_sales, date_dim
  WHERE cs_sold_date_sk = d_date_sk
    AND d_month_seq BETWEEN 1200 AND 1211
  GROUP BY cs_bill_customer_sk, cs_item_sk)
SELECT SUM(CASE WHEN ssci.customer_sk IS NOT NULL
                 AND csci.customer_sk IS NULL THEN 1 ELSE 0 END)
         AS store_only,
       SUM(CASE WHEN ssci.customer_sk IS NULL
                 AND csci.customer_sk IS NOT NULL THEN 1 ELSE 0 END)
         AS catalog_only,
       SUM(CASE WHEN ssci.customer_sk IS NOT NULL
                 AND csci.customer_sk IS NOT NULL THEN 1 ELSE 0 END)
         AS store_and_catalog
FROM ssci FULL OUTER JOIN csci
     ON (ssci.customer_sk = csci.customer_sk
         AND ssci.item_sk = csci.item_sk)
LIMIT 100
""")

tpcds_query("tpcds_q6", """
SELECT a.ca_state AS state, COUNT(*) AS cnt
FROM customer_address a, customer c, store_sales s, date_dim d, item i
WHERE a.ca_address_sk = c.c_current_addr_sk
  AND c.c_customer_sk = s.ss_customer_sk
  AND s.ss_sold_date_sk = d.d_date_sk
  AND s.ss_item_sk = i.i_item_sk
  AND d.d_month_seq = (SELECT DISTINCT d_month_seq FROM date_dim
                       WHERE d_year = 2001 AND d_moy = 1)
  AND CAST(i.i_current_price AS DOUBLE) >
      1.2 * (SELECT CAST(SUM(CAST(j.i_current_price AS DECIMAL(30,6)))
                         AS DOUBLE) / COUNT(j.i_current_price)
             FROM item j WHERE j.i_category = i.i_category)
GROUP BY a.ca_state
HAVING COUNT(*) >= 10
ORDER BY cnt, state
LIMIT 100
""")

tpcds_query("tpcds_q29", """
SELECT i_item_id, i_item_desc, s_store_id, s_store_name,
       SUM(ss_quantity) AS store_sales_quantity,
       SUM(sr_return_quantity) AS store_returns_quantity,
       SUM(cs_quantity) AS catalog_sales_quantity
FROM store_sales, store_returns, catalog_sales,
     date_dim d1, date_dim d2, date_dim d3, store, item
WHERE d1.d_moy BETWEEN 4 AND 10
  AND d1.d_year = 2001
  AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk
  AND s_store_sk = ss_store_sk
  AND ss_customer_sk = sr_customer_sk
  AND ss_item_sk = sr_item_sk
  AND ss_ticket_number = sr_ticket_number
  AND sr_returned_date_sk = d2.d_date_sk
  AND d2.d_year IN (2001, 2002)
  AND sr_customer_sk = cs_bill_customer_sk
  AND sr_item_sk = cs_item_sk
  AND cs_sold_date_sk = d3.d_date_sk
  AND d3.d_year IN (2001, 2002)
GROUP BY i_item_id, i_item_desc, s_store_id, s_store_name
ORDER BY i_item_id, i_item_desc, s_store_id, s_store_name
LIMIT 100
""")

tpcds_query("tpcds_q33", """
WITH ss AS (
  SELECT i_manufact_id, SUM(ss_ext_sales_price) AS total_sales
  FROM store_sales, date_dim, customer_address, item
  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item
                          WHERE i_category = 'Books')
    AND ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 3
    AND ss_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_manufact_id),
cs AS (
  SELECT i_manufact_id, SUM(cs_ext_sales_price) AS total_sales
  FROM catalog_sales, date_dim, customer_address, item
  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item
                          WHERE i_category = 'Books')
    AND cs_item_sk = i_item_sk
    AND cs_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 3
    AND cs_bill_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_manufact_id),
ws AS (
  SELECT i_manufact_id, SUM(ws_ext_sales_price) AS total_sales
  FROM web_sales, date_dim, customer_address, item
  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item
                          WHERE i_category = 'Books')
    AND ws_item_sk = i_item_sk
    AND ws_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 3
    AND ws_bill_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_manufact_id)
SELECT i_manufact_id, CAST(SUM(total_sales) AS DOUBLE) AS total_sales
FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs
      UNION ALL SELECT * FROM ws) tmp1
GROUP BY i_manufact_id
ORDER BY total_sales, i_manufact_id
LIMIT 100
""")

tpcds_query("tpcds_q45", """
SELECT ca_zip, ca_city, CAST(SUM(ws_sales_price) AS DOUBLE) AS sum_sales
FROM web_sales, customer, customer_address, date_dim, item
WHERE ws_bill_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND ws_item_sk = i_item_sk
  AND (substr(ca_zip, 1, 5) IN ('10042', '10113', '10157', '10200',
                                '10244', '10288', '10317', '10362', '10399')
       OR i_item_id IN (SELECT i_item_id FROM item
                        WHERE i_item_sk IN (2, 3, 5, 7, 11, 13, 17, 19, 23, 29)))
  AND ws_sold_date_sk = d_date_sk
  AND d_qoy = 2 AND d_year = 2001
GROUP BY ca_zip, ca_city
ORDER BY ca_zip, ca_city
LIMIT 100
""")

tpcds_query("tpcds_q47", """
WITH v1 AS (
  SELECT i_category, i_brand, s_store_name, d_year, d_moy,
         SUM(ss_sales_price) AS sum_sales,
         CAST(SUM(SUM(ss_sales_price))
              OVER (PARTITION BY i_category, i_brand, s_store_name, d_year)
              AS DOUBLE)
           / COUNT(SUM(ss_sales_price))
              OVER (PARTITION BY i_category, i_brand, s_store_name, d_year)
           AS avg_monthly_sales,
         RANK() OVER (PARTITION BY i_category, i_brand, s_store_name
                      ORDER BY d_year, d_moy) AS rn
  FROM item, store_sales, date_dim, store
  WHERE ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND ss_store_sk = s_store_sk
    AND (d_year = 2000
         OR (d_year = 1999 AND d_moy = 12)
         OR (d_year = 2001 AND d_moy = 1))
  GROUP BY i_category, i_brand, s_store_name, d_year, d_moy),
v2 AS (
  SELECT v1.i_category, v1.i_brand, v1.s_store_name, v1.d_year, v1.d_moy,
         v1.avg_monthly_sales, v1.sum_sales,
         v1_lag.sum_sales AS psum, v1_lead.sum_sales AS nsum
  FROM v1, v1 v1_lag, v1 v1_lead
  WHERE v1.i_category = v1_lag.i_category
    AND v1.i_category = v1_lead.i_category
    AND v1.i_brand = v1_lag.i_brand
    AND v1.i_brand = v1_lead.i_brand
    AND v1.s_store_name = v1_lag.s_store_name
    AND v1.s_store_name = v1_lead.s_store_name
    AND v1.rn = v1_lag.rn + 1
    AND v1.rn = v1_lead.rn - 1)
SELECT i_category, i_brand, s_store_name, d_year, d_moy,
       avg_monthly_sales,
       CAST(sum_sales AS DOUBLE) AS sum_sales,
       CAST(psum AS DOUBLE) AS psum, CAST(nsum AS DOUBLE) AS nsum
FROM v2
WHERE d_year = 2000
  AND avg_monthly_sales > 0
  AND ABS(CAST(sum_sales AS DOUBLE) - avg_monthly_sales)
        / avg_monthly_sales > 0.1
ORDER BY CAST(sum_sales AS DOUBLE) - avg_monthly_sales,
         i_category, i_brand, s_store_name, d_year, d_moy
LIMIT 100
""")

tpcds_query("tpcds_q61", """
SELECT CAST(promotions AS DOUBLE) AS promotions,
       CAST(total AS DOUBLE) AS total,
       CAST(promotions AS DOUBLE) / CAST(total AS DOUBLE) * 100 AS pct
FROM (SELECT SUM(ss_ext_sales_price) AS promotions
      FROM store_sales, store, promotion, date_dim, customer,
           customer_address, item
      WHERE ss_sold_date_sk = d_date_sk
        AND ss_store_sk = s_store_sk
        AND ss_promo_sk = p_promo_sk
        AND ss_customer_sk = c_customer_sk
        AND ca_address_sk = c_current_addr_sk
        AND ss_item_sk = i_item_sk
        AND ca_gmt_offset = -5
        AND i_category = 'Jewelry'
        AND (p_channel_dmail = 'Y' OR p_channel_email = 'Y'
             OR p_channel_tv = 'Y')
        AND s_gmt_offset = -5
        AND d_year = 1998 AND d_moy = 11) promotional_sales,
     (SELECT SUM(ss_ext_sales_price) AS total
      FROM store_sales, store, date_dim, customer, customer_address, item
      WHERE ss_sold_date_sk = d_date_sk
        AND ss_store_sk = s_store_sk
        AND ss_customer_sk = c_customer_sk
        AND ca_address_sk = c_current_addr_sk
        AND ss_item_sk = i_item_sk
        AND ca_gmt_offset = -5
        AND i_category = 'Jewelry'
        AND s_gmt_offset = -5
        AND d_year = 1998 AND d_moy = 11) all_sales
ORDER BY promotions, total
LIMIT 100
""")

tpcds_query("tpcds_q93", """
SELECT ss_customer_sk, CAST(SUM(act_sales) AS DOUBLE) AS sumsales
FROM (SELECT ss_item_sk, ss_ticket_number, ss_customer_sk,
             CASE WHEN sr_return_quantity IS NOT NULL
                  THEN (ss_quantity - sr_return_quantity) * ss_sales_price
                  ELSE ss_quantity * ss_sales_price END AS act_sales
      FROM store_sales
           LEFT OUTER JOIN store_returns
             ON (sr_item_sk = ss_item_sk
                 AND sr_ticket_number = ss_ticket_number),
           reason
      WHERE sr_reason_sk = r_reason_sk
        AND r_reason_desc = 'reason 28') t
GROUP BY ss_customer_sk
ORDER BY sumsales, ss_customer_sk NULLS FIRST
LIMIT 100
""")

tpcds_query("tpcds_q1", """
WITH customer_total_return AS (
  SELECT sr_customer_sk AS ctr_customer_sk, sr_store_sk AS ctr_store_sk,
         CAST(SUM(sr_return_amt) AS DOUBLE) AS ctr_total_return
  FROM store_returns, date_dim
  WHERE sr_returned_date_sk = d_date_sk AND d_year = 2000
  GROUP BY sr_customer_sk, sr_store_sk)
SELECT c_customer_id
FROM customer_total_return ctr1, store, customer
WHERE ctr1.ctr_total_return >
      (SELECT CAST(SUM(CAST(ctr2.ctr_total_return AS DECIMAL(30,6)))
                   AS DOUBLE) / COUNT(ctr2.ctr_total_return) * 1.2
       FROM customer_total_return ctr2
       WHERE ctr1.ctr_store_sk = ctr2.ctr_store_sk)
  AND s_store_sk = ctr1.ctr_store_sk
  AND s_state = 'TN'
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY c_customer_id
LIMIT 100
""")

tpcds_query("tpcds_q2", """
WITH wscs AS (
  SELECT sold_date_sk, sales_price
  FROM (SELECT ws_sold_date_sk AS sold_date_sk,
               ws_ext_sales_price AS sales_price FROM web_sales
        UNION ALL
        SELECT cs_sold_date_sk, cs_ext_sales_price FROM catalog_sales) t),
wswscs AS (
  SELECT d_week_seq,
         SUM(CASE WHEN d_day_name = 'Sunday'
                  THEN sales_price ELSE NULL END) AS sun_sales,
         SUM(CASE WHEN d_day_name = 'Monday'
                  THEN sales_price ELSE NULL END) AS mon_sales,
         SUM(CASE WHEN d_day_name = 'Tuesday'
                  THEN sales_price ELSE NULL END) AS tue_sales,
         SUM(CASE WHEN d_day_name = 'Wednesday'
                  THEN sales_price ELSE NULL END) AS wed_sales,
         SUM(CASE WHEN d_day_name = 'Thursday'
                  THEN sales_price ELSE NULL END) AS thu_sales,
         SUM(CASE WHEN d_day_name = 'Friday'
                  THEN sales_price ELSE NULL END) AS fri_sales,
         SUM(CASE WHEN d_day_name = 'Saturday'
                  THEN sales_price ELSE NULL END) AS sat_sales
  FROM wscs, date_dim
  WHERE d_date_sk = sold_date_sk
  GROUP BY d_week_seq)
SELECT d_week_seq1,
       ROUND(CAST(sun_sales1 AS DOUBLE) / CAST(sun_sales2 AS DOUBLE), 2) AS sun_r,
       ROUND(CAST(mon_sales1 AS DOUBLE) / CAST(mon_sales2 AS DOUBLE), 2) AS mon_r,
       ROUND(CAST(tue_sales1 AS DOUBLE) / CAST(tue_sales2 AS DOUBLE), 2) AS tue_r,
       ROUND(CAST(wed_sales1 AS DOUBLE) / CAST(wed_sales2 AS DOUBLE), 2) AS wed_r,
       ROUND(CAST(thu_sales1 AS DOUBLE) / CAST(thu_sales2 AS DOUBLE), 2) AS thu_r,
       ROUND(CAST(fri_sales1 AS DOUBLE) / CAST(fri_sales2 AS DOUBLE), 2) AS fri_r,
       ROUND(CAST(sat_sales1 AS DOUBLE) / CAST(sat_sales2 AS DOUBLE), 2) AS sat_r
FROM (SELECT wswscs.d_week_seq AS d_week_seq1, sun_sales AS sun_sales1,
             mon_sales AS mon_sales1, tue_sales AS tue_sales1,
             wed_sales AS wed_sales1, thu_sales AS thu_sales1,
             fri_sales AS fri_sales1, sat_sales AS sat_sales1
      FROM wswscs, date_dim
      WHERE date_dim.d_week_seq = wswscs.d_week_seq AND d_year = 2000
        AND d_dom = 1) y,
     (SELECT wswscs.d_week_seq AS d_week_seq2, sun_sales AS sun_sales2,
             mon_sales AS mon_sales2, tue_sales AS tue_sales2,
             wed_sales AS wed_sales2, thu_sales AS thu_sales2,
             fri_sales AS fri_sales2, sat_sales AS sat_sales2
      FROM wswscs, date_dim
      WHERE date_dim.d_week_seq = wswscs.d_week_seq AND d_year = 2001
        AND d_dom = 1) z
WHERE d_week_seq1 = d_week_seq2 - 53
ORDER BY d_week_seq1
""")

tpcds_query("tpcds_q8", """
SELECT s_store_name, CAST(SUM(ss_net_profit) AS DOUBLE) AS net_profit
FROM store_sales, date_dim, store,
     (SELECT ca_zip
      FROM (SELECT substr(ca_zip, 1, 5) AS ca_zip
            FROM customer_address
            WHERE substr(ca_zip, 1, 5) IN ('10042', '10113', '10157',
                                           '10200', '10244', '10288',
                                           '10317', '10362', '10399',
                                           '10441', '10483')
            INTERSECT
            SELECT ca_zip
            FROM (SELECT substr(ca_zip, 1, 5) AS ca_zip, COUNT(*) AS cnt
                  FROM customer_address, customer
                  WHERE ca_address_sk = c_current_addr_sk
                    AND c_preferred_cust_flag = 'Y'
                  GROUP BY ca_zip
                  HAVING COUNT(*) > 1) a1) a2) v1
WHERE ss_store_sk = s_store_sk
  AND ss_sold_date_sk = d_date_sk
  AND d_qoy = 2 AND d_year = 1998
  AND substr(s_zip, 1, 2) = substr(v1.ca_zip, 1, 2)
GROUP BY s_store_name
ORDER BY s_store_name
LIMIT 100
""")

tpcds_query("tpcds_q18", """
SELECT i_item_id, ca_country, ca_state, ca_county,
       CAST(SUM(CAST(cs_quantity AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(cs_quantity) AS agg1,
       CAST(SUM(CAST(cs_list_price AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(cs_list_price) AS agg2,
       CAST(SUM(CAST(cs_coupon_amt AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(cs_coupon_amt) AS agg3,
       CAST(SUM(CAST(cs_sales_price AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(cs_sales_price) AS agg4,
       CAST(SUM(CAST(cs_net_profit AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(cs_net_profit) AS agg5,
       CAST(SUM(CAST(c_birth_year AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(c_birth_year) AS agg6,
       CAST(SUM(CAST(cd1.cd_dep_count AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(cd1.cd_dep_count) AS agg7
FROM catalog_sales, customer_demographics cd1, customer_demographics cd2,
     customer, customer_address, date_dim, item
WHERE cs_sold_date_sk = d_date_sk
  AND cs_item_sk = i_item_sk
  AND cs_bill_cdemo_sk = cd1.cd_demo_sk
  AND cs_bill_customer_sk = c_customer_sk
  AND cd1.cd_gender = 'F'
  AND cd1.cd_education_status = 'Unknown'
  AND c_current_cdemo_sk = cd2.cd_demo_sk
  AND c_current_addr_sk = ca_address_sk
  AND c_birth_month IN (1, 6, 8, 9, 12, 2)
  AND d_year = 1998
  AND ca_state IN ('TN', 'SD', 'TX', 'GA', 'OH', 'IL')
GROUP BY ROLLUP (i_item_id, ca_country, ca_state, ca_county)
ORDER BY ca_country NULLS FIRST, ca_state NULLS FIRST,
         ca_county NULLS FIRST, i_item_id NULLS FIRST
LIMIT 100
""")

tpcds_query("tpcds_q20", """
SELECT i_item_id, i_item_desc, i_category, i_class, i_current_price,
       CAST(SUM(cs_ext_sales_price) AS DOUBLE) AS itemrevenue,
       CAST(SUM(cs_ext_sales_price) AS DOUBLE) * 100
         / CAST(SUM(SUM(cs_ext_sales_price))
                OVER (PARTITION BY i_class) AS DOUBLE) AS revenueratio
FROM catalog_sales, item, date_dim
WHERE cs_item_sk = i_item_sk
  AND i_category IN ('Sports', 'Books', 'Home')
  AND cs_sold_date_sk = d_date_sk
  AND d_date BETWEEN DATE '1999-02-22' AND DATE '1999-03-24'
GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio
LIMIT 100
""")

tpcds_query("tpcds_q22", """
SELECT i_product_name, i_brand, i_class, i_category,
       AVG(inv_quantity_on_hand) AS qoh
FROM inventory, date_dim, item
WHERE inv_date_sk = d_date_sk
  AND inv_item_sk = i_item_sk
  AND d_month_seq BETWEEN 1200 AND 1211
GROUP BY ROLLUP (i_product_name, i_brand, i_class, i_category)
ORDER BY qoh, i_product_name NULLS FIRST, i_brand NULLS FIRST,
         i_class NULLS FIRST, i_category NULLS FIRST
LIMIT 100
""")

tpcds_query("tpcds_q31", """
WITH ss AS (
  SELECT ca_county, d_qoy, d_year,
         SUM(ss_ext_sales_price) AS store_sales
  FROM store_sales, date_dim, customer_address
  WHERE ss_sold_date_sk = d_date_sk AND ss_addr_sk = ca_address_sk
  GROUP BY ca_county, d_qoy, d_year),
ws AS (
  SELECT ca_county, d_qoy, d_year,
         SUM(ws_ext_sales_price) AS web_sales
  FROM web_sales, date_dim, customer_address
  WHERE ws_sold_date_sk = d_date_sk AND ws_bill_addr_sk = ca_address_sk
  GROUP BY ca_county, d_qoy, d_year)
SELECT ss1.ca_county, ss1.d_year,
       CAST(ws2.web_sales AS DOUBLE) / CAST(ws1.web_sales AS DOUBLE)
         AS web_q1_q2_increase,
       CAST(ss2.store_sales AS DOUBLE) / CAST(ss1.store_sales AS DOUBLE)
         AS store_q1_q2_increase,
       CAST(ws3.web_sales AS DOUBLE) / CAST(ws2.web_sales AS DOUBLE)
         AS web_q2_q3_increase,
       CAST(ss3.store_sales AS DOUBLE) / CAST(ss2.store_sales AS DOUBLE)
         AS store_q2_q3_increase
FROM ss ss1, ss ss2, ss ss3, ws ws1, ws ws2, ws ws3
WHERE ss1.d_qoy = 1 AND ss1.d_year = 2000
  AND ss1.ca_county = ss2.ca_county
  AND ss2.d_qoy = 2 AND ss2.d_year = 2000
  AND ss2.ca_county = ss3.ca_county
  AND ss3.d_qoy = 3 AND ss3.d_year = 2000
  AND ss1.ca_county = ws1.ca_county
  AND ws1.d_qoy = 1 AND ws1.d_year = 2000
  AND ws1.ca_county = ws2.ca_county
  AND ws2.d_qoy = 2 AND ws2.d_year = 2000
  AND ws1.ca_county = ws3.ca_county
  AND ws3.d_qoy = 3 AND ws3.d_year = 2000
  AND CASE WHEN ws1.web_sales > 0
           THEN CAST(ws2.web_sales AS DOUBLE) / CAST(ws1.web_sales AS DOUBLE)
           ELSE NULL END
      > CASE WHEN ss1.store_sales > 0
             THEN CAST(ss2.store_sales AS DOUBLE)
                  / CAST(ss1.store_sales AS DOUBLE)
             ELSE NULL END
  AND CASE WHEN ws2.web_sales > 0
           THEN CAST(ws3.web_sales AS DOUBLE) / CAST(ws2.web_sales AS DOUBLE)
           ELSE NULL END
      > CASE WHEN ss2.store_sales > 0
             THEN CAST(ss3.store_sales AS DOUBLE)
                  / CAST(ss2.store_sales AS DOUBLE)
             ELSE NULL END
ORDER BY ss1.ca_county
LIMIT 100
""")

tpcds_query("tpcds_q32", """
SELECT CAST(SUM(cs_ext_discount_amt) AS DOUBLE) AS excess_discount_amount
FROM catalog_sales, item, date_dim
WHERE i_manufact_id = 77
  AND i_item_sk = cs_item_sk
  AND d_date BETWEEN DATE '2000-01-27' AND DATE '2000-04-26'
  AND d_date_sk = cs_sold_date_sk
  AND CAST(cs_ext_discount_amt AS DOUBLE) >
      (SELECT 1.3 * (CAST(SUM(CAST(cs_ext_discount_amt AS DECIMAL(30,6)))
                          AS DOUBLE) / COUNT(cs_ext_discount_amt))
       FROM catalog_sales, date_dim
       WHERE cs_item_sk = i_item_sk
         AND d_date BETWEEN DATE '2000-01-27' AND DATE '2000-04-26'
         AND d_date_sk = cs_sold_date_sk)
LIMIT 100
""")

tpcds_query("tpcds_q34", """
SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
       ss_ticket_number, cnt
FROM (SELECT ss_ticket_number, ss_customer_sk, COUNT(*) AS cnt
      FROM store_sales, date_dim, store, household_demographics
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND (date_dim.d_dom BETWEEN 1 AND 3
             OR date_dim.d_dom BETWEEN 25 AND 28)
        AND (household_demographics.hd_buy_potential = '>10000'
             OR household_demographics.hd_buy_potential = 'Unknown')
        AND household_demographics.hd_vehicle_count > 0
        AND (CASE WHEN household_demographics.hd_vehicle_count > 0
                  THEN CAST(household_demographics.hd_dep_count AS DOUBLE)
                       / household_demographics.hd_vehicle_count
                  ELSE NULL END) > 1.2
        AND date_dim.d_year IN (1999, 2000, 2001)
        AND store.s_county IN ('Williamson County', 'Ziebach County',
                               'Walker County', 'Barrow County',
                               'Franklin Parish', 'Luce County')
      GROUP BY ss_ticket_number, ss_customer_sk) dn, customer
WHERE ss_customer_sk = c_customer_sk
  AND cnt BETWEEN 2 AND 5
ORDER BY c_last_name, c_first_name, c_salutation,
         c_preferred_cust_flag DESC, ss_ticket_number
""")

tpcds_query("tpcds_q35", """
SELECT ca_state, cd_gender, cd_marital_status, cd_dep_count,
       COUNT(*) AS cnt1,
       MIN(cd_dep_count) AS min1, MAX(cd_dep_count) AS max1,
       AVG(cd_dep_count) AS avg1,
       cd_dep_employed_count,
       COUNT(*) AS cnt2,
       MIN(cd_dep_employed_count) AS min2,
       MAX(cd_dep_employed_count) AS max2,
       AVG(cd_dep_employed_count) AS avg2,
       cd_dep_college_count,
       COUNT(*) AS cnt3,
       MIN(cd_dep_college_count) AS min3,
       MAX(cd_dep_college_count) AS max3,
       AVG(cd_dep_college_count) AS avg3
FROM customer c, customer_address ca, customer_demographics
WHERE c.c_current_addr_sk = ca.ca_address_sk
  AND cd_demo_sk = c.c_current_cdemo_sk
  AND EXISTS (SELECT * FROM store_sales, date_dim
              WHERE c.c_customer_sk = ss_customer_sk
                AND ss_sold_date_sk = d_date_sk
                AND d_year = 2002 AND d_qoy < 4)
  AND (EXISTS (SELECT * FROM web_sales, date_dim
               WHERE c.c_customer_sk = ws_bill_customer_sk
                 AND ws_sold_date_sk = d_date_sk
                 AND d_year = 2002 AND d_qoy < 4)
       OR EXISTS (SELECT * FROM catalog_sales, date_dim
                  WHERE c.c_customer_sk = cs_ship_customer_sk
                    AND cs_sold_date_sk = d_date_sk
                    AND d_year = 2002 AND d_qoy < 4))
GROUP BY ca_state, cd_gender, cd_marital_status, cd_dep_count,
         cd_dep_employed_count, cd_dep_college_count
ORDER BY ca_state, cd_gender, cd_marital_status, cd_dep_count,
         cd_dep_employed_count, cd_dep_college_count
LIMIT 100
""")

tpcds_query("tpcds_q37", """
SELECT i_item_id, i_item_desc, i_current_price
FROM item, inventory, date_dim, catalog_sales
WHERE i_current_price BETWEEN 68 AND 68 + 30
  AND inv_item_sk = i_item_sk
  AND d_date_sk = inv_date_sk
  AND d_date BETWEEN DATE '2000-02-01' AND DATE '2000-04-01'
  AND i_manufact_id BETWEEN 100 AND 400
  AND inv_quantity_on_hand BETWEEN 100 AND 500
  AND cs_item_sk = i_item_sk
GROUP BY i_item_id, i_item_desc, i_current_price
ORDER BY i_item_id
LIMIT 100
""")

tpcds_query("tpcds_q38", """
SELECT COUNT(*) AS cnt FROM (
  SELECT DISTINCT c_last_name, c_first_name, d_date
  FROM store_sales, date_dim, customer
  WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
    AND store_sales.ss_customer_sk = customer.c_customer_sk
    AND d_month_seq BETWEEN 1200 AND 1211
  INTERSECT
  SELECT DISTINCT c_last_name, c_first_name, d_date
  FROM catalog_sales, date_dim, customer
  WHERE catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
    AND catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
    AND d_month_seq BETWEEN 1200 AND 1211
  INTERSECT
  SELECT DISTINCT c_last_name, c_first_name, d_date
  FROM web_sales, date_dim, customer
  WHERE web_sales.ws_sold_date_sk = date_dim.d_date_sk
    AND web_sales.ws_bill_customer_sk = customer.c_customer_sk
    AND d_month_seq BETWEEN 1200 AND 1211
) hot_cust
LIMIT 100
""")

tpcds_query("tpcds_q41", """
SELECT DISTINCT i_product_name
FROM item i1
WHERE i_manufact_id BETWEEN 700 AND 740
  AND (SELECT COUNT(*) AS item_cnt
       FROM item
       WHERE (i_manufact = i1.i_manufact
              AND ((i_category = 'Women'
                    AND (i_color = 'red' OR i_color = 'blue')
                    AND (i_units = 'Each' OR i_units = 'Dozen')
                    AND (i_size = 'small' OR i_size = 'medium'))
                OR (i_category = 'Men'
                    AND (i_color = 'green' OR i_color = 'white')
                    AND (i_units = 'Case' OR i_units = 'Pallet')
                    AND (i_size = 'large' OR i_size = 'extra large'))))
          OR (i_manufact = i1.i_manufact
              AND ((i_category = 'Women'
                    AND (i_color = 'black' OR i_color = 'yellow')
                    AND (i_units = 'Each' OR i_units = 'Case')
                    AND (i_size = 'small' OR i_size = 'N/A'))
                OR (i_category = 'Men'
                    AND (i_color = 'purple' OR i_color = 'orange')
                    AND (i_units = 'Dozen' OR i_units = 'Pallet')
                    AND (i_size = 'medium' OR i_size = 'large')))))
      > 0
ORDER BY i_product_name
LIMIT 100
""")

tpcds_query("tpcds_q44", """
SELECT asceding.rnk,
       i1.i_product_name AS best_performing,
       i2.i_product_name AS worst_performing
FROM (SELECT * FROM (
        SELECT item_sk, RANK() OVER (ORDER BY rank_col ASC, item_sk) AS rnk
        FROM (SELECT ss_item_sk AS item_sk,
                     CAST(SUM(CAST(ss_net_profit AS DECIMAL(30,6)))
                          AS DOUBLE) / COUNT(ss_net_profit) AS rank_col
              FROM store_sales ss1
              WHERE ss_store_sk = 4
              GROUP BY ss_item_sk
              HAVING CAST(SUM(CAST(ss_net_profit AS DECIMAL(30,6)))
                          AS DOUBLE) / COUNT(ss_net_profit)
                     > 0.9 * (SELECT CAST(SUM(CAST(ss_net_profit
                                                   AS DECIMAL(30,6)))
                                          AS DOUBLE)
                                     / COUNT(ss_net_profit) AS rank_col
                              FROM store_sales
                              WHERE ss_store_sk = 4
                                AND ss_addr_sk IS NULL
                              GROUP BY ss_store_sk)) v1) v11
      WHERE rnk < 11) asceding,
     (SELECT * FROM (
        SELECT item_sk, RANK() OVER (ORDER BY rank_col DESC, item_sk) AS rnk
        FROM (SELECT ss_item_sk AS item_sk,
                     CAST(SUM(CAST(ss_net_profit AS DECIMAL(30,6)))
                          AS DOUBLE) / COUNT(ss_net_profit) AS rank_col
              FROM store_sales ss1
              WHERE ss_store_sk = 4
              GROUP BY ss_item_sk
              HAVING CAST(SUM(CAST(ss_net_profit AS DECIMAL(30,6)))
                          AS DOUBLE) / COUNT(ss_net_profit)
                     > 0.9 * (SELECT CAST(SUM(CAST(ss_net_profit
                                                   AS DECIMAL(30,6)))
                                          AS DOUBLE)
                                     / COUNT(ss_net_profit) AS rank_col
                              FROM store_sales
                              WHERE ss_store_sk = 4
                                AND ss_addr_sk IS NULL
                              GROUP BY ss_store_sk)) v2) v21
      WHERE rnk < 11) descending,
     item i1, item i2
WHERE asceding.rnk = descending.rnk
  AND i1.i_item_sk = asceding.item_sk
  AND i2.i_item_sk = descending.item_sk
ORDER BY asceding.rnk
""")

tpcds_query("tpcds_q58", """
WITH ss_items AS (
  SELECT i_item_id AS item_id, SUM(ss_ext_sales_price) AS ss_item_rev
  FROM store_sales, item, date_dim
  WHERE ss_item_sk = i_item_sk
    AND d_date IN (SELECT d_date FROM date_dim
                   WHERE d_week_seq BETWEEN
                         (SELECT d_week_seq FROM date_dim
                          WHERE d_date = DATE '2000-01-03')
                     AND (SELECT d_week_seq FROM date_dim
                          WHERE d_date = DATE '2000-01-03') + 25)
    AND ss_sold_date_sk = d_date_sk
  GROUP BY i_item_id),
cs_items AS (
  SELECT i_item_id AS item_id, SUM(cs_ext_sales_price) AS cs_item_rev
  FROM catalog_sales, item, date_dim
  WHERE cs_item_sk = i_item_sk
    AND d_date IN (SELECT d_date FROM date_dim
                   WHERE d_week_seq BETWEEN
                         (SELECT d_week_seq FROM date_dim
                          WHERE d_date = DATE '2000-01-03')
                     AND (SELECT d_week_seq FROM date_dim
                          WHERE d_date = DATE '2000-01-03') + 25)
    AND cs_sold_date_sk = d_date_sk
  GROUP BY i_item_id),
ws_items AS (
  SELECT i_item_id AS item_id, SUM(ws_ext_sales_price) AS ws_item_rev
  FROM web_sales, item, date_dim
  WHERE ws_item_sk = i_item_sk
    AND d_date IN (SELECT d_date FROM date_dim
                   WHERE d_week_seq BETWEEN
                         (SELECT d_week_seq FROM date_dim
                          WHERE d_date = DATE '2000-01-03')
                     AND (SELECT d_week_seq FROM date_dim
                          WHERE d_date = DATE '2000-01-03') + 25)
    AND ws_sold_date_sk = d_date_sk
  GROUP BY i_item_id)
SELECT ss_items.item_id,
       CAST(ss_item_rev AS DOUBLE) AS ss_item_rev,
       CAST(ss_item_rev AS DOUBLE)
         / ((CAST(ss_item_rev AS DOUBLE) + CAST(cs_item_rev AS DOUBLE)
             + CAST(ws_item_rev AS DOUBLE)) / 3) * 100 AS ss_dev,
       CAST(cs_item_rev AS DOUBLE) AS cs_item_rev,
       CAST(cs_item_rev AS DOUBLE)
         / ((CAST(ss_item_rev AS DOUBLE) + CAST(cs_item_rev AS DOUBLE)
             + CAST(ws_item_rev AS DOUBLE)) / 3) * 100 AS cs_dev,
       CAST(ws_item_rev AS DOUBLE) AS ws_item_rev,
       CAST(ws_item_rev AS DOUBLE)
         / ((CAST(ss_item_rev AS DOUBLE) + CAST(cs_item_rev AS DOUBLE)
             + CAST(ws_item_rev AS DOUBLE)) / 3) * 100 AS ws_dev,
       (CAST(ss_item_rev AS DOUBLE) + CAST(cs_item_rev AS DOUBLE)
        + CAST(ws_item_rev AS DOUBLE)) / 3 AS average
FROM ss_items, cs_items, ws_items
WHERE ss_items.item_id = cs_items.item_id
  AND ss_items.item_id = ws_items.item_id
  AND CAST(ss_item_rev AS DOUBLE)
      BETWEEN 0.2 * CAST(cs_item_rev AS DOUBLE)
          AND 5.0 * CAST(cs_item_rev AS DOUBLE)
  AND CAST(cs_item_rev AS DOUBLE)
      BETWEEN 0.2 * CAST(ss_item_rev AS DOUBLE)
          AND 5.0 * CAST(ss_item_rev AS DOUBLE)
  AND CAST(ss_item_rev AS DOUBLE)
      BETWEEN 0.2 * CAST(ws_item_rev AS DOUBLE)
          AND 5.0 * CAST(ws_item_rev AS DOUBLE)
  AND CAST(ws_item_rev AS DOUBLE)
      BETWEEN 0.2 * CAST(ss_item_rev AS DOUBLE)
          AND 5.0 * CAST(ss_item_rev AS DOUBLE)
ORDER BY ss_items.item_id, ss_item_rev
LIMIT 100
""")

tpcds_query("tpcds_q63", """
SELECT * FROM (
  SELECT i_manager_id,
         CAST(SUM(ss_sales_price) AS DOUBLE) AS sum_sales,
         CAST(SUM(SUM(ss_sales_price))
              OVER (PARTITION BY i_manager_id) AS DOUBLE)
           / COUNT(SUM(ss_sales_price))
              OVER (PARTITION BY i_manager_id) AS avg_monthly_sales
  FROM item, store_sales, date_dim, store
  WHERE ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND ss_store_sk = s_store_sk
    AND d_month_seq IN (1200, 1201, 1202, 1203, 1204, 1205, 1206,
                        1207, 1208, 1209, 1210, 1211)
    AND ((i_category IN ('Books', 'Children', 'Electronics')
          AND i_class IN ('accessories', 'classical', 'fiction'))
      OR (i_category IN ('Women', 'Music', 'Men')
          AND i_class IN ('pants', 'pop', 'shirts')))
  GROUP BY i_manager_id, d_moy) tmp1
WHERE CASE WHEN avg_monthly_sales > 0
           THEN ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales
           ELSE NULL END > 0.1
ORDER BY i_manager_id, avg_monthly_sales, sum_sales
LIMIT 100
""")

tpcds_query("tpcds_q67", """
SELECT * FROM (
  SELECT i_category, i_class, i_brand, i_product_name, d_year, d_qoy,
         d_moy, s_store_id, sumsales,
         RANK() OVER (PARTITION BY i_category
                      ORDER BY sumsales DESC) AS rk
  FROM (SELECT i_category, i_class, i_brand, i_product_name, d_year,
               d_qoy, d_moy, s_store_id,
               CAST(SUM(COALESCE(ss_sales_price * ss_quantity, 0))
                    AS DOUBLE) AS sumsales
        FROM store_sales, date_dim, store, item
        WHERE ss_sold_date_sk = d_date_sk
          AND ss_item_sk = i_item_sk
          AND ss_store_sk = s_store_sk
          AND d_month_seq BETWEEN 1200 AND 1211
        GROUP BY ROLLUP (i_category, i_class, i_brand, i_product_name,
                         d_year, d_qoy, d_moy, s_store_id)) dw1) dw2
WHERE rk <= 100
ORDER BY i_category NULLS FIRST, i_class NULLS FIRST, i_brand NULLS FIRST,
         i_product_name NULLS FIRST, d_year NULLS FIRST, d_qoy NULLS FIRST,
         d_moy NULLS FIRST, s_store_id NULLS FIRST, sumsales, rk
LIMIT 100
""")

tpcds_query("tpcds_q69", """
SELECT cd_gender, cd_marital_status, cd_education_status,
       COUNT(*) AS cnt1,
       cd_purchase_estimate,
       COUNT(*) AS cnt2,
       cd_credit_rating,
       COUNT(*) AS cnt3
FROM customer c, customer_address ca, customer_demographics
WHERE c.c_current_addr_sk = ca.ca_address_sk
  AND ca_state IN ('TN', 'GA', 'OH')
  AND cd_demo_sk = c.c_current_cdemo_sk
  AND EXISTS (SELECT * FROM store_sales, date_dim
              WHERE c.c_customer_sk = ss_customer_sk
                AND ss_sold_date_sk = d_date_sk
                AND d_year = 2001 AND d_qoy < 4)
  AND NOT EXISTS (SELECT * FROM web_sales, date_dim
                  WHERE c.c_customer_sk = ws_bill_customer_sk
                    AND ws_sold_date_sk = d_date_sk
                    AND d_year = 2001 AND d_qoy < 4)
  AND NOT EXISTS (SELECT * FROM catalog_sales, date_dim
                  WHERE c.c_customer_sk = cs_ship_customer_sk
                    AND cs_sold_date_sk = d_date_sk
                    AND d_year = 2001 AND d_qoy < 4)
GROUP BY cd_gender, cd_marital_status, cd_education_status,
         cd_purchase_estimate, cd_credit_rating
ORDER BY cd_gender, cd_marital_status, cd_education_status,
         cd_purchase_estimate, cd_credit_rating
LIMIT 100
""")

tpcds_query("tpcds_q70", """
SELECT CAST(SUM(ss_net_profit) AS DOUBLE) AS total_sum,
       s_state, s_county,
       CAST(GROUPING(s_state) + GROUPING(s_county) AS INT) AS lochierarchy,
       RANK() OVER (
         PARTITION BY GROUPING(s_state) + GROUPING(s_county),
                      CASE WHEN GROUPING(s_county) = 0 THEN s_state END
         ORDER BY CAST(SUM(ss_net_profit) AS DOUBLE) DESC,
                  s_county NULLS FIRST
       ) AS rank_within_parent
FROM store_sales, date_dim d1, store
WHERE d1.d_month_seq BETWEEN 1200 AND 1211
  AND d1.d_date_sk = ss_sold_date_sk
  AND s_store_sk = ss_store_sk
  AND s_state IN (SELECT s_state
                  FROM (SELECT s_state,
                               RANK() OVER (PARTITION BY s_state
                                            ORDER BY CAST(SUM(ss_net_profit)
                                                          AS DOUBLE) DESC)
                                 AS ranking
                        FROM store_sales, store, date_dim
                        WHERE d_month_seq BETWEEN 1200 AND 1211
                          AND d_date_sk = ss_sold_date_sk
                          AND s_store_sk = ss_store_sk
                        GROUP BY s_state) tmp1
                  WHERE ranking <= 5)
GROUP BY ROLLUP (s_state, s_county)
ORDER BY lochierarchy DESC,
         CASE WHEN lochierarchy = 0 THEN s_state END NULLS FIRST,
         rank_within_parent, s_state NULLS FIRST, s_county NULLS FIRST
LIMIT 100
""")

tpcds_query("tpcds_q71", """
SELECT i_brand_id AS brand_id, i_brand AS brand, t_hour, t_minute,
       CAST(SUM(ext_price) AS DOUBLE) AS ext_price
FROM item,
     (SELECT ws_ext_sales_price AS ext_price,
             ws_sold_date_sk AS sold_date_sk,
             ws_item_sk AS sold_item_sk,
             ws_sold_time_sk AS time_sk
      FROM web_sales, date_dim
      WHERE d_date_sk = ws_sold_date_sk
        AND d_moy = 11 AND d_year = 1999
      UNION ALL
      SELECT cs_ext_sales_price, cs_sold_date_sk, cs_item_sk,
             cs_sold_time_sk
      FROM catalog_sales, date_dim
      WHERE d_date_sk = cs_sold_date_sk
        AND d_moy = 11 AND d_year = 1999
      UNION ALL
      SELECT ss_ext_sales_price, ss_sold_date_sk, ss_item_sk,
             ss_sold_time_sk
      FROM store_sales, date_dim
      WHERE d_date_sk = ss_sold_date_sk
        AND d_moy = 11 AND d_year = 1999) tmp, time_dim
WHERE sold_item_sk = i_item_sk
  AND i_manager_id = 1
  AND time_sk = t_time_sk
  AND (t_meal_time = 'breakfast' OR t_meal_time = 'dinner')
GROUP BY i_brand, i_brand_id, t_hour, t_minute
ORDER BY ext_price DESC, i_brand_id, t_hour, t_minute
""")

tpcds_query("tpcds_q74", """
WITH year_total AS (
  SELECT c_customer_id AS customer_id,
         c_first_name AS customer_first_name,
         c_last_name AS customer_last_name,
         d_year AS year_,
         CAST(SUM(ss_net_paid) AS DOUBLE) AS year_total,
         's' AS sale_type
  FROM customer, store_sales, date_dim
  WHERE c_customer_sk = ss_customer_sk
    AND ss_sold_date_sk = d_date_sk
    AND d_year IN (2001, 2002)
  GROUP BY c_customer_id, c_first_name, c_last_name, d_year
  UNION ALL
  SELECT c_customer_id, c_first_name, c_last_name, d_year,
         CAST(SUM(ws_net_paid) AS DOUBLE), 'w'
  FROM customer, web_sales, date_dim
  WHERE c_customer_sk = ws_bill_customer_sk
    AND ws_sold_date_sk = d_date_sk
    AND d_year IN (2001, 2002)
  GROUP BY c_customer_id, c_first_name, c_last_name, d_year)
SELECT t_s_secyear.customer_id, t_s_secyear.customer_first_name,
       t_s_secyear.customer_last_name
FROM year_total t_s_firstyear, year_total t_s_secyear,
     year_total t_w_firstyear, year_total t_w_secyear
WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
  AND t_s_firstyear.sale_type = 's'
  AND t_w_firstyear.sale_type = 'w'
  AND t_s_secyear.sale_type = 's'
  AND t_w_secyear.sale_type = 'w'
  AND t_s_firstyear.year_ = 2001
  AND t_s_secyear.year_ = 2002
  AND t_w_firstyear.year_ = 2001
  AND t_w_secyear.year_ = 2002
  AND t_s_firstyear.year_total > 0
  AND t_w_firstyear.year_total > 0
  AND CASE WHEN t_w_firstyear.year_total > 0
           THEN t_w_secyear.year_total / t_w_firstyear.year_total
           ELSE NULL END
      > CASE WHEN t_s_firstyear.year_total > 0
             THEN t_s_secyear.year_total / t_s_firstyear.year_total
             ELSE NULL END
ORDER BY 1, 2, 3
LIMIT 100
""")

tpcds_query("tpcds_q76", """
SELECT channel, col_name, d_year, d_qoy, i_category,
       COUNT(*) AS sales_cnt,
       CAST(SUM(ext_sales_price) AS DOUBLE) AS sales_amt
FROM (SELECT 'store' AS channel, 'ss_store_sk' AS col_name,
             d_year, d_qoy, i_category,
             ss_ext_sales_price AS ext_sales_price
      FROM store_sales, item, date_dim
      WHERE ss_store_sk IS NULL
        AND ss_sold_date_sk = d_date_sk
        AND ss_item_sk = i_item_sk
      UNION ALL
      SELECT 'web', 'ws_promo_sk', d_year, d_qoy, i_category,
             ws_ext_sales_price
      FROM web_sales, item, date_dim
      WHERE ws_promo_sk IS NULL
        AND ws_sold_date_sk = d_date_sk
        AND ws_item_sk = i_item_sk
      UNION ALL
      SELECT 'catalog', 'cs_warehouse_sk', d_year, d_qoy, i_category,
             cs_ext_sales_price
      FROM catalog_sales, item, date_dim
      WHERE cs_warehouse_sk IS NULL
        AND cs_sold_date_sk = d_date_sk
        AND cs_item_sk = i_item_sk) foo
GROUP BY channel, col_name, d_year, d_qoy, i_category
ORDER BY channel, col_name, d_year, d_qoy, i_category
LIMIT 100
""")

tpcds_query("tpcds_q87", """
SELECT COUNT(*) AS cnt FROM (
  (SELECT DISTINCT c_last_name, c_first_name, d_date
   FROM store_sales, date_dim, customer
   WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
     AND store_sales.ss_customer_sk = customer.c_customer_sk
     AND d_month_seq BETWEEN 1200 AND 1211)
  EXCEPT
  (SELECT DISTINCT c_last_name, c_first_name, d_date
   FROM catalog_sales, date_dim, customer
   WHERE catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
     AND catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
     AND d_month_seq BETWEEN 1200 AND 1211)
  EXCEPT
  (SELECT DISTINCT c_last_name, c_first_name, d_date
   FROM web_sales, date_dim, customer
   WHERE web_sales.ws_sold_date_sk = date_dim.d_date_sk
     AND web_sales.ws_bill_customer_sk = customer.c_customer_sk
     AND d_month_seq BETWEEN 1200 AND 1211)
) cool_cust
""")

tpcds_query("tpcds_q89", """
SELECT * FROM (
  SELECT i_category, i_class, i_brand, s_store_name, d_moy,
         CAST(SUM(ss_sales_price) AS DOUBLE) AS sum_sales,
         CAST(SUM(SUM(ss_sales_price))
              OVER (PARTITION BY i_category, i_brand, s_store_name)
              AS DOUBLE)
           / COUNT(SUM(ss_sales_price))
              OVER (PARTITION BY i_category, i_brand, s_store_name)
           AS avg_monthly_sales
  FROM item, store_sales, date_dim, store
  WHERE ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND ss_store_sk = s_store_sk
    AND d_year = 1999
    AND ((i_category IN ('Books', 'Electronics', 'Sports')
          AND i_class IN ('fiction', 'accessories', 'fitness'))
      OR (i_category IN ('Men', 'Jewelry', 'Women')
          AND i_class IN ('shirts', 'romance', 'dresses')))
  GROUP BY i_category, i_class, i_brand, s_store_name, d_moy) tmp1
WHERE CASE WHEN avg_monthly_sales <> 0
           THEN ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales
           ELSE NULL END > 0.1
ORDER BY sum_sales - avg_monthly_sales, s_store_name, i_category,
         i_class, i_brand, d_moy
LIMIT 100
""")

tpcds_query("tpcds_q90", """
SELECT CAST(amc AS DOUBLE) / CAST(pmc AS DOUBLE) AS am_pm_ratio
FROM (SELECT COUNT(*) AS amc
      FROM web_sales, household_demographics, time_dim, web_page
      WHERE ws_sold_time_sk = time_dim.t_time_sk
        AND ws_ship_hdemo_sk = household_demographics.hd_demo_sk
        AND ws_web_page_sk = web_page.wp_web_page_sk
        AND time_dim.t_hour BETWEEN 8 AND 9
        AND household_demographics.hd_dep_count = 6
        AND web_page.wp_char_count BETWEEN 5000 AND 5200) at_,
     (SELECT COUNT(*) AS pmc
      FROM web_sales, household_demographics, time_dim, web_page
      WHERE ws_sold_time_sk = time_dim.t_time_sk
        AND ws_ship_hdemo_sk = household_demographics.hd_demo_sk
        AND ws_web_page_sk = web_page.wp_web_page_sk
        AND time_dim.t_hour BETWEEN 19 AND 20
        AND household_demographics.hd_dep_count = 6
        AND web_page.wp_char_count BETWEEN 5000 AND 5200) pt
ORDER BY am_pm_ratio
LIMIT 100
""")

tpcds_query("tpcds_q92", """
SELECT CAST(SUM(ws_ext_discount_amt) AS DOUBLE) AS excess_discount_amount
FROM web_sales, item, date_dim
WHERE i_manufact_id = 350
  AND i_item_sk = ws_item_sk
  AND d_date BETWEEN DATE '2000-01-27' AND DATE '2000-04-26'
  AND d_date_sk = ws_sold_date_sk
  AND CAST(ws_ext_discount_amt AS DOUBLE) >
      (SELECT 1.3 * (CAST(SUM(CAST(ws_ext_discount_amt AS DECIMAL(30,6)))
                          AS DOUBLE) / COUNT(ws_ext_discount_amt))
       FROM web_sales, date_dim
       WHERE ws_item_sk = i_item_sk
         AND d_date BETWEEN DATE '2000-01-27' AND DATE '2000-04-26'
         AND d_date_sk = ws_sold_date_sk)
ORDER BY excess_discount_amount
LIMIT 100
""")

tpcds_query("tpcds_q16", """
SELECT COUNT(DISTINCT cs_order_number) AS order_count,
       CAST(SUM(cs_ext_ship_cost) AS DOUBLE) AS total_shipping_cost,
       CAST(SUM(cs_net_profit) AS DOUBLE) AS total_net_profit
FROM catalog_sales cs1, date_dim, customer_address, call_center
WHERE d_date BETWEEN DATE '2002-02-01' AND DATE '2002-04-02'
  AND cs1.cs_ship_date_sk = d_date_sk
  AND cs1.cs_ship_addr_sk = ca_address_sk
  AND ca_state = 'GA'
  AND cs1.cs_call_center_sk = cc_call_center_sk
  AND cc_county IN ('Williamson County', 'Ziebach County', 'Walker County',
                    'Barrow County', 'Franklin Parish')
  AND EXISTS (SELECT * FROM catalog_sales cs2
              WHERE cs1.cs_order_number = cs2.cs_order_number
                AND cs1.cs_warehouse_sk <> cs2.cs_warehouse_sk)
  AND NOT EXISTS (SELECT * FROM catalog_returns cr1
                  WHERE cs1.cs_order_number = cr1.cr_order_number)
ORDER BY COUNT(DISTINCT cs_order_number)
LIMIT 100
""")

tpcds_query("tpcds_q30", """
WITH customer_total_return AS (
  SELECT wr_returning_customer_sk AS ctr_customer_sk,
         ca_state AS ctr_state,
         SUM(wr_return_amt) AS ctr_total_return
  FROM web_returns, date_dim, customer_address
  WHERE wr_returned_date_sk = d_date_sk
    AND d_year = 2002
    AND wr_returning_addr_sk = ca_address_sk
  GROUP BY wr_returning_customer_sk, ca_state)
SELECT c_customer_id, c_salutation, c_first_name, c_last_name,
       c_preferred_cust_flag, c_birth_month, c_birth_year,
       CAST(ctr_total_return AS DOUBLE) AS ctr_total_return
FROM customer_total_return ctr1, customer_address, customer
WHERE ctr1.ctr_total_return >
      (SELECT CAST(SUM(CAST(ctr2.ctr_total_return AS DECIMAL(30,6)))
                   AS DOUBLE) / COUNT(ctr2.ctr_total_return) * 1.2
       FROM customer_total_return ctr2
       WHERE ctr1.ctr_state = ctr2.ctr_state)
  AND ca_address_sk = c_current_addr_sk
  AND ca_state = 'GA'
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY c_customer_id, c_salutation, c_first_name, c_last_name,
         c_preferred_cust_flag, c_birth_month, c_birth_year,
         ctr_total_return
LIMIT 100
""")

tpcds_query("tpcds_q49", """
SELECT channel, item, return_ratio, return_rank, currency_rank FROM (
  SELECT 'web' AS channel, web.item, web.return_ratio,
         web.return_rank, web.currency_rank
  FROM (SELECT item, return_ratio, currency_ratio,
               RANK() OVER (ORDER BY return_ratio, item) AS return_rank,
               RANK() OVER (ORDER BY currency_ratio, item) AS currency_rank
        FROM (SELECT ws.ws_item_sk AS item,
                     CAST(SUM(COALESCE(wr.wr_return_quantity, 0)) AS DOUBLE)
                       / CAST(SUM(COALESCE(ws.ws_quantity, 0)) AS DOUBLE)
                       AS return_ratio,
                     CAST(SUM(COALESCE(wr.wr_return_amt, 0)) AS DOUBLE)
                       / CAST(SUM(COALESCE(ws.ws_net_paid, 0)) AS DOUBLE)
                       AS currency_ratio
              FROM web_sales ws
                   LEFT OUTER JOIN web_returns wr
                     ON (ws.ws_order_number = wr.wr_order_number
                         AND ws.ws_item_sk = wr.wr_item_sk),
                   date_dim
              WHERE wr.wr_return_amt > 100
                AND ws.ws_net_profit > 1
                AND ws.ws_net_paid > 0
                AND ws.ws_quantity > 0
                AND ws_sold_date_sk = d_date_sk
                AND d_year = 2001 AND d_moy = 12
              GROUP BY ws.ws_item_sk) in_web) web
  WHERE web.return_rank <= 10 OR web.currency_rank <= 10
  UNION
  SELECT 'catalog', catalog.item, catalog.return_ratio,
         catalog.return_rank, catalog.currency_rank
  FROM (SELECT item, return_ratio, currency_ratio,
               RANK() OVER (ORDER BY return_ratio, item) AS return_rank,
               RANK() OVER (ORDER BY currency_ratio, item) AS currency_rank
        FROM (SELECT cs.cs_item_sk AS item,
                     CAST(SUM(COALESCE(cr.cr_return_quantity, 0)) AS DOUBLE)
                       / CAST(SUM(COALESCE(cs.cs_quantity, 0)) AS DOUBLE)
                       AS return_ratio,
                     CAST(SUM(COALESCE(cr.cr_return_amount, 0)) AS DOUBLE)
                       / CAST(SUM(COALESCE(cs.cs_net_paid, 0)) AS DOUBLE)
                       AS currency_ratio
              FROM catalog_sales cs
                   LEFT OUTER JOIN catalog_returns cr
                     ON (cs.cs_order_number = cr.cr_order_number
                         AND cs.cs_item_sk = cr.cr_item_sk),
                   date_dim
              WHERE cr.cr_return_amount > 100
                AND cs.cs_net_profit > 1
                AND cs.cs_net_paid > 0
                AND cs.cs_quantity > 0
                AND cs_sold_date_sk = d_date_sk
                AND d_year = 2001 AND d_moy = 12
              GROUP BY cs.cs_item_sk) in_cat) catalog
  WHERE catalog.return_rank <= 10 OR catalog.currency_rank <= 10
  UNION
  SELECT 'store', store.item, store.return_ratio,
         store.return_rank, store.currency_rank
  FROM (SELECT item, return_ratio, currency_ratio,
               RANK() OVER (ORDER BY return_ratio, item) AS return_rank,
               RANK() OVER (ORDER BY currency_ratio, item) AS currency_rank
        FROM (SELECT sts.ss_item_sk AS item,
                     CAST(SUM(COALESCE(sr.sr_return_quantity, 0)) AS DOUBLE)
                       / CAST(SUM(COALESCE(sts.ss_quantity, 0)) AS DOUBLE)
                       AS return_ratio,
                     CAST(SUM(COALESCE(sr.sr_return_amt, 0)) AS DOUBLE)
                       / CAST(SUM(COALESCE(sts.ss_net_paid, 0)) AS DOUBLE)
                       AS currency_ratio
              FROM store_sales sts
                   LEFT OUTER JOIN store_returns sr
                     ON (sts.ss_ticket_number = sr.sr_ticket_number
                         AND sts.ss_item_sk = sr.sr_item_sk),
                   date_dim
              WHERE sr.sr_return_amt > 100
                AND sts.ss_net_profit > 1
                AND sts.ss_net_paid > 0
                AND sts.ss_quantity > 0
                AND ss_sold_date_sk = d_date_sk
                AND d_year = 2001 AND d_moy = 12
              GROUP BY sts.ss_item_sk) in_store) store
  WHERE store.return_rank <= 10 OR store.currency_rank <= 10
) sq1
ORDER BY 1, 4, 5, 2
LIMIT 100
""")

tpcds_query("tpcds_q81", """
WITH customer_total_return AS (
  SELECT cr_returning_customer_sk AS ctr_customer_sk,
         ca_state AS ctr_state,
         SUM(cr_return_amt_inc_tax) AS ctr_total_return
  FROM catalog_returns, date_dim, customer_address
  WHERE cr_returned_date_sk = d_date_sk
    AND d_year = 2000
    AND cr_returning_addr_sk = ca_address_sk
  GROUP BY cr_returning_customer_sk, ca_state)
SELECT c_customer_id, c_salutation, c_first_name, c_last_name,
       ca_street_number, ca_street_name, ca_city, ca_state, ca_zip,
       CAST(ctr_total_return AS DOUBLE) AS ctr_total_return
FROM customer_total_return ctr1, customer_address, customer
WHERE ctr1.ctr_total_return >
      (SELECT CAST(SUM(CAST(ctr2.ctr_total_return AS DECIMAL(30,6)))
                   AS DOUBLE) / COUNT(ctr2.ctr_total_return) * 1.2
       FROM customer_total_return ctr2
       WHERE ctr1.ctr_state = ctr2.ctr_state)
  AND ca_address_sk = c_current_addr_sk
  AND ca_state = 'TN'
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY c_customer_id, c_salutation, c_first_name, c_last_name,
         ca_street_number, ca_street_name, ca_city, ca_state, ca_zip,
         ctr_total_return
LIMIT 100
""")

tpcds_query("tpcds_q84", """
SELECT c_customer_id AS customer_id,
       COALESCE(c_last_name, '') || ', ' || COALESCE(c_first_name, '')
         AS customername
FROM customer, customer_address, customer_demographics,
     household_demographics, income_band, store_returns
WHERE ca_city = 'Midway'
  AND c_current_addr_sk = ca_address_sk
  AND ib_lower_bound >= 30000
  AND ib_upper_bound <= 80000
  AND ib_income_band_sk = hd_income_band_sk
  AND cd_demo_sk = c_current_cdemo_sk
  AND hd_demo_sk = c_current_hdemo_sk
  AND sr_cdemo_sk = cd_demo_sk
ORDER BY c_customer_id
LIMIT 100
""")

tpcds_query("tpcds_q85", """
SELECT substr(r_reason_desc, 1, 20) AS r20,
       AVG(ws_quantity) AS avg_qty,
       CAST(SUM(CAST(wr_refunded_cash AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(wr_refunded_cash) AS avg_refunded,
       CAST(SUM(CAST(wr_fee AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(wr_fee) AS avg_fee
FROM web_sales, web_returns, web_page, customer_demographics cd1,
     customer_demographics cd2, customer_address, date_dim, reason
WHERE ws_web_page_sk = wp_web_page_sk
  AND ws_item_sk = wr_item_sk
  AND ws_order_number = wr_order_number
  AND ws_sold_date_sk = d_date_sk AND d_year = 2000
  AND cd1.cd_demo_sk = wr_refunded_cdemo_sk
  AND cd2.cd_demo_sk = wr_returning_cdemo_sk
  AND ca_address_sk = wr_refunded_addr_sk
  AND r_reason_sk = wr_reason_sk
  AND ((cd1.cd_marital_status = 'M'
        AND cd1.cd_marital_status = cd2.cd_marital_status
        AND cd1.cd_education_status = 'Advanced Degree'
        AND cd1.cd_education_status = cd2.cd_education_status
        AND ws_sales_price BETWEEN 100.00 AND 150.00)
    OR (cd1.cd_marital_status = 'S'
        AND cd1.cd_marital_status = cd2.cd_marital_status
        AND cd1.cd_education_status = 'College'
        AND cd1.cd_education_status = cd2.cd_education_status
        AND ws_sales_price BETWEEN 50.00 AND 100.00)
    OR (cd1.cd_marital_status = 'W'
        AND cd1.cd_marital_status = cd2.cd_marital_status
        AND cd1.cd_education_status = '2 yr Degree'
        AND cd1.cd_education_status = cd2.cd_education_status
        AND ws_sales_price BETWEEN 150.00 AND 200.00))
  AND ((ca_country = 'United States'
        AND ca_state IN ('TN', 'OH', 'TX')
        AND ws_net_profit BETWEEN 100 AND 200)
    OR (ca_country = 'United States'
        AND ca_state IN ('SD', 'GA', 'IL')
        AND ws_net_profit BETWEEN 150 AND 300)
    OR (ca_country = 'United States'
        AND ca_state IN ('TX', 'GA', 'IL')
        AND ws_net_profit BETWEEN 50 AND 250))
GROUP BY r_reason_desc
ORDER BY r20, avg_qty, avg_refunded, avg_fee
LIMIT 100
""")

tpcds_query("tpcds_q94", """
SELECT COUNT(DISTINCT ws_order_number) AS order_count,
       CAST(SUM(ws_ext_ship_cost) AS DOUBLE) AS total_shipping_cost,
       CAST(SUM(ws_net_profit) AS DOUBLE) AS total_net_profit
FROM web_sales ws1, date_dim, customer_address, web_site
WHERE d_date BETWEEN DATE '1999-02-01' AND DATE '1999-04-02'
  AND ws1.ws_ship_date_sk = d_date_sk
  AND ws1.ws_ship_addr_sk = ca_address_sk
  AND ca_state = 'IL'
  AND ws1.ws_web_site_sk = web_site_sk
  AND web_company_name = 'pri'
  AND EXISTS (SELECT * FROM web_sales ws2
              WHERE ws1.ws_order_number = ws2.ws_order_number
                AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
  AND NOT EXISTS (SELECT * FROM web_returns wr1
                  WHERE ws1.ws_order_number = wr1.wr_order_number)
ORDER BY COUNT(DISTINCT ws_order_number)
LIMIT 100
""")

tpcds_query("tpcds_q95", """
WITH ws_wh AS (
  SELECT ws1.ws_order_number, ws1.ws_warehouse_sk AS wh1,
         ws2.ws_warehouse_sk AS wh2
  FROM web_sales ws1, web_sales ws2
  WHERE ws1.ws_order_number = ws2.ws_order_number
    AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
SELECT COUNT(DISTINCT ws_order_number) AS order_count,
       CAST(SUM(ws_ext_ship_cost) AS DOUBLE) AS total_shipping_cost,
       CAST(SUM(ws_net_profit) AS DOUBLE) AS total_net_profit
FROM web_sales ws1, date_dim, customer_address, web_site
WHERE d_date BETWEEN DATE '1999-02-01' AND DATE '1999-04-02'
  AND ws1.ws_ship_date_sk = d_date_sk
  AND ws1.ws_ship_addr_sk = ca_address_sk
  AND ca_state = 'IL'
  AND ws1.ws_web_site_sk = web_site_sk
  AND web_company_name = 'pri'
  AND ws1.ws_order_number IN (SELECT ws_order_number FROM ws_wh)
  AND ws1.ws_order_number IN (SELECT wr_order_number
                              FROM web_returns, ws_wh
                              WHERE wr_order_number = ws_wh.ws_order_number)
ORDER BY COUNT(DISTINCT ws_order_number)
LIMIT 100
""")

tpcds_query("tpcds_q99", """
SELECT substr(w_warehouse_name, 1, 20) AS wh, sm_type, cc_name,
       SUM(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk <= 30)
                THEN 1 ELSE 0 END) AS d30,
       SUM(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 30)
                 AND (cs_ship_date_sk - cs_sold_date_sk <= 60)
                THEN 1 ELSE 0 END) AS d31_60,
       SUM(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 60)
                 AND (cs_ship_date_sk - cs_sold_date_sk <= 90)
                THEN 1 ELSE 0 END) AS d61_90,
       SUM(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 90)
                 AND (cs_ship_date_sk - cs_sold_date_sk <= 120)
                THEN 1 ELSE 0 END) AS d91_120,
       SUM(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 120)
                THEN 1 ELSE 0 END) AS d_gt_120
FROM catalog_sales, warehouse, ship_mode, call_center, date_dim
WHERE d_month_seq BETWEEN 1200 AND 1211
  AND cs_ship_date_sk = d_date_sk
  AND cs_warehouse_sk = w_warehouse_sk
  AND cs_ship_mode_sk = sm_ship_mode_sk
  AND cs_call_center_sk = cc_call_center_sk
GROUP BY substr(w_warehouse_name, 1, 20), sm_type, cc_name
ORDER BY wh NULLS FIRST, sm_type, cc_name, d30, d31_60, d61_90,
         d91_120, d_gt_120
LIMIT 100
""")

tpcds_query("tpcds_q10", """
SELECT cd_gender, cd_marital_status, cd_education_status,
       COUNT(*) AS cnt1,
       cd_purchase_estimate, COUNT(*) AS cnt2,
       cd_credit_rating, COUNT(*) AS cnt3,
       cd_dep_count, COUNT(*) AS cnt4,
       cd_dep_employed_count, COUNT(*) AS cnt5,
       cd_dep_college_count, COUNT(*) AS cnt6
FROM customer c, customer_address ca, customer_demographics
WHERE c.c_current_addr_sk = ca.ca_address_sk
  AND ca_county IN ('Williamson County', 'Ziebach County', 'Walker County',
                    'Barrow County', 'Franklin Parish')
  AND cd_demo_sk = c.c_current_cdemo_sk
  AND EXISTS (SELECT * FROM store_sales, date_dim
              WHERE c.c_customer_sk = ss_customer_sk
                AND ss_sold_date_sk = d_date_sk
                AND d_year = 2002 AND d_moy BETWEEN 1 AND 4)
  AND (EXISTS (SELECT * FROM web_sales, date_dim
               WHERE c.c_customer_sk = ws_bill_customer_sk
                 AND ws_sold_date_sk = d_date_sk
                 AND d_year = 2002 AND d_moy BETWEEN 1 AND 4)
       OR EXISTS (SELECT * FROM catalog_sales, date_dim
                  WHERE c.c_customer_sk = cs_ship_customer_sk
                    AND cs_sold_date_sk = d_date_sk
                    AND d_year = 2002 AND d_moy BETWEEN 1 AND 4))
GROUP BY cd_gender, cd_marital_status, cd_education_status,
         cd_purchase_estimate, cd_credit_rating, cd_dep_count,
         cd_dep_employed_count, cd_dep_college_count
ORDER BY cd_gender, cd_marital_status, cd_education_status,
         cd_purchase_estimate, cd_credit_rating, cd_dep_count,
         cd_dep_employed_count, cd_dep_college_count
LIMIT 100
""")

tpcds_query("tpcds_q12", """
SELECT i_item_id, i_item_desc, i_category, i_class, i_current_price,
       CAST(SUM(ws_ext_sales_price) AS DOUBLE) AS itemrevenue,
       CAST(SUM(ws_ext_sales_price) AS DOUBLE) * 100
         / CAST(SUM(SUM(ws_ext_sales_price))
                OVER (PARTITION BY i_class) AS DOUBLE) AS revenueratio
FROM web_sales, item, date_dim
WHERE ws_item_sk = i_item_sk
  AND i_category IN ('Sports', 'Books', 'Home')
  AND ws_sold_date_sk = d_date_sk
  AND d_date BETWEEN DATE '1999-02-22' AND DATE '1999-03-24'
GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio
LIMIT 100
""")

tpcds_query("tpcds_q40", """
SELECT w_state, i_item_id,
       CAST(SUM(CASE WHEN d_date < DATE '2000-03-11'
                     THEN cs_sales_price - COALESCE(cr_refunded_cash, 0)
                     ELSE 0 END) AS DOUBLE) AS sales_before,
       CAST(SUM(CASE WHEN d_date >= DATE '2000-03-11'
                     THEN cs_sales_price - COALESCE(cr_refunded_cash, 0)
                     ELSE 0 END) AS DOUBLE) AS sales_after
FROM catalog_sales
     LEFT OUTER JOIN catalog_returns
       ON (cs_order_number = cr_order_number AND cs_item_sk = cr_item_sk),
     warehouse, item, date_dim
WHERE i_current_price BETWEEN 0.99 AND 31.49
  AND i_item_sk = cs_item_sk
  AND cs_warehouse_sk = w_warehouse_sk
  AND cs_sold_date_sk = d_date_sk
  AND d_date BETWEEN DATE '2000-02-10' AND DATE '2000-04-10'
GROUP BY w_state, i_item_id
ORDER BY w_state, i_item_id
LIMIT 100
""")

tpcds_query("tpcds_q53", """
SELECT * FROM (
  SELECT i_manufact_id,
         CAST(SUM(ss_sales_price) AS DOUBLE) AS sum_sales,
         CAST(SUM(SUM(ss_sales_price))
              OVER (PARTITION BY i_manufact_id) AS DOUBLE)
           / COUNT(SUM(ss_sales_price))
              OVER (PARTITION BY i_manufact_id) AS avg_quarterly_sales
  FROM item, store_sales, date_dim, store
  WHERE ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND ss_store_sk = s_store_sk
    AND d_month_seq IN (1200, 1201, 1202, 1203, 1204, 1205, 1206,
                        1207, 1208, 1209, 1210, 1211)
    AND ((i_category IN ('Books', 'Children', 'Electronics')
          AND i_class IN ('classical', 'fiction', 'accessories'))
      OR (i_category IN ('Women', 'Music', 'Men')
          AND i_class IN ('pants', 'pop', 'shirts')))
  GROUP BY i_manufact_id, d_qoy) tmp1
WHERE CASE WHEN avg_quarterly_sales > 0
           THEN ABS(sum_sales - avg_quarterly_sales) / avg_quarterly_sales
           ELSE NULL END > 0.1
ORDER BY avg_quarterly_sales, sum_sales, i_manufact_id
LIMIT 100
""")

tpcds_query("tpcds_q56", """
WITH ss AS (
  SELECT i_item_id, SUM(ss_ext_sales_price) AS total_sales
  FROM store_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item
                      WHERE i_color IN ('red', 'blue', 'green'))
    AND ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND d_year = 2001 AND d_moy = 2
    AND ss_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_item_id),
cs AS (
  SELECT i_item_id, SUM(cs_ext_sales_price) AS total_sales
  FROM catalog_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item
                      WHERE i_color IN ('red', 'blue', 'green'))
    AND cs_item_sk = i_item_sk
    AND cs_sold_date_sk = d_date_sk
    AND d_year = 2001 AND d_moy = 2
    AND cs_bill_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_item_id),
ws AS (
  SELECT i_item_id, SUM(ws_ext_sales_price) AS total_sales
  FROM web_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item
                      WHERE i_color IN ('red', 'blue', 'green'))
    AND ws_item_sk = i_item_sk
    AND ws_sold_date_sk = d_date_sk
    AND d_year = 2001 AND d_moy = 2
    AND ws_bill_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_item_id)
SELECT i_item_id, CAST(SUM(total_sales) AS DOUBLE) AS total_sales
FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs
      UNION ALL SELECT * FROM ws) tmp1
GROUP BY i_item_id
ORDER BY total_sales, i_item_id
LIMIT 100
""")

tpcds_query("tpcds_q60", """
WITH ss AS (
  SELECT i_item_id, SUM(ss_ext_sales_price) AS total_sales
  FROM store_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item
                      WHERE i_category = 'Music')
    AND ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 9
    AND ss_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_item_id),
cs AS (
  SELECT i_item_id, SUM(cs_ext_sales_price) AS total_sales
  FROM catalog_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item
                      WHERE i_category = 'Music')
    AND cs_item_sk = i_item_sk
    AND cs_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 9
    AND cs_bill_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_item_id),
ws AS (
  SELECT i_item_id, SUM(ws_ext_sales_price) AS total_sales
  FROM web_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item
                      WHERE i_category = 'Music')
    AND ws_item_sk = i_item_sk
    AND ws_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 9
    AND ws_bill_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_item_id)
SELECT i_item_id, CAST(SUM(total_sales) AS DOUBLE) AS total_sales
FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs
      UNION ALL SELECT * FROM ws) tmp1
GROUP BY i_item_id
ORDER BY i_item_id, total_sales
LIMIT 100
""")

tpcds_query("tpcds_q77", """
WITH ss AS (
  SELECT s_store_sk, SUM(ss_ext_sales_price) AS sales,
         SUM(ss_net_profit) AS profit
  FROM store_sales, date_dim, store
  WHERE ss_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-03' AND DATE '2000-09-02'
    AND ss_store_sk = s_store_sk
  GROUP BY s_store_sk),
sr AS (
  SELECT s_store_sk, SUM(sr_return_amt) AS returns_,
         SUM(sr_net_loss) AS profit_loss
  FROM store_returns, date_dim, store
  WHERE sr_returned_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-03' AND DATE '2000-09-02'
    AND sr_store_sk = s_store_sk
  GROUP BY s_store_sk),
cs AS (
  SELECT cs_call_center_sk, SUM(cs_ext_sales_price) AS sales,
         SUM(cs_net_profit) AS profit
  FROM catalog_sales, date_dim
  WHERE cs_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-03' AND DATE '2000-09-02'
  GROUP BY cs_call_center_sk),
cr AS (
  SELECT cr_call_center_sk, SUM(cr_return_amount) AS returns_,
         SUM(cr_net_loss) AS profit_loss
  FROM catalog_returns, date_dim
  WHERE cr_returned_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-03' AND DATE '2000-09-02'
  GROUP BY cr_call_center_sk),
ws AS (
  SELECT wp_web_page_sk, SUM(ws_ext_sales_price) AS sales,
         SUM(ws_net_profit) AS profit
  FROM web_sales, date_dim, web_page
  WHERE ws_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-03' AND DATE '2000-09-02'
    AND ws_web_page_sk = wp_web_page_sk
  GROUP BY wp_web_page_sk),
wr AS (
  SELECT wp_web_page_sk, SUM(wr_return_amt) AS returns_,
         SUM(wr_net_loss) AS profit_loss
  FROM web_returns, date_dim, web_page
  WHERE wr_returned_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-03' AND DATE '2000-09-02'
    AND wr_web_page_sk = wp_web_page_sk
  GROUP BY wp_web_page_sk)
SELECT channel, id,
       CAST(SUM(sales) AS DOUBLE) AS sales,
       CAST(SUM(returns_) AS DOUBLE) AS returns_,
       CAST(SUM(profit) AS DOUBLE) AS profit
FROM (SELECT 'store channel' AS channel, ss.s_store_sk AS id, sales,
             COALESCE(returns_, 0) AS returns_,
             (profit - COALESCE(profit_loss, 0)) AS profit
      FROM ss LEFT JOIN sr ON ss.s_store_sk = sr.s_store_sk
      UNION ALL
      SELECT 'catalog channel', cs_call_center_sk, sales, returns_,
             (profit - profit_loss)
      FROM cs, cr
      UNION ALL
      SELECT 'web channel', ws.wp_web_page_sk, sales,
             COALESCE(returns_, 0),
             (profit - COALESCE(profit_loss, 0))
      FROM ws LEFT JOIN wr ON ws.wp_web_page_sk = wr.wp_web_page_sk) x
GROUP BY ROLLUP (channel, id)
ORDER BY channel NULLS FIRST, id NULLS FIRST, sales
LIMIT 100
""")

tpcds_query("tpcds_q83", """
WITH sr_items AS (
  SELECT i_item_id AS item_id, SUM(sr_return_quantity) AS sr_item_qty
  FROM store_returns, item, date_dim
  WHERE sr_item_sk = i_item_sk
    AND d_date IN (SELECT d_date FROM date_dim
                   WHERE d_week_seq IN (SELECT d_week_seq FROM date_dim
                                        WHERE d_date BETWEEN
                                              DATE '2000-01-01'
                                          AND DATE '2000-06-30'))
    AND sr_returned_date_sk = d_date_sk
  GROUP BY i_item_id),
cr_items AS (
  SELECT i_item_id AS item_id, SUM(cr_return_quantity) AS cr_item_qty
  FROM catalog_returns, item, date_dim
  WHERE cr_item_sk = i_item_sk
    AND d_date IN (SELECT d_date FROM date_dim
                   WHERE d_week_seq IN (SELECT d_week_seq FROM date_dim
                                        WHERE d_date BETWEEN
                                              DATE '2000-01-01'
                                          AND DATE '2000-06-30'))
    AND cr_returned_date_sk = d_date_sk
  GROUP BY i_item_id),
wr_items AS (
  SELECT i_item_id AS item_id, SUM(wr_return_quantity) AS wr_item_qty
  FROM web_returns, item, date_dim
  WHERE wr_item_sk = i_item_sk
    AND d_date IN (SELECT d_date FROM date_dim
                   WHERE d_week_seq IN (SELECT d_week_seq FROM date_dim
                                        WHERE d_date BETWEEN
                                              DATE '2000-01-01'
                                          AND DATE '2000-06-30'))
    AND wr_returned_date_sk = d_date_sk
  GROUP BY i_item_id)
SELECT sr_items.item_id, sr_item_qty,
       CAST(sr_item_qty AS DOUBLE)
         / CAST(sr_item_qty + cr_item_qty + wr_item_qty AS DOUBLE)
         / 3.0 * 100 AS sr_dev,
       cr_item_qty,
       CAST(cr_item_qty AS DOUBLE)
         / CAST(sr_item_qty + cr_item_qty + wr_item_qty AS DOUBLE)
         / 3.0 * 100 AS cr_dev,
       wr_item_qty,
       CAST(wr_item_qty AS DOUBLE)
         / CAST(sr_item_qty + cr_item_qty + wr_item_qty AS DOUBLE)
         / 3.0 * 100 AS wr_dev,
       CAST(sr_item_qty + cr_item_qty + wr_item_qty AS DOUBLE) / 3.0
         AS average
FROM sr_items, cr_items, wr_items
WHERE sr_items.item_id = cr_items.item_id
  AND sr_items.item_id = wr_items.item_id
ORDER BY sr_items.item_id, sr_item_qty
LIMIT 100
""")

tpcds_query("tpcds_q91", """
SELECT cc_call_center_id AS call_center, cc_name, cc_manager,
       CAST(SUM(cr_net_loss) AS DOUBLE) AS returns_loss
FROM call_center, catalog_returns, date_dim, customer,
     customer_address, customer_demographics, household_demographics
WHERE cr_call_center_sk = cc_call_center_sk
  AND cr_returned_date_sk = d_date_sk
  AND cr_returning_customer_sk = c_customer_sk
  AND cd_demo_sk = c_current_cdemo_sk
  AND hd_demo_sk = c_current_hdemo_sk
  AND ca_address_sk = c_current_addr_sk
  AND d_year = 1998
  AND ((cd_marital_status = 'M' AND cd_education_status = 'Unknown')
    OR (cd_marital_status = 'W'
        AND cd_education_status = 'Advanced Degree'))
  AND hd_buy_potential LIKE 'Unknown%'
  AND ca_gmt_offset = -7
GROUP BY cc_call_center_id, cc_name, cc_manager,
         cd_marital_status, cd_education_status
ORDER BY returns_loss DESC, call_center
""")

tpcds_query("tpcds_q11", """
WITH year_total AS (
  SELECT c_customer_id AS customer_id,
         c_first_name AS customer_first_name,
         c_last_name AS customer_last_name,
         c_preferred_cust_flag AS customer_preferred_cust_flag,
         c_birth_country AS customer_birth_country,
         c_email_address AS customer_email_address,
         d_year AS dyear,
         CAST(SUM(ss_ext_list_price - ss_ext_discount_amt) AS DOUBLE)
           AS year_total,
         's' AS sale_type
  FROM customer, store_sales, date_dim
  WHERE c_customer_sk = ss_customer_sk AND ss_sold_date_sk = d_date_sk
  GROUP BY c_customer_id, c_first_name, c_last_name,
           c_preferred_cust_flag, c_birth_country, c_email_address, d_year
  UNION ALL
  SELECT c_customer_id, c_first_name, c_last_name, c_preferred_cust_flag,
         c_birth_country, c_email_address, d_year,
         CAST(SUM(ws_ext_list_price - ws_ext_discount_amt) AS DOUBLE),
         'w'
  FROM customer, web_sales, date_dim
  WHERE c_customer_sk = ws_bill_customer_sk AND ws_sold_date_sk = d_date_sk
  GROUP BY c_customer_id, c_first_name, c_last_name,
           c_preferred_cust_flag, c_birth_country, c_email_address, d_year)
SELECT t_s_secyear.customer_id, t_s_secyear.customer_first_name,
       t_s_secyear.customer_last_name,
       t_s_secyear.customer_email_address
FROM year_total t_s_firstyear, year_total t_s_secyear,
     year_total t_w_firstyear, year_total t_w_secyear
WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
  AND t_s_firstyear.sale_type = 's'
  AND t_w_firstyear.sale_type = 'w'
  AND t_s_secyear.sale_type = 's'
  AND t_w_secyear.sale_type = 'w'
  AND t_s_firstyear.dyear = 2001
  AND t_s_secyear.dyear = 2002
  AND t_w_firstyear.dyear = 2001
  AND t_w_secyear.dyear = 2002
  AND t_s_firstyear.year_total > 0
  AND t_w_firstyear.year_total > 0
  AND CASE WHEN t_w_firstyear.year_total > 0
           THEN t_w_secyear.year_total / t_w_firstyear.year_total
           ELSE 0.0 END
      > CASE WHEN t_s_firstyear.year_total > 0
             THEN t_s_secyear.year_total / t_s_firstyear.year_total
             ELSE 0.0 END
ORDER BY t_s_secyear.customer_id, t_s_secyear.customer_first_name,
         t_s_secyear.customer_last_name,
         t_s_secyear.customer_email_address
LIMIT 100
""")

tpcds_query("tpcds_q17", """
SELECT i_item_id, i_item_desc, s_state,
       COUNT(ss_quantity) AS store_sales_quantitycount,
       CAST(SUM(ss_quantity) AS DOUBLE) / COUNT(ss_quantity)
         AS store_sales_quantityave,
       CASE WHEN COUNT(ss_quantity) > 1 THEN
         SQRT((CAST(COUNT(ss_quantity) AS DOUBLE)
                 * CAST(SUM(ss_quantity * ss_quantity) AS DOUBLE)
               - CAST(SUM(ss_quantity) AS DOUBLE)
                 * CAST(SUM(ss_quantity) AS DOUBLE))
              / (CAST(COUNT(ss_quantity) AS DOUBLE)
                 * (CAST(COUNT(ss_quantity) AS DOUBLE) - 1)))
       ELSE NULL END AS store_sales_quantitystdev,
       COUNT(sr_return_quantity) AS store_returns_quantitycount,
       CAST(SUM(sr_return_quantity) AS DOUBLE)
         / COUNT(sr_return_quantity) AS store_returns_quantityave,
       CASE WHEN COUNT(sr_return_quantity) > 1 THEN
         SQRT((CAST(COUNT(sr_return_quantity) AS DOUBLE)
                 * CAST(SUM(sr_return_quantity * sr_return_quantity)
                        AS DOUBLE)
               - CAST(SUM(sr_return_quantity) AS DOUBLE)
                 * CAST(SUM(sr_return_quantity) AS DOUBLE))
              / (CAST(COUNT(sr_return_quantity) AS DOUBLE)
                 * (CAST(COUNT(sr_return_quantity) AS DOUBLE) - 1)))
       ELSE NULL END AS store_returns_quantitystdev,
       COUNT(cs_quantity) AS catalog_sales_quantitycount,
       CAST(SUM(cs_quantity) AS DOUBLE) / COUNT(cs_quantity)
         AS catalog_sales_quantityave
FROM store_sales, store_returns, catalog_sales,
     date_dim d1, date_dim d2, date_dim d3, store, item
WHERE d1.d_quarter_name IN ('2001Q1', '2001Q2', '2001Q3')
  AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk
  AND s_store_sk = ss_store_sk
  AND ss_customer_sk = sr_customer_sk
  AND ss_item_sk = sr_item_sk
  AND ss_ticket_number = sr_ticket_number
  AND sr_returned_date_sk = d2.d_date_sk
  AND d2.d_quarter_name IN ('2001Q1', '2001Q2', '2001Q3', '2001Q4')
  AND sr_customer_sk = cs_bill_customer_sk
  AND sr_item_sk = cs_item_sk
  AND cs_sold_date_sk = d3.d_date_sk
  AND d3.d_quarter_name IN ('2001Q1', '2001Q2', '2001Q3', '2001Q4')
GROUP BY i_item_id, i_item_desc, s_state
ORDER BY i_item_id, i_item_desc, s_state
LIMIT 100
""")

tpcds_query("tpcds_q72", """
SELECT i_item_desc, w_warehouse_name, d1.d_week_seq,
       SUM(CASE WHEN p_promo_sk IS NULL THEN 1 ELSE 0 END) AS no_promo,
       SUM(CASE WHEN p_promo_sk IS NOT NULL THEN 1 ELSE 0 END) AS promo,
       COUNT(*) AS total_cnt
FROM catalog_sales
     JOIN inventory ON (cs_item_sk = inv_item_sk)
     JOIN warehouse ON (w_warehouse_sk = inv_warehouse_sk)
     JOIN item ON (i_item_sk = cs_item_sk)
     JOIN customer_demographics ON (cs_bill_cdemo_sk = cd_demo_sk)
     JOIN household_demographics ON (cs_bill_hdemo_sk = hd_demo_sk)
     JOIN date_dim d1 ON (cs_sold_date_sk = d1.d_date_sk)
     JOIN date_dim d2 ON (inv_date_sk = d2.d_date_sk)
     JOIN date_dim d3 ON (cs_ship_date_sk = d3.d_date_sk)
     LEFT OUTER JOIN promotion ON (cs_promo_sk = p_promo_sk)
     LEFT OUTER JOIN catalog_returns
       ON (cr_item_sk = cs_item_sk AND cr_order_number = cs_order_number)
WHERE d1.d_week_seq = d2.d_week_seq
  AND inv_quantity_on_hand < cs_quantity
  AND d3.d_date > d1.d_date + 5
  AND hd_buy_potential = '>10000'
  AND d1.d_year = 1999
  AND cd_marital_status = 'D'
GROUP BY i_item_desc, w_warehouse_name, d1.d_week_seq
ORDER BY total_cnt DESC, i_item_desc, w_warehouse_name, d1.d_week_seq
LIMIT 100
""")

tpcds_query("tpcds_q78", """
WITH ws AS (
  SELECT d_year AS ws_sold_year, ws_item_sk,
         ws_bill_customer_sk AS ws_customer_sk,
         SUM(ws_quantity) AS ws_qty,
         SUM(ws_wholesale_cost) AS ws_wc,
         SUM(ws_sales_price) AS ws_sp
  FROM web_sales
       LEFT JOIN web_returns
         ON wr_order_number = ws_order_number AND ws_item_sk = wr_item_sk
       JOIN date_dim ON ws_sold_date_sk = d_date_sk
  WHERE wr_order_number IS NULL
  GROUP BY d_year, ws_item_sk, ws_bill_customer_sk),
cs AS (
  SELECT d_year AS cs_sold_year, cs_item_sk,
         cs_bill_customer_sk AS cs_customer_sk,
         SUM(cs_quantity) AS cs_qty,
         SUM(cs_wholesale_cost) AS cs_wc,
         SUM(cs_sales_price) AS cs_sp
  FROM catalog_sales
       LEFT JOIN catalog_returns
         ON cr_order_number = cs_order_number AND cs_item_sk = cr_item_sk
       JOIN date_dim ON cs_sold_date_sk = d_date_sk
  WHERE cr_order_number IS NULL
  GROUP BY d_year, cs_item_sk, cs_bill_customer_sk),
ss AS (
  SELECT d_year AS ss_sold_year, ss_item_sk,
         ss_customer_sk,
         SUM(ss_quantity) AS ss_qty,
         SUM(ss_wholesale_cost) AS ss_wc,
         SUM(ss_sales_price) AS ss_sp
  FROM store_sales
       LEFT JOIN store_returns
         ON sr_ticket_number = ss_ticket_number
            AND ss_item_sk = sr_item_sk
       JOIN date_dim ON ss_sold_date_sk = d_date_sk
  WHERE sr_ticket_number IS NULL
  GROUP BY d_year, ss_item_sk, ss_customer_sk)
SELECT ss_sold_year, ss.ss_item_sk, ss_customer_sk,
       ROUND(CAST(ss_qty AS DOUBLE)
             / CAST(COALESCE(ws_qty, 0) + COALESCE(cs_qty, 0) AS DOUBLE),
             2) AS ratio,
       ss_qty AS store_qty,
       CAST(ss_wc AS DOUBLE) AS store_wholesale_cost,
       CAST(ss_sp AS DOUBLE) AS store_sales_price,
       COALESCE(ws_qty, 0) + COALESCE(cs_qty, 0) AS other_chan_qty,
       CAST(COALESCE(ws_wc, 0) + COALESCE(cs_wc, 0) AS DOUBLE)
         AS other_chan_wholesale_cost,
       CAST(COALESCE(ws_sp, 0) + COALESCE(cs_sp, 0) AS DOUBLE)
         AS other_chan_sales_price
FROM ss
     LEFT JOIN ws ON (ws_sold_year = ss_sold_year
                      AND ws.ws_item_sk = ss.ss_item_sk
                      AND ws_customer_sk = ss_customer_sk)
     LEFT JOIN cs ON (cs_sold_year = ss_sold_year
                      AND cs.cs_item_sk = ss.ss_item_sk
                      AND cs_customer_sk = ss_customer_sk)
WHERE (COALESCE(ws_qty, 0) > 0 OR COALESCE(cs_qty, 0) > 0)
  AND ss_sold_year = 2000
ORDER BY ss_sold_year, ss.ss_item_sk, ss_customer_sk NULLS FIRST,
         ss_qty DESC, ss_wc DESC, ss_sp DESC
LIMIT 100
""")

tpcds_query("tpcds_q4", """
WITH year_total AS (
  SELECT c_customer_id AS customer_id,
         c_first_name AS customer_first_name,
         c_last_name AS customer_last_name,
         c_preferred_cust_flag AS customer_preferred_cust_flag,
         c_birth_country AS customer_birth_country,
         c_email_address AS customer_email_address,
         d_year AS dyear,
         CAST(SUM((ss_ext_list_price - ss_ext_wholesale_cost
                   - ss_ext_discount_amt) + ss_ext_sales_price)
              AS DOUBLE) / 2 AS year_total,
         's' AS sale_type
  FROM customer, store_sales, date_dim
  WHERE c_customer_sk = ss_customer_sk AND ss_sold_date_sk = d_date_sk
  GROUP BY c_customer_id, c_first_name, c_last_name,
           c_preferred_cust_flag, c_birth_country, c_email_address, d_year
  UNION ALL
  SELECT c_customer_id, c_first_name, c_last_name, c_preferred_cust_flag,
         c_birth_country, c_email_address, d_year,
         CAST(SUM((cs_ext_list_price - cs_ext_wholesale_cost
                   - cs_ext_discount_amt) + cs_ext_sales_price)
              AS DOUBLE) / 2,
         'c'
  FROM customer, catalog_sales, date_dim
  WHERE c_customer_sk = cs_bill_customer_sk
    AND cs_sold_date_sk = d_date_sk
  GROUP BY c_customer_id, c_first_name, c_last_name,
           c_preferred_cust_flag, c_birth_country, c_email_address, d_year
  UNION ALL
  SELECT c_customer_id, c_first_name, c_last_name, c_preferred_cust_flag,
         c_birth_country, c_email_address, d_year,
         CAST(SUM((ws_ext_list_price - ws_ext_wholesale_cost
                   - ws_ext_discount_amt) + ws_ext_sales_price)
              AS DOUBLE) / 2,
         'w'
  FROM customer, web_sales, date_dim
  WHERE c_customer_sk = ws_bill_customer_sk
    AND ws_sold_date_sk = d_date_sk
  GROUP BY c_customer_id, c_first_name, c_last_name,
           c_preferred_cust_flag, c_birth_country, c_email_address, d_year)
SELECT t_s_secyear.customer_id, t_s_secyear.customer_first_name,
       t_s_secyear.customer_last_name,
       t_s_secyear.customer_preferred_cust_flag
FROM year_total t_s_firstyear, year_total t_s_secyear,
     year_total t_c_firstyear, year_total t_c_secyear,
     year_total t_w_firstyear, year_total t_w_secyear
WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_c_secyear.customer_id
  AND t_s_firstyear.customer_id = t_c_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
  AND t_s_firstyear.sale_type = 's'
  AND t_c_firstyear.sale_type = 'c'
  AND t_w_firstyear.sale_type = 'w'
  AND t_s_secyear.sale_type = 's'
  AND t_c_secyear.sale_type = 'c'
  AND t_w_secyear.sale_type = 'w'
  AND t_s_firstyear.dyear = 2001
  AND t_s_secyear.dyear = 2002
  AND t_c_firstyear.dyear = 2001
  AND t_c_secyear.dyear = 2002
  AND t_w_firstyear.dyear = 2001
  AND t_w_secyear.dyear = 2002
  AND t_s_firstyear.year_total > 0
  AND t_c_firstyear.year_total > 0
  AND t_w_firstyear.year_total > 0
  AND CASE WHEN t_c_firstyear.year_total > 0
           THEN t_c_secyear.year_total / t_c_firstyear.year_total
           ELSE NULL END
      > CASE WHEN t_s_firstyear.year_total > 0
             THEN t_s_secyear.year_total / t_s_firstyear.year_total
             ELSE NULL END
  AND CASE WHEN t_c_firstyear.year_total > 0
           THEN t_c_secyear.year_total / t_c_firstyear.year_total
           ELSE NULL END
      > CASE WHEN t_w_firstyear.year_total > 0
             THEN t_w_secyear.year_total / t_w_firstyear.year_total
             ELSE NULL END
ORDER BY t_s_secyear.customer_id, t_s_secyear.customer_first_name,
         t_s_secyear.customer_last_name,
         t_s_secyear.customer_preferred_cust_flag
LIMIT 100
""")

tpcds_query("tpcds_q5", """
WITH ssr AS (
  SELECT s_store_id, SUM(sales_price) AS sales, SUM(profit) AS profit,
         SUM(return_amt) AS returns_, SUM(net_loss) AS profit_loss
  FROM (SELECT ss_store_sk AS store_sk, ss_sold_date_sk AS date_sk,
               ss_ext_sales_price AS sales_price,
               ss_net_profit AS profit,
               CAST(0 AS DECIMAL(7,2)) AS return_amt,
               CAST(0 AS DECIMAL(7,2)) AS net_loss
        FROM store_sales
        UNION ALL
        SELECT sr_store_sk, sr_returned_date_sk,
               CAST(0 AS DECIMAL(7,2)), CAST(0 AS DECIMAL(7,2)),
               sr_return_amt, sr_net_loss
        FROM store_returns) salesreturns, date_dim, store
  WHERE date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-06'
    AND store_sk = s_store_sk
  GROUP BY s_store_id),
csr AS (
  SELECT cp_catalog_page_id, SUM(sales_price) AS sales,
         SUM(profit) AS profit, SUM(return_amt) AS returns_,
         SUM(net_loss) AS profit_loss
  FROM (SELECT cs_catalog_page_sk AS page_sk,
               cs_sold_date_sk AS date_sk,
               cs_ext_sales_price AS sales_price,
               cs_net_profit AS profit,
               CAST(0 AS DECIMAL(7,2)) AS return_amt,
               CAST(0 AS DECIMAL(7,2)) AS net_loss
        FROM catalog_sales
        UNION ALL
        SELECT cr_catalog_page_sk, cr_returned_date_sk,
               CAST(0 AS DECIMAL(7,2)), CAST(0 AS DECIMAL(7,2)),
               cr_return_amount, cr_net_loss
        FROM catalog_returns) salesreturns, date_dim, catalog_page
  WHERE date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-06'
    AND page_sk = cp_catalog_page_sk
  GROUP BY cp_catalog_page_id),
wsr AS (
  SELECT web_site_id, SUM(sales_price) AS sales, SUM(profit) AS profit,
         SUM(return_amt) AS returns_, SUM(net_loss) AS profit_loss
  FROM (SELECT ws_web_site_sk AS wsr_web_site_sk,
               ws_sold_date_sk AS date_sk,
               ws_ext_sales_price AS sales_price,
               ws_net_profit AS profit,
               CAST(0 AS DECIMAL(7,2)) AS return_amt,
               CAST(0 AS DECIMAL(7,2)) AS net_loss
        FROM web_sales
        UNION ALL
        SELECT ws_web_site_sk, wr_returned_date_sk,
               CAST(0 AS DECIMAL(7,2)), CAST(0 AS DECIMAL(7,2)),
               wr_return_amt, wr_net_loss
        FROM web_returns
             LEFT OUTER JOIN web_sales
               ON (wr_item_sk = ws_item_sk
                   AND wr_order_number = ws_order_number)) salesreturns,
       date_dim, web_site
  WHERE date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-06'
    AND wsr_web_site_sk = web_site_sk
  GROUP BY web_site_id)
SELECT channel, id,
       CAST(SUM(sales) AS DOUBLE) AS sales,
       CAST(SUM(returns_) AS DOUBLE) AS returns_,
       CAST(SUM(profit) AS DOUBLE) AS profit
FROM (SELECT 'store channel' AS channel, 'store' || s_store_id AS id,
             sales, returns_, (profit - profit_loss) AS profit
      FROM ssr
      UNION ALL
      SELECT 'catalog channel', 'catalog_page' || cp_catalog_page_id,
             sales, returns_, (profit - profit_loss)
      FROM csr
      UNION ALL
      SELECT 'web channel', 'web_site' || web_site_id,
             sales, returns_, (profit - profit_loss)
      FROM wsr) x
GROUP BY ROLLUP (channel, id)
ORDER BY channel NULLS FIRST, id NULLS FIRST, sales
LIMIT 100
""")

tpcds_query("tpcds_q24", """
WITH ssales AS (
  SELECT c_last_name, c_first_name, s_store_name, ca_state, s_state,
         i_color, i_current_price, i_manager_id, i_units, i_size,
         SUM(ss_net_paid) AS netpaid
  FROM store_sales, store_returns, store, item, customer, customer_address
  WHERE ss_ticket_number = sr_ticket_number
    AND ss_item_sk = sr_item_sk
    AND ss_customer_sk = c_customer_sk
    AND ss_item_sk = i_item_sk
    AND ss_store_sk = s_store_sk
    AND c_current_addr_sk = ca_address_sk
    AND c_birth_country <> upper(ca_country)
    AND s_market_id BETWEEN 5 AND 10
  GROUP BY c_last_name, c_first_name, s_store_name, ca_state, s_state,
           i_color, i_current_price, i_manager_id, i_units, i_size)
SELECT c_last_name, c_first_name, s_store_name,
       CAST(SUM(netpaid) AS DOUBLE) AS paid
FROM ssales
WHERE i_color = 'red'
GROUP BY c_last_name, c_first_name, s_store_name
HAVING CAST(SUM(netpaid) AS DOUBLE) >
       (SELECT 0.05 * (CAST(SUM(CAST(netpaid AS DECIMAL(30,6)))
                            AS DOUBLE) / COUNT(netpaid))
        FROM ssales)
ORDER BY c_last_name, c_first_name, s_store_name, paid
""")

tpcds_query("tpcds_q54", """
WITH my_customers AS (
  SELECT DISTINCT c_customer_sk, c_current_addr_sk
  FROM (SELECT cs_sold_date_sk AS sold_date_sk,
               cs_bill_customer_sk AS customer_sk,
               cs_item_sk AS item_sk
        FROM catalog_sales
        UNION ALL
        SELECT ws_sold_date_sk, ws_bill_customer_sk, ws_item_sk
        FROM web_sales) cs_or_ws_sales, item, date_dim, customer
  WHERE sold_date_sk = d_date_sk
    AND item_sk = i_item_sk
    AND i_category = 'Women'
    AND i_class = 'pants'
    AND c_customer_sk = cs_or_ws_sales.customer_sk
    AND d_moy BETWEEN 10 AND 12 AND d_year = 1998),
my_revenue AS (
  SELECT c_customer_sk, SUM(ss_ext_sales_price) AS revenue
  FROM my_customers, store_sales, customer_address, store, date_dim
  WHERE c_current_addr_sk = ca_address_sk
    AND ca_county = s_county
    AND ca_state = s_state
    AND ss_customer_sk = c_customer_sk
    AND ss_sold_date_sk = d_date_sk
    AND d_month_seq BETWEEN (SELECT DISTINCT d_month_seq + 1
                             FROM date_dim
                             WHERE d_year = 1998 AND d_moy = 12)
                        AND (SELECT DISTINCT d_month_seq + 3
                             FROM date_dim
                             WHERE d_year = 1998 AND d_moy = 12)
  GROUP BY c_customer_sk),
segments AS (
  SELECT CAST(FLOOR(CAST(revenue AS DOUBLE) / 50) AS INT) AS segment
  FROM my_revenue)
SELECT segment, COUNT(*) AS num_customers, segment * 50 AS segment_base
FROM segments
GROUP BY segment
ORDER BY segment, num_customers
LIMIT 100
""")

tpcds_query("tpcds_q80", """
WITH ssr AS (
  SELECT s_store_id AS store_id,
         SUM(ss_ext_sales_price) AS sales,
         SUM(COALESCE(sr_return_amt, 0)) AS returns_,
         SUM(ss_net_profit - COALESCE(sr_net_loss, 0)) AS profit
  FROM store_sales
       LEFT OUTER JOIN store_returns
         ON (ss_item_sk = sr_item_sk
             AND ss_ticket_number = sr_ticket_number),
       date_dim, store, item, promotion
  WHERE ss_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-22'
    AND ss_store_sk = s_store_sk
    AND ss_item_sk = i_item_sk
    AND i_current_price > 50
    AND ss_promo_sk = p_promo_sk
    AND p_channel_tv = 'N'
  GROUP BY s_store_id),
csr AS (
  SELECT cp_catalog_page_id AS catalog_page_id,
         SUM(cs_ext_sales_price) AS sales,
         SUM(COALESCE(cr_return_amount, 0)) AS returns_,
         SUM(cs_net_profit - COALESCE(cr_net_loss, 0)) AS profit
  FROM catalog_sales
       LEFT OUTER JOIN catalog_returns
         ON (cs_item_sk = cr_item_sk
             AND cs_order_number = cr_order_number),
       date_dim, catalog_page, item, promotion
  WHERE cs_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-22'
    AND cs_catalog_page_sk = cp_catalog_page_sk
    AND cs_item_sk = i_item_sk
    AND i_current_price > 50
    AND cs_promo_sk = p_promo_sk
    AND p_channel_tv = 'N'
  GROUP BY cp_catalog_page_id),
wsr AS (
  SELECT web_site_id,
         SUM(ws_ext_sales_price) AS sales,
         SUM(COALESCE(wr_return_amt, 0)) AS returns_,
         SUM(ws_net_profit - COALESCE(wr_net_loss, 0)) AS profit
  FROM web_sales
       LEFT OUTER JOIN web_returns
         ON (ws_item_sk = wr_item_sk
             AND ws_order_number = wr_order_number),
       date_dim, web_site, item, promotion
  WHERE ws_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-22'
    AND ws_web_site_sk = web_site_sk
    AND ws_item_sk = i_item_sk
    AND i_current_price > 50
    AND ws_promo_sk = p_promo_sk
    AND p_channel_tv = 'N'
  GROUP BY web_site_id)
SELECT channel, id,
       CAST(SUM(sales) AS DOUBLE) AS sales,
       CAST(SUM(returns_) AS DOUBLE) AS returns_,
       CAST(SUM(profit) AS DOUBLE) AS profit
FROM (SELECT 'store channel' AS channel, 'store' || store_id AS id,
             sales, returns_, profit
      FROM ssr
      UNION ALL
      SELECT 'catalog channel', 'catalog_page' || catalog_page_id,
             sales, returns_, profit
      FROM csr
      UNION ALL
      SELECT 'web channel', 'web_site' || web_site_id,
             sales, returns_, profit
      FROM wsr) x
GROUP BY ROLLUP (channel, id)
ORDER BY channel NULLS FIRST, id NULLS FIRST, sales
LIMIT 100
""")

tpcds_query("tpcds_q23", """
WITH frequent_ss_items AS (
  SELECT substr(i_item_desc, 1, 30) AS itemdesc, i_item_sk AS item_sk,
         d_date AS solddate, COUNT(*) AS cnt
  FROM store_sales, date_dim, item
  WHERE ss_sold_date_sk = d_date_sk
    AND ss_item_sk = i_item_sk
    AND d_year IN (2000, 2001, 2002, 2003)
  GROUP BY substr(i_item_desc, 1, 30), i_item_sk, d_date
  HAVING COUNT(*) > 1),
max_store_sales AS (
  SELECT MAX(csales) AS tpcds_cmax
  FROM (SELECT c_customer_sk, SUM(ss_quantity * ss_sales_price) AS csales
        FROM store_sales, customer, date_dim
        WHERE ss_customer_sk = c_customer_sk
          AND ss_sold_date_sk = d_date_sk
          AND d_year IN (2000, 2001, 2002, 2003)
        GROUP BY c_customer_sk) t),
best_ss_customer AS (
  SELECT c_customer_sk, SUM(ss_quantity * ss_sales_price) AS ssales
  FROM store_sales, customer
  WHERE ss_customer_sk = c_customer_sk
  GROUP BY c_customer_sk
  HAVING CAST(SUM(ss_quantity * ss_sales_price) AS DOUBLE) >
         0.5 * (SELECT CAST(tpcds_cmax AS DOUBLE) FROM max_store_sales))
SELECT CAST(SUM(sales) AS DOUBLE) AS sum_sales
FROM (SELECT cs_quantity * cs_list_price AS sales
      FROM catalog_sales, date_dim
      WHERE d_year = 2000 AND d_moy = 2
        AND cs_sold_date_sk = d_date_sk
        AND cs_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        AND cs_bill_customer_sk IN (SELECT c_customer_sk
                                    FROM best_ss_customer)
      UNION ALL
      SELECT ws_quantity * ws_list_price
      FROM web_sales, date_dim
      WHERE d_year = 2000 AND d_moy = 2
        AND ws_sold_date_sk = d_date_sk
        AND ws_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        AND ws_bill_customer_sk IN (SELECT c_customer_sk
                                    FROM best_ss_customer)) y
LIMIT 100
""")

tpcds_query("tpcds_q39", """
WITH inv AS (
  SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy, stdev, mean,
         CASE mean WHEN 0 THEN NULL ELSE stdev / mean END AS cov
  FROM (SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy,
               CASE WHEN COUNT(inv_quantity_on_hand) > 1 THEN
                 SQRT((CAST(COUNT(inv_quantity_on_hand) AS DOUBLE)
                         * CAST(SUM(inv_quantity_on_hand
                                    * inv_quantity_on_hand) AS DOUBLE)
                       - CAST(SUM(inv_quantity_on_hand) AS DOUBLE)
                         * CAST(SUM(inv_quantity_on_hand) AS DOUBLE))
                      / (CAST(COUNT(inv_quantity_on_hand) AS DOUBLE)
                         * (CAST(COUNT(inv_quantity_on_hand) AS DOUBLE)
                            - 1)))
               ELSE NULL END AS stdev,
               CAST(SUM(inv_quantity_on_hand) AS DOUBLE)
                 / COUNT(inv_quantity_on_hand) AS mean
        FROM inventory, item, warehouse, date_dim
        WHERE inv_item_sk = i_item_sk
          AND inv_warehouse_sk = w_warehouse_sk
          AND inv_date_sk = d_date_sk
          AND d_year = 2001
        GROUP BY w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy) foo
  WHERE CASE mean WHEN 0 THEN 0 ELSE stdev / mean END > 1)
SELECT inv1.w_warehouse_sk AS wsk1, inv1.i_item_sk AS isk1,
       inv1.d_moy AS moy1, inv1.mean AS mean1, inv1.cov AS cov1,
       inv2.w_warehouse_sk AS wsk2, inv2.i_item_sk AS isk2,
       inv2.d_moy AS moy2, inv2.mean AS mean2, inv2.cov AS cov2
FROM inv inv1, inv inv2
WHERE inv1.i_item_sk = inv2.i_item_sk
  AND inv1.w_warehouse_sk = inv2.w_warehouse_sk
  AND inv1.d_moy = 1
  AND inv2.d_moy = 1 + 1
ORDER BY inv1.w_warehouse_sk, inv1.i_item_sk, inv1.d_moy, inv1.mean,
         inv1.cov, inv2.d_moy, inv2.mean, inv2.cov
""")

tpcds_query("tpcds_q75", """
WITH all_sales AS (
  SELECT d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id,
         SUM(sales_cnt) AS sales_cnt, SUM(sales_amt) AS sales_amt
  FROM (SELECT d_year, i_brand_id, i_class_id, i_category_id,
               i_manufact_id,
               cs_quantity - COALESCE(cr_return_quantity, 0) AS sales_cnt,
               cs_ext_sales_price
                 - COALESCE(cr_return_amount, CAST(0 AS DECIMAL(7,2)))
                 AS sales_amt
        FROM catalog_sales
             JOIN item ON i_item_sk = cs_item_sk
             JOIN date_dim ON d_date_sk = cs_sold_date_sk
             LEFT JOIN catalog_returns
               ON (cs_order_number = cr_order_number
                   AND cs_item_sk = cr_item_sk)
        WHERE i_category = 'Books'
        UNION
        SELECT d_year, i_brand_id, i_class_id, i_category_id,
               i_manufact_id,
               ss_quantity - COALESCE(sr_return_quantity, 0),
               ss_ext_sales_price
                 - COALESCE(sr_return_amt, CAST(0 AS DECIMAL(7,2)))
        FROM store_sales
             JOIN item ON i_item_sk = ss_item_sk
             JOIN date_dim ON d_date_sk = ss_sold_date_sk
             LEFT JOIN store_returns
               ON (ss_ticket_number = sr_ticket_number
                   AND ss_item_sk = sr_item_sk)
        WHERE i_category = 'Books'
        UNION
        SELECT d_year, i_brand_id, i_class_id, i_category_id,
               i_manufact_id,
               ws_quantity - COALESCE(wr_return_quantity, 0),
               ws_ext_sales_price
                 - COALESCE(wr_return_amt, CAST(0 AS DECIMAL(7,2)))
        FROM web_sales
             JOIN item ON i_item_sk = ws_item_sk
             JOIN date_dim ON d_date_sk = ws_sold_date_sk
             LEFT JOIN web_returns
               ON (ws_order_number = wr_order_number
                   AND ws_item_sk = wr_item_sk)
        WHERE i_category = 'Books') sales_detail
  GROUP BY d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id)
SELECT prev_yr.d_year AS prev_year, curr_yr.d_year AS year_,
       curr_yr.i_brand_id, curr_yr.i_class_id, curr_yr.i_category_id,
       curr_yr.i_manufact_id,
       prev_yr.sales_cnt AS prev_yr_cnt,
       curr_yr.sales_cnt AS curr_yr_cnt,
       curr_yr.sales_cnt - prev_yr.sales_cnt AS sales_cnt_diff,
       CAST(curr_yr.sales_amt - prev_yr.sales_amt AS DOUBLE)
         AS sales_amt_diff
FROM all_sales curr_yr, all_sales prev_yr
WHERE curr_yr.i_brand_id = prev_yr.i_brand_id
  AND curr_yr.i_class_id = prev_yr.i_class_id
  AND curr_yr.i_category_id = prev_yr.i_category_id
  AND curr_yr.i_manufact_id = prev_yr.i_manufact_id
  AND curr_yr.d_year = 2002
  AND prev_yr.d_year = 2002 - 1
  AND CAST(curr_yr.sales_cnt AS DOUBLE)
      / CAST(prev_yr.sales_cnt AS DOUBLE) < 0.9
ORDER BY sales_cnt_diff, sales_amt_diff, curr_yr.i_brand_id,
         curr_yr.i_class_id, curr_yr.i_category_id, curr_yr.i_manufact_id
LIMIT 100
""")

tpcds_query("tpcds_q66", """
SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
       w_country, ship_carriers, year_,
       CAST(SUM(jan_sales) AS DOUBLE) AS jan_sales,
       CAST(SUM(feb_sales) AS DOUBLE) AS feb_sales,
       CAST(SUM(mar_sales) AS DOUBLE) AS mar_sales,
       CAST(SUM(apr_sales) AS DOUBLE) AS apr_sales,
       CAST(SUM(may_sales) AS DOUBLE) AS may_sales,
       CAST(SUM(jun_sales) AS DOUBLE) AS jun_sales,
       CAST(SUM(jul_sales) AS DOUBLE) AS jul_sales,
       CAST(SUM(aug_sales) AS DOUBLE) AS aug_sales,
       CAST(SUM(sep_sales) AS DOUBLE) AS sep_sales,
       CAST(SUM(oct_sales) AS DOUBLE) AS oct_sales,
       CAST(SUM(nov_sales) AS DOUBLE) AS nov_sales,
       CAST(SUM(dec_sales) AS DOUBLE) AS dec_sales,
       CAST(SUM(jan_sales) AS DOUBLE) / w_warehouse_sq_ft AS jan_sales_per_sq_foot,
       CAST(SUM(feb_sales) AS DOUBLE) / w_warehouse_sq_ft AS feb_sales_per_sq_foot,
       CAST(SUM(mar_sales) AS DOUBLE) / w_warehouse_sq_ft AS mar_sales_per_sq_foot,
       CAST(SUM(apr_sales) AS DOUBLE) / w_warehouse_sq_ft AS apr_sales_per_sq_foot,
       CAST(SUM(may_sales) AS DOUBLE) / w_warehouse_sq_ft AS may_sales_per_sq_foot,
       CAST(SUM(jun_sales) AS DOUBLE) / w_warehouse_sq_ft AS jun_sales_per_sq_foot,
       CAST(SUM(jul_sales) AS DOUBLE) / w_warehouse_sq_ft AS jul_sales_per_sq_foot,
       CAST(SUM(aug_sales) AS DOUBLE) / w_warehouse_sq_ft AS aug_sales_per_sq_foot,
       CAST(SUM(sep_sales) AS DOUBLE) / w_warehouse_sq_ft AS sep_sales_per_sq_foot,
       CAST(SUM(oct_sales) AS DOUBLE) / w_warehouse_sq_ft AS oct_sales_per_sq_foot,
       CAST(SUM(nov_sales) AS DOUBLE) / w_warehouse_sq_ft AS nov_sales_per_sq_foot,
       CAST(SUM(dec_sales) AS DOUBLE) / w_warehouse_sq_ft AS dec_sales_per_sq_foot,
       CAST(SUM(jan_net) AS DOUBLE) AS jan_net,
       CAST(SUM(feb_net) AS DOUBLE) AS feb_net,
       CAST(SUM(mar_net) AS DOUBLE) AS mar_net,
       CAST(SUM(apr_net) AS DOUBLE) AS apr_net,
       CAST(SUM(may_net) AS DOUBLE) AS may_net,
       CAST(SUM(jun_net) AS DOUBLE) AS jun_net,
       CAST(SUM(jul_net) AS DOUBLE) AS jul_net,
       CAST(SUM(aug_net) AS DOUBLE) AS aug_net,
       CAST(SUM(sep_net) AS DOUBLE) AS sep_net,
       CAST(SUM(oct_net) AS DOUBLE) AS oct_net,
       CAST(SUM(nov_net) AS DOUBLE) AS nov_net,
       CAST(SUM(dec_net) AS DOUBLE) AS dec_net
FROM (
  SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
         w_state, w_country,
         'DHL,USPS' AS ship_carriers, d_year AS year_,
         SUM(CASE WHEN d_moy = 1 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS jan_sales,
         SUM(CASE WHEN d_moy = 2 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS feb_sales,
         SUM(CASE WHEN d_moy = 3 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS mar_sales,
         SUM(CASE WHEN d_moy = 4 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS apr_sales,
         SUM(CASE WHEN d_moy = 5 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS may_sales,
         SUM(CASE WHEN d_moy = 6 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS jun_sales,
         SUM(CASE WHEN d_moy = 7 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS jul_sales,
         SUM(CASE WHEN d_moy = 8 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS aug_sales,
         SUM(CASE WHEN d_moy = 9 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS sep_sales,
         SUM(CASE WHEN d_moy = 10 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS oct_sales,
         SUM(CASE WHEN d_moy = 11 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS nov_sales,
         SUM(CASE WHEN d_moy = 12 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS dec_sales,
         SUM(CASE WHEN d_moy = 1 THEN ws_net_paid * ws_quantity ELSE 0 END) AS jan_net,
         SUM(CASE WHEN d_moy = 2 THEN ws_net_paid * ws_quantity ELSE 0 END) AS feb_net,
         SUM(CASE WHEN d_moy = 3 THEN ws_net_paid * ws_quantity ELSE 0 END) AS mar_net,
         SUM(CASE WHEN d_moy = 4 THEN ws_net_paid * ws_quantity ELSE 0 END) AS apr_net,
         SUM(CASE WHEN d_moy = 5 THEN ws_net_paid * ws_quantity ELSE 0 END) AS may_net,
         SUM(CASE WHEN d_moy = 6 THEN ws_net_paid * ws_quantity ELSE 0 END) AS jun_net,
         SUM(CASE WHEN d_moy = 7 THEN ws_net_paid * ws_quantity ELSE 0 END) AS jul_net,
         SUM(CASE WHEN d_moy = 8 THEN ws_net_paid * ws_quantity ELSE 0 END) AS aug_net,
         SUM(CASE WHEN d_moy = 9 THEN ws_net_paid * ws_quantity ELSE 0 END) AS sep_net,
         SUM(CASE WHEN d_moy = 10 THEN ws_net_paid * ws_quantity ELSE 0 END) AS oct_net,
         SUM(CASE WHEN d_moy = 11 THEN ws_net_paid * ws_quantity ELSE 0 END) AS nov_net,
         SUM(CASE WHEN d_moy = 12 THEN ws_net_paid * ws_quantity ELSE 0 END) AS dec_net
  FROM web_sales, warehouse, date_dim, time_dim, ship_mode
  WHERE ws_warehouse_sk = w_warehouse_sk
    AND ws_sold_date_sk = d_date_sk
    AND ws_sold_time_sk = t_time_sk
    AND ws_ship_mode_sk = sm_ship_mode_sk
    AND d_year = 2001
    AND t_time BETWEEN 30838 AND 30838 + 28800
    AND sm_carrier IN ('DHL', 'USPS')
  GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
           w_state, w_country, d_year
  UNION ALL
  SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
         w_state, w_country,
         'DHL,USPS' AS ship_carriers, d_year AS year_,
         SUM(CASE WHEN d_moy = 1 THEN cs_ext_sales_price * cs_quantity ELSE 0 END) AS jan_sales,
         SUM(CASE WHEN d_moy = 2 THEN cs_ext_sales_price * cs_quantity ELSE 0 END) AS feb_sales,
         SUM(CASE WHEN d_moy = 3 THEN cs_ext_sales_price * cs_quantity ELSE 0 END) AS mar_sales,
         SUM(CASE WHEN d_moy = 4 THEN cs_ext_sales_price * cs_quantity ELSE 0 END) AS apr_sales,
         SUM(CASE WHEN d_moy = 5 THEN cs_ext_sales_price * cs_quantity ELSE 0 END) AS may_sales,
         SUM(CASE WHEN d_moy = 6 THEN cs_ext_sales_price * cs_quantity ELSE 0 END) AS jun_sales,
         SUM(CASE WHEN d_moy = 7 THEN cs_ext_sales_price * cs_quantity ELSE 0 END) AS jul_sales,
         SUM(CASE WHEN d_moy = 8 THEN cs_ext_sales_price * cs_quantity ELSE 0 END) AS aug_sales,
         SUM(CASE WHEN d_moy = 9 THEN cs_ext_sales_price * cs_quantity ELSE 0 END) AS sep_sales,
         SUM(CASE WHEN d_moy = 10 THEN cs_ext_sales_price * cs_quantity ELSE 0 END) AS oct_sales,
         SUM(CASE WHEN d_moy = 11 THEN cs_ext_sales_price * cs_quantity ELSE 0 END) AS nov_sales,
         SUM(CASE WHEN d_moy = 12 THEN cs_ext_sales_price * cs_quantity ELSE 0 END) AS dec_sales,
         SUM(CASE WHEN d_moy = 1 THEN cs_net_paid * cs_quantity ELSE 0 END) AS jan_net,
         SUM(CASE WHEN d_moy = 2 THEN cs_net_paid * cs_quantity ELSE 0 END) AS feb_net,
         SUM(CASE WHEN d_moy = 3 THEN cs_net_paid * cs_quantity ELSE 0 END) AS mar_net,
         SUM(CASE WHEN d_moy = 4 THEN cs_net_paid * cs_quantity ELSE 0 END) AS apr_net,
         SUM(CASE WHEN d_moy = 5 THEN cs_net_paid * cs_quantity ELSE 0 END) AS may_net,
         SUM(CASE WHEN d_moy = 6 THEN cs_net_paid * cs_quantity ELSE 0 END) AS jun_net,
         SUM(CASE WHEN d_moy = 7 THEN cs_net_paid * cs_quantity ELSE 0 END) AS jul_net,
         SUM(CASE WHEN d_moy = 8 THEN cs_net_paid * cs_quantity ELSE 0 END) AS aug_net,
         SUM(CASE WHEN d_moy = 9 THEN cs_net_paid * cs_quantity ELSE 0 END) AS sep_net,
         SUM(CASE WHEN d_moy = 10 THEN cs_net_paid * cs_quantity ELSE 0 END) AS oct_net,
         SUM(CASE WHEN d_moy = 11 THEN cs_net_paid * cs_quantity ELSE 0 END) AS nov_net,
         SUM(CASE WHEN d_moy = 12 THEN cs_net_paid * cs_quantity ELSE 0 END) AS dec_net
  FROM catalog_sales, warehouse, date_dim, time_dim, ship_mode
  WHERE cs_warehouse_sk = w_warehouse_sk
    AND cs_sold_date_sk = d_date_sk
    AND cs_sold_time_sk = t_time_sk
    AND cs_ship_mode_sk = sm_ship_mode_sk
    AND d_year = 2001
    AND t_time BETWEEN 30838 AND 30838 + 28800
    AND sm_carrier IN ('DHL', 'USPS')
  GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
           w_state, w_country, d_year
) x
GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
         w_country, ship_carriers, year_
ORDER BY w_warehouse_name
LIMIT 100
""")

tpcds_query("tpcds_q57", """
WITH v1 AS (
  SELECT i_category, i_brand, cc_name, d_year, d_moy,
         SUM(cs_sales_price) AS sum_sales,
         CAST(SUM(SUM(cs_sales_price))
              OVER (PARTITION BY i_category, i_brand, cc_name, d_year)
              AS DOUBLE)
           / COUNT(SUM(cs_sales_price))
              OVER (PARTITION BY i_category, i_brand, cc_name, d_year)
           AS avg_monthly_sales,
         RANK() OVER (PARTITION BY i_category, i_brand, cc_name
                      ORDER BY d_year, d_moy) AS rn
  FROM item, catalog_sales, date_dim, call_center
  WHERE cs_item_sk = i_item_sk
    AND cs_sold_date_sk = d_date_sk
    AND cc_call_center_sk = cs_call_center_sk
    AND (d_year = 2000
         OR (d_year = 1999 AND d_moy = 12)
         OR (d_year = 2001 AND d_moy = 1))
  GROUP BY i_category, i_brand, cc_name, d_year, d_moy),
v2 AS (
  SELECT v1.i_category, v1.i_brand, v1.cc_name, v1.d_year, v1.d_moy,
         v1.avg_monthly_sales, v1.sum_sales,
         v1_lag.sum_sales AS psum, v1_lead.sum_sales AS nsum
  FROM v1, v1 v1_lag, v1 v1_lead
  WHERE v1.i_category = v1_lag.i_category
    AND v1.i_category = v1_lead.i_category
    AND v1.i_brand = v1_lag.i_brand
    AND v1.i_brand = v1_lead.i_brand
    AND v1.cc_name = v1_lag.cc_name
    AND v1.cc_name = v1_lead.cc_name
    AND v1.rn = v1_lag.rn + 1
    AND v1.rn = v1_lead.rn - 1)
SELECT i_category, i_brand, cc_name, d_year, d_moy,
       avg_monthly_sales,
       CAST(sum_sales AS DOUBLE) AS sum_sales,
       CAST(psum AS DOUBLE) AS psum, CAST(nsum AS DOUBLE) AS nsum
FROM v2
WHERE d_year = 2000
  AND avg_monthly_sales > 0
  AND ABS(CAST(sum_sales AS DOUBLE) - avg_monthly_sales)
        / avg_monthly_sales > 0.1
ORDER BY CAST(sum_sales AS DOUBLE) - avg_monthly_sales,
         i_category, i_brand, cc_name, d_year, d_moy
LIMIT 100
""")

tpcds_query("tpcds_q14", """
WITH cross_items AS (
  SELECT i_item_sk AS ss_item_sk
  FROM item,
       (SELECT iss.i_brand_id AS brand_id, iss.i_class_id AS class_id,
               iss.i_category_id AS category_id
        FROM store_sales, item iss, date_dim d1
        WHERE ss_item_sk = iss.i_item_sk
          AND ss_sold_date_sk = d1.d_date_sk
          AND d1.d_year BETWEEN 1999 AND 1999 + 2
        INTERSECT
        SELECT ics.i_brand_id, ics.i_class_id, ics.i_category_id
        FROM catalog_sales, item ics, date_dim d2
        WHERE cs_item_sk = ics.i_item_sk
          AND cs_sold_date_sk = d2.d_date_sk
          AND d2.d_year BETWEEN 1999 AND 1999 + 2
        INTERSECT
        SELECT iws.i_brand_id, iws.i_class_id, iws.i_category_id
        FROM web_sales, item iws, date_dim d3
        WHERE ws_item_sk = iws.i_item_sk
          AND ws_sold_date_sk = d3.d_date_sk
          AND d3.d_year BETWEEN 1999 AND 1999 + 2) x
  WHERE i_brand_id = brand_id
    AND i_class_id = class_id
    AND i_category_id = category_id),
avg_sales AS (
  SELECT CAST(SUM(CAST(quantity * list_price AS DECIMAL(30,6)))
              AS DOUBLE) / COUNT(*) AS average_sales
  FROM (SELECT ss_quantity AS quantity, ss_list_price AS list_price
        FROM store_sales, date_dim
        WHERE ss_sold_date_sk = d_date_sk
          AND d_year BETWEEN 1999 AND 1999 + 2
        UNION ALL
        SELECT cs_quantity, cs_list_price
        FROM catalog_sales, date_dim
        WHERE cs_sold_date_sk = d_date_sk
          AND d_year BETWEEN 1999 AND 1999 + 2
        UNION ALL
        SELECT ws_quantity, ws_list_price
        FROM web_sales, date_dim
        WHERE ws_sold_date_sk = d_date_sk
          AND d_year BETWEEN 1999 AND 1999 + 2) x)
SELECT channel, i_brand_id, i_class_id, i_category_id,
       CAST(SUM(sales) AS DOUBLE) AS sum_sales,
       SUM(number_sales) AS number_sales
FROM (SELECT 'store' AS channel, i_brand_id, i_class_id, i_category_id,
             SUM(ss_quantity * ss_list_price) AS sales,
             COUNT(*) AS number_sales
      FROM store_sales, item, date_dim
      WHERE ss_item_sk IN (SELECT ss_item_sk FROM cross_items)
        AND ss_item_sk = i_item_sk
        AND ss_sold_date_sk = d_date_sk
        AND d_year = 1999 + 2 AND d_moy = 11
      GROUP BY i_brand_id, i_class_id, i_category_id
      HAVING CAST(SUM(ss_quantity * ss_list_price) AS DOUBLE) >
             (SELECT average_sales FROM avg_sales)
      UNION ALL
      SELECT 'catalog', i_brand_id, i_class_id, i_category_id,
             SUM(cs_quantity * cs_list_price), COUNT(*)
      FROM catalog_sales, item, date_dim
      WHERE cs_item_sk IN (SELECT ss_item_sk FROM cross_items)
        AND cs_item_sk = i_item_sk
        AND cs_sold_date_sk = d_date_sk
        AND d_year = 1999 + 2 AND d_moy = 11
      GROUP BY i_brand_id, i_class_id, i_category_id
      HAVING CAST(SUM(cs_quantity * cs_list_price) AS DOUBLE) >
             (SELECT average_sales FROM avg_sales)
      UNION ALL
      SELECT 'web', i_brand_id, i_class_id, i_category_id,
             SUM(ws_quantity * ws_list_price), COUNT(*)
      FROM web_sales, item, date_dim
      WHERE ws_item_sk IN (SELECT ss_item_sk FROM cross_items)
        AND ws_item_sk = i_item_sk
        AND ws_sold_date_sk = d_date_sk
        AND d_year = 1999 + 2 AND d_moy = 11
      GROUP BY i_brand_id, i_class_id, i_category_id
      HAVING CAST(SUM(ws_quantity * ws_list_price) AS DOUBLE) >
             (SELECT average_sales FROM avg_sales)) y
GROUP BY ROLLUP (channel, i_brand_id, i_class_id, i_category_id)
ORDER BY channel NULLS FIRST, i_brand_id NULLS FIRST,
         i_class_id NULLS FIRST, i_category_id NULLS FIRST
LIMIT 100
""")

tpcds_query("tpcds_q64", """
WITH cs_ui AS (
  SELECT cs_item_sk,
         SUM(cs_ext_list_price) AS sale,
         SUM(cr_refunded_cash + cr_reversed_charge + cr_store_credit)
           AS refund
  FROM catalog_sales, catalog_returns
  WHERE cs_item_sk = cr_item_sk
    AND cs_order_number = cr_order_number
  GROUP BY cs_item_sk
  HAVING SUM(cs_ext_list_price) >
         2 * SUM(cr_refunded_cash + cr_reversed_charge + cr_store_credit)),
cross_sales AS (
  SELECT i_product_name AS product_name, i_item_sk AS item_sk,
         s_store_name AS store_name, s_zip AS store_zip,
         ad1.ca_street_number AS b_street_number,
         ad1.ca_street_name AS b_street_name,
         ad1.ca_city AS b_city, ad1.ca_zip AS b_zip,
         ad2.ca_street_number AS c_street_number,
         ad2.ca_street_name AS c_street_name,
         ad2.ca_city AS c_city, ad2.ca_zip AS c_zip,
         d1.d_year AS syear, d2.d_year AS fsyear, d3.d_year AS s2year,
         COUNT(*) AS cnt,
         SUM(ss_wholesale_cost) AS s1,
         SUM(ss_list_price) AS s2,
         SUM(ss_coupon_amt) AS s3
  FROM store_sales, store_returns, cs_ui,
       date_dim d1, date_dim d2, date_dim d3,
       store, customer,
       customer_demographics cd1, customer_demographics cd2,
       promotion, household_demographics hd1, household_demographics hd2,
       customer_address ad1, customer_address ad2,
       income_band ib1, income_band ib2, item
  WHERE ss_store_sk = s_store_sk
    AND ss_sold_date_sk = d1.d_date_sk
    AND ss_customer_sk = c_customer_sk
    AND ss_cdemo_sk = cd1.cd_demo_sk
    AND ss_hdemo_sk = hd1.hd_demo_sk
    AND ss_addr_sk = ad1.ca_address_sk
    AND ss_item_sk = i_item_sk
    AND ss_item_sk = sr_item_sk
    AND ss_ticket_number = sr_ticket_number
    AND ss_item_sk = cs_ui.cs_item_sk
    AND c_current_cdemo_sk = cd2.cd_demo_sk
    AND c_current_hdemo_sk = hd2.hd_demo_sk
    AND c_current_addr_sk = ad2.ca_address_sk
    AND c_first_sales_date_sk = d2.d_date_sk
    AND c_first_shipto_date_sk = d3.d_date_sk
    AND ss_promo_sk = p_promo_sk
    AND hd1.hd_income_band_sk = ib1.ib_income_band_sk
    AND hd2.hd_income_band_sk = ib2.ib_income_band_sk
    AND cd1.cd_marital_status <> cd2.cd_marital_status
    AND i_color IN ('purple', 'red', 'blue', 'green', 'white', 'black')
    AND i_current_price BETWEEN 0.99 AND 85
    AND i_current_price BETWEEN 1.99 AND 90
  GROUP BY i_product_name, i_item_sk, s_store_name, s_zip,
           ad1.ca_street_number, ad1.ca_street_name, ad1.ca_city,
           ad1.ca_zip, ad2.ca_street_number, ad2.ca_street_name,
           ad2.ca_city, ad2.ca_zip, d1.d_year, d2.d_year, d3.d_year)
SELECT cs1.product_name, cs1.store_name, cs1.store_zip,
       cs1.b_street_number, cs1.b_street_name, cs1.b_city, cs1.b_zip,
       cs1.c_street_number, cs1.c_street_name, cs1.c_city, cs1.c_zip,
       cs1.syear AS syear1, cs1.cnt AS cnt1,
       CAST(cs1.s1 AS DOUBLE) AS s11, CAST(cs1.s2 AS DOUBLE) AS s21,
       CAST(cs1.s3 AS DOUBLE) AS s31,
       cs2.s1 AS s12_raw, cs2.s2 AS s22_raw, cs2.s3 AS s32_raw,
       cs2.syear AS syear2, cs2.cnt AS cnt2
FROM cross_sales cs1, cross_sales cs2
WHERE cs1.item_sk = cs2.item_sk
  AND cs1.syear = 1999
  AND cs2.syear = 1999 + 1
  AND cs2.cnt <= cs1.cnt
  AND cs1.store_name = cs2.store_name
  AND cs1.store_zip = cs2.store_zip
ORDER BY cs1.product_name, cs1.store_name, cnt2, cs1.b_zip, cs1.c_zip,
         cs1.b_street_number, cs1.c_street_number, syear1, cnt1
LIMIT 100
""")

# the reference's 103-query battery = 99 numbers + the a/b variant pairs
# (TpcdsTestProgram.java:75-86: 14a/b, 23a/b, 24a/b, 39a/b). The plain
# tpcds_qNN entries above are the a-variants; these are the b-variants.

tpcds_query("tpcds_q14b", """
WITH cross_items AS (
  SELECT i_item_sk AS ss_item_sk
  FROM item,
       (SELECT iss.i_brand_id AS brand_id, iss.i_class_id AS class_id,
               iss.i_category_id AS category_id
        FROM store_sales, item iss, date_dim d1
        WHERE ss_item_sk = iss.i_item_sk
          AND ss_sold_date_sk = d1.d_date_sk
          AND d1.d_year BETWEEN 1999 AND 1999 + 2
        INTERSECT
        SELECT ics.i_brand_id, ics.i_class_id, ics.i_category_id
        FROM catalog_sales, item ics, date_dim d2
        WHERE cs_item_sk = ics.i_item_sk
          AND cs_sold_date_sk = d2.d_date_sk
          AND d2.d_year BETWEEN 1999 AND 1999 + 2
        INTERSECT
        SELECT iws.i_brand_id, iws.i_class_id, iws.i_category_id
        FROM web_sales, item iws, date_dim d3
        WHERE ws_item_sk = iws.i_item_sk
          AND ws_sold_date_sk = d3.d_date_sk
          AND d3.d_year BETWEEN 1999 AND 1999 + 2) x
  WHERE i_brand_id = brand_id
    AND i_class_id = class_id
    AND i_category_id = category_id),
avg_sales AS (
  SELECT CAST(SUM(CAST(quantity * list_price AS DECIMAL(30,6)))
              AS DOUBLE) / COUNT(*) AS average_sales
  FROM (SELECT ss_quantity AS quantity, ss_list_price AS list_price
        FROM store_sales, date_dim
        WHERE ss_sold_date_sk = d_date_sk
          AND d_year BETWEEN 1999 AND 1999 + 2
        UNION ALL
        SELECT cs_quantity, cs_list_price
        FROM catalog_sales, date_dim
        WHERE cs_sold_date_sk = d_date_sk
          AND d_year BETWEEN 1999 AND 1999 + 2
        UNION ALL
        SELECT ws_quantity, ws_list_price
        FROM web_sales, date_dim
        WHERE ws_sold_date_sk = d_date_sk
          AND d_year BETWEEN 1999 AND 1999 + 2) x)
SELECT this_year.channel AS ty_channel,
       this_year.i_brand_id AS ty_brand,
       this_year.i_class_id AS ty_class,
       this_year.i_category_id AS ty_category,
       this_year.sales AS ty_sales,
       this_year.number_sales AS ty_number_sales,
       last_year.channel AS ly_channel,
       last_year.i_brand_id AS ly_brand,
       last_year.i_class_id AS ly_class,
       last_year.i_category_id AS ly_category,
       last_year.sales AS ly_sales,
       last_year.number_sales AS ly_number_sales
FROM (SELECT 'store' AS channel, i_brand_id, i_class_id, i_category_id,
             CAST(SUM(ss_quantity * ss_list_price) AS DOUBLE) AS sales,
             COUNT(*) AS number_sales
      FROM store_sales, item, date_dim
      WHERE ss_item_sk IN (SELECT ss_item_sk FROM cross_items)
        AND ss_item_sk = i_item_sk
        AND ss_sold_date_sk = d_date_sk
        AND d_week_seq = (SELECT d_week_seq FROM date_dim
                          WHERE d_year = 1999 + 1
                            AND d_moy = 12 AND d_dom = 11)
      GROUP BY i_brand_id, i_class_id, i_category_id
      HAVING CAST(SUM(ss_quantity * ss_list_price) AS DOUBLE) >
             (SELECT average_sales FROM avg_sales)) this_year,
     (SELECT 'store' AS channel, i_brand_id, i_class_id, i_category_id,
             CAST(SUM(ss_quantity * ss_list_price) AS DOUBLE) AS sales,
             COUNT(*) AS number_sales
      FROM store_sales, item, date_dim
      WHERE ss_item_sk IN (SELECT ss_item_sk FROM cross_items)
        AND ss_item_sk = i_item_sk
        AND ss_sold_date_sk = d_date_sk
        AND d_week_seq = (SELECT d_week_seq FROM date_dim
                          WHERE d_year = 1999
                            AND d_moy = 12 AND d_dom = 11)
      GROUP BY i_brand_id, i_class_id, i_category_id
      HAVING CAST(SUM(ss_quantity * ss_list_price) AS DOUBLE) >
             (SELECT average_sales FROM avg_sales)) last_year
WHERE this_year.i_brand_id = last_year.i_brand_id
  AND this_year.i_class_id = last_year.i_class_id
  AND this_year.i_category_id = last_year.i_category_id
ORDER BY this_year.channel, this_year.i_brand_id, this_year.i_class_id,
         this_year.i_category_id
LIMIT 100
""")

tpcds_query("tpcds_q23b", """
WITH frequent_ss_items AS (
  SELECT substr(i_item_desc, 1, 30) AS itemdesc, i_item_sk AS item_sk,
         d_date AS solddate, COUNT(*) AS cnt
  FROM store_sales, date_dim, item
  WHERE ss_sold_date_sk = d_date_sk
    AND ss_item_sk = i_item_sk
    AND d_year IN (2000, 2001, 2002, 2003)
  GROUP BY substr(i_item_desc, 1, 30), i_item_sk, d_date
  HAVING COUNT(*) > 1),
max_store_sales AS (
  SELECT MAX(csales) AS tpcds_cmax
  FROM (SELECT c_customer_sk, SUM(ss_quantity * ss_sales_price) AS csales
        FROM store_sales, customer, date_dim
        WHERE ss_customer_sk = c_customer_sk
          AND ss_sold_date_sk = d_date_sk
          AND d_year IN (2000, 2001, 2002, 2003)
        GROUP BY c_customer_sk) t),
best_ss_customer AS (
  SELECT c_customer_sk, SUM(ss_quantity * ss_sales_price) AS ssales
  FROM store_sales, customer
  WHERE ss_customer_sk = c_customer_sk
  GROUP BY c_customer_sk
  HAVING CAST(SUM(ss_quantity * ss_sales_price) AS DOUBLE) >
         0.5 * (SELECT CAST(tpcds_cmax AS DOUBLE) FROM max_store_sales))
SELECT c_last_name, c_first_name, CAST(SUM(sales) AS DOUBLE) AS sales_
FROM (SELECT c_last_name, c_first_name,
             cs_quantity * cs_list_price AS sales
      FROM catalog_sales, customer, date_dim
      WHERE d_year = 2000 AND d_moy = 2
        AND cs_sold_date_sk = d_date_sk
        AND cs_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        AND cs_bill_customer_sk IN (SELECT c_customer_sk
                                    FROM best_ss_customer)
        AND cs_bill_customer_sk = c_customer_sk
      UNION ALL
      SELECT c_last_name, c_first_name, ws_quantity * ws_list_price
      FROM web_sales, customer, date_dim
      WHERE d_year = 2000 AND d_moy = 2
        AND ws_sold_date_sk = d_date_sk
        AND ws_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        AND ws_bill_customer_sk IN (SELECT c_customer_sk
                                    FROM best_ss_customer)
        AND ws_bill_customer_sk = c_customer_sk) y
GROUP BY c_last_name, c_first_name
ORDER BY c_last_name, c_first_name, sales_
LIMIT 100
""")

tpcds_query("tpcds_q24b", """
WITH ssales AS (
  SELECT c_last_name, c_first_name, s_store_name, ca_state, s_state,
         i_color, i_current_price, i_manager_id, i_units, i_size,
         SUM(ss_net_paid) AS netpaid
  FROM store_sales, store_returns, store, item, customer, customer_address
  WHERE ss_ticket_number = sr_ticket_number
    AND ss_item_sk = sr_item_sk
    AND ss_customer_sk = c_customer_sk
    AND ss_item_sk = i_item_sk
    AND ss_store_sk = s_store_sk
    AND c_current_addr_sk = ca_address_sk
    AND c_birth_country <> upper(ca_country)
    AND s_market_id BETWEEN 5 AND 10
  GROUP BY c_last_name, c_first_name, s_store_name, ca_state, s_state,
           i_color, i_current_price, i_manager_id, i_units, i_size)
SELECT c_last_name, c_first_name, s_store_name,
       CAST(SUM(netpaid) AS DOUBLE) AS paid
FROM ssales
WHERE i_color = 'blue'
GROUP BY c_last_name, c_first_name, s_store_name
HAVING CAST(SUM(netpaid) AS DOUBLE) >
       (SELECT 0.05 * (CAST(SUM(CAST(netpaid AS DECIMAL(30,6)))
                            AS DOUBLE) / COUNT(netpaid))
        FROM ssales)
ORDER BY c_last_name, c_first_name, s_store_name, paid
""")

tpcds_query("tpcds_q39b", """
WITH inv AS (
  SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy, stdev, mean,
         CASE mean WHEN 0 THEN NULL ELSE stdev / mean END AS cov
  FROM (SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy,
               CASE WHEN COUNT(inv_quantity_on_hand) > 1 THEN
                 SQRT((CAST(COUNT(inv_quantity_on_hand) AS DOUBLE)
                         * CAST(SUM(inv_quantity_on_hand
                                    * inv_quantity_on_hand) AS DOUBLE)
                       - CAST(SUM(inv_quantity_on_hand) AS DOUBLE)
                         * CAST(SUM(inv_quantity_on_hand) AS DOUBLE))
                      / (CAST(COUNT(inv_quantity_on_hand) AS DOUBLE)
                         * (CAST(COUNT(inv_quantity_on_hand) AS DOUBLE)
                            - 1)))
               ELSE NULL END AS stdev,
               CAST(SUM(inv_quantity_on_hand) AS DOUBLE)
                 / COUNT(inv_quantity_on_hand) AS mean
        FROM inventory, item, warehouse, date_dim
        WHERE inv_item_sk = i_item_sk
          AND inv_warehouse_sk = w_warehouse_sk
          AND inv_date_sk = d_date_sk
          AND d_year = 2001
        GROUP BY w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy) foo
  WHERE CASE mean WHEN 0 THEN 0 ELSE stdev / mean END > 1)
SELECT inv1.w_warehouse_sk AS wsk1, inv1.i_item_sk AS isk1,
       inv1.d_moy AS moy1, inv1.mean AS mean1, inv1.cov AS cov1,
       inv2.w_warehouse_sk AS wsk2, inv2.i_item_sk AS isk2,
       inv2.d_moy AS moy2, inv2.mean AS mean2, inv2.cov AS cov2
FROM inv inv1, inv inv2
WHERE inv1.i_item_sk = inv2.i_item_sk
  AND inv1.w_warehouse_sk = inv2.w_warehouse_sk
  AND inv1.d_moy = 1
  AND inv2.d_moy = 1 + 1
  AND inv1.cov > 1.25
ORDER BY inv1.w_warehouse_sk, inv1.i_item_sk, inv1.d_moy, inv1.mean,
         inv1.cov, inv2.d_moy, inv2.mean, inv2.cov
""")
