"""Scalar-function-library coverage queries (SURVEY §2.8).

One query per function family; every expression is checked value-exact
against DuckDB (per-row scalar functions carry no summation-order risk;
transcendentals are rounded to 9-10 digits to absorb last-ulp libm
differences between the JVM and DuckDB's libm).

Flink-compat residue functions (SPLIT_INDEX, IS_DIGIT, ...) come from
flink_parent_spark.functions.registry — SQL UDFs that inline into Catalyst.
"""

from __future__ import annotations

from flink_parent_spark.functions.registry import register_flink_functions
from flink_parent_spark.queries.registry import df_query, register, sql_query
from flink_parent_spark.tables import load_tables

# --- string functions -------------------------------------------------------

sql_query(
    "fn_string_basic",
    """
    SELECT c_custkey,
           UPPER(c_name) AS up, LOWER(c_mktsegment) AS lo,
           LENGTH(c_name) AS len,
           SUBSTRING(c_name, 1, 8) AS sub,
           CONCAT(c_name, '/', c_mktsegment) AS cat,
           REPLACE(c_name, 'Customer', 'Cust') AS repl,
           TRIM('  pad  ') AS trimmed,
           LTRIM('  pad') AS l_trimmed,
           RTRIM('pad  ') AS r_trimmed,
           LPAD(CAST(c_custkey AS STRING), 8, '0') AS padded,
           RPAD(c_mktsegment, 12, '.') AS rpadded,
           REVERSE(c_mktsegment) AS rev,
           REPEAT(c_mktsegment, 2) AS rep,
           LEFT(c_name, 4) AS l4, RIGHT(c_name, 4) AS r4
    FROM customer WHERE c_custkey < 30
    """,
)

sql_query(
    "fn_string_search",
    """
    SELECT c_custkey,
           POSITION('5' IN c_name) AS pos5,
           STARTSWITH(c_name, 'Customer') AS sw,
           ENDSWITH(c_name, '1') AS ew,
           CONTAINS(c_name, '00') AS has00,
           c_name LIKE 'Customer#0%' AS like_pat,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS digits,
           REGEXP_REPLACE(c_name, '[0-9]', '#') AS masked
    FROM customer WHERE c_custkey < 30
    """,
    oracle="""
    SELECT c_custkey,
           POSITION('5' IN c_name) AS pos5,
           STARTS_WITH(c_name, 'Customer') AS sw,
           ENDS_WITH(c_name, '1') AS ew,
           CONTAINS(c_name, '00') AS has00,
           c_name LIKE 'Customer#0%' AS like_pat,
           COALESCE(REGEXP_EXTRACT(c_name, '([0-9]+)', 1), '') AS digits,
           REGEXP_REPLACE(c_name, '[0-9]', '#', 'g') AS masked
    FROM customer WHERE c_custkey < 30
    """,
)

sql_query(
    "fn_string_split_concat_ws",
    """
    SELECT doc_id,
           CONCAT_WS('|', lang, source) AS tagged,
           SPLIT(text, ' ')[0] AS first_tok,
           SIZE(SPLIT(text, ' ')) AS n_toks,
           SUBSTRING_INDEX(source, 'c', 1) AS before_c
    FROM documents WHERE doc_id < 30
    """,
    oracle="""
    SELECT doc_id,
           CONCAT_WS('|', lang, source) AS tagged,
           string_split(text, ' ')[1] AS first_tok,
           len(string_split(text, ' ')) AS n_toks,
           string_split(source, 'c')[1] AS before_c
    FROM documents WHERE doc_id < 30
    """,
)

# --- math functions ---------------------------------------------------------

sql_query(
    "fn_math",
    """
    SELECT p_partkey,
           ABS(p_retailprice - 1000) AS a,
           CAST(CEIL(p_retailprice) AS DOUBLE) AS c,
           CAST(FLOOR(p_retailprice) AS DOUBLE) AS f,
           ROUND(p_retailprice, 1) AS r1,
           CAST(SIGN(p_retailprice - 1000) AS DOUBLE) AS sg,
           MOD(p_partkey, 7) AS m7,
           POWER(p_size, 2) AS sq,
           SQRT(CAST(p_size AS DOUBLE)) AS sqr,
           ROUND(EXP(p_size / 100.0), 9) AS e,
           ROUND(LN(p_retailprice), 9) AS lnp,
           ROUND(LOG10(p_retailprice), 9) AS lg10,
           ROUND(LOG2(CAST(p_size AS DOUBLE)), 9) AS lg2,
           ROUND(SIN(p_size), 9) AS sn,
           ROUND(COS(p_size), 9) AS cs,
           ROUND(ATAN2(CAST(p_size AS DOUBLE), 10.0), 9) AS at2,
           ROUND(DEGREES(1.0), 9) AS deg, ROUND(RADIANS(180.0), 9) AS rad,
           ROUND(PI(), 9) AS pi_val
    FROM part WHERE p_partkey < 40
    """,
)

sql_query(
    "fn_hex_conv",
    """
    SELECT n_nationkey,
           HEX(n_nationkey) AS h,
           CONV(SUBSTRING(MD5(n_name), 1, 15), 16, 10) AS md5_int
    FROM nation
    """,
    oracle="""
    SELECT n_nationkey,
           HEX(n_nationkey) AS h,
           CAST(('0x' || SUBSTRING(MD5(n_name), 1, 15))::BIGINT AS VARCHAR) AS md5_int
    FROM nation
    """,
)

# --- temporal functions -----------------------------------------------------

sql_query(
    "fn_temporal_extract",
    """
    SELECT o_orderkey,
           EXTRACT(YEAR FROM o_orderdate) AS y,
           EXTRACT(MONTH FROM o_orderdate) AS mo,
           EXTRACT(DAY FROM o_orderdate) AS d,
           QUARTER(o_orderdate) AS q,
           DATE_TRUNC('month', o_orderdate) AS mstart,
           DATE_TRUNC('week', o_orderdate) AS wstart,
           o_orderdate + INTERVAL '45' DAY AS plus45,
           o_orderdate - INTERVAL '6' HOUR AS minus6h,
           CAST(o_orderdate AS DATE) AS as_date
    FROM orders WHERE o_orderkey < 60
    """,
    oracle="""
    SELECT o_orderkey,
           EXTRACT(YEAR FROM o_orderdate) AS y,
           EXTRACT(MONTH FROM o_orderdate) AS mo,
           EXTRACT(DAY FROM o_orderdate) AS d,
           QUARTER(o_orderdate) AS q,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS mstart,
           CAST(DATE_TRUNC('week', o_orderdate) AS TIMESTAMP) AS wstart,
           o_orderdate + INTERVAL '45' DAY AS plus45,
           o_orderdate - INTERVAL '6' HOUR AS minus6h,
           CAST(o_orderdate AS DATE) AS as_date
    FROM orders WHERE o_orderkey < 60
    """,
)

sql_query(
    "fn_temporal_epoch_format",
    """
    SELECT event_id,
           UNIX_TIMESTAMP(ts) AS epoch_s,
           DATE_FORMAT(ts, 'yyyy-MM-dd HH:mm') AS fmt,
           TIMESTAMPDIFF(MINUTE, TIMESTAMP '2024-01-01 00:00:00', ts) AS mins_since,
           TIMESTAMPADD(HOUR, 2, ts) AS plus2h
    FROM events WHERE event_id < 40
    """,
    oracle="""
    SELECT event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
           strftime(ts, '%Y-%m-%d %H:%M') AS fmt,
           datediff('minute', TIMESTAMP '2024-01-01 00:00:00', ts) AS mins_since,
           ts + INTERVAL '2' HOUR AS plus2h
    FROM events WHERE event_id < 40
    """,
)

# --- hash functions ---------------------------------------------------------

sql_query(
    "fn_hash",
    """
    SELECT n_nationkey, MD5(n_name) AS h_md5, SHA2(n_name, 256) AS h_sha256
    FROM nation
    """,
    oracle="""
    SELECT n_nationkey, MD5(n_name) AS h_md5, SHA256(n_name) AS h_sha256
    FROM nation
    """,
)

# --- conditional / null handling -------------------------------------------

sql_query(
    "fn_conditional",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_class,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_or_default,
           GREATEST(c_acctbal, 0.0) AS clamped,
           LEAST(CAST(c_custkey AS DOUBLE), 100.0) AS capped,
           c_nationkey IN (1, 2, 3) AS in_small,
           c_acctbal BETWEEN 1000 AND 2000 AS in_band,
           c_acctbal IS NOT NULL AS nn
    FROM customer WHERE c_custkey < 50
    """,
)

# --- collection functions ---------------------------------------------------

sql_query(
    "fn_collections",
    """
    SELECT n_nationkey,
           ARRAY_JOIN(ARRAY(n_nationkey, n_regionkey), ',') AS pair,
           SIZE(ARRAY(n_nationkey, n_regionkey)) AS pair_len,
           ELEMENT_AT(ARRAY(n_nationkey, n_regionkey), 2) AS second,
           ARRAY_CONTAINS(ARRAY(n_nationkey, n_regionkey), 0) AS has_zero,
           ARRAY_JOIN(SORT_ARRAY(ARRAY(n_regionkey, n_nationkey)), ',')
             AS sorted_pair,
           ARRAY_JOIN(SLICE(ARRAY(1, 2, 3, 4), 2, 2), ',') AS mid
    FROM nation
    """,
    oracle="""
    -- array outputs serialized to strings: the driver canonicalizer cannot
    -- hash numpy.ndarray cells, and it keeps the comparison engine-neutral
    SELECT n_nationkey,
           array_to_string([n_nationkey, n_regionkey], ',') AS pair,
           len([n_nationkey, n_regionkey]) AS pair_len,
           [n_nationkey, n_regionkey][2] AS second,
           list_contains([n_nationkey, n_regionkey], 0) AS has_zero,
           array_to_string(list_sort([n_regionkey, n_nationkey]), ',')
             AS sorted_pair,
           array_to_string([1, 2, 3, 4][2:3], ',') AS mid
    FROM nation
    """,
)

sql_query(
    "fn_str_to_map_parse_url",
    """
    SELECT doc_id,
           STR_TO_MAP(CONCAT('lang:', lang, ',src:', source), ',', ':')['lang']
             AS lang_from_map,
           PARSE_URL(CONCAT('https://example.com/', source, '?d=', doc_id),
                     'HOST') AS host,
           PARSE_URL(CONCAT('https://example.com/', source, '?d=', doc_id),
                     'QUERY', 'd') AS qparam
    FROM documents WHERE doc_id < 25
    """,
    oracle="""
    SELECT doc_id,
           lang AS lang_from_map,
           'example.com' AS host,
           CAST(doc_id AS VARCHAR) AS qparam
    FROM documents WHERE doc_id < 25
    """,
)

sql_query(
    "over_ignore_nulls",
    """
    SELECT o_orderkey,
           LAST_VALUE(CASE WHEN o_orderstatus = 'F' THEN o_orderkey END)
             IGNORE NULLS OVER w AS last_finished,
           LEAD(o_orderkey, 1) OVER w AS next_any
    FROM orders
    WHERE o_custkey < 40
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    oracle="""
    SELECT o_orderkey,
           LAST_VALUE(CASE WHEN o_orderstatus = 'F' THEN o_orderkey END
                      IGNORE NULLS) OVER w AS last_finished,
           LEAD(o_orderkey, 1) OVER w AS next_any
    FROM orders
    WHERE o_custkey < 40
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)

sql_query(
    "fn_null_semantics",
    """
    SELECT k,
           COUNT(*) AS n_rows,
           COUNT(v) AS n_nonnull,
           COALESCE(CAST(SUM(CAST(v AS DECIMAL(20,6))) AS DOUBLE), -1.0) AS sum_v,
           MAX(v IS NULL) AS has_null
    FROM (VALUES (1, 10.0), (1, CAST(NULL AS DOUBLE)), (2, 5.0),
                 (2, 7.0), (3, CAST(NULL AS DOUBLE))) AS t(k, v)
    GROUP BY k
    ORDER BY k NULLS FIRST
    """,
)

sql_query(
    "fn_decimal_arithmetic",
    """
    SELECT p_partkey,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 3 AS DOUBLE) AS tripled,
           CAST(CAST(CAST(p_retailprice AS DECIMAL(12,2))
                + CAST(0.05 AS DECIMAL(4,2)) AS DECIMAL(14,2)) AS DOUBLE)
             AS plus_tax,
           CAST(CAST(CAST(p_retailprice AS DECIMAL(12,2)) / 4 AS DECIMAL(16,4))
                AS DOUBLE) AS quartered
    FROM part WHERE p_partkey < 40
    """,
)

sql_query(
    "fn_array_hof",
    """
    SELECT n_nationkey,
           ARRAY_JOIN(TRANSFORM(SEQUENCE(1, 4), x -> x * n_nationkey), ',')
             AS multiples,
           ARRAY_JOIN(FILTER(SEQUENCE(1, 10), x -> x % 3 = 0), ',') AS div3,
           AGGREGATE(SEQUENCE(1, 5), CAST(0 AS BIGINT), (a, x) -> a + x)
             AS sum15,
           EXISTS(SEQUENCE(1, 5), x -> x = n_nationkey) AS small_key,
           ARRAY_JOIN(ZIP_WITH(ARRAY(1, 2, 3), ARRAY(10, 20, 30),
                               (a, b) -> a + b), ',') AS zipped
    FROM nation
    """,
    oracle="""
    -- array outputs serialized to strings (driver canonicalizer contract)
    SELECT n_nationkey,
           array_to_string(list_transform(generate_series(1, 4),
                                          x -> x * n_nationkey), ',')
             AS multiples,
           array_to_string(list_filter(generate_series(1, 10),
                                       x -> x % 3 = 0), ',') AS div3,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
                       generate_series(1, 5)), (a, x) -> a + x) AS sum15,
           len(list_filter(generate_series(1, 5), x -> x = n_nationkey)) > 0
             AS small_key,
           '11,22,33' AS zipped
    FROM nation
    """,
)

sql_query(
    "fn_bitwise",
    """
    SELECT n_nationkey,
           n_nationkey & 12 AS b_and,
           n_nationkey | 5 AS b_or,
           CAST(n_nationkey AS BIGINT) ^ 9 AS b_xor,
           SHIFTLEFT(CAST(n_nationkey AS BIGINT), 2) AS shl,
           SHIFTRIGHT(CAST(n_nationkey AS BIGINT), 1) AS shr,
           BIT_COUNT(CAST(n_nationkey AS BIGINT)) AS popcount,
           WIDTH_BUCKET(CAST(n_nationkey AS DOUBLE), 0.0, 25.0, 5) AS bucket
    FROM nation
    """,
    oracle="""
    SELECT n_nationkey,
           n_nationkey & 12 AS b_and,
           n_nationkey | 5 AS b_or,
           xor(CAST(n_nationkey AS BIGINT), 9) AS b_xor,
           CAST(n_nationkey AS BIGINT) << 2 AS shl,
           CAST(n_nationkey AS BIGINT) >> 1 AS shr,
           bit_count(CAST(n_nationkey AS BIGINT)) AS popcount,
           CAST(floor(CAST(n_nationkey AS DOUBLE) / 5.0) + 1 AS INT) AS bucket
    FROM nation
    """,
)

sql_query(
    "explode_map_entries",
    """
    SELECT doc_id, mk, mv
    FROM (SELECT doc_id, MAP('lang', lang, 'source', source) AS m
          FROM documents WHERE doc_id < 20) t
    LATERAL VIEW EXPLODE(m) x AS mk, mv
    """,
    oracle="""
    SELECT doc_id, 'lang' AS mk, lang AS mv FROM documents WHERE doc_id < 20
    UNION ALL
    SELECT doc_id, 'source', source FROM documents WHERE doc_id < 20
    """,
)

# --- Flink-compat residue (SQL UDFs from functions/registry.py) -------------


@df_query(
    "fn_flink_compat",
    oracle="""
    SELECT doc_id,
           string_split(source, 'r')[2] AS split_idx,
           source ~ '^[0-9]+$' AS is_digit,
           lang ~ '^[A-Za-z]+$' AS is_alpha,
           CASE WHEN n_chars >= 0 THEN floor(n_chars / 7.0 * 10) / 10
                ELSE ceil(n_chars / 7.0 * 10) / 10 END AS trunc1,
           to_base64(encode(lang)) AS b64,
           true AS overlaps_check
    FROM documents WHERE doc_id < 30
    """,
)
def fn_flink_compat(spark, sf_dir):
    load_tables(spark, sf_dir)
    register_flink_functions(spark)
    return spark.sql(
        """
        SELECT doc_id,
               SPLIT_INDEX(source, 'r', 1) AS split_idx,
               IS_DIGIT(source) AS is_digit,
               IS_ALPHA(lang) AS is_alpha,
               TRUNCATE_NUM(n_chars / 7.0, 1) AS trunc1,
               TO_BASE64(lang) AS b64,
               TEMPORAL_OVERLAPS(TIMESTAMP '2024-01-01 00:00:00',
                                 TIMESTAMP '2024-01-02 00:00:00',
                                 TIMESTAMP '2024-01-01 12:00:00',
                                 TIMESTAMP '2024-01-03 00:00:00') AS overlaps_check
        FROM documents WHERE doc_id < 30
        """
    )

sql_query(
    "fn_string_residue",
    """
    SELECT c_custkey,
           INITCAP(LOWER(c_mktsegment)) AS seg_cap,
           OVERLAY(c_name PLACING 'XX' FROM 2 FOR 2) AS overlaid,
           ASCII(c_mktsegment) AS first_code,
           CHR(65 + CAST(c_custkey % 26 AS INT)) AS letter,
           INSTR(c_name, '1') AS i1,
           LOCATE('2', c_name) AS l2,
           TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS vowelled
    FROM customer WHERE c_custkey < 30
    """,
    oracle="""
    SELECT c_custkey,
           UPPER(SUBSTR(c_mktsegment, 1, 1)) || LOWER(SUBSTR(c_mktsegment, 2))
             AS seg_cap,
           SUBSTR(c_name, 1, 1) || 'XX' || SUBSTR(c_name, 4) AS overlaid,
           ASCII(c_mktsegment) AS first_code,
           CHR(65 + CAST(c_custkey % 26 AS INT)) AS letter,
           INSTR(c_name, '1') AS i1,
           INSTR(c_name, '2') AS l2,
           TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS vowelled
    FROM customer WHERE c_custkey < 30
    """,
)

# Approximate distinct-count (HLL++): the estimator differs per engine, so
# this is a rows-only entry — the driver still checks schema + row count
# (one row per mktsegment); the reference's APPROX_COUNT_DISTINCT lives in
# flink-table-planner-blink aggfunctions (HllBuffer-based), same contract.
from flink_parent_spark.queries.registry import df_query as _df_query  # noqa: E402
from flink_parent_spark.tables import load_tables as _load_tables  # noqa: E402


@_df_query("agg_approx_count_distinct")
def agg_approx_count_distinct(spark, sf_dir):
    from pyspark.sql import functions as F

    t = _load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey").alias("approx_customers"),
            F.count("*").alias("n"),
        )
    )


sql_query(
    "agg_single_value",
    """
    SELECT o_orderkey,
           CASE WHEN COUNT(*) = 1 THEN MAX(o_totalprice)
                ELSE CAST(RAISE_ERROR('SINGLE_VALUE: group has > 1 row')
                          AS DOUBLE) END AS the_price
    FROM orders WHERE o_orderkey < 200
    GROUP BY o_orderkey
    """,
    oracle="""
    SELECT o_orderkey,
           CASE WHEN COUNT(*) = 1 THEN MAX(o_totalprice)
                ELSE CAST(error('SINGLE_VALUE: group has > 1 row')
                          AS DOUBLE) END AS the_price
    FROM orders WHERE o_orderkey < 200
    GROUP BY o_orderkey
    """,
)
# ^ SINGLE_VALUE aggregate (SingleValueAggFunction in flink-table-planner-
# blink aggfunctions): returns the group's only value, errors on >1 row.
# Both engines keep the error branch lazy, so unique-keyed groups pass.

sql_query(
    "fn_string_pad_repeat",
    """
    SELECT n_nationkey,
           LPAD(n_name, 20, '*') AS padded_l,
           RPAD(n_name, 20, '*') AS padded_r,
           REPEAT(SUBSTRING(n_name, 1, 2), 3) AS rep,
           REVERSE(n_name) AS rev,
           POSITION('A' IN n_name) AS pos_a,
           ASCII(n_name) AS first_code,
           CHR(65 + n_nationkey % 26) AS letter
    FROM nation
    """,
)

sql_query(
    "fn_string_overlay_initcap",
    """
    SELECT c_custkey,
           OVERLAY(c_name PLACING 'XXX' FROM 10 FOR 3) AS redacted,
           INITCAP(LOWER(c_mktsegment)) AS seg_title,
           TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS vowels_low
    FROM customer WHERE c_custkey < 30
    """,
    oracle="""
    SELECT c_custkey,
           SUBSTRING(c_name, 1, 9) || 'XXX' || SUBSTRING(c_name, 13)
             AS redacted,
           UPPER(SUBSTRING(c_mktsegment, 1, 1))
             || LOWER(SUBSTRING(c_mktsegment, 2)) AS seg_title,
           TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS vowels_low
    FROM customer WHERE c_custkey < 30
    """,
)
