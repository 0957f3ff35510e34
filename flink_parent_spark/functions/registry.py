"""Flink-dialect scalar functions missing from Spark, as SQL UDFs.

The reference's function surface is BuiltInFunctionDefinitions.java (~150
functions) + FlinkSqlOperatorTable.java; runtime impls SqlFunctionUtils.java /
SqlDateTimeUtils.java. Spark covers almost all of it natively (see SURVEY §2.8
for the 1:1 table). The residue is registered here as **SQL UDFs**
(`CREATE TEMPORARY FUNCTION ... RETURN <expr>`): they inline into the Catalyst
plan as expressions — whole-stage-codegen'd, NOT Python UDFs — so using them
costs nothing at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, body). Kept as data so tests can enumerate coverage.
FLINK_SQL_UDFS: dict[str, tuple[str, str]] = {
    # SqlFunctionUtils.java splitIndex (Flink: 0-based index, NULL past end)
    "SPLIT_INDEX": (
        "(s STRING, sep STRING, idx INT) RETURNS STRING",
        "element_at_or_null(split(s, sep), idx + 1)",
    ),
    # BuiltInFunctionDefinitions IS_DECIMAL/IS_DIGIT/IS_ALPHA
    "IS_DECIMAL": (
        "(s STRING) RETURNS BOOLEAN",
        r"s IS NOT NULL AND s rlike '^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)$'",
    ),
    "IS_DIGIT": ("(s STRING) RETURNS BOOLEAN", "s IS NOT NULL AND s rlike '^[0-9]+$'"),
    "IS_ALPHA": ("(s STRING) RETURNS BOOLEAN", "s IS NOT NULL AND s rlike '^[A-Za-z]+$'"),
    # Flink TRUNCATE(numeric, d): truncate toward zero to d decimals
    "TRUNCATE_NUM": (
        "(x DOUBLE, d INT) RETURNS DOUBLE",
        "CASE WHEN x >= 0 THEN floor(x * power(10, d)) / power(10, d)"
        "     ELSE ceil(x * power(10, d)) / power(10, d) END",
    ),
    # Flink RAND_INTEGER(bound)
    "RAND_INTEGER": ("(bound INT) RETURNS INT", "CAST(floor(rand() * bound) AS INT)"),
    # Flink TO_BASE64/FROM_BASE64 operate on strings
    "TO_BASE64": ("(s STRING) RETURNS STRING", "base64(CAST(s AS BINARY))"),
    "FROM_BASE64": ("(s STRING) RETURNS STRING", "CAST(unbase64(s) AS STRING)"),
    # Calcite TEMPORAL_OVERLAPS((s1,e1),(s2,e2))
    "TEMPORAL_OVERLAPS": (
        "(s1 TIMESTAMP, e1 TIMESTAMP, s2 TIMESTAMP, e2 TIMESTAMP) RETURNS BOOLEAN",
        "s1 <= e2 AND s2 <= e1",
    ),
    # Flink HASH_CODE(string)
    "HASH_CODE": ("(s STRING) RETURNS INT", "hash(s)"),
    # FlinkSqlOperatorTable PROCTIME(): processing-time attribute — maps to
    # the session-evaluated current timestamp (nondeterministic by nature,
    # so no oracle; surface parity for Flink-SQL queries that select it)
    "PROCTIME": ("() RETURNS TIMESTAMP", "current_timestamp()"),
}

# helper used by SPLIT_INDEX: element_at throws past-end in ANSI mode
_HELPERS: dict[str, tuple[str, str]] = {
    "element_at_or_null": (
        "(a ARRAY<STRING>, i INT) RETURNS STRING",
        "CASE WHEN i BETWEEN 1 AND size(a) THEN a[i - 1] END",
    ),
}


def register_flink_functions(spark: SparkSession) -> None:
    """Idempotently register the Flink-compat function residue."""
    for name, (sig, body) in {**_HELPERS, **FLINK_SQL_UDFS}.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name} {sig} RETURN {body}")
