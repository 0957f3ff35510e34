"""Machine-checked completeness of the scalar-function surface.

Enumerates every public function name in the reference's
BuiltInFunctionDefinitions.java (flink-table/flink-table-common/.../
functions/BuiltInFunctionDefinitions.java — 137 definitions at 1.11) and
asserts each one maps to something runnable in this engine: a Spark
built-in (possibly renamed), a registered Flink-residue SQL UDF, a
planner construct that needs no function at all, or a documented
non-applicable entry (TypeInference/planner internals).

This is the executable version of SURVEY §2.8's mapping table: if the
reference adds a name this test starts failing instead of silently
drifting.
"""

from __future__ import annotations

import re

import pytest

REF = (
    "/root/reference/flink-table/flink-table-common/src/main/java/"
    "org/apache/flink/table/functions/BuiltInFunctionDefinitions.java"
)

# Flink name (lowercased) -> how this engine provides it.
# "spark:<fn>"   = Spark built-in (run to prove it resolves)
# "udf:<fn>"     = registered Flink-residue SQL UDF (functions/registry.py)
# "syntax:<sql>" = SQL syntax, not a function call (run as-is)
# "planner"      = planner-internal marker with no runtime function
MAPPING: dict[str, str] = {
    # logic / comparison — SQL operators
    "and": "syntax:SELECT true AND false",
    "or": "syntax:SELECT true OR false",
    "not": "syntax:SELECT NOT true",
    "equals": "syntax:SELECT 1 = 1",
    "notequals": "syntax:SELECT 1 <> 2",
    "greaterthan": "syntax:SELECT 2 > 1",
    "greaterthanorequal": "syntax:SELECT 2 >= 1",
    "lessthan": "syntax:SELECT 1 < 2",
    "lessthanorequal": "syntax:SELECT 1 <= 2",
    "isnull": "syntax:SELECT NULL IS NULL",
    "isnotnull": "syntax:SELECT 1 IS NOT NULL",
    "istrue": "syntax:SELECT true IS TRUE",
    "isfalse": "syntax:SELECT false IS FALSE",
    "isnottrue": "syntax:SELECT false IS NOT TRUE",
    "isnotfalse": "syntax:SELECT true IS NOT FALSE",
    "between": "syntax:SELECT 2 BETWEEN 1 AND 3",
    "notbetween": "syntax:SELECT 0 NOT BETWEEN 1 AND 3",
    "in": "syntax:SELECT 1 IN (1, 2)",
    "like": "syntax:SELECT 'ab' LIKE 'a%'",
    "similar": "syntax:SELECT 'ab' RLIKE 'a.'",  # SIMILAR TO -> RLIKE
    "ifthenelse": "syntax:SELECT IF(true, 1, 2)",
    # aggregates
    "avg": "spark:avg",
    "count": "spark:count",
    "max": "spark:max",
    "min": "spark:min",
    "sum": "spark:sum",
    "sum0": "syntax:SELECT COALESCE(SUM(x), 0) FROM (SELECT 1 x) WHERE x < 0",
    "stddevpop": "spark:stddev_pop",
    "stddevsamp": "spark:stddev_samp",
    "varpop": "spark:var_pop",
    "varsamp": "spark:var_samp",
    "collect": "spark:collect_list",
    "distinct": "syntax:SELECT DISTINCT 1",
    # string
    "charlength": "spark:char_length",
    "initcap": "spark:initcap",
    "lowercase": "spark:lower",
    "lower": "spark:lower",
    "uppercase": "spark:upper",
    "upper": "spark:upper",
    "position": "syntax:SELECT POSITION('b' IN 'abc')",
    "trim": "spark:trim",
    "ltrim": "spark:ltrim",
    "rtrim": "spark:rtrim",
    "repeat": "spark:repeat",
    "regexpreplace": "spark:regexp_replace",
    "regexpextract": "spark:regexp_extract",
    "frombase64": "udf:FROM_BASE64",
    "tobase64": "udf:TO_BASE64",
    "uuid": "spark:uuid",
    "lpad": "spark:lpad",
    "rpad": "spark:rpad",
    "concat": "spark:concat",
    "concat_ws": "spark:concat_ws",
    "overlay": "syntax:SELECT OVERLAY('abcd' PLACING 'xx' FROM 2)",
    "substring": "spark:substring",
    "replace": "spark:replace",
    # math
    "plus": "syntax:SELECT 1 + 2",
    "minus": "syntax:SELECT 2 - 1",
    "divide": "syntax:SELECT 4 / 2",
    "times": "syntax:SELECT 2 * 3",
    "abs": "spark:abs",
    "ceil": "spark:ceil",
    "exp": "spark:exp",
    "floor": "spark:floor",
    "log10": "spark:log10",
    "log2": "spark:log2",
    "ln": "spark:ln",
    "log": "spark:log",
    "power": "spark:power",
    "mod": "spark:mod",
    "sqrt": "spark:sqrt",
    "minusprefix": "syntax:SELECT -(1)",
    "sin": "spark:sin",
    "cos": "spark:cos",
    "sinh": "spark:sinh",
    "tan": "spark:tan",
    "tanh": "spark:tanh",
    "cot": "spark:cot",
    "asin": "spark:asin",
    "acos": "spark:acos",
    "atan": "spark:atan",
    "atan2": "spark:atan2",
    "cosh": "spark:cosh",
    "degrees": "spark:degrees",
    "radians": "spark:radians",
    "sign": "spark:sign",
    "round": "spark:round",
    "pi": "spark:pi",
    "e": "syntax:SELECT EXP(1)",
    "rand": "spark:rand",
    "randinteger": "udf:RAND_INTEGER",
    "bin": "spark:bin",
    "hex": "spark:hex",
    "truncate": "udf:TRUNCATE_NUM",
    # time
    "extract": "syntax:SELECT EXTRACT(YEAR FROM DATE '2024-01-01')",
    "currentdate": "syntax:SELECT CURRENT_DATE",
    "currenttime": "syntax:SELECT CURRENT_TIMESTAMP",  # TIME type folds to ts
    "currenttimestamp": "syntax:SELECT CURRENT_TIMESTAMP",
    "localtime": "syntax:SELECT CURRENT_TIMESTAMP",
    "localtimestamp": "syntax:SELECT localtimestamp()",
    "temporaloverlaps": "udf:TEMPORAL_OVERLAPS",
    "dateformat": "spark:date_format",
    "timestampdiff": "syntax:SELECT TIMESTAMPDIFF(DAY, TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-02 00:00:00')",
    "datetimeplus": "syntax:SELECT DATE '2024-01-01' + INTERVAL 1 DAY",
    # collections
    "at": "syntax:SELECT element_at(ARRAY(1, 2), 1)",  # Flink AT is 1-based -> element_at
    "cardinality": "spark:cardinality",
    "array": "spark:array",
    "element": "syntax:SELECT element_at(ARRAY(7), 1)",  # ELEMENT(single-elem array)
    "map": "spark:map",
    "row": "spark:struct",
    "flatten": "spark:flatten",
    # composite/casting
    "cast": "syntax:SELECT CAST(1 AS STRING)",
    "reinterpretcast": "syntax:SELECT CAST(CAST(1 AS TIMESTAMP) AS BIGINT)",
    "as": "syntax:SELECT 1 AS x",
    "get": "syntax:SELECT named_struct('a', 1).a",
    # hashing
    "md5": "spark:md5",
    "sha1": "spark:sha1",
    "sha2": "spark:sha2",
    "sha224": "syntax:SELECT SHA2('x', 224)",
    "sha256": "syntax:SELECT SHA2('x', 256)",
    "sha384": "syntax:SELECT SHA2('x', 384)",
    "sha512": "syntax:SELECT SHA2('x', 512)",
    # time attributes / windows — planner constructs in this engine
    "proctime": "udf:PROCTIME",
    "rowtime": "planner",  # DDL WATERMARK column IS the rowtime attribute
    "currentrange": "planner",  # OVER-frame markers (RANGE UNBOUNDED ...)
    "currentrow": "planner",
    "unboundedrange": "planner",
    "unboundedrow": "planner",
    "over": "syntax:SELECT COUNT(*) OVER () FROM (SELECT 1)",
    "streamrecordtimestamp": "planner",  # internal rowtime accessor
    # ordering / projection helpers — Table-API expression DSL internals
    "asc": "syntax:SELECT 1 ORDER BY 1 ASC",
    "desc": "syntax:SELECT 1 ORDER BY 1 DESC",
    "start": "planner",  # window_start column of window()/group windows
    "end": "planner",  # window_end
    "withcolumns": "planner",  # Table-API projection sugar
    "withoutcolumns": "planner",
    "rangeto": "planner",  # column-range selection sugar
}


def ref_names() -> list[str]:
    src = open(REF).read()
    return sorted({m.lower() for m in re.findall(r'name\("([A-Za-z0-9_]+)"\)', src)})


def test_reference_function_list_fully_mapped():
    names = ref_names()
    assert len(names) >= 130, "reference list unexpectedly small"
    missing = [n for n in names if n not in MAPPING]
    assert not missing, f"unmapped reference functions: {missing}"


@pytest.mark.parametrize("kind", ["spark", "udf", "syntax"])
def test_mappings_resolve_and_run(spark, kind):
    from flink_parent_spark.functions.registry import register_flink_functions

    register_flink_functions(spark)
    for flink_name, how in MAPPING.items():
        tag, _, val = how.partition(":")
        if tag != kind:
            continue
        if kind == "spark":
            assert spark.catalog.functionExists(val), (flink_name, val)
        elif kind == "udf":
            assert spark.catalog.functionExists(val.lower()), (flink_name, val)
        else:  # syntax: must parse and execute
            spark.sql(val).collect()
