"""User-defined function surface (SURVEY §2.12): Flink-shaped decorators
mapped onto PySpark's Arrow-vectorized UDF machinery.

| Flink                      | here                | Spark machinery        |
|----------------------------|---------------------|------------------------|
| ScalarFunction (udf)       | @scalar_udf         | pandas_udf (SCALAR)    |
| AggregateFunction (udaf)   | @agg_udf            | pandas_udf GROUPED_AGG |
| TableFunction (udtf)       | table_function()    | mapInPandas + explode  |
| TableAggregateFunction     | applyInPandas direct (multi-row per group) |
| AsyncTableFunction         | mapInPandas with client batching (pattern) |

The reference runs Python UDFs through a Beam bridge with an Arrow option
(flink-python/.../PythonScalarFunctionOperator.java, Arrow variant); in a
PySpark-native engine that entire bridge is Spark's built-in Arrow path —
these wrappers only provide the Flink-flavored registration surface.
Everything is vectorized: no row-at-a-time Python anywhere."""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def scalar_udf(return_type: str):
    """Vectorized scalar UDF: fn(pd.Series, ...) -> pd.Series."""

    def deco(fn):
        return F.pandas_udf(return_type)(fn)

    return deco


def agg_udf(return_type: str):
    """Vectorized grouped-agg UDF: fn(pd.Series, ...) -> scalar. The
    GROUPED_AGG kind is inferred by pandas_udf from the function's type
    hints (Series -> scalar)."""

    def deco(fn):
        return F.pandas_udf(return_type)(fn)

    return deco


def table_function(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema: str,
) -> DataFrame:
    """TableFunction (UDTF): fn maps an input batch to 0..n output rows per
    input row (return any number of rows; include pass-through columns in
    the output yourself). Runs Arrow-batched via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = fn(pdf)
            if out is not None and len(out):
                yield out

    return df.mapInPandas(run, schema=output_schema)


# -- CREATE FUNCTION DDL demo/reference targets ------------------------------
# (SQL-registered UDFs are the PyFlink idiom: CREATE TEMPORARY FUNCTION f
# AS 'module.attr' LANGUAGE PYTHON resolves the dotted ref to an object
# like these — pyflink/table/udf.py:322's wrapped-function shape.)

def _double_value_fn(v):
    return v * 2.0


# DataType object (not a DDL string) so creating the UDF needs no active
# SparkSession at import time
from pyspark.sql.types import DoubleType as _DoubleType  # noqa: E402

double_value = F.pandas_udf(_DoubleType())(_double_value_fn)
double_value.__doc__ = "Vectorized demo scalar: value * 2 (CREATE FUNCTION target)."


def _triple_value_fn(v):
    return v * 3.0


triple_value = F.pandas_udf(_DoubleType())(_triple_value_fn)
triple_value.__doc__ = (
    "Vectorized demo scalar: value * 3 (ALTER FUNCTION replacement target)."
)
