"""Registry wiring query implementations to the DuckDB-oracle correctness gate.

Every operator the engine claims (SURVEY.md §2) registers here twice:
- a Spark implementation `(spark, sf_dir) -> DataFrame`;
- an oracle: ANSI-ish SQL DuckDB can run over the same parquet tables.

Cross-engine float determinism contract (this is what makes exact value-hash
matching possible):
- All per-row arithmetic stays in DOUBLE (IEEE ops are bitwise identical in
  the JVM and DuckDB).
- Accumulating aggregates (SUM/AVG/STDDEV) go through DECIMAL: cast the
  per-row double to a fixed-scale decimal, sum exactly (order-independent),
  cast the final result back to double. `dsum`/`davg` below emit that SQL.
- MIN/MAX/COUNT are order-independent already — used raw.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_parent_spark.tables import load_tables

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: Callable[[SparkSession, str], DataFrame], oracle: str | None = None) -> None:
    if name in QUERIES:
        raise ValueError(f"duplicate query name: {name}")
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


def sql_query(name: str, sql: str, oracle: str | None = None) -> None:
    """Register a query written in the Spark/DuckDB-common SQL dialect.

    If `oracle` is omitted the same text is used for both engines — the
    preferred form, since it guarantees the semantics under test are the
    SQL surface itself, not a hand-translated pair.
    """

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_tables(spark, sf_dir)
        return spark.sql(sql)

    run.__name__ = f"q_{name}"
    run.__doc__ = sql
    register(name, run, oracle if oracle is not None else sql)


def df_query(name: str, oracle: str | None = None):
    """Decorator for DataFrame-API implementations (Table-API surface parity)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        register(name, fn, oracle)
        return fn

    return deco


# --- deterministic-aggregation SQL fragments (shared dialect) ---------------


def dsum(expr: str, alias: str, p: int = 30, s: int = 6) -> str:
    """Order-independent cross-engine SUM of a double expression.

    The exact decimal routes through STRING before the double cast (r12):
    DuckDB's direct decimal->double cast drifts 1 ulp off the correctly-
    rounded value once the scaled integer exceeds 2^53, while
    decimal->string is exact and string->double parsing is correctly
    rounded on both engines — so the emitted double is bit-identical to
    Spark's BigDecimal.doubleValue() at any magnitude."""
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL({p},{s}))) AS STRING) "
        f"AS DOUBLE) AS {alias}"
    )


def davg(expr: str, alias: str, p: int = 30, s: int = 6) -> str:
    """Order-independent cross-engine AVG (decimal sum / double count);
    same string-routed conversion contract as dsum."""
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL({p},{s}))) AS STRING) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE) AS {alias}"
    )
