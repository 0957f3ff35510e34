"""Catalog over the driver-generated parquet fixtures.

Equivalent surface in the reference: `CREATE TABLE ... WITH ('connector'='...')`
DDL (flink-table/flink-sql-parser/.../ddl/SqlCreateTable.java) + catalog lookup.
Here the catalog is `spark.read.parquet` + temp views: Catalyst then owns
predicate pushdown, column pruning and partition pruning on the scans
(verified via .explain — PushedFilters/ReadSchema reach the parquet source).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_parent_spark.session import apply_runtime_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Fixture timestamp encodings vary by generator version:
# - older fixtures: TIMESTAMP(NANOS), which the Spark parquet reader rejects —
#   read as raw int64 nanos (legacy.parquet.nanosAsLong) and convert to
#   TimestampType in the load projection (no sub-microsecond data; lossless).
# - current fixtures: timestamp[us] with isAdjustedToUTC=false, which Spark
#   4.x reads as TIMESTAMP_NTZ — cast to TimestampType. The session timezone
#   is pinned UTC (session.py), so the cast is lossless and matches DuckDB's
#   naive-timestamp reading of the same file.
# Known cost at scale: parquet row-group stats pruning on converted columns is
# lost because the filter sits above the cast; column pruning and all other
# pushdown still apply.
NANOS_TS_COLS: dict[str, tuple[str, ...]] = {
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def normalize_timestamps(df: DataFrame, name: str) -> DataFrame:
    """Normalize every fixture timestamp encoding to plain TimestampType."""
    dtypes = dict(df.dtypes)
    for c in NANOS_TS_COLS.get(name, ()):
        if dtypes.get(c) == "bigint":
            # integer DIV, not double /: nanos values exceed double's
            # exact-integer range, a float divide can come back 1µs short.
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view and return the DataFrames.

    Called at the top of every query entry point: cheap (no IO until an
    action), idempotent, and makes both the DataFrame and SQL surfaces work
    against the same logical scans.

    The unresolved scan DataFrames (logical plans only — no data, no
    results; every action still reads the parquet) are memoized on the
    session object keyed by the directory and each file's (mtime, size):
    rebuilding them costs a parquet footer read + several py4j calls per
    table, ~0.5 s per query invocation that the bench and parity harness
    paid on EVERY entry. A regenerated fixture directory changes the stat
    signature and misses the cache; temp views are (re)registered on every
    call so view-replacement semantics are unchanged."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    apply_runtime_confs(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    present: list[tuple[str, str]] = []
    sig_parts: list[tuple] = []
    for name in TABLE_NAMES:
        path = table_path(sf_dir, name)
        try:
            st = os.stat(path)
        except OSError:
            continue
        present.append((name, path))
        sig_parts.append((name, st.st_mtime_ns, st.st_size))
    key = (sf_dir, tuple(sig_parts))
    cache: dict = getattr(spark, "_fps_table_plans", None) or {}
    out = cache.get(key)
    if out is None:
        out = {}
        for name, path in present:
            out[name] = normalize_timestamps(spark.read.parquet(path), name)
        # keep only the latest signature per directory: a regenerated
        # fixture dir must not pin its stale plans alive
        cache = {k: v for k, v in cache.items() if k[0] != sf_dir}
        cache[key] = out
        spark._fps_table_plans = cache  # noqa: SLF001 - session-scoped memo
    for name, df in out.items():
        df.createOrReplaceTempView(name)
    return dict(out)
