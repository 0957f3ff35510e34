"""Source/sink format layer: csv, json, parquet, orc readers/writers and the
partitioned filesystem sink.

Reference surface:
- flink-formats/ (flink-csv, flink-json, flink-parquet, flink-orc) — all are
  Spark built-ins; this module is the thin recipe layer the DDL catalog
  (api/table_env.py) delegates to.
- FileSystemTableSink (flink-table-runtime-blink/.../filesystem/
  FileSystemTableSink.java): partitioned, rolling files ->
  df.write.partitionBy(...); exactly-once commit protocol is Spark's file
  commit protocol (v2) — nothing to build.
- StreamingFileSink -> writeStream file sink (WAL-backed, exactly-once).
- TwoPhaseCommitSinkFunction -> foreachBatch + idempotent/transactional
  writes (`foreach_batch_idempotent` below shows the pattern).

Scale notes: always write splittable columnar (parquet/orc) partitioned by a
low-cardinality column; csv/json exist for interchange, not for the 100 TB
path."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_READERS = {"parquet", "orc", "json", "csv"}
# avro (flink-formats/flink-avro parity): on a real cluster Spark's
# external spark-avro module (format("avro") + from_avro/to_avro, add
# --packages org.apache.spark:spark-avro_2.13:<ver>) is the native path;
# this container lacks the jar, so a RUNNABLE fallback lives in
# sources/avro_format.py — a pure-Python Avro OCF codec driven through
# binaryFile + mapInPandas (distributed per-file decode, per-partition
# encode), oracle-checked by the `format_avro_roundtrip` query.


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options,
) -> DataFrame:
    if fmt not in _READERS:
        raise ValueError(f"unsupported format {fmt!r} (have: {sorted(_READERS)})")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    if fmt not in _READERS:
        raise ValueError(f"unsupported format {fmt!r}")
    writer = df.write.mode(mode).options(**options)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def foreach_batch_idempotent(
    write_fn: Callable[[DataFrame, int], None],
) -> Callable[[DataFrame, int], None]:
    """Two-phase-commit sink pattern (TwoPhaseCommitSinkFunction parity):
    Structured Streaming replays a batch after failure with the SAME
    batch_id — a sink keyed on batch_id is exactly-once. The wrapper just
    documents/enforces the contract: write_fn must be idempotent per
    (batch_id, partition of data)."""

    def apply(df: DataFrame, batch_id: int) -> None:
        write_fn(df, batch_id)

    return apply
