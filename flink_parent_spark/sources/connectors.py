"""External-system connector recipes (Kafka, JDBC, rate, socket, console).

Reference: flink-connectors/ (Kafka universal, JDBC, ...). Spark ships all
of these natively — the recipes below pin the option mapping so the DDL
layer (`connector`=...) resolves them. No external services exist in the
test container, so each raises a clear error at build time when its
prerequisite is missing, while keeping the option translation testable.

| Flink connector | Spark call |
|---|---|
| kafka (universal) | `spark.readStream.format("kafka")` (needs spark-sql-kafka jar) |
| jdbc             | `spark.read.format("jdbc")` |
| datagen          | `spark.readStream.format("rate")` |
| print            | `writeStream.format("console")` |
| socket           | `spark.readStream.format("socket")` |
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    streaming: bool = True,
) -> DataFrame:
    """Kafka source (value as binary; pair with from_json/from_avro)."""
    reader = spark.readStream if streaming else spark.read
    try:
        return (
            reader.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:  # no kafka jar / broker in this environment
        raise RuntimeError(
            "kafka connector requires the spark-sql-kafka package on the "
            "classpath and a reachable broker"
        ) from e


def jdbc_source(
    spark: SparkSession, url: str, table: str, partition_column: str | None = None,
    num_partitions: int = 8, lower_bound=None, upper_bound=None, **options,
) -> DataFrame:
    """JDBC source; pass partition_column+bounds for parallel reads (the
    scale path — a single-connection JDBC read is a driver bottleneck)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def rate_source(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Datagen/sequence source parity: monotonic (timestamp, value) rows."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def console_sink(sdf: DataFrame, truncate: bool = False):
    """PrintSinkFunction parity."""
    return sdf.writeStream.format("console").option("truncate", truncate)
