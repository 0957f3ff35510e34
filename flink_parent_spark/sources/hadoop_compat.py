"""Hadoop-compatibility bridge: SequenceFiles and raw Hadoop In/OutputFormats.

Reference surface: flink-connectors/flink-hadoop-compatibility —
`HadoopInputs.readSequenceFile` / `HadoopOutputs` wrap Hadoop's
Input/OutputFormat pairs so legacy Writable-keyed data keeps working. Spark
ships the same Hadoop client, and its RDD layer (`sequenceFile`,
`saveAsSequenceFile`, `newAPIHadoopFile`) IS the Hadoop-format bridge — this
is the one module where the RDD API is the honest mapping, because the
formats are defined in terms of key/value records, not columns. Everything
is converted to/from a DataFrame at the boundary so the rest of the engine
stays declarative.

Scale note: SequenceFiles split on sync markers exactly like in any Hadoop
job, so reads parallelize per split; writes produce one file per partition.
The bridge is for interop with legacy corpora — new data should land in
parquet (columnar pruning, predicate pushdown), which these helpers make a
one-liner: read_sequence_file(...).write.parquet(...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_sequence_file(
    df: DataFrame, path: str, key_col: str, value_col: str
) -> None:
    """Write (key_col, value_col) as a Hadoop SequenceFile
    (HadoopOutputs parity). Key/value python types map to Writables the
    standard way (str -> Text, int -> LongWritable, bytes ->
    BytesWritable)."""
    df.select(key_col, value_col).rdd.map(tuple).saveAsSequenceFile(path)


def read_sequence_file(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """Read a Hadoop SequenceFile into a DataFrame with the declared
    2-field schema (HadoopInputs.readSequenceFile parity)."""
    return spark.createDataFrame(
        spark.sparkContext.sequenceFile(path), schema
    )


def read_hadoop_text(spark: SparkSession, path: str) -> DataFrame:
    """Read through Hadoop's newAPI TextInputFormat, keeping the byte
    offset key the format exposes (HadoopInputs.readHadoopFile with
    TextInputFormat parity) — `(offset bigint, line string)` rows."""
    rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
    )
    return spark.createDataFrame(rdd, "offset bigint, line string")
