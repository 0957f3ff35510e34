"""Sink-semantics tests: foreachBatch exactly-once (2PC parity) and
dropDuplicatesWithinWatermark (state TTL parity)."""

from __future__ import annotations

import datetime as dt
import os
import tempfile
import uuid

import pytest

from pyspark.sql import functions as F

from flink_parent_spark.streaming.core import run_stream_to_df, stream_table


def test_foreachbatch_idempotent_sink(spark):
    """TwoPhaseCommitSinkFunction parity: a batch_id-keyed sink stays
    exactly-once under redelivery — re-invoking with the same batch_id
    must not duplicate output."""
    from flink_parent_spark.sources.formats import foreach_batch_idempotent

    out = os.path.join(tempfile.gettempdir(), f"fps_2pc_{uuid.uuid4().hex[:6]}")

    def write(df, batch_id: int) -> None:
        # idempotence via deterministic per-batch directory + overwrite
        df.write.mode("overwrite").parquet(f"{out}/batch_id={batch_id}")

    sink = foreach_batch_idempotent(write)
    ev = stream_table(spark, "/root/testdata/sf0.001", "events")
    q = (
        ev.groupBy("event_type").count()
        .writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", out + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    first = spark.read.parquet(out).count()
    # redelivery: same batch contents, same batch_id
    batch_df = spark.read.parquet(f"{out}/batch_id=0") if first else None
    agg = spark.read.parquet("/root/testdata/sf0.001/events.parquet").groupBy(
        "event_type"
    ).count()
    sink(agg, 0)
    assert spark.read.parquet(out).count() == first  # no duplication


def test_dedup_within_watermark_ttl(spark):
    """State-TTL parity (StateTtlConfig / idle-state retention):
    dropDuplicatesWithinWatermark keeps dedup state only within the
    watermark horizon; duplicates inside it are suppressed."""
    schema = "ts timestamp, k string"
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0, "a"),
        (t0 + dt.timedelta(seconds=10), "a"),  # dup within horizon
        (t0 + dt.timedelta(seconds=20), "b"),
    ]
    d = tempfile.mkdtemp(prefix="fps_ttl_")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(f"{d}/data")
    sdf = (
        spark.readStream.schema(schema)
        .parquet(f"{d}/data")
        .withWatermark("ts", "1 minute")
        .dropDuplicatesWithinWatermark(["k"])
    )
    out = run_stream_to_df(sdf, "append")
    got = sorted(r["k"] for r in out.collect())
    assert got == ["a", "b"]


def test_streaming_partition_commit_success_file(spark, tmp_path):
    """Partition-commit policy 'success-file' (FileSystemTableSink /
    SuccessFileCommitPolicy.java): complete partitions (watermark past
    partition end + delay) get a _SUCCESS marker; the still-open trailing
    partition does not."""
    import datetime as dtm
    import os

    from flink_parent_spark.streaming.core import streaming_partitioned_sink

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    rows = []
    for day, n in (("2024-01-01", 3), ("2024-01-02", 3), ("2024-01-03", 2)):
        base = dtm.datetime.fromisoformat(day)
        rows += [(day, base + dtm.timedelta(hours=h), float(h)) for h in range(n)]
    schema = "d string, ts timestamp, v double"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(src)

    sdf = (
        spark.readStream.schema(schema).parquet(src).withWatermark("ts", "1 hour")
    )
    q = streaming_partitioned_sink(
        sdf, out, partition_col="d", ts_col="ts", commit_delay="0 seconds"
    )
    q.awaitTermination(120)

    # data landed partitioned
    back = spark.read.parquet(out)
    assert back.count() == 8
    # day 1 and 2 are complete (max ts = Jan 3 01:00 > their end), day 3 open
    assert os.path.exists(os.path.join(out, "d=2024-01-01", "_SUCCESS"))
    assert os.path.exists(os.path.join(out, "d=2024-01-02", "_SUCCESS"))
    assert not os.path.exists(os.path.join(out, "d=2024-01-03", "_SUCCESS"))


def test_streaming_partition_commit_hourly_granularity(spark, tmp_path):
    """Hourly partition values commit as soon as the watermark passes
    partition-time + 1 HOUR + delay — not + 1 day (round-5 ADVICE: the
    granularity follows the parsed value, PartitionTimeExtractor parity)."""
    import datetime as dtm
    import os

    from flink_parent_spark.streaming.core import streaming_partitioned_sink

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    base = dtm.datetime(2024, 1, 1)
    rows = []
    for h, n in ((0, 3), (1, 2), (2, 1)):
        start = base + dtm.timedelta(hours=h)
        rows += [
            (start.strftime("%Y-%m-%d %H:00:00"),
             start + dtm.timedelta(minutes=10 * i), float(i))
            for i in range(n)
        ]
    schema = "hr string, ts timestamp, v double"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(src)

    sdf = spark.readStream.schema(schema).parquet(src).withWatermark("ts", "1 minute")
    q = streaming_partitioned_sink(
        sdf, out, partition_col="hr", ts_col="ts", commit_delay="0 seconds"
    )
    q.awaitTermination(120)

    assert spark.read.parquet(out).count() == 6
    # max ts = 02:00; hours 00 and 01 end at 01:00/02:00 <= cutoff -> committed
    assert os.path.exists(os.path.join(out, "hr=2024-01-01 00%3A00%3A00", "_SUCCESS")) or \
        os.path.exists(os.path.join(out, "hr=2024-01-01 00:00:00", "_SUCCESS"))
    hr2 = [
        p for p in os.listdir(out)
        if p.startswith("hr=") and ("02%3A00" in p or "02:00" in p)
    ]
    assert hr2 and not any(
        os.path.exists(os.path.join(out, p, "_SUCCESS")) for p in hr2
    )


def test_compressed_format_roundtrips(spark, tmp_path):
    """flink-compress / flink-formats codec parity: the reference ships a
    CompressWriterFactory wrapping Hadoop codecs
    (flink-formats/flink-compress); in Spark the same capability is the
    writer's `compression` option, applied per format. Round-trip csv+gzip,
    json+gzip and parquet+zstd and check the bytes on disk really are
    compressed (suffix + magic), not just renamed."""
    import gzip
    import os

    from flink_parent_spark.sources.formats import read_table, write_table

    df = spark.range(0, 1000).selectExpr(
        "id", "concat('payload_', id) AS s", "id * 2 AS v"
    )
    expect = {(r.id, r.s, r.v) for r in df.collect()}

    for fmt, codec, suffix in [
        ("csv", "gzip", ".csv.gz"),
        ("json", "gzip", ".json.gz"),
        ("parquet", "zstd", ".zstd.parquet"),
    ]:
        p = str(tmp_path / f"c_{fmt}")
        write_table(df, p, fmt=fmt, compression=codec)
        files = [f for f in os.listdir(p) if f.endswith(suffix)]
        assert files, f"{fmt}: no {suffix} part files in {os.listdir(p)}"
        if suffix.endswith(".gz"):
            with gzip.open(os.path.join(p, files[0])) as fh:
                assert fh.read(1)  # valid gzip stream, not renamed plaintext
        back = read_table(
            spark, p, fmt=fmt, schema="id long, s string, v long"
        )
        assert {(r.id, r.s, r.v) for r in back.collect()} == expect
