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
