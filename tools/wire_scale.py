"""At-volume sweep of the wire-protocol streaming sources.

The stop/restart tests (tests/test_wire_streams.py) prove the sources'
EXACTLY-ONCE semantics at tens of messages; this tool demonstrates the
same paths at real message counts — hundreds of thousands of records
through the actual protocol stacks (Kinesis_20131202 JSON over HTTP,
Kafka v0 wire frames over TCP, Pub/Sub REST pull/acknowledge, AMQP
0-9-1 Basic.Consume push deliveries) against the in-container stubs, with an exactly-once
assertion (distinct delivered ids == published count) and a mid-stream
stop/restart leg on the kinesis path to prove checkpoint resume beyond
toy volume.

Per-protocol counts reflect each protocol's wire shape: Kafka/Kinesis
batch thousands of records per round-trip (200k each); Pub/Sub pulls in
leased batches (100k); AMQP consumes push-mode via Basic.Consume /
Basic.Deliver (100k) — the same consumer shape as the reference's
RMQSource (QueueingConsumer), switched from the earlier Basic.Get pull
after this sweep measured the per-message round-trip at 17 msg/s under
Nagle x delayed-ACK (TCP_NODELAY brought it to ~100/s; push-mode
removes the per-message round-trip entirely).

    python tools/wire_scale.py              # one JSON line
    FPS_WIRE_N=20000 python tools/...       # smaller sweep
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("FPS_WIRE_N", "200000"))
BASE = os.path.join(tempfile.gettempdir(), f"fps_wire_scale_{uuid.uuid4().hex[:8]}")


def _run_stream(spark, reader_df, out_name: str) -> "tuple[float, int]":
    """Drain an unbounded source to a parquet sink until idle; returns
    (seconds, rows written)."""
    out = os.path.join(BASE, out_name, "out")
    ckpt = os.path.join(BASE, out_name, "ckpt")
    t0 = time.time()
    q = (
        reader_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    dt = time.time() - t0
    return dt, spark.read.parquet(out).count()


def kinesis_leg(spark) -> dict:
    from tests.wire_stubs import KinesisStreamStub

    stub = KinesisStreamStub(n_shards=4).start()
    try:
        t0 = time.time()
        for i in range(N):
            stub.publish(f"pk{i % 997}", {"ev_id": i})
        pub_sec = round(time.time() - t0, 1)

        def reader():
            return (
                spark.readStream.format("kinesis-stream")
                .option("endpoint", f"http://127.0.0.1:{stub.port}")
                .option("stream", "s")
                .option("schema", "ev_id long")
                .option("maxperbatch", "20000")
                .load()
            )

        out = os.path.join(BASE, "kinesis", "out")
        ckpt = os.path.join(BASE, "kinesis", "ckpt")
        t0 = time.time()
        # leg 1: drain, stop (as a crash/redeploy would)
        q = (
            reader().writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt).start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)
        # publish more while down, restart from the same checkpoint
        extra = N // 10
        for i in range(N, N + extra):
            stub.publish(f"pk{i % 997}", {"ev_id": i})
        q = (
            reader().writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt).start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)
        dt = time.time() - t0
        df = spark.read.parquet(out)
        total, distinct = df.count(), df.select("ev_id").distinct().count()
        assert total == distinct == N + extra, (total, distinct, N + extra)
        return {
            "published": N + extra, "publish_sec": pub_sec,
            "drain_sec": round(dt, 1), "rows_per_sec": int((N + extra) / dt),
            "exactly_once": True, "restart_leg": True, "shards": 4,
        }
    finally:
        stub.stop()


def _kafka_run(spark, n_partitions: int, n: int) -> dict:
    """Produce n records over n_partitions, drain through the unbounded
    wire reader, assert exactly-once; returns the drain figures."""
    from flink_parent_spark.sources import kafka_wire as kw
    from tests.wire_stubs import KafkaBrokerStub

    stub = KafkaBrokerStub(n_partitions=n_partitions).start()
    out_name = f"kafka_p{n_partitions}"
    try:
        t0 = time.time()
        sock = kw.connect("127.0.0.1", stub.port)
        per = n // n_partitions
        for pid in range(n_partitions):
            lo, hi = pid * per, (pid + 1) * per
            for c0 in range(lo, hi, 5000):
                kw.produce(
                    sock, "t", pid,
                    [
                        (None, json.dumps({"ev_id": i}).encode())
                        for i in range(c0, min(c0 + 5000, hi))
                    ],
                )
        sock.close()
        pub_sec = round(time.time() - t0, 1)
        total_n = n_partitions * per

        rdr = (
            spark.readStream.format("kafka-wire-stream")
            .option("host", "127.0.0.1")
            .option("port", str(stub.port))
            .option("topic", "t")
            .option("maxperbatch", "20000")
            .load()
        )
        dt, total = _run_stream(spark, rdr, out_name)
        df = spark.read.parquet(os.path.join(BASE, out_name, "out"))
        distinct = df.select("partition", "offset").distinct().count()
        assert total == distinct == total_n, (total, distinct, total_n)
        return {
            "published": total_n, "publish_sec": pub_sec,
            "drain_sec": round(dt, 1), "rows_per_sec": int(total_n / dt),
            "exactly_once": True, "partitions": n_partitions,
        }
    finally:
        stub.stop()


def kafka_leg(spark) -> dict:
    """Headline 4-partition run PLUS a 1-partition control at the same
    total volume: KafkaWireStreamReader reads partitions serially in one
    driver-side consumer (documented ceiling — fan-in at volume belongs
    to format('kafka')'s partition-parallel source), so rows/s should be
    roughly FLAT from 1 -> 4 partitions. Emitting both figures makes the
    documented ceiling a measured number instead of an assumption."""
    figures = _kafka_run(spark, 4, N)
    control = _kafka_run(spark, 1, N)
    figures["by_partition_count"] = {
        "1": control["rows_per_sec"],
        "4": figures["rows_per_sec"],
    }
    return figures


def pubsub_leg(spark) -> dict:
    from tests.wire_stubs import PubSubStub

    n = N // 2
    stub = PubSubStub().start()
    try:
        t0 = time.time()
        stub.publish(*[{"ev_id": i} for i in range(n)])
        pub_sec = round(time.time() - t0, 1)
        rdr = (
            spark.readStream.format("pubsub-stream")
            .option("endpoint", f"http://127.0.0.1:{stub.port}")
            .option("project", "p")
            .option("subscription", "s")
            .option("schema", "ev_id long")
            .option("spooldir", os.path.join(BASE, "pubsub", "spool"))
            .option("maxperbatch", "10000")
            .load()
        )
        dt, total = _run_stream(spark, rdr, "pubsub")
        df = spark.read.parquet(os.path.join(BASE, "pubsub", "out"))
        distinct = df.select("ev_id").distinct().count()
        assert total == distinct == n, (total, distinct, n)
        # only the stop-raced tail batch may remain unacked (its commit
        # never fired) — same tolerance as the stop/restart tests
        unacked_tail = stub.unacked_count()
        assert unacked_tail <= 10000, unacked_tail
        return {
            "published": n, "publish_sec": pub_sec,
            "drain_sec": round(dt, 1), "rows_per_sec": int(n / dt),
            "exactly_once": True, "unacked_tail": unacked_tail,
        }
    finally:
        stub.stop()


def rabbitmq_leg(spark) -> dict:
    from flink_parent_spark.sources.stream_wire import RabbitMQAdapter
    from tests.wire_stubs import AmqpBrokerStub

    n = max(N // 4, 1000)
    # drain-until-idle sweep: a sub-second push gap must not read as
    # "queue empty" (processAllAvailable ends on the first no-progress
    # poll); continuous production deployments tolerate gaps naturally
    # because the next trigger simply picks the stream back up
    RabbitMQAdapter.FIRST_WAIT = 2.0
    stub = AmqpBrokerStub().start()
    try:
        t0 = time.time()
        stub.publish(*[json.dumps({"ev_id": i}).encode() for i in range(n)])
        pub_sec = round(time.time() - t0, 1)
        rdr = (
            spark.readStream.format("rabbitmq-stream")
            .option("host", "127.0.0.1")
            .option("port", str(stub.port))
            .option("queue", "q")
            .option("schema", "ev_id long")
            .option("spooldir", os.path.join(BASE, "rabbitmq", "spool"))
            .option("maxperbatch", "5000")
            .load()
        )
        dt, total = _run_stream(spark, rdr, "rabbitmq")
        df = spark.read.parquet(os.path.join(BASE, "rabbitmq", "out"))
        distinct = df.select("ev_id").distinct().count()
        assert total == distinct == n, (total, distinct, n)
        return {
            "published": n, "publish_sec": pub_sec,
            "drain_sec": round(dt, 1), "rows_per_sec": int(n / dt),
            "exactly_once": True, "push_mode": True,
        }
    finally:
        stub.stop()


def main() -> None:
    from flink_parent_spark.session import get_spark  # noqa: PLC0415
    from flink_parent_spark.sources.stream_wire import (  # noqa: PLC0415
        register_wire_sources,
    )

    spark = get_spark("wire_scale")
    register_wire_sources(spark)
    os.makedirs(BASE, exist_ok=True)
    results: dict = {}
    try:
        for name, leg in (
            ("kinesis", kinesis_leg),
            ("kafka_wire", kafka_leg),
            ("pubsub", pubsub_leg),
            ("rabbitmq", rabbitmq_leg),
        ):
            results[name] = leg(spark)
            print(f"[wire-scale] {name}: {results[name]}", flush=True)
    finally:
        shutil.rmtree(BASE, ignore_errors=True)
    print(
        json.dumps(
            {"metric": "wire_source_at_volume", "n_base": N, "legs": results}
        )
    )


if __name__ == "__main__":
    main()
