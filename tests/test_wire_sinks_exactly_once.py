"""Mid-write-failure + retry tests for the wire sinks' exactly-once
discipline (the TwoPhaseCommitSinkFunction write-side contract).

Spark's retry unit is the task (within a batch) and the micro-batch
(across a restart); both re-execute the same rows. Each test injects a
failure mid-write on the first attempt, re-runs (the retry), and asserts
the stub's VISIBLE/DEDUPED state holds each row exactly once:

- Cassandra: PK upserts — retry overwrites, never duplicates.
- RabbitMQ: `correlation_id_col` publishes the AMQP correlation-id
  property; the broker-side dedup store keeps one copy per id
  (RMQSource.java's exactly-once consumption contract).
- Pub/Sub: `dedup_id_col` -> `dedupId` attribute; the lost-response
  retry overwrites the same ids.
- NiFi: one confirmed transaction per flush — a torn confirm leaves
  NOTHING visible, so the retry's transaction is the only copy.
- foreachBatch ledger: a batch re-executed after restart with the same
  batch_id is skipped once its commit marker exists.
"""

from __future__ import annotations

import json

import pytest

from tests.wire_stubs import (
    CassandraUpsertStub,
    DedupAmqpSinkStub,
    NiFiInputPortStub,
    PubSubTopicStub,
)


def _df(spark, n=5):
    return spark.createDataFrame(
        [(i, f"name{i}", i * 1.5) for i in range(n)],
        "user_id long, name string, score double",
    ).coalesce(1)


def test_cassandra_sink_mid_batch_failure_then_retry_upserts_once(spark):
    from flink_parent_spark.sources.cassandra_cql import cassandra_cql_sink

    stub = CassandraUpsertStub(drop_after=3).start()
    try:
        df = _df(spark)
        with pytest.raises(Exception):
            cassandra_cql_sink(
                df, "127.0.0.1", stub.port, "ks", "t", batch_size=2
            )
        assert 0 < len(stub.by_pk) < 5  # genuinely torn mid-batch
        # the retry (Spark re-runs the task with the same rows)
        cassandra_cql_sink(df, "127.0.0.1", stub.port, "ks", "t", batch_size=2)
        # PK upsert idempotence: 5 keys, one row each, latest values
        assert len(stub.by_pk) == 5
        assert stub.insert_count > 5  # the wire saw retries; the table didn't
    finally:
        stub.stop()


def test_rabbitmq_sink_correlation_id_dedup_across_retry(spark):
    from flink_parent_spark.sources.rabbitmq_amqp import rabbitmq_sink

    stub = DedupAmqpSinkStub(drop_after=3).start()
    try:
        df = _df(spark)
        with pytest.raises(Exception):
            rabbitmq_sink(
                df, "127.0.0.1", stub.port, "q",
                batch_confirm=2, correlation_id_col="user_id",
            )
        assert 0 < len(stub.by_id) < 5
        rabbitmq_sink(
            df, "127.0.0.1", stub.port, "q",
            batch_confirm=2, correlation_id_col="user_id",
        )
        assert sorted(stub.by_id) == ["0", "1", "2", "3", "4"]
        assert stub.publish_count > 5  # retried on the wire, deduped by id
        # payload integrity through the dedup store
        assert json.loads(stub.by_id["3"])["name"] == "name3"
    finally:
        stub.stop()


def test_pubsub_sink_dedup_id_survives_lost_response(spark):
    from flink_parent_spark.sources.connectors import pubsub_publish_sink

    stub = PubSubTopicStub(fail_first=True).start()
    try:
        df = _df(spark)
        # first attempt: server stores the batch but the response is lost
        with pytest.raises(Exception):
            pubsub_publish_sink(
                df, f"http://127.0.0.1:{stub.port}", "p", "t",
                batch_messages=10, dedup_id_col="user_id",
            )
        pubsub_publish_sink(
            df, f"http://127.0.0.1:{stub.port}", "p", "t",
            batch_messages=10, dedup_id_col="user_id",
        )
        assert sorted(stub.by_id) == ["0", "1", "2", "3", "4"]
    finally:
        stub.stop()


def test_nifi_sink_torn_confirm_leaves_nothing_then_retry_once(spark):
    from flink_parent_spark.sources.nifi_s2s import nifi_s2s_sink

    stub = NiFiInputPortStub(fail_first_confirm=True).start()
    try:
        df = spark.createDataFrame(
            [(f"u{i}", f"c{i}") for i in range(4)], "uuid string, body string"
        ).coalesce(1)
        with pytest.raises(Exception):
            nifi_s2s_sink(
                df, f"http://127.0.0.1:{stub.port}", "p",
                content_col="body", attr_cols=["uuid"],
            )
        assert stub.visible == []  # torn transaction: all-or-nothing held
        nifi_s2s_sink(
            df, f"http://127.0.0.1:{stub.port}", "p",
            content_col="body", attr_cols=["uuid"],
        )
        got = sorted(attrs["uuid"] for attrs, _content in stub.visible)
        assert got == ["u0", "u1", "u2", "u3"]  # exactly once
        assert len(stub.visible) == 4
    finally:
        stub.stop()


def test_idempotent_foreach_batch_skips_committed_batches(spark, tmp_path):
    from flink_parent_spark.sources.stream_wire import idempotent_foreach_batch

    calls: list[int] = []

    def sink(batch_df, batch_id):
        calls.append(batch_id)
        if len(calls) == 1:
            raise RuntimeError("sink died before the ledger marker")

    wrapped = idempotent_foreach_batch(sink, str(tmp_path / "ledger"))
    df = _df(spark, 2)
    with pytest.raises(RuntimeError):
        wrapped(df, 0)  # attempt 1: fails, no marker written
    wrapped(df, 0)  # restart replays batch 0: runs (marker absent)
    wrapped(df, 0)  # second replay: skipped (marker present)
    wrapped(df, 1)  # next batch runs
    assert calls == [0, 0, 1]


def test_end_to_end_stream_restart_into_deduped_pubsub(spark, tmp_path):
    """Full checkpoint-aligned pipe: wire SOURCE (feed) -> foreachBatch
    ledger -> dedup-id Pub/Sub SINK, stopped and restarted — the sink-side
    store holds every record exactly once."""
    from flink_parent_spark.sources.connectors import pubsub_publish_sink
    from flink_parent_spark.sources.stream_wire import (
        idempotent_foreach_batch,
        register_wire_sources,
    )
    from tests.wire_stubs import FeedStub

    feed = FeedStub().start()
    topic = PubSubTopicStub().start()
    register_wire_sources(spark)

    def sink(batch_df, batch_id):
        from pyspark.sql import functions as F

        enriched = batch_df.select(
            F.get_json_object("status", "$.sid").cast("long").alias("user_id"),
            F.col("status").alias("name"),
            F.lit(0.0).alias("score"),
        )
        pubsub_publish_sink(
            enriched, f"http://127.0.0.1:{topic.port}", "p", "t",
            batch_messages=10, dedup_id_col="user_id",
        )

    wrapped = idempotent_foreach_batch(sink, str(tmp_path / "ledger"))

    def run():
        df = (
            spark.readStream.format("twitter-stream")
            .option("endpoint", f"http://127.0.0.1:{feed.port}/sample")
            .option("spooldir", str(tmp_path / "spool"))
            .option("maxperbatch", "3")
            .load()
        )
        q = (
            df.writeStream.foreachBatch(wrapped)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    try:
        feed.publish(*[json.dumps({"sid": i}) for i in range(5)])
        run()
        feed.publish(*[json.dumps({"sid": i}) for i in range(5, 8)])
        run()
        assert sorted(int(k) for k in topic.by_id) == list(range(8))
    finally:
        feed.stop()
        topic.stop()
