"""Kafka wire protocol (v0) against an in-container TCP broker stub —
the kafka analog of the CQL/AMQP/NiFi wire suites (r7 verdict #6): the
connector family's flagship now speaks its real framing in tests instead
of only the file-backed fake."""

from __future__ import annotations

import json

import pytest

from tests.wire_stubs import KafkaBrokerStub


def test_protocol_roundtrip_produce_fetch_metadata():
    from flink_parent_spark.sources import kafka_wire as kw

    stub = KafkaBrokerStub().start()
    sock = kw.connect("127.0.0.1", stub.port)
    try:
        versions = kw.api_versions(sock)
        assert kw.API_PRODUCE in versions and kw.API_FETCH in versions

        md = kw.metadata(sock, ["t1"])
        assert md["brokers"][0]["port"] == stub.port
        assert 0 in md["topics"]["t1"]["partitions"]

        base = kw.produce(
            sock, "t1", 0, [(b"k1", b"v1"), (None, b"v2"), (b"k3", b"v3")]
        )
        assert base == 0
        base2 = kw.produce(sock, "t1", 0, [(b"k4", b"v4")])
        assert base2 == 3  # broker-assigned monotone offsets

        msgs, hw = kw.fetch(sock, "t1", 0, 0)
        assert hw == 4
        assert [(o, k, v) for o, k, v in msgs] == [
            (0, b"k1", b"v1"),
            (1, None, b"v2"),
            (2, b"k3", b"v3"),
            (3, b"k4", b"v4"),
        ]
        # offset-addressed resume
        msgs, hw = kw.fetch(sock, "t1", 0, 2)
        assert [o for o, _k, _v in msgs] == [2, 3]
    finally:
        sock.close()
        stub.stop()


def test_message_set_crc_rejected_on_corruption():
    from flink_parent_spark.sources import kafka_wire as kw

    mset = bytearray(kw.encode_message_set([(b"k", b"value")]))
    mset[-1] ^= 0xFF  # corrupt the value's last byte
    with pytest.raises(RuntimeError, match="crc mismatch"):
        kw.decode_message_set(bytes(mset))


def test_kafka_wire_ddl_insert_readback(spark):
    """DDL with fps.transport=wire -> INSERT INTO produces real v0
    MessageSets to the stub -> SELECT reads them back through Fetch +
    the unchanged json decode chain."""
    from flink_parent_spark.api.table_env import TableEnvironment

    stub = KafkaBrokerStub().start()
    try:
        env = TableEnvironment.create(spark=spark)
        env.execute_sql(f"""
            CREATE TABLE kw_events (ev_id BIGINT, kind STRING,
                PRIMARY KEY (ev_id) NOT ENFORCED)
            WITH ('connector' = 'kafka', 'topic' = 'events',
                  'format' = 'json',
                  'properties.bootstrap.servers' = '127.0.0.1:{stub.port}',
                  'fps.transport' = 'wire')
        """)
        spark.createDataFrame(
            [(1, "click"), (2, "view"), (3, "buy")], "ev_id long, kind string"
        ).createOrReplaceTempView("kw_src")
        env.execute_sql("INSERT INTO kw_events SELECT * FROM kw_src")

        # the stub's log holds real decoded MessageSets: key = PK string.
        # Order is unordered ACROSS Spark partitions (each produces on its
        # own connection — Kafka only orders within one producer), so
        # compare as a set.
        assert sorted(k for k, _v in stub.logs["events"]) == [b"1", b"2", b"3"]
        by_key = {k: v for k, v in stub.logs["events"]}
        assert json.loads(by_key[b"3"])["kind"] == "buy"

        got = sorted(
            (r["ev_id"], r["kind"])
            for r in env.sql_query(
                "SELECT ev_id, kind FROM kw_events"
            ).collect()
        )
        assert got == [(1, "click"), (2, "view"), (3, "buy")]

        # append-then-reread: offsets advance, second scan sees both batches
        spark.createDataFrame(
            [(4, "refund")], "ev_id long, kind string"
        ).createOrReplaceTempView("kw_src2")
        env.execute_sql("INSERT INTO kw_events SELECT * FROM kw_src2")
        n = env.sql_query("SELECT count(*) AS n FROM kw_events").collect()[0]["n"]
        assert n == 4
    finally:
        stub.stop()
