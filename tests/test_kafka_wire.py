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
        assert sorted(k for k, _v in stub.logs["events"][0]) == [b"1", b"2", b"3"]
        by_key = {k: v for k, v in stub.logs["events"][0]}
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


def test_kafka_wire_sink_partition_routing(spark):
    """Keyed rows route by toPositive(murmur2(key)) % n_partitions (Java
    client default partitioner). Uses 3 partitions because the
    toPositive mask is a no-op at powers of two — only a non-power-of-2
    count catches a missing `& 0x7fffffff`. Hash vectors pinned to the
    Java client's own published test values (UtilsTest.testMurmur2)."""
    import struct

    from flink_parent_spark.sources.kafka_wire import (
        kafka_partition_for,
        kafka_wire_sink,
        murmur2,
    )
    from tests.wire_stubs import KafkaBrokerStub

    # Java-client known-answer vectors (signed 32-bit, as UtilsTest
    # prints them) — placement parity with a stock producer depends on
    # the hash matching bit-for-bit.
    def signed(h):
        return struct.unpack(">i", struct.pack(">I", h))[0]

    java_vectors = {
        b"21": -973932308,
        b"foobar": -790332482,
        b"a-little-bit-long-string": -985981536,
        b"a-little-bit-longer-string": -1486304829,
        b"lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8": -58897971,
        b"abc": 479470107,
    }
    for k, v in java_vectors.items():
        assert signed(murmur2(k)) == v
        # Java computes toPositive(murmur2) % n on the masked hash
        assert kafka_partition_for(k, 3) == (v & 0x7FFFFFFF) % 3
    # keys whose hash has bit 31 set are where the mask matters at n=3
    assert any(murmur2(k) & 0x80000000 for k in java_vectors)

    stub = KafkaBrokerStub(n_partitions=3).start()
    try:
        df = spark.createDataFrame(
            [(f"k{i}", f"v{i}") for i in range(30)], "k string, v string"
        ).coalesce(2)
        kafka_wire_sink(df, "127.0.0.1", stub.port, "routed")
        logs = stub.logs["routed"]
        assert set(logs) == {0, 1, 2}  # every partition got data
        all_keys = [k for pid in logs for (k, _v) in logs[pid]]
        assert sorted(all_keys) == sorted(f"k{i}".encode() for i in range(30))
        # per-key placement matches the Java partitioner contract
        for pid, entries in logs.items():
            for k, _v in entries:
                assert kafka_partition_for(k, 3) == pid
    finally:
        stub.stop()
