"""Stop/restart exactly-once tests for the unbounded wire sources.

Contract under test (stream_wire.py): poll-per-trigger micro-batches,
acks deferred to `commit` (checkpoint complete — RMQSource.java:308
parity), spool-backed replay for uncommitted batches, and redelivery
dedup — so a stop + broker redelivery + restart yields every message in
the sink EXACTLY once, with the checkpointed position advancing across
the restart.

Each test: publish -> run -> stop (leaving the tail batch uncommitted,
as a crash would) -> force broker redelivery (lease/transaction expiry
where the protocol has one) -> publish more -> restart from the same
checkpoint -> assert the sink holds the full set exactly once.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

from flink_parent_spark.sources.stream_wire import register_wire_sources
from tests.wire_stubs import AmqpBrokerStub, FeedStub, NiFiPortStub, PubSubStub


@pytest.fixture()
def workdir(tmp_path):
    d = str(tmp_path / "wire")
    os.makedirs(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_until_idle(reader_df, workdir):
    q = (
        reader_df.writeStream.format("json")
        .option("path", f"{workdir}/out")
        .option("checkpointLocation", f"{workdir}/ckpt")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)


def _sink_rows(workdir) -> list[dict]:
    out = []
    d = f"{workdir}/out"
    for f in os.listdir(d):
        if f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                out.extend(json.loads(line) for line in fh if line.strip())
    return out


def _committed_batches(workdir) -> int:
    commits = f"{workdir}/ckpt/commits"
    return len(
        [f for f in os.listdir(commits) if not f.startswith(".")]
    ) if os.path.exists(commits) else 0


def test_rabbitmq_stream_restart_exactly_once(spark, workdir):
    stub = AmqpBrokerStub().start()
    register_wire_sources(spark)

    def reader():
        return (
            spark.readStream.format("rabbitmq-stream")
            .option("host", "127.0.0.1")
            .option("port", str(stub.port))
            .option("queue", "q")
            .option("schema", "ev_id long, kind string")
            .option("spooldir", f"{workdir}/spool")
            .option("maxperbatch", "2")
            .load()
        )

    try:
        stub.publish(
            *[json.dumps({"ev_id": i, "kind": f"k{i}"}).encode() for i in range(5)]
        )
        _run_until_idle(reader(), workdir)
        c1 = _committed_batches(workdir)
        assert c1 >= 2  # maxperbatch=2 over 5 messages: several batches
        # the broker redelivers whatever the stopped run left unacked;
        # AMQP requeues on disconnect automatically (stub models that)
        stub.publish(
            *[json.dumps({"ev_id": i, "kind": f"k{i}"}).encode() for i in range(5, 8)]
        )
        _run_until_idle(reader(), workdir)
        rows = _sink_rows(workdir)
        assert sorted(r["ev_id"] for r in rows) == list(range(8))  # no loss, no dupes
        assert _committed_batches(workdir) > c1  # position advanced across restart
        # every batch whose commit fired is acked at the broker; only the
        # final (stop-raced) batch may remain outstanding
        assert stub.unacked_count() <= 2
    finally:
        stub.stop()


def test_pubsub_stream_restart_exactly_once(spark, workdir):
    stub = PubSubStub().start()
    register_wire_sources(spark)

    def reader():
        return (
            spark.readStream.format("pubsub-stream")
            .option("endpoint", f"http://127.0.0.1:{stub.port}")
            .option("project", "p")
            .option("subscription", "s")
            .option("schema", "ev_id long, kind string")
            .option("spooldir", f"{workdir}/spool")
            .option("maxperbatch", "3")
            .load()
        )

    try:
        stub.publish(*[{"ev_id": i, "kind": f"k{i}"} for i in range(7)])
        _run_until_idle(reader(), workdir)
        c1 = _committed_batches(workdir)
        # ack deadline passes while the query is down: every outstanding
        # lease redelivers (the dedup filter must absorb them)
        stub.expire_leases()
        stub.publish(*[{"ev_id": i, "kind": f"k{i}"} for i in range(7, 10)])
        _run_until_idle(reader(), workdir)
        rows = _sink_rows(workdir)
        assert sorted(r["ev_id"] for r in rows) == list(range(10))
        assert _committed_batches(workdir) > c1
        assert stub.unacked_count() <= 3  # only the stop-raced tail batch
    finally:
        stub.stop()


def test_nifi_stream_restart_exactly_once(spark, workdir):
    stub = NiFiPortStub(batch=2).start()
    register_wire_sources(spark)

    def reader():
        return (
            spark.readStream.format("nifi-stream")
            .option("url", f"http://127.0.0.1:{stub.port}")
            .option("portid", "p")
            .option("spooldir", f"{workdir}/spool")
            .option("maxperbatch", "4")
            .load()
        )

    try:
        stub.publish(
            *[({"uuid": f"u{i}", "n": str(i)}, f"c{i}".encode()) for i in range(5)]
        )
        _run_until_idle(reader(), workdir)
        c1 = _committed_batches(workdir)
        # server-side transaction timeout while down: unconfirmed
        # transactions requeue their flowfiles
        stub.expire_transactions()
        stub.publish(
            *[({"uuid": f"u{i}", "n": str(i)}, f"c{i}".encode()) for i in range(5, 8)]
        )
        _run_until_idle(reader(), workdir)
        rows = _sink_rows(workdir)
        got = sorted(r["attributes"]["uuid"] for r in rows)
        assert got == [f"u{i}" for i in range(8)]
        # content survives the spool roundtrip (base64 in, bytes out,
        # json sink base64s binary again)
        import base64

        by_uuid = {r["attributes"]["uuid"]: r for r in rows}
        assert base64.b64decode(by_uuid["u3"]["content"]) == b"c3"
        assert _committed_batches(workdir) > c1
        assert stub.unconsumed_count() <= 4
    finally:
        stub.stop()


def test_twitter_stream_restart_no_loss(spark, workdir):
    stub = FeedStub().start()
    register_wire_sources(spark)

    def reader():
        return (
            spark.readStream.format("twitter-stream")
            .option("endpoint", f"http://127.0.0.1:{stub.port}/sample")
            .option("spooldir", f"{workdir}/spool")
            .option("maxperbatch", "3")
            .load()
        )

    try:
        stub.publish(*[json.dumps({"sid": i}) for i in range(6)])
        _run_until_idle(reader(), workdir)
        c1 = _committed_batches(workdir)
        # a feed has no redelivery: uncommitted tail comes back from the
        # spool alone, and the feed cursor never rewinds
        stub.publish(*[json.dumps({"sid": i}) for i in range(6, 9)])
        _run_until_idle(reader(), workdir)
        rows = _sink_rows(workdir)
        sids = sorted(json.loads(r["status"])["sid"] for r in rows)
        assert sids == list(range(9))
        assert _committed_batches(workdir) > c1
    finally:
        stub.stop()


def test_spooling_reader_unit_replay_and_dedup(tmp_path):
    """Reader-level contract without Spark: spool-before-emit, replay
    between offsets, redelivery dedup with immediate ack, commit acks +
    prunes."""
    from flink_parent_spark.sources.stream_wire import (
        SpoolingWireReader,
        WireAdapter,
        WireMessage,
    )

    class FakeQueue(WireAdapter):
        def __init__(self):
            self.pending = []  # (id, payload)
            self.acked = []

        def fetch(self, n):
            return [
                WireMessage(i, ("h", i), p) for i, p in self.pending[:n]
            ]

        def ack(self, handles):
            ids = {h[1] for h in handles}
            self.acked.extend(sorted(ids))
            self.pending = [(i, p) for i, p in self.pending if i not in ids]

        def to_row(self, payload):
            return (payload["v"],)

    q = FakeQueue()
    q.pending = [(f"m{i}", {"v": i}) for i in range(3)]
    spool = str(tmp_path / "spool")
    r = SpoolingWireReader(q, spool, max_per_batch=10)
    assert r.initialOffset() == {"batch": 0}

    rows, nxt = r.read({"batch": 0})
    assert list(rows) == [(0,), (1,), (2,)] and nxt == {"batch": 1}
    assert q.acked == []  # nothing acked before commit
    # replay serves from spool, not the broker
    assert list(r.readBetweenOffsets({"batch": 0}, {"batch": 1})) == [
        (0,), (1,), (2,),
    ]

    # crash/redelivery before commit: same ids fetched again on a NEW
    # reader (fresh connection) -> deduped, acked immediately
    r2 = SpoolingWireReader(q, spool, max_per_batch=10)
    rows, nxt = r2.read({"batch": 1})
    assert list(rows) == [] and nxt == {"batch": 1}  # no progress
    assert q.acked == ["m0", "m1", "m2"]  # duplicate redeliveries acked
    assert q.pending == []

    # commit prunes the spool (the committed-ids ledger remains) and
    # records the ids as committed
    r2.commit({"batch": 1})
    assert [f for f in os.listdir(spool) if f.endswith(".json")] == []
    # a redelivery AFTER commit (Pub/Sub ack-deadline shape: the
    # pre-crash ack handle was session-scoped, so the broker copy
    # survived the commit) is acked, never re-emitted
    q.acked.clear()
    q.pending = [("m0", {"v": 99}), ("m9", {"v": 9})]
    rows, nxt = r2.read({"batch": 1})
    assert list(rows) == [(9,)] and nxt == {"batch": 2}
    assert q.acked == ["m0"]  # committed-ledger hit: broker copy cleared
    # ...and the ledger survives a restart (it is a durable file)
    r3 = SpoolingWireReader(q, spool, max_per_batch=10)
    q.pending = [("m1", {"v": 1})]
    rows, nxt = r3.read({"batch": 2})
    assert list(rows) == []  # m1 committed pre-"crash": dedup holds


def test_spooling_reader_reserves_orphaned_spool(tmp_path):
    """Crash window between read()'s spool write and Spark's offset-log
    write: the restart re-calls read() at the SAME batch — the reader
    must re-serve the orphaned spool file, not overwrite it with a fresh
    fetch (which would lose its messages from broker and spool alike)."""
    from flink_parent_spark.sources.stream_wire import (
        SpoolingWireReader,
        WireAdapter,
        WireMessage,
    )

    class Q(WireAdapter):
        def __init__(self):
            self.pending, self.acked = [], []

        def fetch(self, n):
            return [WireMessage(i, i, p) for i, p in self.pending[:n]]

        def ack(self, handles):
            self.acked.extend(handles)
            self.pending = [(i, p) for i, p in self.pending if i not in handles]

        def to_row(self, payload):
            return (payload["v"],)

    q = Q()
    q.pending = [("a", {"v": 1}), ("b", {"v": 2})]
    spool = str(tmp_path / "spool")
    r = SpoolingWireReader(q, spool, max_per_batch=10)
    rows, nxt = r.read({"batch": 0})
    assert list(rows) == [(1,), (2,)] and nxt == {"batch": 0 + 1}

    # crash before Spark logs batch 0; broker redelivers NOTHING yet and
    # two brand-new messages arrive — the old code would fetch them and
    # os.replace the batch-0 spool, orphaning a/b forever
    q.pending = [("c", {"v": 3}), ("d", {"v": 4})]
    r2 = SpoolingWireReader(q, spool, max_per_batch=10)
    rows, nxt = r2.read({"batch": 0})
    assert list(rows) == [(1,), (2,)]  # re-served, same end offset
    assert nxt == {"batch": 1}
    assert q.pending == [("c", {"v": 3}), ("d", {"v": 4})]  # untouched
    # the fresh messages arrive in the NEXT batch, nothing lost
    rows, nxt = r2.read({"batch": 1})
    assert list(rows) == [(3,), (4,)] and nxt == {"batch": 2}


def test_spooling_reader_transaction_scoped_handles(tmp_path):
    """NiFi shape: ONE ack handle covers a whole transaction. A mixed
    transaction (spooled duplicate + fresh flowfile) must NOT be acked at
    read time — confirming it would lose the un-spooled fresh flowfile on
    a crash; the handle is acked exactly once, at commit."""
    from flink_parent_spark.sources.stream_wire import (
        SpoolingWireReader,
        WireAdapter,
        WireMessage,
    )

    class TxQ(WireAdapter):
        def __init__(self):
            self.batches = []  # each: list[(handle, id, payload)]
            self.acked = []

        def fetch(self, n):
            out = []
            for b in self.batches:
                out.extend(WireMessage(i, h, p) for h, i, p in b)
            return out[:n]

        def ack(self, handles):
            self.acked.extend(handles)
            self.batches = [
                b for b in self.batches if b[0][0] not in handles
            ]

        def to_row(self, payload):
            return (payload["v"],)

    q = TxQ()
    spool = str(tmp_path / "spool")
    # tx1 delivered and spooled, but NOT committed (crash before commit)
    q.batches = [[("tx1", "m0", {"v": 0}), ("tx1", "m1", {"v": 1})]]
    r = SpoolingWireReader(q, spool, max_per_batch=10)
    rows, _ = r.read({"batch": 0})
    assert list(rows) == [(0,), (1,)]
    assert q.acked == []

    # restart: the broker requeues tx1's flowfiles together with a fresh
    # one in a NEW transaction — a mixed dup/fresh group under one handle
    q.acked.clear()
    q.batches = [
        [("tx2", "m0", {"v": 0}), ("tx2", "m1", {"v": 1}), ("tx2", "m2", {"v": 2})]
    ]
    r2 = SpoolingWireReader(q, spool, max_per_batch=10)
    rows, nxt = r2.read({"batch": 1})
    assert list(rows) == [(2,)]  # only the fresh flowfile emits
    assert q.acked == []  # mixed tx NOT confirmed at read time
    r2.commit({"batch": 2})
    assert q.acked == ["tx2"]  # confirmed exactly once, at commit

    # all-duplicate transaction IS safely ack-able at read time
    q.acked.clear()
    q.batches = [[("tx3", "m3", {"v": 3})]]
    rows, _ = r2.read({"batch": 2})
    assert list(rows) == [(3,)]
    q.batches = [[("tx4", "m3", {"v": 3})]]  # pure redelivery of m3
    rows, nxt = r2.read({"batch": 3})
    assert list(rows) == [] and nxt == {"batch": 3}
    assert q.acked == ["tx4"]


def test_rabbitmq_correlation_id_identity(spark, workdir):
    """Two DISTINCT messages with byte-identical bodies but different
    correlation ids must both be delivered — identity comes from the
    correlation-id property, not the body digest, when the publisher
    sets one (RMQSource usesCorrelationId parity). maxperbatch=1 forces
    each message into its own micro-batch so the cross-batch dedup path
    actually runs (an in-batch pair never consults _pending_ids)."""
    stub = AmqpBrokerStub().start()
    register_wire_sources(spark)
    body = json.dumps({"ev_id": 7, "kind": "same"}).encode()
    try:
        stub.publish_with_cid(body, "cid-a")
        stub.publish_with_cid(body, "cid-b")
        df = (
            spark.readStream.format("rabbitmq-stream")
            .option("host", "127.0.0.1")
            .option("port", str(stub.port))
            .option("queue", "q")
            .option("schema", "ev_id long, kind string")
            .option("spooldir", f"{workdir}/spool")
            .option("maxperbatch", "1")
            .load()
        )
        _run_until_idle(df, workdir)
        rows = _sink_rows(workdir)
        assert [r["ev_id"] for r in rows] == [7, 7]  # neither dropped
    finally:
        stub.stop()


def test_rabbitmq_fetch_surfaces_correlation_id(workdir):
    """The adapter's message identity IS the published correlation-id —
    asserted directly on RabbitMQAdapter.fetch so a header-parse
    regression (flags/property offsets) can't hide behind batch
    boundaries. Also pins the AMQP 0-9-1 §4.2.6.1 content-header layout:
    class(2)+weight(2)+body-size(8), flags at 12, properties at 14."""
    import struct

    from flink_parent_spark.sources import rabbitmq_amqp as amqp
    from flink_parent_spark.sources.stream_wire import RabbitMQAdapter

    body = json.dumps({"ev_id": 9, "kind": "direct"}).encode()
    hdr = struct.pack(">HHQH", 60, 0, len(body), 0x0400) + amqp.shortstr(
        "cid-direct"
    )
    props = amqp.parse_basic_properties(hdr)
    assert props["body_size"] == len(body)
    assert props["correlation_id"] == "cid-direct"
    # no correlation-id bit -> no fabricated identity, whatever the size
    for n in (7, 1024, 2047):  # 1024..2047 set bit 10 of the size's low
        plain = struct.pack(">HHQH", 60, 0, n, 0)  # half — must not leak
        p = amqp.parse_basic_properties(plain)
        assert p["body_size"] == n and "correlation_id" not in p

    stub = AmqpBrokerStub().start()
    try:
        stub.publish_with_cid(body, "cid-direct")
        stub.publish(json.dumps({"ev_id": 10, "kind": "anon"}).encode())
        adapter = RabbitMQAdapter(
            "127.0.0.1", stub.port, "q", "ev_id long, kind string"
        )
        try:
            msgs = adapter.fetch(10)
        finally:
            adapter.close()
        by_ev = {m.payload["ev_id"]: m for m in msgs}
        assert by_ev[9].msg_id == "cid-direct"
        assert by_ev[10].msg_id != "cid-direct"  # sha1(body) fallback
    finally:
        stub.stop()


def test_kinesis_stream_restart_exactly_once(spark, workdir):
    """FlinkKinesisConsumer parity: per-shard sequence numbers live in
    the checkpoint; restart resumes each shard AFTER its checkpointed
    sequence number — no loss, no dupes, positions advance, and replay
    needs no spool because the log re-serves by sequence number."""
    from tests.wire_stubs import KinesisStreamStub

    stub = KinesisStreamStub(n_shards=2).start()
    register_wire_sources(spark)

    def reader():
        return (
            spark.readStream.format("kinesis-stream")
            .option("endpoint", f"http://127.0.0.1:{stub.port}")
            .option("stream", "events")
            .option("schema", "ev_id long, kind string")
            .option("maxperbatch", "3")
            .load()
        )

    try:
        for i in range(7):
            stub.publish(f"pk{i}", {"ev_id": i, "kind": f"k{i}"})
        _run_until_idle(reader(), workdir)
        c1 = _committed_batches(workdir)
        assert c1 >= 2  # maxperbatch=3 over 7 records: several batches
        for i in range(7, 10):
            stub.publish(f"pk{i}", {"ev_id": i, "kind": f"k{i}"})
        _run_until_idle(reader(), workdir)
        rows = _sink_rows(workdir)
        assert sorted(r["ev_id"] for r in rows) == list(range(10))
        assert _committed_batches(workdir) > c1  # positions advanced
        # both shards actually carried data (md5 routing over 10 keys)
        assert all(stub.shards[s] for s in stub.shard_ids)
    finally:
        stub.stop()


def test_kinesis_reader_unit_replay():
    """Reader-level: readBetweenOffsets re-serves exactly the records in
    (start_seq, end_seq] per shard, straight from the retained log."""
    from flink_parent_spark.sources.kinesis_wire import (
        KinesisClient,
        KinesisStreamReader,
    )
    from tests.wire_stubs import KinesisStreamStub

    stub = KinesisStreamStub(n_shards=2).start()
    try:
        r = KinesisStreamReader(
            KinesisClient(f"http://127.0.0.1:{stub.port}", "s"),
            ["v"],
            max_per_batch=100,
        )
        assert r.initialOffset() == {"seqs": {}}
        for i in range(6):
            stub.publish(f"k{i}", {"v": i})
        rows, o1 = r.read({"seqs": {}})
        assert sorted(v for (v,) in rows) == list(range(6))
        # replay the whole range deterministically
        replay = sorted(v for (v,) in r.readBetweenOffsets({"seqs": {}}, o1))
        assert replay == list(range(6))
        # incremental range: publish more, replay only the delta
        for i in range(6, 9):
            stub.publish(f"k{i}", {"v": i})
        rows, o2 = r.read(o1)
        assert sorted(v for (v,) in rows) == [6, 7, 8]
        delta = sorted(v for (v,) in r.readBetweenOffsets(o1, o2))
        assert delta == [6, 7, 8]
    finally:
        stub.stop()


def test_kafka_wire_stream_restart_exactly_once(spark, workdir):
    """Unbounded kafka wire source: multi-partition offsets in the
    checkpoint, replay via re-fetch (no spool), restart resumes from the
    checkpointed positions (FlinkKafkaConsumer checkpoint-owned offsets)."""
    import struct as _struct  # noqa: F401

    from flink_parent_spark.sources import kafka_wire as kw
    from tests.wire_stubs import KafkaBrokerStub

    stub = KafkaBrokerStub(n_partitions=2).start()
    register_wire_sources(spark)

    def produce(pid, lo, hi):
        sock = kw.connect("127.0.0.1", stub.port)
        try:
            kw.produce(
                sock, "events", pid,
                [
                    (str(i).encode(), json.dumps({"ev_id": i}).encode())
                    for i in range(lo, hi)
                ],
            )
        finally:
            sock.close()

    def reader():
        return (
            spark.readStream.format("kafka-wire-stream")
            .option("host", "127.0.0.1")
            .option("port", str(stub.port))
            .option("topic", "events")
            .option("maxperbatch", "3")
            .load()
        )

    try:
        produce(0, 0, 4)
        produce(1, 4, 7)
        _run_until_idle(reader(), workdir)
        c1 = _committed_batches(workdir)
        assert c1 >= 2
        produce(0, 7, 9)
        produce(1, 9, 10)
        _run_until_idle(reader(), workdir)
        rows = _sink_rows(workdir)
        import base64

        ev_ids = sorted(
            json.loads(base64.b64decode(r["value"]))["ev_id"] for r in rows
        )
        assert ev_ids == list(range(10))  # no loss, no dupes
        assert {r["partition"] for r in rows} == {0, 1}
        assert _committed_batches(workdir) > c1
    finally:
        stub.stop()


def test_kafka_wire_reader_unit_replay():
    """Reader-level: per-partition offsets advance independently and
    readBetweenOffsets re-fetches exactly the [start, end) range."""
    from flink_parent_spark.sources import kafka_wire as kw
    from tests.wire_stubs import KafkaBrokerStub

    stub = KafkaBrokerStub(n_partitions=2).start()
    try:
        sock = kw.connect("127.0.0.1", stub.port)
        kw.produce(sock, "t", 0, [(None, b"a"), (None, b"b")])
        kw.produce(sock, "t", 1, [(None, b"c")])
        sock.close()

        r = kw.KafkaWireStreamReader("127.0.0.1", stub.port, "t", 100)
        rows, o1 = r.read({"offsets": {}})
        vals = sorted(v for (_k, v, _t, _p, _o, _ts, _tt) in rows)
        assert vals == [b"a", b"b", b"c"]
        assert o1 == {"offsets": {"0": 2, "1": 1}}
        replay = list(r.readBetweenOffsets({"offsets": {}}, o1))
        assert sorted(v for (_k, v, *_rest) in replay) == [b"a", b"b", b"c"]
        # partial range replays only the slice
        part = list(
            r.readBetweenOffsets({"offsets": {"0": 1, "1": 1}}, o1)
        )
        assert [v for (_k, v, *_rest) in part] == [b"b"]
        # no progress -> same offset back, no empty batch
        rows, o2 = r.read(o1)
        assert list(rows) == [] and o2 == o1
        r.close()
    finally:
        stub.stop()


def test_kinesis_ddl_roundtrip(spark):
    """connector=kinesis full circle through ONE stub: CREATE TABLE ->
    INSERT INTO (PutRecords, executor-side) -> SELECT (bounded
    TRIM_HORIZON->tip drain over GetRecords) — the scan half added to
    the DDL path, matching the kafka wire DDL roundtrip."""
    from flink_parent_spark.api.table_env import TableEnvironment
    from tests.wire_stubs import KinesisStreamStub

    stub = KinesisStreamStub(n_shards=2).start()
    try:
        env = TableEnvironment.create(spark=spark)
        env.execute_sql(f"""
            CREATE TABLE kin_rt (
                uid BIGINT, amount DOUBLE,
                PRIMARY KEY (uid) NOT ENFORCED
            ) WITH ('connector' = 'kinesis', 'stream' = 'payments',
                    'aws.endpoint' = 'http://127.0.0.1:{stub.port}')
        """)
        spark.createDataFrame(
            [(i, i + 0.5) for i in range(6)], "uid long, amount double"
        ).coalesce(2).createOrReplaceTempView("kin_rt_src")
        env.execute_sql("INSERT INTO kin_rt SELECT * FROM kin_rt_src")
        # records landed on both shards (md5 partition-key routing)
        assert all(stub.shards[s] for s in stub.shard_ids)
        got = env.from_path("kin_rt").to_df().collect()
        assert sorted((r.uid, r.amount) for r in got) == [
            (i, i + 0.5) for i in range(6)
        ]
    finally:
        stub.stop()


def test_kinesis_ddl_streaming_scan(spark, workdir):
    """Streaming SELECT over a connector=kinesis table goes through the
    checkpoint-offset source (per-shard sequence numbers)."""
    from flink_parent_spark.api.table_env import TableEnvironment
    from tests.wire_stubs import KinesisStreamStub

    stub = KinesisStreamStub(n_shards=2).start()
    try:
        for i in range(5):
            stub.publish(f"pk{i}", {"uid": i, "amount": i * 1.5})
        env = TableEnvironment.create(spark=spark)
        env.execute_sql(f"""
            CREATE TABLE kin_live (uid BIGINT, amount DOUBLE)
            WITH ('connector' = 'kinesis', 'stream' = 'live',
                  'aws.endpoint' = 'http://127.0.0.1:{stub.port}')
        """)
        sdf = env._scan(env.catalog["kin_live"], streaming=True)
        assert sdf.isStreaming
        _run_until_idle(sdf, workdir)
        rows = _sink_rows(workdir)
        assert sorted(r["uid"] for r in rows) == list(range(5))
    finally:
        stub.stop()


def test_committed_ids_ledger_compaction(tmp_path, monkeypatch):
    """The committed-ids ledger compacts to the most recent _LEDGER_MAX
    ids once it doubles past that bound: oldest ids age out (a very-late
    redelivery of an ancient id is then treated as new — the documented
    TTL analog), newest ids keep dedup working, and the compacted file
    survives a restart."""
    import flink_parent_spark.sources.stream_wire as sw

    class Q(sw.WireAdapter):
        def __init__(self):
            self.pending, self.acked = [], []

        def fetch(self, n):
            return [sw.WireMessage(i, i, p) for i, p in self.pending[:n]]

        def ack(self, handles):
            self.acked.extend(handles)
            self.pending = [
                (i, p) for i, p in self.pending if i not in handles
            ]

        def to_row(self, payload):
            return (payload["v"],)

    monkeypatch.setattr(sw, "_LEDGER_MAX", 10)
    q = Q()
    spool = str(tmp_path / "spool")
    r = sw.SpoolingWireReader(q, spool, max_per_batch=100)
    # commit 3 batches x 9 ids = 27 committed ids -> compaction at >20
    batch = 0
    for round_ in range(3):
        q.pending = [(f"m{round_}_{i}", {"v": i}) for i in range(9)]
        rows, nxt = r.read({"batch": batch})
        assert len(list(rows)) == 9
        batch = nxt["batch"]
        r.commit(nxt)
    assert len(r._committed_ids) == 10  # compacted to the newest MAX
    ledger = (tmp_path / "spool" / "committed-ids.log").read_text()
    kept = [ln for ln in ledger.splitlines() if ln]
    assert kept == list(r._committed_ids)
    assert all(i.startswith(("m2_", "m1_8")) for i in kept)  # newest win

    # restart: the compacted ledger still dedups recent ids...
    r2 = sw.SpoolingWireReader(q, spool, max_per_batch=100)
    q.acked.clear()
    q.pending = [("m2_5", {"v": 5}), ("new", {"v": 99})]
    rows, nxt = r2.read({"batch": batch})
    assert list(rows) == [(99,)]  # recent committed id deduped
    assert q.acked == ["m2_5"]
    # ...while an aged-out id (compacted away) is treated as new
    q.pending = [("m0_0", {"v": 0})]
    rows, _ = r2.read(nxt)
    assert list(rows) == [(0,)]
