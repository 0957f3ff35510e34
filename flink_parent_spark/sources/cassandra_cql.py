"""Cassandra sink speaking the CQL native wire protocol (v4) directly.

Reference surface: flink-connectors/flink-connector-cassandra —
`CassandraSink` / `CassandraSinkBase` (per-record writes through a
datastax Session with failure propagation) and the `CassandraRowWriteAheadSink`
exactly-once variant. The reference drives a live cluster through the
datastax driver; this engine has no client library and no cluster, so the
sink speaks the protocol itself: the CQL native protocol v4 frame layout
(version/flags/stream/opcode/length header, STARTUP handshake, QUERY and
BATCH requests with positionally-bound values) is public — the
`native_protocol_v4.spec` file shipped in apache/cassandra — and small
enough that stdlib `socket` + `struct` cover the sink's needs.

Wire behavior mirrors the reference sink's semantics:

- one connection per Spark partition (the reference opens one Session per
  subtask), STARTUP/READY handshake, then INSERTs;
- rows are written as positionally-bound values, NOT interpolated into the
  statement text — the binary value encoding per CQL type, like the
  reference's PreparedStatement binds (and immune to quoting issues);
- `batch_size` rows are grouped into one UNLOGGED BATCH frame (same-table
  batching is the documented throughput pattern; LOGGED atomicity is not
  needed for idempotent PK upserts);
- any ERROR response (opcode 0x00) raises and fails the Spark task, the
  reference's `CassandraFailureHandler` contract;
- INSERT by PRIMARY KEY is an upsert in Cassandra, so task retries
  overwrite in place — the same idempotent effectively-once discipline as
  the elasticsearch `_id` mapping in this package.

Tested against an in-container TCP stub (tests/test_connectors.py) that
implements the server half of the handshake and records the decoded
frames, the same pattern that made the kafka/ES/HBase/kinesis connectors
runnable without their live services.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

# -- protocol constants (native_protocol_v4.spec) ---------------------------

OP_ERROR = 0x00
OP_STARTUP = 0x01
OP_READY = 0x02
OP_QUERY = 0x07
OP_RESULT = 0x08
OP_BATCH = 0x0D

CONSISTENCY_LOCAL_QUORUM = 0x0006
_FLAG_VALUES = 0x01  # query-parameter flag: positional values follow


# -- frame codec (module-level so the test stub reuses it) ------------------

def encode_string(s: str) -> bytes:
    """[string]: short length + utf8 bytes."""
    b = s.encode("utf-8")
    return struct.pack(">H", len(b)) + b


def encode_long_string(s: str) -> bytes:
    """[long string]: int length + utf8 bytes."""
    b = s.encode("utf-8")
    return struct.pack(">i", len(b)) + b


def encode_string_map(m: "dict[str, str]") -> bytes:
    out = [struct.pack(">H", len(m))]
    for k, v in m.items():
        out.append(encode_string(k))
        out.append(encode_string(v))
    return b"".join(out)


def encode_bytes(b: "bytes | None") -> bytes:
    """[bytes]: int length + bytes; -1 encodes null."""
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


def encode_frame(opcode: int, body: bytes, stream: int = 0) -> bytes:
    """Request frame: version 0x04, flags 0, stream id, opcode, length."""
    return struct.pack(">BBhBi", 0x04, 0x00, stream, opcode, len(body)) + body


def decode_frame_header(hdr: bytes) -> "tuple[int, int, int, int, int]":
    """(version, flags, stream, opcode, body_length) from a 9-byte header."""
    return struct.unpack(">BBhBi", hdr)


def encode_cql_value(v, dtype: str) -> "bytes | None":
    """The binary value encoding for the CQL type backing a Spark column.

    Mapping (Spark simpleString -> CQL type -> wire bytes):
      string -> text (utf8) · int -> int (4B BE) · bigint -> bigint (8B BE)
      smallint/tinyint -> widened to int · double -> double · float -> float
      boolean -> boolean (1B) · timestamp -> timestamp (millis, 8B BE)
      date -> date (unsigned days with epoch at 2^31) · decimal -> decimal
      (int scale + big-endian two's-complement unscaled)
    None maps to the protocol's null ([bytes] length -1).
    """
    import datetime  # noqa: PLC0415
    import decimal  # noqa: PLC0415

    if v is None:
        return None
    if dtype == "string":
        return str(v).encode("utf-8")
    if dtype in ("int", "smallint", "tinyint"):
        return struct.pack(">i", int(v))
    if dtype == "bigint":
        return struct.pack(">q", int(v))
    if dtype == "double":
        return struct.pack(">d", float(v))
    if dtype == "float":
        return struct.pack(">f", float(v))
    if dtype == "boolean":
        return b"\x01" if v else b"\x00"
    if dtype == "timestamp":
        if isinstance(v, datetime.datetime):
            ms = int(v.timestamp() * 1000)
        else:
            ms = int(v)
        return struct.pack(">q", ms)
    if dtype == "date":
        if isinstance(v, datetime.date):
            days = (v - datetime.date(1970, 1, 1)).days
        else:
            days = int(v)
        return struct.pack(">I", days + 2**31)
    if dtype.startswith("decimal"):
        d = v if isinstance(v, decimal.Decimal) else decimal.Decimal(str(v))
        sign, digits, exp = d.as_tuple()
        unscaled = int(d.scaleb(-exp))
        n = max(1, (unscaled.bit_length() + 8) // 8)
        return struct.pack(">i", -exp) + unscaled.to_bytes(n, "big", signed=True)
    # fallback: textual form (matches how unsupported types would be
    # declared text-typed in the Cassandra schema)
    return str(v).encode("utf-8")


def read_exact(sock, n: int) -> bytes:
    chunks = []
    while n:
        c = sock.recv(n)
        if not c:
            raise ConnectionError("cassandra peer closed mid-frame")
        chunks.append(c)
        n -= len(c)
    return b"".join(chunks)


def _read_response(sock) -> "tuple[int, bytes]":
    hdr = read_exact(sock, 9)
    _ver, _flags, _stream, opcode, length = decode_frame_header(hdr)
    body = read_exact(sock, length) if length else b""
    if opcode == OP_ERROR:
        # ERROR body: [int code][string message]
        code = struct.unpack(">i", body[:4])[0]
        mlen = struct.unpack(">H", body[4:6])[0]
        msg = body[6 : 6 + mlen].decode("utf-8", "replace")
        raise RuntimeError(f"cassandra error 0x{code:04x}: {msg}")
    return opcode, body


def cassandra_cql_sink(
    df: DataFrame,
    host: str,
    port: int,
    keyspace: str,
    table: str,
    batch_size: int = 50,
    consistency: int = CONSISTENCY_LOCAL_QUORUM,
) -> None:
    """Write `df` to `keyspace.table` over the CQL native protocol.

    Executor-side by construction: each partition opens its own socket
    (reference: one Session per sink subtask), performs the
    STARTUP/READY handshake, then sends INSERTs with positionally-bound
    binary values — one UNLOGGED BATCH frame per `batch_size` rows, a
    plain QUERY frame when a group has a single row. Every request waits
    for its RESULT; an ERROR response raises and fails the task
    (CassandraSinkBase's failure propagation).
    """
    cols = df.columns
    dtypes = [t for _, t in df.dtypes]
    stmt = (
        f"INSERT INTO {keyspace}.{table} "  # noqa: S608 — identifiers from DDL
        f"({', '.join(cols)}) VALUES ({', '.join(['?'] * len(cols))})"
    )

    def send(rows):
        import socket  # noqa: PLC0415
        import struct as st  # noqa: PLC0415

        sock = None

        def ensure_conn():
            nonlocal sock
            if sock is not None:
                return
            s = socket.create_connection((host, port), timeout=30)
            s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)  # no Nagle stalls
            s.sendall(
                encode_frame(
                    OP_STARTUP, encode_string_map({"CQL_VERSION": "3.0.0"})
                )
            )
            opcode, _ = _read_response(s)
            if opcode != OP_READY:
                raise RuntimeError(
                    f"cassandra handshake: expected READY, got opcode {opcode}"
                )
            sock = s

        def bound_values(rec) -> bytes:
            out = [st.pack(">H", len(cols))]
            for c, t in zip(cols, dtypes):
                out.append(encode_bytes(encode_cql_value(rec[c], t)))
            return b"".join(out)

        buf: list[bytes] = []

        def flush():
            if not buf:
                return
            ensure_conn()
            if len(buf) == 1:
                # QUERY body: [long string][consistency][flags][values]
                body = (
                    encode_long_string(stmt)
                    + st.pack(">H", consistency)
                    + st.pack(">B", _FLAG_VALUES)
                    + buf[0]
                )
                sock.sendall(encode_frame(OP_QUERY, body))
            else:
                # BATCH body: [type][n] n*([kind][long string][values])
                #             [consistency][flags]
                parts = [st.pack(">BH", 0x01, len(buf))]  # 0x01 = UNLOGGED
                for values in buf:
                    parts.append(st.pack(">B", 0x00))  # kind 0: query string
                    parts.append(encode_long_string(stmt))
                    parts.append(values)
                parts.append(st.pack(">HB", consistency, 0x00))
                sock.sendall(encode_frame(OP_BATCH, b"".join(parts)))
            opcode, _ = _read_response(sock)
            if opcode != OP_RESULT:
                raise RuntimeError(
                    f"cassandra write: expected RESULT, got opcode {opcode}"
                )
            buf.clear()

        # close the socket even when a failed write aborts the task:
        # Spark reuses Python worker processes, so an unclosed socket
        # would outlive the task by the worker's lifetime
        try:
            for row in rows:
                rec = row.asDict()
                buf.append(bound_values(rec))
                if len(buf) >= batch_size:
                    flush()
            flush()
        finally:
            if sock is not None:
                sock.close()

    df.foreachPartition(send)


# -- read side (CassandraInputFormat parity) --------------------------------

_CQL_TYPE_NAMES = {
    0x0001: "string",   # ascii
    0x0002: "bigint",
    0x0004: "boolean",
    0x0006: "decimal(38,18)",  # CQL decimal is arbitrary-scale
    0x0007: "double",
    0x0008: "float",
    0x0009: "int",
    0x000B: "timestamp",
    0x000D: "string",   # varchar
    0x0011: "date",
    0x0013: "smallint",
    0x0014: "tinyint",
}


def decode_cql_value(b: "bytes | None", type_id: int):
    """Inverse of encode_cql_value for the supported scalar ids."""
    import datetime  # noqa: PLC0415
    import decimal  # noqa: PLC0415

    if b is None:
        return None
    if type_id in (0x0001, 0x000D):
        return b.decode("utf-8")
    if type_id == 0x0002:
        return struct.unpack(">q", b)[0]
    if type_id == 0x0004:
        return b != b"\x00"
    if type_id == 0x0006:
        scale = struct.unpack(">i", b[:4])[0]
        unscaled = int.from_bytes(b[4:], "big", signed=True)
        return decimal.Decimal(unscaled).scaleb(-scale)
    if type_id == 0x0007:
        return struct.unpack(">d", b)[0]
    if type_id == 0x0008:
        return struct.unpack(">f", b)[0]
    if type_id in (0x0009, 0x0013, 0x0014):
        n = {0x0009: 4, 0x0013: 2, 0x0014: 1}[type_id]
        return int.from_bytes(b[:n], "big", signed=True)
    if type_id == 0x000B:
        ms = struct.unpack(">q", b)[0]
        return datetime.datetime.fromtimestamp(
            ms / 1000, tz=datetime.timezone.utc
        ).replace(tzinfo=None)
    if type_id == 0x0011:
        days = struct.unpack(">I", b)[0] - 2**31
        return datetime.date(1970, 1, 1) + datetime.timedelta(days=days)
    raise ValueError(f"unsupported CQL type id 0x{type_id:04x}")


def _parse_rows_result(body: bytes):
    """RESULT kind 0x0002 (Rows) -> (col_names, col_type_ids, rows)."""
    kind = struct.unpack_from(">i", body, 0)[0]
    if kind != 0x0002:
        raise RuntimeError(f"cassandra read: RESULT kind {kind}, expected Rows")
    flags, col_count = struct.unpack_from(">ii", body, 4)
    off = 12
    if flags & 0x0002:  # has_more_pages: paging state [bytes]
        (n,) = struct.unpack_from(">i", body, off)
        off += 4 + max(n, 0)
    names: list[str] = []
    type_ids: list[int] = []
    global_spec = bool(flags & 0x0001)
    if global_spec:
        for _ in range(2):  # keyspace + table shortstr
            (n,) = struct.unpack_from(">H", body, off)
            off += 2 + n
    for _ in range(col_count):
        if not global_spec:
            for _ in range(2):
                (n,) = struct.unpack_from(">H", body, off)
                off += 2 + n
        (n,) = struct.unpack_from(">H", body, off)
        names.append(body[off + 2 : off + 2 + n].decode())
        off += 2 + n
        (tid,) = struct.unpack_from(">H", body, off)
        off += 2
        if tid not in _CQL_TYPE_NAMES:
            raise ValueError(f"unsupported CQL column type 0x{tid:04x}")
        type_ids.append(tid)
    (rows_count,) = struct.unpack_from(">i", body, off)
    off += 4
    rows = []
    for _ in range(rows_count):
        vals = []
        for tid in type_ids:
            (n,) = struct.unpack_from(">i", body, off)
            off += 4
            vals.append(
                decode_cql_value(body[off : off + n] if n >= 0 else None, tid)
            )
            off += max(n, 0)
        rows.append(tuple(vals))
    return names, type_ids, rows


def cassandra_cql_read(
    spark,
    host: str,
    port: int,
    query: str,
    consistency: int = CONSISTENCY_LOCAL_QUORUM,
) -> "DataFrame":
    """Bounded CQL SELECT -> DataFrame (flink-connectors/
    flink-connector-cassandra's CassandraInputFormat role: run one CQL
    statement, emit its rows). The QUERY frame goes out with no paging
    requested; the Rows RESULT (metadata + binary values) decodes per the
    column specs the server returns. A SELECT is one cursor on one
    coordinator, so the drain runs on the driver (control-plane size);
    the result becomes a normal distributed DataFrame, and real-scale
    extracts should go token-range-parallel (the reference splits by
    token ranges too) — one cassandra_cql_read per range union'd."""
    import socket  # noqa: PLC0415

    sock = socket.create_connection((host, port), timeout=30)
    sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)  # no Nagle stalls
    try:
        sock.sendall(
            encode_frame(OP_STARTUP, encode_string_map({"CQL_VERSION": "3.0.0"}))
        )
        opcode, _ = _read_response(sock)
        if opcode != OP_READY:
            raise RuntimeError(
                f"cassandra handshake: expected READY, got opcode {opcode}"
            )
        body = (
            encode_long_string(query)
            + struct.pack(">H", consistency)
            + struct.pack(">B", 0x00)  # no values, no paging
        )
        sock.sendall(encode_frame(OP_QUERY, body))
        opcode, rbody = _read_response(sock)
        if opcode != OP_RESULT:
            raise RuntimeError(
                f"cassandra read: expected RESULT, got opcode {opcode}"
            )
        names, type_ids, rows = _parse_rows_result(rbody)
    finally:
        sock.close()
    schema = ", ".join(
        f"`{n}` {_CQL_TYPE_NAMES[t]}" for n, t in zip(names, type_ids)
    )
    return spark.createDataFrame(rows, schema)
