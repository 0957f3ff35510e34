"""Apache NiFi site-to-site connector over the public HTTP(S) transport.

Reference surface: flink-connectors/flink-connector-nifi —
`NiFiSink.java:33` (per-record createTransaction -> send(content,
attributes) -> confirm -> complete against a SiteToSiteClient) and
`NiFiSource.java:42` (transaction receive loop yielding `NiFiDataPacket`s:
content bytes + a string attribute map, `NiFiDataPacket.java`).

The reference delegates the wire work to nifi-site-to-site-client. This
engine speaks the documented HTTP site-to-site protocol itself (stdlib
urllib only), the same surface the official client's HttpClientTransaction
uses:

  POST   /nifi-api/data-transfer/{input|output}-ports/{port}/transactions
         -> 201, Location header carries the transaction URI
  POST   .../transactions/{tx}/flow-files   (octet-stream packet frames)
         -> 202, body = server-computed CRC32 (decimal text)
  GET    .../transactions/{tx}/flow-files   (receive side)
         -> 200 + packet frames, or 204 when the port has nothing
  DELETE .../transactions/{tx}?responseCode=CONFIRM_TRANSACTION[&checksum=]
         -> commits; BAD_CHECKSUM instead aborts

Flow-file packet framing (the site-to-site codec's data-packet stream;
also what the reference's StandardDataPacket serializes): per packet a
big-endian int32 attribute count, each attribute as length-prefixed UTF-8
key and value (int32 lengths), then an int64 content length and the raw
content bytes.

Two-phase discipline mirrors `Transaction.confirm()`/`complete()`: the
sink compares the server's CRC32 echo against its own running CRC32 of
the bytes it sent and only then commits; a mismatch sends BAD_CHECKSUM
and fails the task. The receive side confirms by sending ITS checksum of
the received bytes on the DELETE, so the server can detect a torn read
before marking the flow files consumed.
"""

from __future__ import annotations

import struct
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

_PROTO_HEADER = ("x-nifi-site-to-site-protocol-version", "5")


def encode_flowfile_packets(packets: "list[tuple[dict, bytes]]") -> bytes:
    """Serialize (attributes, content) pairs to the site-to-site
    data-packet stream framing."""
    out = bytearray()
    for attrs, content in packets:
        out += struct.pack(">i", len(attrs))
        for k, v in attrs.items():
            kb = str(k).encode("utf-8")
            vb = str(v).encode("utf-8")
            out += struct.pack(">i", len(kb)) + kb
            out += struct.pack(">i", len(vb)) + vb
        out += struct.pack(">q", len(content)) + content
    return bytes(out)


def decode_flowfile_packets(buf: bytes) -> "list[tuple[dict, bytes]]":
    """Parse a site-to-site data-packet stream back to (attributes,
    content) pairs. Raises on truncated frames (a torn transfer must not
    half-succeed — the receive side aborts the transaction instead)."""
    packets: list[tuple[dict, bytes]] = []
    pos, n = 0, len(buf)

    def take(k: int) -> bytes:
        nonlocal pos
        if pos + k > n:
            raise ValueError(
                f"truncated flow-file packet stream at byte {pos} (+{k} > {n})"
            )
        b = buf[pos : pos + k]
        pos += k
        return b

    while pos < n:
        (n_attrs,) = struct.unpack(">i", take(4))
        attrs: dict = {}
        for _ in range(n_attrs):
            (klen,) = struct.unpack(">i", take(4))
            key = take(klen).decode("utf-8")
            (vlen,) = struct.unpack(">i", take(4))
            attrs[key] = take(vlen).decode("utf-8")
        (clen,) = struct.unpack(">q", take(8))
        packets.append((attrs, bytes(take(clen))))
    return packets


def _open_transaction(base: str, kind: str, port_id: str):
    """POST .../{kind}-ports/{port}/transactions; returns the transaction
    URL from the Location header (the documented handshake)."""
    import urllib.request  # noqa: PLC0415

    req = urllib.request.Request(
        f"{base}/nifi-api/data-transfer/{kind}-ports/{port_id}/transactions",
        data=b"",
        headers={_PROTO_HEADER[0]: _PROTO_HEADER[1]},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        loc = r.headers.get("Location")
        if r.status not in (200, 201) or not loc:
            raise RuntimeError(
                f"nifi transaction handshake failed: {r.status}, Location={loc!r}"
            )
    if loc.startswith("/"):
        loc = base + loc
    return loc


def _complete(tx_url: str, response_code: str, checksum: "int | None" = None):
    import urllib.request  # noqa: PLC0415

    q = f"?responseCode={response_code}"
    if checksum is not None:
        q += f"&checksum={checksum}"
    req = urllib.request.Request(tx_url + q, method="DELETE")
    with urllib.request.urlopen(req) as r:
        return r.read()


def nifi_s2s_sink(
    df: "DataFrame",
    url: str,
    port_id: str,
    content_col: str,
    attr_cols: "list[str] | None" = None,
    batch_flowfiles: int = 500,
) -> None:
    """NiFi site-to-site sink (NiFiSink.java:33 role): each partition
    packs its rows into flow-file packets — `content_col` (binary or
    string) becomes the flow-file content, `attr_cols` become string
    attributes (the NiFiDataPacketBuilder contract, NiFiSink.java:62) —
    and pushes them through the HTTP transaction handshake in chunks of
    `batch_flowfiles` per transaction.

    Two-phase per transaction: send packets, compare the server's CRC32
    echo with the locally computed CRC32 (Transaction.confirm()), then
    commit with CONFIRM_TRANSACTION; a checksum mismatch aborts with
    BAD_CHECKSUM and fails the Spark task (at-least-once on retry, the
    reference sink's guarantee). Executor-side by construction: stdlib
    urllib inside foreachPartition, no driver collect."""
    attrs_list = list(attr_cols or [])
    base = url.rstrip("/")

    def send(rows):
        import urllib.request  # noqa: PLC0415
        import zlib  # noqa: PLC0415

        buf: list[tuple[dict, bytes]] = []

        def flush():
            if not buf:
                return
            tx_url = _open_transaction(base, "input", port_id)
            body = encode_flowfile_packets(buf)
            req = urllib.request.Request(
                tx_url + "/flow-files",
                data=body,
                headers={
                    "Content-Type": "application/octet-stream",
                    _PROTO_HEADER[0]: _PROTO_HEADER[1],
                },
                method="POST",
            )
            with urllib.request.urlopen(req) as r:
                server_crc = int(r.read().decode().strip() or "-1")
            local_crc = zlib.crc32(body) & 0xFFFFFFFF
            if server_crc != local_crc:
                _complete(tx_url, "BAD_CHECKSUM")
                raise RuntimeError(
                    f"nifi send checksum mismatch: server={server_crc} "
                    f"local={local_crc}"
                )
            _complete(tx_url, "CONFIRM_TRANSACTION")
            buf.clear()

        for row in rows:
            content = row[content_col]
            if content is None:
                content = b""
            elif isinstance(content, str):
                content = content.encode("utf-8")
            else:
                content = bytes(content)
            attrs = {
                c: row[c] for c in attrs_list if row[c] is not None
            }
            buf.append((attrs, content))
            if len(buf) >= batch_flowfiles:
                flush()
        flush()

    df.foreachPartition(send)


def nifi_s2s_read(
    spark: "SparkSession",
    url: str,
    port_id: str,
    max_flowfiles: int = 10_000,
) -> "DataFrame":
    """Bounded site-to-site receive from a NiFi output port
    (NiFiSource.java:42's transaction loop, restricted to a bounded
    drain): open a transaction, GET the packet stream, CRC32-confirm on
    the DELETE, repeat until the port answers 204 or `max_flowfiles`
    arrive. Yields the NiFiDataPacket shape — `attributes
    map<string,string>, content binary` (NiFiDataPacket.java contract).

    A site-to-site receive hands out one transaction cursor at a time,
    so the bounded drain runs on the driver (control-plane size: bounded
    by `max_flowfiles`) and the result becomes a normal distributed
    DataFrame — the same shape as the pub/sub and twitter bounded
    bridges; continuous ingestion lands packets into files/kafka and
    uses the streaming scans."""
    import urllib.error  # noqa: PLC0415
    import urllib.request  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    base = url.rstrip("/")
    out: list[tuple[dict, bytes]] = []
    while len(out) < max_flowfiles:
        tx_url = _open_transaction(base, "output", port_id)
        req = urllib.request.Request(
            tx_url + "/flow-files",
            headers={_PROTO_HEADER[0]: _PROTO_HEADER[1]},
            method="GET",
        )
        with urllib.request.urlopen(req) as r:
            status = r.status
            body = r.read()
        if status == 204 or not body:
            # nothing available: cancel the empty transaction and stop
            try:
                _complete(tx_url, "CANCEL_TRANSACTION")
            except urllib.error.HTTPError:
                pass
            break
        try:
            packets = decode_flowfile_packets(body)
        except ValueError:
            _complete(tx_url, "BAD_CHECKSUM")
            raise
        crc = zlib.crc32(body) & 0xFFFFFFFF
        _complete(tx_url, "CONFIRM_TRANSACTION", checksum=crc)
        out.extend(packets)
    from pyspark.sql.types import (  # noqa: PLC0415
        BinaryType,
        MapType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("attributes", MapType(StringType(), StringType())),
            StructField("content", BinaryType()),
        ]
    )
    return spark.createDataFrame(
        [(attrs, bytearray(content)) for attrs, content in out[:max_flowfiles]],
        schema,
    )
