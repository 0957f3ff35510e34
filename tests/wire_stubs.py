"""Reusable in-process broker stubs with faithful redelivery semantics.

The bounded-read stubs inside test_connectors.py serve each message once;
stop/restart tests need the real contract: a message DELIVERED but not
ACKED returns to the queue when its connection/lease/transaction dies.
These stubs implement exactly that slice of each protocol, nothing more.
"""

from __future__ import annotations

import base64
import json
import socketserver
import struct
import threading


class _NoDelayTCPServer(socketserver.ThreadingTCPServer):
    """ThreadingTCPServer with TCP_NODELAY on accepted sockets — the
    stubs answer small framed round-trips, where Nagle x delayed-ACK
    adds ~40ms per exchange."""

    daemon_threads = True

    def process_request(self, request, client_address):
        import socket as _socket

        request.setsockopt(_socket.IPPROTO_TCP, _socket.TCP_NODELAY, 1)
        super().process_request(request, client_address)


class AmqpBrokerStub:
    """AMQP 0-9-1 broker slice: handshake, Queue.Declare, Basic.Get /
    Basic.GetEmpty, Basic.Ack — with requeue-on-disconnect for unacked
    deliveries (the at-least-once contract RMQSource builds on)."""

    def __init__(self):
        self.messages: list[bytes] = []  # append-only message log
        self.cids: dict[int, str] = {}  # index -> correlation-id property
        self.acked: set[int] = set()  # indexes durably consumed
        self.lock = threading.Lock()
        self._srv = None
        self.port = None

    def publish(self, *bodies: bytes) -> None:
        with self.lock:
            self.messages.extend(bodies)

    def publish_with_cid(self, body: bytes, cid: str) -> None:
        """Publish with the correlation-id basic property set — the
        exactly-once identity contract (RMQSource usesCorrelationId)."""
        with self.lock:
            self.cids[len(self.messages)] = cid
            self.messages.append(body)

    def unacked_count(self) -> int:
        with self.lock:
            return len(self.messages) - len(self.acked)

    def start(self):
        stub = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                from flink_parent_spark.sources import rabbitmq_amqp as amqp

                sock = self.request
                # per-connection delivery state: tag -> message index
                delivered: dict[int, int] = {}
                next_tag = 1
                consuming = False

                def send_method(channel, method, args=b""):
                    sock.sendall(
                        amqp.encode_frame(
                            amqp.FRAME_METHOD, channel,
                            amqp.method_payload(*method, args),
                        )
                    )

                def send_content(channel, body, cid):
                    hdr = (
                        struct.pack(">HHQH", 60, 0, len(body), 0x0400)
                        + amqp.shortstr(cid)
                        if cid is not None
                        else struct.pack(">HHQH", 60, 0, len(body), 0)
                    )
                    sock.sendall(
                        amqp.encode_frame(amqp.FRAME_HEADER, channel, hdr)
                    )
                    mid = max(1, len(body) // 2)
                    for chunk in (body[:mid], body[mid:]):
                        sock.sendall(
                            amqp.encode_frame(amqp.FRAME_BODY, channel, chunk)
                        )

                def encode_content(body, cid):
                    hdr = (
                        struct.pack(">HHQH", 60, 0, len(body), 0x0400)
                        + amqp.shortstr(cid)
                        if cid is not None
                        else struct.pack(">HHQH", 60, 0, len(body), 0)
                    )
                    mid = max(1, len(body) // 2)
                    return (
                        amqp.encode_frame(amqp.FRAME_HEADER, 1, hdr)
                        + amqp.encode_frame(amqp.FRAME_BODY, 1, body[:mid])
                        + amqp.encode_frame(amqp.FRAME_BODY, 1, body[mid:])
                    )

                def push_available(channel):
                    """Consume mode: deliver every available message as
                    Basic.Deliver (the server-push half of the protocol).
                    Called after Consume-Ok and after each ack (acks wake
                    the loop, re-publishing may have happened meanwhile).
                    Frames are batched ~500 messages per sendall so the
                    push keeps pace at 100k+ messages."""
                    nonlocal next_tag
                    while True:
                        buf = bytearray()
                        with stub.lock:
                            in_flight = set(delivered.values())
                            avail = [
                                i
                                for i in range(len(stub.messages))
                                if i not in stub.acked and i not in in_flight
                            ][:500]
                            for idx in avail:
                                tag = next_tag
                                next_tag += 1
                                delivered[tag] = idx
                                body = stub.messages[idx]
                                cid = stub.cids.get(idx)
                                buf += amqp.encode_frame(
                                    amqp.FRAME_METHOD, channel,
                                    amqp.method_payload(
                                        *amqp.BASIC_DELIVER,
                                        amqp.shortstr("ctag")
                                        + struct.pack(">QB", tag, 0)
                                        + amqp.shortstr("")
                                        + amqp.shortstr("q"),
                                    ),
                                )
                                buf += encode_content(body, cid)
                        if not buf:
                            return
                        sock.sendall(bytes(buf))

                try:
                    assert amqp.read_exact(sock, 8) == amqp.PROTOCOL_HEADER
                    send_method(
                        0, amqp.CONNECTION_START,
                        struct.pack(">BB", 0, 9) + struct.pack(">I", 0)
                        + amqp.longstr(b"PLAIN") + amqp.longstr(b"en_US"),
                    )
                    while True:
                        ftype, channel, payload = amqp.read_frame(sock)
                        if ftype != amqp.FRAME_METHOD:
                            continue
                        m, args = amqp.parse_method(payload)
                        if m == amqp.CONNECTION_START_OK:
                            send_method(
                                0, amqp.CONNECTION_TUNE,
                                struct.pack(">HIH", 2047, 131072, 60),
                            )
                        elif m == amqp.CONNECTION_OPEN:
                            send_method(0, amqp.CONNECTION_OPEN_OK, b"\x00")
                        elif m == amqp.CHANNEL_OPEN:
                            send_method(
                                channel, amqp.CHANNEL_OPEN_OK,
                                struct.pack(">I", 0),
                            )
                        elif m == amqp.QUEUE_DECLARE:
                            qlen = args[2]
                            qname = args[3 : 3 + qlen].decode()
                            send_method(
                                channel, amqp.QUEUE_DECLARE_OK,
                                amqp.shortstr(qname) + struct.pack(">II", 0, 0),
                            )
                        elif m == amqp.BASIC_GET:
                            with stub.lock:
                                in_flight = set(delivered.values())
                                idx = next(
                                    (
                                        i
                                        for i in range(len(stub.messages))
                                        if i not in stub.acked
                                        and i not in in_flight
                                    ),
                                    None,
                                )
                                if idx is None:
                                    send_method(
                                        channel, amqp.BASIC_GET_EMPTY,
                                        amqp.shortstr(""),
                                    )
                                    continue
                                tag = next_tag
                                next_tag += 1
                                delivered[tag] = idx
                                body = stub.messages[idx]
                                cid = stub.cids.get(idx)
                                remaining = sum(
                                    1
                                    for i in range(len(stub.messages))
                                    if i not in stub.acked
                                    and i not in set(delivered.values())
                                )
                            send_method(
                                channel, amqp.BASIC_GET_OK,
                                struct.pack(">QB", tag, 0)
                                + amqp.shortstr("") + amqp.shortstr("q")
                                + struct.pack(">I", remaining),
                            )
                            send_content(channel, body, cid)
                        elif m == amqp.BASIC_QOS:
                            send_method(channel, amqp.BASIC_QOS_OK)
                        elif m == amqp.BASIC_CONSUME:
                            consuming = True
                            send_method(
                                channel, amqp.BASIC_CONSUME_OK,
                                amqp.shortstr("ctag"),
                            )
                            push_available(channel)
                        elif m == amqp.BASIC_ACK:
                            (tag,) = struct.unpack_from(">Q", args, 0)
                            with stub.lock:
                                if tag in delivered:
                                    stub.acked.add(delivered.pop(tag))
                            if consuming:
                                # the ack woke the loop: push anything
                                # published since the last delivery round
                                push_available(channel)
                except (ConnectionError, AssertionError, OSError):
                    pass
                # connection gone: everything delivered-but-unacked
                # requeues (delivered dict simply drops from scope)

        self._srv = _NoDelayTCPServer(("127.0.0.1", 0), Handler)
        self._srv.daemon_threads = True
        self.port = self._srv.server_address[1]
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        return self

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()


class PubSubStub:
    """Pub/Sub emulator slice: :pull leases messages, :acknowledge
    consumes them; `expire_leases()` is the ack-deadline test hook that
    makes every outstanding lease eligible for redelivery."""

    def __init__(self):
        self.messages: list[dict] = []  # {"id", "data"(b64), "acked", "leased"}
        self.lock = threading.Lock()
        self._next_id = 0
        self._srv = None
        self.port = None

    def publish(self, *payloads: dict) -> None:
        with self.lock:
            for p in payloads:
                self._next_id += 1
                self.messages.append(
                    {
                        "id": str(self._next_id),
                        "data": base64.b64encode(
                            json.dumps(p).encode()
                        ).decode(),
                        "acked": False,
                        "leased": False,
                    }
                )

    def expire_leases(self) -> None:
        with self.lock:
            for m in self.messages:
                m["leased"] = False

    def unacked_count(self) -> int:
        with self.lock:
            return sum(1 for m in self.messages if not m["acked"])

    def start(self):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        stub = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                if self.path.endswith(":pull"):
                    want = body.get("maxMessages", 100)
                    out = []
                    with stub.lock:
                        for m in stub.messages:
                            if m["acked"] or m["leased"]:
                                continue
                            m["leased"] = True
                            out.append(
                                {
                                    "ackId": "a-" + m["id"],
                                    "message": {
                                        "messageId": m["id"],
                                        "data": m["data"],
                                    },
                                }
                            )
                            if len(out) >= want:
                                break
                    resp = json.dumps({"receivedMessages": out}).encode()
                elif self.path.endswith(":acknowledge"):
                    ids = {a[2:] for a in body.get("ackIds", [])}
                    with stub.lock:
                        for m in stub.messages:
                            if m["id"] in ids:
                                m["acked"] = True
                    resp = b"{}"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(resp)))
                self.end_headers()
                self.wfile.write(resp)

        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self._srv.server_address[1]
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        return self

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()


class NiFiPortStub:
    """Site-to-site output-port slice: transactions lease flowfiles;
    CONFIRM_TRANSACTION consumes them, CANCEL or `expire_transactions()`
    requeues them (the server-side timeout)."""

    def __init__(self, batch: int = 2):
        self.flowfiles: list[tuple[dict, bytes]] = []
        self.consumed: set[int] = set()
        self.leased: dict[str, list[int]] = {}  # tx id -> flowfile indexes
        self.batch = batch
        self.lock = threading.Lock()
        self._next_tx = 0
        self._srv = None
        self.port = None

    def publish(self, *packets: "tuple[dict, bytes]") -> None:
        with self.lock:
            self.flowfiles.extend(packets)

    def expire_transactions(self) -> None:
        with self.lock:
            self.leased.clear()

    def unconsumed_count(self) -> int:
        with self.lock:
            return len(self.flowfiles) - len(self.consumed)

    def start(self):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        from flink_parent_spark.sources.nifi_s2s import encode_flowfile_packets

        stub = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                if "/transactions" in self.path:
                    with stub.lock:
                        stub._next_tx += 1
                        tx = f"tx-{stub._next_tx}"
                        stub.leased[tx] = []
                    self.send_response(201)
                    self.send_header(
                        "Location",
                        f"/nifi-api/data-transfer/output-ports/p/transactions/{tx}",
                    )
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                else:
                    self.send_response(404)
                    self.end_headers()

            def do_GET(self):
                tx = self.path.split("/transactions/")[1].split("/")[0]
                with stub.lock:
                    in_flight = {
                        i for idxs in stub.leased.values() for i in idxs
                    }
                    idxs = [
                        i
                        for i in range(len(stub.flowfiles))
                        if i not in stub.consumed and i not in in_flight
                    ][: stub.batch]
                    if tx in stub.leased:
                        stub.leased[tx] = idxs
                    packets = [stub.flowfiles[i] for i in idxs]
                if not packets:
                    self.send_response(204)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                body = encode_flowfile_packets(packets)
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_DELETE(self):
                path, _, query = self.path.partition("?")
                tx = path.split("/transactions/")[1].split("/")[0]
                confirm = "responseCode=CONFIRM_TRANSACTION" in query
                with stub.lock:
                    idxs = stub.leased.pop(tx, [])
                    if confirm:
                        stub.consumed.update(idxs)
                    # CANCEL / BAD_CHECKSUM: lease dropped -> requeued
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self._srv.server_address[1]
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        return self

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()


class KafkaBrokerStub:
    """Kafka wire-protocol broker slice (v0 APIs): ApiVersions, Metadata,
    Produce (crc-validated MessageSet append), Fetch (offset-addressed
    read) over an in-memory log per (topic, partition)."""

    def __init__(self, n_partitions: int = 1):
        self.n_partitions = n_partitions
        # topic -> partition -> [(key, value), ...]
        self.logs: dict[str, dict[int, list[tuple[bytes, bytes]]]] = {}
        self.lock = threading.Lock()
        self._srv = None
        self.port = None

    def start(self):
        stub = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                from flink_parent_spark.sources import kafka_wire as kw

                sock = self.request
                try:
                    while True:
                        (size,) = struct.unpack(
                            ">i", kw._read_exact(sock, 4)
                        )
                        r = kw._Reader(kw._read_exact(sock, size))
                        api_key = r.i16()
                        api_version = r.i16()
                        corr = r.i32()
                        r.string()  # client id
                        assert api_version == 0, api_version
                        if api_key == kw.API_API_VERSIONS:
                            body = struct.pack(">hi", 0, 3) + b"".join(
                                struct.pack(">hhh", k, 0, 0)
                                for k in (
                                    kw.API_PRODUCE,
                                    kw.API_FETCH,
                                    kw.API_METADATA,
                                )
                            )
                        elif api_key == kw.API_METADATA:
                            topics = [
                                r.string() for _ in range(r.i32())
                            ]
                            body = struct.pack(">i", 1)  # one broker
                            body += (
                                struct.pack(">i", 0)
                                + kw._str("127.0.0.1")
                                + struct.pack(">i", stub.port)
                            )
                            body += struct.pack(">i", len(topics))
                            for t in topics:
                                body += struct.pack(">h", 0) + kw._str(t)
                                body += struct.pack(
                                    ">i", stub.n_partitions
                                )
                                for pid in range(stub.n_partitions):
                                    body += struct.pack(">hii", 0, pid, 0)
                                    body += struct.pack(">ii", 1, 0)
                                    body += struct.pack(">ii", 1, 0)
                        elif api_key == kw.API_PRODUCE:
                            r.i16()  # acks
                            r.i32()  # timeout
                            n_topics = r.i32()
                            resp_topics = b""
                            for _ in range(n_topics):
                                t = r.string()
                                n_parts = r.i32()
                                parts = b""
                                for _ in range(n_parts):
                                    pid = r.i32()
                                    mset = r.raw(r.i32())
                                    msgs = kw.decode_message_set(mset)
                                    with stub.lock:
                                        log = stub.logs.setdefault(
                                            t, {}
                                        ).setdefault(pid, [])
                                        base = len(log)
                                        log.extend(
                                            (k, v) for _o, k, v in msgs
                                        )
                                    parts += struct.pack(
                                        ">ihq", pid, 0, base
                                    )
                                resp_topics += (
                                    kw._str(t)
                                    + struct.pack(">i", n_parts)
                                    + parts
                                )
                            body = struct.pack(">i", n_topics) + resp_topics
                        elif api_key == kw.API_FETCH:
                            r.i32()  # replica
                            r.i32()  # max wait
                            r.i32()  # min bytes
                            n_topics = r.i32()
                            resp_topics = b""
                            for _ in range(n_topics):
                                t = r.string()
                                n_parts = r.i32()
                                parts = b""
                                for _ in range(n_parts):
                                    pid = r.i32()
                                    off = r.i64()
                                    r.i32()  # max bytes
                                    with stub.lock:
                                        log = list(
                                            stub.logs.get(t, {}).get(
                                                pid, []
                                            )
                                        )
                                    hw = len(log)
                                    out = bytearray()
                                    for o in range(off, hw):
                                        k, v = log[o]
                                        b2 = (
                                            struct.pack(">bb", 0, 0)
                                            + kw._bytes(k)
                                            + kw._bytes(v)
                                        )
                                        import zlib

                                        crc = (
                                            zlib.crc32(b2) & 0xFFFFFFFF
                                        )
                                        msg = struct.pack(">I", crc) + b2
                                        out += struct.pack(
                                            ">qi", o, len(msg)
                                        ) + msg
                                    parts += struct.pack(
                                        ">ihq", pid, 0, hw
                                    ) + struct.pack(
                                        ">i", len(out)
                                    ) + bytes(out)
                                resp_topics += (
                                    kw._str(t)
                                    + struct.pack(">i", n_parts)
                                    + parts
                                )
                            body = struct.pack(">i", n_topics) + resp_topics
                        else:
                            return
                        payload = struct.pack(">i", corr) + body
                        sock.sendall(
                            struct.pack(">i", len(payload)) + payload
                        )
                except (ConnectionError, AssertionError, OSError, struct.error):
                    return

        self._srv = _NoDelayTCPServer(("127.0.0.1", 0), Handler)
        self._srv.daemon_threads = True
        self.port = self._srv.server_address[1]
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        return self

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()


class DedupAmqpSinkStub:
    """AMQP broker slice for the SINK side: accepts Basic.Publish +
    header + body triples, confirms them, and stores bodies keyed by the
    correlation-id basic property (exactly-once for id-carrying
    publishers). `drop_after` kills the FIRST connection after that many
    publishes — the mid-batch failure a task retry must survive."""

    def __init__(self, drop_after: "int | None" = None):
        self.by_id: dict[str, bytes] = {}
        self.publish_count = 0
        self.drop_after = drop_after
        self._dropped_once = False
        self.lock = threading.Lock()
        self._srv = None
        self.port = None

    def start(self):
        stub = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                from flink_parent_spark.sources import rabbitmq_amqp as amqp

                sock = self.request
                tag = 0
                pending_cid = None
                body_remaining = 0
                body_buf = b""

                def send_method(channel, method, args=b""):
                    sock.sendall(
                        amqp.encode_frame(
                            amqp.FRAME_METHOD, channel,
                            amqp.method_payload(*method, args),
                        )
                    )

                try:
                    assert amqp.read_exact(sock, 8) == amqp.PROTOCOL_HEADER
                    send_method(
                        0, amqp.CONNECTION_START,
                        struct.pack(">BB", 0, 9) + struct.pack(">I", 0)
                        + amqp.longstr(b"PLAIN") + amqp.longstr(b"en_US"),
                    )
                    while True:
                        ftype, channel, payload = amqp.read_frame(sock)
                        if ftype == amqp.FRAME_HEADER:
                            (body_remaining,) = struct.unpack_from(
                                ">Q", payload, 4
                            )
                            (flags,) = struct.unpack_from(">H", payload, 12)
                            pending_cid = None
                            if flags & 0x0400:  # correlation-id property
                                ln = payload[14]
                                pending_cid = payload[15 : 15 + ln].decode()
                            body_buf = b""
                            continue
                        if ftype == amqp.FRAME_BODY:
                            body_buf += payload
                            if len(body_buf) < body_remaining:
                                continue
                            tag += 1
                            with stub.lock:
                                stub.publish_count += 1
                                key = (
                                    pending_cid
                                    if pending_cid is not None
                                    else f"anon-{stub.publish_count}"
                                )
                                stub.by_id[key] = body_buf
                                should_drop = (
                                    stub.drop_after is not None
                                    and not stub._dropped_once
                                    and stub.publish_count >= stub.drop_after
                                )
                                if should_drop:
                                    stub._dropped_once = True
                            if should_drop:
                                sock.close()  # mid-batch broker failure
                                return
                            send_method(
                                channel, amqp.BASIC_ACK,
                                struct.pack(">QB", tag, 0),
                            )
                            continue
                        if ftype != amqp.FRAME_METHOD:
                            continue
                        m, args = amqp.parse_method(payload)
                        if m == amqp.CONNECTION_START_OK:
                            send_method(
                                0, amqp.CONNECTION_TUNE,
                                struct.pack(">HIH", 2047, 131072, 60),
                            )
                        elif m == amqp.CONNECTION_OPEN:
                            send_method(0, amqp.CONNECTION_OPEN_OK, b"\x00")
                        elif m == amqp.CHANNEL_OPEN:
                            send_method(
                                channel, amqp.CHANNEL_OPEN_OK,
                                struct.pack(">I", 0),
                            )
                        elif m == amqp.QUEUE_DECLARE:
                            qlen = args[2]
                            qname = args[3 : 3 + qlen].decode()
                            send_method(
                                channel, amqp.QUEUE_DECLARE_OK,
                                amqp.shortstr(qname)
                                + struct.pack(">II", 0, 0),
                            )
                        elif m == amqp.CONFIRM_SELECT:
                            send_method(channel, amqp.CONFIRM_SELECT_OK)
                except (ConnectionError, AssertionError, OSError):
                    return

        self._srv = _NoDelayTCPServer(("127.0.0.1", 0), Handler)
        self._srv.daemon_threads = True
        self.port = self._srv.server_address[1]
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        return self

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()


class PubSubTopicStub:
    """Pub/Sub publish endpoint keyed by the `dedupId` message attribute.
    `fail_first` stores the first request's messages but answers 500 —
    the lost-response case where a retry without dedup ids doubles."""

    def __init__(self, fail_first: bool = False):
        self.by_id: dict[str, str] = {}
        self.anon_count = 0
        self.fail_first = fail_first
        self._failed_once = False
        self.lock = threading.Lock()
        self._srv = None
        self.port = None

    def start(self):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        stub = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                msgs = body.get("messages", [])
                with stub.lock:
                    for m in msgs:
                        did = (m.get("attributes") or {}).get("dedupId")
                        if did is None:
                            stub.anon_count += 1
                            did = f"anon-{stub.anon_count}"
                        stub.by_id[did] = m["data"]
                    fail = stub.fail_first and not stub._failed_once
                    if fail:
                        stub._failed_once = True
                if fail:
                    self.send_response(500)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                resp = json.dumps(
                    {"messageIds": [str(i) for i in range(len(msgs))]}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(resp)))
                self.end_headers()
                self.wfile.write(resp)

        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self._srv.server_address[1]
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        return self

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()


class NiFiInputPortStub:
    """Site-to-site INPUT port: flowfiles POSTed into a transaction stay
    staged (invisible) until CONFIRM_TRANSACTION. `fail_first_confirm`
    answers the first confirm with 500 AND drops the staged data — the
    torn-transaction case: nothing becomes visible, the task retries,
    and the retry's single confirmed transaction is the only visible
    copy."""

    def __init__(self, fail_first_confirm: bool = False):
        self.visible: list[tuple[dict, bytes]] = []
        self.staged: dict[str, list[tuple[dict, bytes]]] = {}
        self.fail_first_confirm = fail_first_confirm
        self._failed_once = False
        self.lock = threading.Lock()
        self._next_tx = 0
        self._srv = None
        self.port = None

    def start(self):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        from flink_parent_spark.sources.nifi_s2s import decode_flowfile_packets

        stub = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                import zlib

                if self.path.endswith("/transactions"):
                    with stub.lock:
                        stub._next_tx += 1
                        tx = f"tx-{stub._next_tx}"
                        stub.staged[tx] = []
                    self.send_response(201)
                    self.send_header(
                        "Location",
                        "/nifi-api/data-transfer/input-ports/p/"
                        f"transactions/{tx}",
                    )
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                # flow-files upload
                tx = self.path.split("/transactions/")[1].split("/")[0]
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                with stub.lock:
                    stub.staged[tx] = decode_flowfile_packets(body)
                crc = str(zlib.crc32(body) & 0xFFFFFFFF).encode()
                self.send_response(202)
                self.send_header("Content-Length", str(len(crc)))
                self.end_headers()
                self.wfile.write(crc)

            def do_DELETE(self):
                path, _, query = self.path.partition("?")
                tx = path.split("/transactions/")[1].split("/")[0]
                confirm = "responseCode=CONFIRM_TRANSACTION" in query
                with stub.lock:
                    packets = stub.staged.pop(tx, [])
                    if confirm and stub.fail_first_confirm and not stub._failed_once:
                        stub._failed_once = True
                        # torn commit: staged data is dropped, client errors
                        self.send_response(500)
                        self.send_header("Content-Length", "0")
                        self.end_headers()
                        return
                    if confirm:
                        stub.visible.extend(packets)
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self._srv.server_address[1]
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        return self

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()


class CassandraUpsertStub:
    """CQL native-protocol slice for the sink: STARTUP/READY handshake,
    then QUERY/BATCH INSERT frames upserted into a dict keyed by the
    first bound value (the partition key) — idempotence is the table's
    own PK semantics. `drop_after` closes the FIRST connection after
    that many stored rows, mid-batch."""

    def __init__(self, drop_after: "int | None" = None):
        self.by_pk: dict[bytes, list] = {}
        self.insert_count = 0
        self.drop_after = drop_after
        self._dropped_once = False
        self.lock = threading.Lock()
        self._srv = None
        self.port = None

    def start(self):
        stub = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                from flink_parent_spark.sources import cassandra_cql as cql

                sock = self.request

                def reply(stream, opcode, body=b""):
                    sock.sendall(
                        struct.pack(
                            ">BBhBi", 0x84, 0x00, stream, opcode, len(body)
                        )
                        + body
                    )

                def read_values(body, off):
                    (nv,) = struct.unpack_from(">H", body, off)
                    off += 2
                    vals = []
                    for _ in range(nv):
                        (ln,) = struct.unpack_from(">i", body, off)
                        off += 4
                        vals.append(None if ln < 0 else body[off : off + ln])
                        off += max(ln, 0)
                    return vals, off

                def read_long_string(body, off):
                    (n,) = struct.unpack_from(">i", body, off)
                    return off + 4 + n  # statement text not needed

                try:
                    while True:
                        hdr = cql.read_exact(sock, 9)
                        _v, _f, stream, opcode, length = (
                            cql.decode_frame_header(hdr)
                        )
                        body = cql.read_exact(sock, length) if length else b""
                        if opcode == cql.OP_STARTUP:
                            reply(stream, cql.OP_READY)
                            continue
                        rows = []
                        if opcode == cql.OP_QUERY:
                            off = read_long_string(body, 0)
                            off += 2  # consistency
                            assert body[off] & 0x01
                            vals, _ = read_values(body, off + 1)
                            rows.append(vals)
                        elif opcode == cql.OP_BATCH:
                            _btype, n = struct.unpack_from(">BH", body, 0)
                            off = 3
                            for _ in range(n):
                                assert body[off] == 0x00
                                off = read_long_string(body, off + 1)
                                vals, off = read_values(body, off)
                                rows.append(vals)
                        with stub.lock:
                            drop_now = False
                            for vals in rows:
                                stub.by_pk[vals[0]] = vals
                                stub.insert_count += 1
                                if (
                                    stub.drop_after is not None
                                    and not stub._dropped_once
                                    and stub.insert_count >= stub.drop_after
                                ):
                                    stub._dropped_once = True
                                    drop_now = True
                                    break
                        if drop_now:
                            sock.close()  # mid-batch node failure
                            return
                        reply(
                            stream, cql.OP_RESULT, struct.pack(">i", 0x0001)
                        )
                except (ConnectionError, AssertionError, OSError):
                    return

        self._srv = _NoDelayTCPServer(("127.0.0.1", 0), Handler)
        self._srv.daemon_threads = True
        self.port = self._srv.server_address[1]
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        return self

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()


class FeedStub:
    """Twitter-style line feed: one global cursor — each line is served to
    exactly one connection read (a live feed never replays). Closes the
    response once `hang=False` and the backlog drains, so the client's
    read loop terminates; with `hang=True` the test can emulate a stalled
    stream."""

    def __init__(self):
        self.lines: list[str] = []
        self.cursor = 0
        self.lock = threading.Lock()
        self._srv = None
        self.port = None

    def publish(self, *lines: str) -> None:
        with self.lock:
            self.lines.extend(lines)

    def start(self):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        stub = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):
                pass

            def do_GET(self):
                with stub.lock:
                    chunk = stub.lines[stub.cursor :]
                    stub.cursor = len(stub.lines)
                body = ("".join(line + "\n" for line in chunk)).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self._srv.server_address[1]
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        return self

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()


class KinesisStreamStub:
    """Kinesis_20131202 JSON API slice: ListShards, GetShardIterator
    (TRIM_HORIZON / AFTER_SEQUENCE_NUMBER), GetRecords — a sharded
    retained log, so replay-by-sequence-number works exactly like the
    real service. Records route to shards by md5(partition key), the
    real service's hash-key scheme in miniature."""

    def __init__(self, n_shards: int = 2):
        self.shard_ids = [f"shardId-{i:012d}" for i in range(n_shards)]
        # shard -> [(sequence_number, partition_key, payload_dict), ...]
        self.shards: dict[str, list[tuple[str, str, dict]]] = {
            s: [] for s in self.shard_ids
        }
        self._seq = 0
        self.lock = threading.Lock()
        self._srv = None
        self.port = None

    def publish(self, partition_key: str, payload: dict) -> str:
        import hashlib

        shard = self.shard_ids[
            int(hashlib.md5(partition_key.encode()).hexdigest(), 16)
            % len(self.shard_ids)
        ]
        with self.lock:
            self._seq += 1
            seq = f"{self._seq:020d}"
            self.shards[shard].append((seq, partition_key, payload))
        return seq

    def records_total(self) -> int:
        with self.lock:
            return sum(len(v) for v in self.shards.values())

    def start(self):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        stub = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                body = json.loads(
                    self.rfile.read(int(self.headers["Content-Length"]))
                )
                target = (self.headers.get("X-Amz-Target") or "").split(".")[-1]
                if target == "ListShards":
                    resp = {
                        "Shards": [{"ShardId": s} for s in stub.shard_ids]
                    }
                elif target == "PutRecords":
                    # sink side: append by partition-key hash, exactly
                    # like publish() — one stub serves the full roundtrip
                    for rec in body["Records"]:
                        stub.publish(
                            rec["PartitionKey"],
                            json.loads(base64.b64decode(rec["Data"])),
                        )
                    resp = {"FailedRecordCount": 0, "Records": []}
                elif target == "GetShardIterator":
                    shard = body["ShardId"]
                    with stub.lock:
                        log = stub.shards[shard]
                        if body["ShardIteratorType"] == "TRIM_HORIZON":
                            idx = 0
                        else:  # AFTER_SEQUENCE_NUMBER
                            seq = body["StartingSequenceNumber"]
                            idx = next(
                                (
                                    i + 1
                                    for i, (s, _k, _p) in enumerate(log)
                                    if s == seq
                                ),
                                len(log),
                            )
                    resp = {
                        "ShardIterator": json.dumps(
                            {"shard": shard, "idx": idx}
                        )
                    }
                elif target == "GetRecords":
                    it = json.loads(body["ShardIterator"])
                    limit = body.get("Limit", 100)
                    with stub.lock:
                        log = stub.shards[it["shard"]]
                        chunk = log[it["idx"] : it["idx"] + limit]
                    resp = {
                        "Records": [
                            {
                                "SequenceNumber": seq,
                                "PartitionKey": pk,
                                "Data": base64.b64encode(
                                    json.dumps(payload).encode()
                                ).decode(),
                            }
                            for seq, pk, payload in chunk
                        ],
                        "NextShardIterator": json.dumps(
                            {"shard": it["shard"], "idx": it["idx"] + len(chunk)}
                        ),
                        "MillisBehindLatest": 0,
                    }
                else:
                    self.send_response(400)
                    self.end_headers()
                    return
                out = json.dumps(resp).encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "application/x-amz-json-1.1"
                )
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)

        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self._srv.server_address[1]
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        return self

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()
