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


class AmqpBrokerStub:
    """AMQP 0-9-1 broker slice: handshake, Queue.Declare, Basic.Get /
    Basic.GetEmpty, Basic.Ack — with requeue-on-disconnect for unacked
    deliveries (the at-least-once contract RMQSource builds on)."""

    def __init__(self):
        self.messages: list[bytes] = []  # append-only message log
        self.acked: set[int] = set()  # indexes durably consumed
        self.lock = threading.Lock()
        self._srv = None
        self.port = None

    def publish(self, *bodies: bytes) -> None:
        with self.lock:
            self.messages.extend(bodies)

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
                            sock.sendall(
                                amqp.encode_frame(
                                    amqp.FRAME_HEADER, channel,
                                    struct.pack(">HHQH", 60, 0, len(body), 0),
                                )
                            )
                            mid = max(1, len(body) // 2)
                            for chunk in (body[:mid], body[mid:]):
                                sock.sendall(
                                    amqp.encode_frame(
                                        amqp.FRAME_BODY, channel, chunk
                                    )
                                )
                        elif m == amqp.BASIC_ACK:
                            (tag,) = struct.unpack_from(">Q", args, 0)
                            with stub.lock:
                                if tag in delivered:
                                    stub.acked.add(delivered.pop(tag))
                except (ConnectionError, AssertionError, OSError):
                    pass
                # connection gone: everything delivered-but-unacked
                # requeues (delivered dict simply drops from scope)

        self._srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
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
