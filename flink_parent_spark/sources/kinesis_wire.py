"""Kinesis consumer as an unbounded Spark streaming source.

Reference surface: `flink-connectors/flink-connector-kinesis` —
`FlinkKinesisConsumer.java:105` (per-shard sequence numbers snapshotted
into Flink state; restore resumes each shard AFTER its checkpointed
sequence number) and `ShardConsumer.java:56` (the per-shard
GetShardIterator/GetRecords polling loop). The Spark mapping is a
`SimpleDataSourceStreamReader` whose offset IS the reference's state:
`{"seqs": {shard_id: last_read_sequence_number}}`.

Unlike the queue protocols in `stream_wire.py`, Kinesis needs no spool
WAL and no ack: the stream is a sharded log with retention, so
`readBetweenOffsets` replays deterministically by re-reading each shard
from AFTER the start sequence number up to the end sequence number, and
`commit` is a no-op (position lives in Spark's checkpoint, exactly as
the reference keeps it in Flink state rather than in Kinesis).

Wire format: the public Kinesis_20131202 JSON API over HTTP —
ListShards, GetShardIterator (TRIM_HORIZON / AFTER_SEQUENCE_NUMBER),
GetRecords — the same stdlib-urllib, no-SDK transport the PutRecords
sink (`connectors.kinesis_putrecords_sink`) already uses; auth is the
deployment's concern (localhost stub or sigv4 proxy).

Shard discovery runs per poll, so shards created by a reshard are picked
up from TRIM_HORIZON (the reference's shard-discovery loop in
KinesisDataFetcher). Records' `Data` is base64 json; the `schema` option
names the payload fields, like the other wire sources.

Scale shape: one driver-side consumer per query — the reference's
consumer is parallel across subtasks, but its unit of parallelism is the
shard, and this transport is the in-container test bridge; a production
100 TB deployment fronts Kinesis with a partition-parallel connector jar
on the JVM side. Spark distributes everything downstream of the scan.
"""

from __future__ import annotations

import base64
import json
from typing import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


class KinesisClient:
    """Minimal Kinesis_20131202 JSON API client (stdlib urllib)."""

    def __init__(self, endpoint: str, stream: str):
        self.endpoint = endpoint.rstrip("/") + "/"
        self.stream = stream

    def _call(self, target: str, payload: dict) -> dict:
        import urllib.request  # noqa: PLC0415

        req = urllib.request.Request(
            self.endpoint,
            data=json.dumps(payload).encode(),
            headers={
                "Content-Type": "application/x-amz-json-1.1",
                "X-Amz-Target": f"Kinesis_20131202.{target}",
            },
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            return json.load(r)

    def list_shards(self) -> "list[str]":
        resp = self._call("ListShards", {"StreamName": self.stream})
        return sorted(s["ShardId"] for s in resp.get("Shards", []))

    def shard_iterator(self, shard_id: str, after_seq: "str | None") -> str:
        payload: dict = {"StreamName": self.stream, "ShardId": shard_id}
        if after_seq is None:
            payload["ShardIteratorType"] = "TRIM_HORIZON"
        else:
            payload["ShardIteratorType"] = "AFTER_SEQUENCE_NUMBER"
            payload["StartingSequenceNumber"] = after_seq
        return self._call("GetShardIterator", payload)["ShardIterator"]

    def get_records(self, iterator: str, limit: int) -> dict:
        return self._call(
            "GetRecords", {"ShardIterator": iterator, "Limit": limit}
        )


class KinesisStreamReader(SimpleDataSourceStreamReader):
    """Per-shard sequence-number offsets in the checkpoint
    (FlinkKinesisConsumer.java:105 parity); GetRecords polling loop per
    shard (ShardConsumer.java:56)."""

    def __init__(self, client: KinesisClient, fields: "list[str]", max_per_batch: int):
        self._client = client
        self._fields = fields
        self._max = max_per_batch

    def initialOffset(self) -> dict:
        return {"seqs": {}}

    def _to_row(self, record: dict) -> tuple:
        payload = json.loads(base64.b64decode(record["Data"]))
        return tuple(payload.get(f) for f in self._fields)

    def read(self, start: dict) -> "tuple[Iterator[tuple], dict]":
        seqs = dict(start.get("seqs", {}))
        rows: list[tuple] = []
        for shard in self._client.list_shards():
            budget = self._max - len(rows)
            if budget <= 0:
                break
            it = self._client.shard_iterator(shard, seqs.get(shard))
            resp = self._client.get_records(it, budget)
            for rec in resp.get("Records", []):
                rows.append(self._to_row(rec))
                seqs[shard] = rec["SequenceNumber"]
        if not rows:
            return iter(()), start  # no progress
        return iter(rows), {"seqs": seqs}

    def readBetweenOffsets(self, start: dict, end: dict) -> "Iterator[tuple]":
        """Replay: Kinesis re-serves by sequence number, so the range
        (start_seq, end_seq] is re-read from each shard — no spool."""
        s = start.get("seqs", {})
        e = end.get("seqs", {})
        rows: list[tuple] = []
        for shard in sorted(e):
            stop_seq = e[shard]
            after = s.get(shard)
            if after == stop_seq:
                continue  # shard made no progress in this range
            it = self._client.shard_iterator(shard, after)
            done = False
            while not done:
                resp = self._client.get_records(it, self._max)
                records = resp.get("Records", [])
                if not records:
                    raise RuntimeError(
                        f"kinesis replay: shard {shard} exhausted before "
                        f"sequence {stop_seq} (stream trimmed below the "
                        "checkpoint?)"
                    )
                for rec in records:
                    rows.append(self._to_row(rec))
                    if rec["SequenceNumber"] == stop_seq:
                        done = True
                        break
                it = resp.get("NextShardIterator")
        return iter(rows)

    def commit(self, end: dict) -> None:
        # position lives in the checkpoint (the reference keeps it in
        # Flink state, never in Kinesis); the log needs no ack
        pass


class KinesisStreamDataSource(DataSource):
    """`spark.readStream.format("kinesis-stream")` — options: endpoint,
    stream, schema (payload field DDL), maxperbatch."""

    @classmethod
    def name(cls) -> str:
        return "kinesis-stream"

    def schema(self) -> str:
        ddl = self.options.get("schema")
        if not ddl:
            raise ValueError("kinesis-stream requires a 'schema' option")
        return ddl

    def simpleStreamReader(self, schema):
        o = self.options
        fields = [f.strip().split()[0] for f in self.schema().split(",")]
        return KinesisStreamReader(
            KinesisClient(o["endpoint"], o["stream"]),
            fields,
            int(o.get("maxperbatch", "1000")),
        )


def kinesis_bounded_read(
    spark, endpoint: str, stream: str, schema_ddl: str,
    limit_per_call: int = 1000,
):
    """Bounded driver-side drain: every shard from TRIM_HORIZON to the
    current tip, decoded into `schema_ddl` — the batch half of the
    consumer (the `kafka_wire_read` analog), used by the DDL scan path
    for `SELECT` over a `connector=kinesis` table."""
    client = KinesisClient(endpoint, stream)
    fields = [f.strip().split()[0] for f in schema_ddl.split(",")]
    rows: list[tuple] = []
    for shard in client.list_shards():
        it = client.shard_iterator(shard, None)
        while it:
            resp = client.get_records(it, limit_per_call)
            records = resp.get("Records", [])
            if not records:
                break  # at the tip of this shard
            for rec in records:
                payload = json.loads(base64.b64decode(rec["Data"]))
                rows.append(tuple(payload.get(f) for f in fields))
            it = resp.get("NextShardIterator")
    return spark.createDataFrame(rows, schema_ddl)
