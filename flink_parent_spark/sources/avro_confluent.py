"""Confluent Schema Registry Avro wire format.

Reference surface: flink-formats/flink-avro-confluent-registry —
`ConfluentSchemaRegistryCoder.java` (readSchema: a 0x00 magic byte then a
4-byte big-endian schema id, resolved through the registry client;
writeSchema mirrors it) and `ConfluentRegistryAvroDeserializationSchema` /
`...SerializationSchema` (per-record single-object avro binary, NOT the
OCF container — the container lives in files, the registry frame lives in
Kafka messages).

The registry itself is spoken over its public REST surface with stdlib
urllib (no client library): POST /subjects/{subject}/versions to register
(idempotent: same schema returns the same id), GET /schemas/ids/{id} to
resolve, GET /subjects/{subject}/versions/latest for reader-side schema
discovery. Works against the real registry or an in-container stub.

Record binary uses the same from-first-principles codec as
`avro_format.py` (zigzag varints, little-endian doubles, ["null", T]
unions with branch index) so the two format modules stay one
implementation.
"""

from __future__ import annotations

import io
import json
import struct
from typing import TYPE_CHECKING, Callable

import pandas as pd

from flink_parent_spark.sources.avro_format import (
    _field_kind,
    _read_bytes,
    _read_long,
    _spark_ddl_of_avro,
    _write_bytes,
    _write_long,
    avro_schema_of,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

CONFLUENT_MAGIC = 0  # ConfluentSchemaRegistryCoder.java CONFLUENT_MAGIC_BYTE


def _encode_record(body: io.BytesIO, rec: dict, kinds) -> None:
    for name, kind in kinds:
        v = rec.get(name)
        if v is None or v != v:  # None or NaN
            _write_long(body, 0)
            continue
        _write_long(body, 1)
        if kind in ("long", "int"):
            _write_long(body, int(v))
        elif kind == "double":
            body.write(struct.pack("<d", float(v)))
        elif kind == "string":
            _write_bytes(body, str(v).encode("utf-8"))
        elif kind == "boolean":
            body.write(b"\x01" if v else b"\x00")
        elif kind == "timestamp":
            _write_long(body, int(pd.Timestamp(v).value // 1_000))
        else:
            raise ValueError(f"unsupported avro kind: {kind}")


def _decode_record(buf: io.BytesIO, kinds) -> dict:
    rec: dict = {}
    for name, kind in kinds:
        if _read_long(buf) == 0:
            rec[name] = None
            continue
        if kind in ("long", "int"):
            rec[name] = _read_long(buf)
        elif kind == "double":
            (rec[name],) = struct.unpack("<d", buf.read(8))
        elif kind == "string":
            rec[name] = _read_bytes(buf).decode("utf-8")
        elif kind == "boolean":
            rec[name] = buf.read(1) == b"\x01"
        elif kind == "timestamp":
            rec[name] = pd.Timestamp(_read_long(buf) * 1_000)
        else:
            raise ValueError(f"unsupported avro kind: {kind}")
    return rec


def encode_confluent_frame(rec: dict, schema: dict, schema_id: int) -> bytes:
    """One Kafka-message payload: magic 0x00 + int32-BE schema id + the
    record's avro binary (ConfluentSchemaRegistryCoder.writeSchema +
    AvroSerializationSchema record encode)."""
    body = io.BytesIO()
    body.write(bytes([CONFLUENT_MAGIC]))
    body.write(struct.pack(">i", schema_id))
    kinds = [(f["name"], _field_kind(f["type"])) for f in schema["fields"]]
    _encode_record(body, rec, kinds)
    return body.getvalue()


def decode_confluent_frame(
    data: bytes, schema_by_id: Callable[[int], dict]
) -> tuple[int, dict]:
    """Inverse of encode_confluent_frame; raises on a foreign magic byte
    exactly like ConfluentSchemaRegistryCoder.readSchema ('Unknown data
    format. Magic number does not match')."""
    buf = io.BytesIO(data)
    magic = buf.read(1)
    if magic != bytes([CONFLUENT_MAGIC]):
        raise ValueError(
            "unknown data format: confluent magic byte does not match"
        )
    (schema_id,) = struct.unpack(">i", buf.read(4))
    schema = schema_by_id(schema_id)
    kinds = [(f["name"], _field_kind(f["type"])) for f in schema["fields"]]
    return schema_id, _decode_record(buf, kinds)


class SchemaRegistryClient:
    """Minimal Confluent Schema Registry REST client (stdlib urllib).
    Picklable — ships into executors; the id->schema cache refills per
    worker process, matching the reference client's per-instance cache."""

    def __init__(self, url: str):
        self.url = url.rstrip("/")
        self._by_id: dict[int, dict] = {}

    def __getstate__(self):
        return {"url": self.url}

    def __setstate__(self, state):
        self.url = state["url"]
        self._by_id = {}

    def _request(self, path: str, payload: dict | None = None) -> dict:
        import urllib.request  # noqa: PLC0415

        data = None
        headers = {}
        if payload is not None:
            data = json.dumps(payload).encode()
            headers["Content-Type"] = "application/vnd.schemaregistry.v1+json"
        req = urllib.request.Request(
            self.url + path, data=data, headers=headers,
            method="POST" if payload is not None else "GET",
        )
        import urllib.error  # noqa: PLC0415

        try:
            with urllib.request.urlopen(req) as r:
                return json.load(r)
        except urllib.error.HTTPError as e:
            raise ValueError(
                f"schema registry {path}: HTTP {e.code} {e.read()[:200]!r}"
            ) from e

    def register(self, subject: str, schema: dict) -> int:
        resp = self._request(
            f"/subjects/{subject}/versions", {"schema": json.dumps(schema)}
        )
        return int(resp["id"])

    def get_by_id(self, schema_id: int) -> dict:
        if schema_id not in self._by_id:
            resp = self._request(f"/schemas/ids/{schema_id}")
            self._by_id[schema_id] = json.loads(resp["schema"])
        return self._by_id[schema_id]

    def latest(self, subject: str) -> tuple[int, dict]:
        resp = self._request(f"/subjects/{subject}/versions/latest")
        return int(resp["id"]), json.loads(resp["schema"])


def kafka_confluent_sink(
    df: "DataFrame",
    path: str,
    topic: str,
    registry_url: str,
    subject: str | None = None,
    key_cols: "list[str] | None" = None,
) -> int:
    """Registry-framed producer onto the file-backed topic
    (ConfluentRegistryAvroSerializationSchema.forSpecific role): the
    writer schema registers ONCE on the driver (subject defaults to
    '{topic}-value', the registry's TopicNameStrategy), then every
    partition encodes its rows to magic+id+binary frames executor-side
    and appends them through the distributed producer half. Returns the
    schema id."""
    schema = avro_schema_of(df, name=topic)
    client = SchemaRegistryClient(registry_url)
    schema_id = client.register(subject or f"{topic}-value", schema)
    cols = df.columns
    keys = list(key_cols or [])

    def enc(batches):
        for pdf in batches:
            ks = []
            vs = []
            for rec in pdf.to_dict("records"):
                ks.append(
                    json.dumps([str(rec[c]) for c in keys]) if keys else None
                )
                vs.append(encode_confluent_frame(rec, schema, schema_id))
            yield pd.DataFrame({"k": pd.Series(ks, dtype=object),
                                "v": pd.Series(vs, dtype=object)})

    kv = df.select(cols).mapInPandas(enc, "k string, v binary")
    from flink_parent_spark.sources.connectors import (  # noqa: PLC0415
        write_kafka_file_topic_df,
    )

    write_kafka_file_topic_df(kv, path, topic, binary_value=True)
    return schema_id


def kafka_confluent_source(
    spark: "SparkSession",
    path: str,
    topic: str,
    registry_url: str,
    subject: str | None = None,
) -> "DataFrame":
    """Registry-framed consumer (ConfluentRegistryAvroDeserializationSchema
    role): the READER schema comes from the subject's latest version
    (driver-side discovery, '{topic}-value' TopicNameStrategy); each
    executor decodes frames with a per-worker registry client, resolving
    writer schemas by the embedded id and projecting onto the reader
    schema (a missing field reads as null — the union-with-null default
    the OCF reader uses too)."""
    client = SchemaRegistryClient(registry_url)
    _, reader_schema = client.latest(subject or f"{topic}-value")
    ddl = _spark_ddl_of_avro(reader_schema)
    reader_fields = [f["name"] for f in reader_schema["fields"]]

    from flink_parent_spark.sources.connectors import (  # noqa: PLC0415
        kafka_file_source,
    )

    raw = kafka_file_source(spark, path, topic, streaming=False).select("value")

    def dec(batches):
        for pdf in batches:
            recs = []
            for v in pdf["value"]:
                _, rec = decode_confluent_frame(bytes(v), client.get_by_id)
                recs.append({f: rec.get(f) for f in reader_fields})
            yield pd.DataFrame(recs, columns=reader_fields)

    return raw.mapInPandas(dec, ddl)
