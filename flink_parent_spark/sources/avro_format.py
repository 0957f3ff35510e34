"""Avro format support (flink-formats/flink-avro — AvroRowDeserializationSchema
/ AvroRowSerializationSchema parity for flat row schemas).

This container ships Spark's core avro jars but NOT the spark-avro data
source module, so `spark.read.format("avro")` is unavailable. Instead this
module implements the Avro 1.x Object Container File format directly
(binary encoding per the public Avro spec: zigzag-varint longs, LE doubles,
length-prefixed utf8, null-unions) and runs it THROUGH Spark:

- read_avro:  spark.read.format("binaryFile") over the directory, then an
  Arrow-batched mapInPandas decode — one task per file, so reads scale with
  file count exactly like any other splittable-by-file source.
- write_avro: mapInPandas encoder writing one OCF per input partition —
  the distributed mirror of the reader.

Supported field types (the fixture surface): long/int, double, string,
boolean, timestamp (logicalType timestamp-micros). Every field is encoded
as the nullable union ["null", T].
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic sync marker

_AVRO_OF_SPARK = {
    "bigint": "long",
    "int": "int",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
    "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
}
_SPARK_OF_AVRO = {
    "long": "bigint",
    "int": "int",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
}


# --- binary primitives (Avro spec "Binary encoding") -------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(buf: io.BytesIO, n: int) -> None:
    n = _zigzag(int(n))
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    _write_long(buf, len(data))
    buf.write(data)


def _read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_read_long(buf))


# --- schema mapping ----------------------------------------------------------


def avro_schema_of(df: DataFrame, name: str = "row") -> dict:
    fields = []
    for c, t in df.dtypes:
        if t not in _AVRO_OF_SPARK:
            raise ValueError(f"unsupported Spark type for avro: {c}: {t}")
        fields.append({"name": c, "type": ["null", _AVRO_OF_SPARK[t]]})
    return {"type": "record", "name": name, "fields": fields}


def _spark_ddl_of_avro(schema: dict) -> str:
    cols = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):  # ["null", T]
            t = next(x for x in t if x != "null")
        if isinstance(t, dict):
            if t.get("logicalType") == "timestamp-micros":
                cols.append(f"`{f['name']}` timestamp")
                continue
            t = t["type"]
        cols.append(f"`{f['name']}` {_SPARK_OF_AVRO[t]}")
    return ", ".join(cols)


# --- encode / decode one OCF -------------------------------------------------


def _field_kind(ftype) -> str:
    t = ftype
    if isinstance(t, list):
        t = next(x for x in t if x != "null")
    if isinstance(t, dict):
        if t.get("logicalType") == "timestamp-micros":
            return "timestamp"
        t = t["type"]
    return t


def encode_ocf(pdf: pd.DataFrame, schema: dict) -> bytes:
    kinds = [(f["name"], _field_kind(f["type"])) for f in schema["fields"]]
    body = io.BytesIO()
    n = 0
    for rec in pdf.to_dict("records"):
        for name, kind in kinds:
            v = rec[name]
            if v is None or v != v:  # None or NaN
                _write_long(body, 0)
                continue
            _write_long(body, 1)
            if kind == "long" or kind == "int":
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
        n += 1
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": b"null",
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(SYNC)
    payload = body.getvalue()
    if n:
        _write_long(out, n)
        _write_long(out, len(payload))
        out.write(payload)
        out.write(SYNC)
    return out.getvalue()


def decode_ocf_schema(data: bytes) -> dict:
    """Decode only the OCF header (magic + metadata block) and return the
    writer schema — no record blocks are read, so probing a large file on
    the driver stays O(header)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    schema = None
    n_meta = _read_long(buf)
    while True:
        if n_meta == 0:
            break
        for _ in range(abs(n_meta)):
            k = _read_bytes(buf).decode()
            v = _read_bytes(buf)
            if k == "avro.schema":
                schema = json.loads(v)
        n_meta = _read_long(buf)
    if schema is None:
        raise ValueError("Avro OCF header has no avro.schema metadata entry")
    return schema


def decode_ocf(data: bytes) -> tuple[dict, pd.DataFrame]:
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    schema = None
    n_meta = _read_long(buf)
    while True:
        if n_meta == 0:
            break
        for _ in range(abs(n_meta)):
            k = _read_bytes(buf).decode()
            v = _read_bytes(buf)
            if k == "avro.schema":
                schema = json.loads(v)
        n_meta = _read_long(buf)
    sync = buf.read(16)
    kinds = [(f["name"], _field_kind(f["type"])) for f in schema["fields"]]
    recs = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = _read_long(buf)
        _read_long(buf)  # block byte size
        for _ in range(count):
            rec = {}
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
            recs.append(rec)
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch")
    cols = [f["name"] for f in schema["fields"]]
    return schema, pd.DataFrame(recs, columns=cols)


# --- Spark-side read/write ---------------------------------------------------


def write_avro(df: DataFrame, path: str) -> None:
    """Distributed OCF writer: one file per input partition via an
    Arrow-batched encoder (mirror of the reader's per-file parallelism)."""
    os.makedirs(path, exist_ok=True)
    schema = avro_schema_of(df)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = []
        for pdf in batches:
            parts.append(pdf)
        pdf = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame(columns=[f["name"] for f in schema["fields"]])
        )
        fname = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
        if len(pdf):
            with open(fname, "wb") as fh:
                fh.write(encode_ocf(pdf, schema))
            yield pd.DataFrame({"path": [fname], "rows": [len(pdf)]})
        else:
            yield pd.DataFrame({"path": [], "rows": []})

    # the manifest collect triggers the distributed write
    df.mapInPandas(enc, "path string, rows long").collect()


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed OCF reader: binaryFile source (one row per file) +
    mapInPandas decode, so parallelism scales with file count and the
    decode never funnels through the driver."""
    # schema discovery from one file header (driver-side, header only)
    if os.path.isdir(path):
        candidates = sorted(
            f for f in os.listdir(path)
            if f.endswith(".avro") and not f.startswith((".", "_"))
        )
        if not candidates:
            raise FileNotFoundError(f"no *.avro files under {path}")
        probe = os.path.join(path, candidates[0])
    else:
        probe = path
    with open(probe, "rb") as fh:
        # the header (magic + metadata map + sync marker) is at the front;
        # 64 KiB comfortably covers any real schema without reading records
        head = fh.read(65536)
    schema = decode_ocf_schema(head)
    ddl = _spark_ddl_of_avro(schema)
    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.avro") if os.path.isdir(path) else path
    )

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                _, out = decode_ocf(bytes(content))
                yield out

    return files.select("content").mapInPandas(dec, ddl)
