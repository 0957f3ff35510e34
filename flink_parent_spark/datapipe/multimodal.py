"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract as Arrow-batched Pandas UDFs over mapInPandas.

Contract (mirrors how a 100 TB image/audio corpus is laid out):
- payload column: BinaryType (the raw bytes — parquet stores them as BYTE_ARRAY,
  column pruning means metadata-only queries never read them);
- metadata column: StructType (modality, byte_len, digest, decoded props).

The actual media decode (PIL/ffmpeg/torchaudio) is NOT available in this
container — `decode_media` gates the real path behind an import-try and
otherwise produces a clearly-marked deterministic fake (md5-derived
dimensions) so the Spark-side plumbing — schema, batch shape, partitioning —
is fully real and testable end-to-end. The fake is reproducible cross-engine,
which lets even this path be oracle-checked.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str, payload_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary payload column (fixtures carry no real
    media, so payloads are the utf-8 bytes of a text column — the plumbing
    downstream is identical)."""
    return df.withColumn(payload_col, F.encode(F.col(text_col), "utf-8"))


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for an image decode: dimensions derived from
    the payload digest. Marked in the output via decoder='fake-md5'."""
    d = hashlib.md5(payload).hexdigest()
    return int(d[:8], 16) % 1920 + 1, int(d[8:16], 16) % 1080 + 1, "fake-md5"


def decode_media(
    df: DataFrame,
    payload_col: str = "payload",
    modality: str = "image",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Decode payloads into typed metadata via mapInPandas (Arrow batches).

    Real decoders are plugged in here when available; this container has
    none, so the deterministic fake runs (decoder column says which).
    """
    try:  # the real path, absent in this environment
        from PIL import Image  # noqa: F401

        real_decoder = True
    except ImportError:
        real_decoder = False

    out_schema = T.StructType(df.schema.fields + [T.StructField(meta_col, MEDIA_META_SCHEMA)])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = []
            for payload in pdf[payload_col]:
                b = bytes(payload)
                if real_decoder:
                    raise NotImplementedError(
                        "real media decode not wired in this container"
                    )
                w, h, dec = _fake_decode(b)
                metas.append(
                    {
                        "modality": modality,
                        "byte_len": len(b),
                        "digest": hashlib.md5(b).hexdigest(),
                        "width": w,
                        "height": h,
                        "decoder": dec,
                    }
                )
            pdf = pdf.copy()
            pdf[meta_col] = metas
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def frame_sample_stub(n_frames: int = 4):
    """Video frame-sampling stub: returns the byte-offsets a sampler would
    decode. Plumbing-only (no codec in container)."""

    def plan(byte_len: int) -> list[int]:
        if byte_len <= 0:
            return []
        step = max(byte_len // n_frames, 1)
        return [i * step for i in range(min(n_frames, byte_len))]

    return plan
