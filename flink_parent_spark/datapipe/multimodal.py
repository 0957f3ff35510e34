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


def resize_plan(
    df: DataFrame,
    meta_col: str = "media_meta",
    max_side: int = 512,
) -> DataFrame:
    """Image resize planning: aspect-preserving fit of the decoded
    dimensions into a `max_side` bounding box (integer floor math — the
    deterministic part every real resize shares; the pixel resample itself
    is the stubbed decoder's job). Pure codegen expressions over the
    metadata struct — the payload column is never read, so at 100 TB this
    is a metadata-only scan."""
    w = F.col(f"{meta_col}.width")
    h = F.col(f"{meta_col}.height")
    long_side = F.greatest(w, h)
    needs = long_side > max_side
    new_w = F.when(needs, (w * max_side / long_side).cast("int")).otherwise(w)
    new_h = F.when(needs, (h * max_side / long_side).cast("int")).otherwise(h)
    return df.withColumn(
        "resize",
        F.struct(
            new_w.alias("new_width"),
            new_h.alias("new_height"),
            (new_w.cast("double") / w.cast("double")).alias("scale_x"),
            (new_h.cast("double") / h.cast("double")).alias("scale_y"),
        ),
    )


def audio_chunks(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    chunk_bytes: int = 64,
    hop_bytes: int = 48,
) -> DataFrame:
    """Audio chunking plumbing: split each payload into overlapping
    fixed-size windows (chunk `chunk_bytes`, hop `hop_bytes` — the standard
    STFT-style framing), emitting per-chunk byte ranges and digests. The
    fan-out is an Arrow-batched mapInPandas (one input row -> n_chunks
    rows), the same shape a real feature extractor (fbank/MFCC) plugs
    into; digests make the fake path oracle-checkable."""
    dt = dict(df.dtypes)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for rec in pdf.to_dict("records"):
                b = bytes(rec[payload_col])
                start = 0
                idx = 0
                while start < len(b):
                    chunk = b[start : start + chunk_bytes]
                    recs.append(
                        {
                            id_col: rec[id_col],
                            "chunk_idx": idx,
                            "start_byte": start,
                            "n_bytes": len(chunk),
                            "digest": hashlib.md5(chunk).hexdigest(),
                        }
                    )
                    start += hop_bytes
                    idx += 1
            yield pd.DataFrame(
                recs,
                columns=[id_col, "chunk_idx", "start_byte", "n_bytes", "digest"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches,
        f"`{id_col}` {dt[id_col]}, chunk_idx int, start_byte long, "
        "n_bytes int, digest string",
    )
