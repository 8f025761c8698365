"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schema, partition-friendly
batch iteration, Arrow UDF signatures, deterministic batch shapes — is
real and tested; the actual media DECODE is stubbed (the sandbox ships
no codec libraries): ``decode_stub`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake feature
vector derived from the payload bytes (stable across partitionings, so
pipelines downstream of "decode" remain testable).

At 100 TB: payloads live in their own parquet column (columnar pruning
keeps metadata-only scans cheap); mapInPandas streams Arrow batches so
a task never materializes more than one batch of payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<mime: string, width: int, height: int, duration_ms: int>"
)

FEATURE_DIM = 16
_MAGIC = {b"\x89PNG": "image/png", b"\xff\xd8\xff": "image/jpeg", b"RIFF": "audio/wav"}


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata derivation that never decodes: byte length + magic
    sniff (pure Catalyst — binary functions, no Python)."""
    p = F.col(payload_col)
    mime = F.lit("application/octet-stream")
    for magic, m in _MAGIC.items():
        hexpfx = magic.hex()
        mime = F.when(
            F.startswith(F.hex(p), F.lit(hexpfx.upper())), F.lit(m)
        ).otherwise(mime)
    return df.withColumn("n_bytes", F.length(p)).withColumn("sniffed_mime", mime)


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: FEATURE_DIM floats
    from the sha256 of the payload (stable, partition-independent)."""
    h = hashlib.sha256(payload or b"").digest()
    # big-endian words: SQL engines can rebuild these from the hex
    # digest with plain substr (the DuckDB oracle does)
    raw = np.frombuffer(
        (h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype=">u4"
    )
    return (raw.astype(np.float64) / np.float64(2**32)).astype(np.float32)


def decode_features(
    df: DataFrame, payload_col: str = "payload", fake: bool = False
) -> DataFrame:
    """payload -> float feature vector via mapInPandas (Arrow batches).

    fake=False raises NotImplementedError at execution time — the
    decode step needs media libraries absent from this environment; the
    plumbing (schema, batch iteration, output shape) is the tested part.
    """

    out_schema = "doc_id long, features array<float>"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries not present in this "
                    "environment; pass fake=True for the deterministic stub"
                )
            feats = [
                _fake_features(p if p is not None else b"").tolist()
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.select("doc_id", payload_col).mapInPandas(op, out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Image resize plumbing via mapInPandas: (doc_id, payload) ->
    (doc_id, width, height, payload). The real pixel decode/resample is
    stubbed like decode_features (no codec libraries in this sandbox);
    ``fake=True`` emits a deterministic pseudo-payload (sha256 of input
    bytes + target dims) with the exact schema/batch shape a real
    Pillow/libvips worker would produce, so downstream writers and
    repartitioning are testable."""
    out_schema = "doc_id long, width int, height int, payload binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"{width}x{height}".encode()
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires codec libraries not present in this "
                    "environment; pass fake=True for the deterministic stub"
                )
            payloads = [
                hashlib.sha256((p if p is not None else b"") + tag).digest()
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "payload": payloads,
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(op, out_schema)


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, payload_col: str = "payload"
) -> DataFrame:
    """Video frame-sampling PLAN: expands (doc_id, duration_ms) into
    one row per sampled timestamp — the shuffle-free explode that a
    real frame extractor would consume. Decode itself is the stub."""
    return df.select(
        "doc_id",
        payload_col,
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                       F.lit(every_ms))
        ).alias("ts_ms"),
    )
