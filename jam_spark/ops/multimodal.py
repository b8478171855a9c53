"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side contract (schemas, partitioning, UDF signatures, batch
shapes) is real and tested; the actual codec work is stubbed behind
:func:`register_decoder` because media libraries are not available in
this environment — swap in PIL/ffmpeg decoders in production. The
default decoder is a deterministic fake that derives features from the
bytes, so the plumbing is exercisable end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms long"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "feature array<float>, decode_ok boolean, decode_error string"
)

_FEATURE_DIM = 16

_DECODERS: dict[str, Callable[[bytes], np.ndarray]] = {}


def register_decoder(kind: str, fn: Callable[[bytes], np.ndarray]) -> None:
    """Register a real decoder (e.g. PIL image decode) for a media kind."""
    _DECODERS[kind] = fn


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decode+embed: fixed-dim feature
    from the payload digest. NOT a real decoder — see module docstring."""
    d = hashlib.sha256(payload).digest()
    arr = np.frombuffer(d[: _FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return arr / 65535.0


def _real_decode_unavailable(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "media codec libraries (PIL/av/soundfile) are not installed in "
        "this environment; register_decoder() a real implementation"
    )


def extract_features(media: DataFrame, use_fake: bool = True) -> DataFrame:
    """media table → per-item features via Arrow-batched mapInPandas.

    Batch shape: the iterator yields one output frame per input Arrow
    batch; payload bytes never cross to the driver.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks, errs, digests, sizes = [], [], [], [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                digests.append(hashlib.sha256(payload).hexdigest())
                sizes.append(len(payload))
                decoder = _DECODERS.get(
                    kind, _fake_decode if use_fake else _real_decode_unavailable
                )
                try:
                    feats.append(decoder(payload).tolist())
                    oks.append(True)
                    errs.append(None)
                except NotImplementedError as e:
                    feats.append(None)
                    oks.append(False)
                    errs.append(str(e))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.array(sizes, dtype="int64"),
                    "sha256": digests,
                    "feature": feats,
                    "decode_ok": oks,
                    "decode_error": errs,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame to decode
    (media_id, frame_idx, ts_ms) — pure column ops, no decode. The decode
    itself would run via extract_features on the planned frames."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.col("duration_ms") / every_ms).cast("long") - 1,
                        F.lit(0),
                    ),
                )
            ).alias("frame_idx"),
        )
        .withColumn("ts_ms", F.col("frame_idx") * every_ms)
    )


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Deterministic media table DERIVED from the documents table (so a
    SQL oracle can reproduce it): payload = UTF-8 bytes of
    ``text || '|' || doc_id``, kind round-robins image/audio/video."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    return documents.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.element_at(kinds, (F.col("doc_id") % 3).cast("int") + 1).alias("kind"),
        F.encode(
            F.concat_ws("|", F.col("text"), F.col("doc_id").cast("string")),
            "UTF-8",
        ).alias("payload"),
    )


def media_features(documents: DataFrame) -> DataFrame:
    """Driver-checkable multimodal query: derive a media table from
    documents, push it through the REAL :func:`extract_features`
    mapInPandas plumbing (payload bytes stay executor-side), and project
    the oracle-computable columns (media_id, kind, n_bytes, sha256) —
    n_bytes/sha256 are computed IN the Arrow-batched Python stage, so a
    green driver row certifies the multimodal batch path end-to-end."""
    feats = extract_features(media_from_documents(documents))
    return feats.select(
        F.col("media_id").cast("long"),
        "kind",
        F.col("n_bytes").cast("long"),
        "sha256",
    )


def media_features_sql() -> str:
    return """
        SELECT doc_id::BIGINT AS media_id,
               ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
               octet_length(encode(text || '|' || doc_id::VARCHAR))::BIGINT
                 AS n_bytes,
               sha256(text || '|' || doc_id::VARCHAR) AS sha256
        FROM documents
    """


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = (f"media-{i}-" * (i % 7 + 1)).encode() * 17
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 512 if kind == "image" else None,
                64 + (i * 3) % 512 if kind == "image" else None,
                (i % 30 + 1) * 1000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
