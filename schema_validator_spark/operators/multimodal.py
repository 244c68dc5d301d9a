"""Multimodal-column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas`` stages.

The decode step itself is STUBBED — the image/audio libraries are not in this
container — but everything Spark-side is real and tested: the media schema,
the mapInPandas batch iteration, the UDF signatures, output schemas, and
partition-preserving behaviour.  Swap ``_decode_stub`` for a real Pillow/
ffmpeg call and nothing else changes.

Scale notes: media blobs make rows wide — mapInPandas streams Arrow batches
(bounded memory per batch via spark.sql.execution.arrow.maxRecordsPerBatch)
and never materializes a partition; feature outputs drop the blob column so
downstream stages shuffle only the small features.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (
    "media_id bigint, media_type string, payload binary, "
    "meta struct<width:int,height:int,duration_ms:int,codec:string>"
)


def _decode_stub(payload: bytes, media_type: str, fake: bool) -> dict:
    """Placeholder for the real decoder (Pillow / libav).  With ``fake=True``
    returns deterministic pseudo-features derived from the bytes so the
    pipeline is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in "
            "this environment; pass fake=True for deterministic stub features"
        )
    digest = hashlib.md5(payload or b"").digest()
    return {
        "n_bytes": len(payload or b""),
        "content_hash": digest.hex(),
        # fake 4-dim "embedding" from the digest — stable across runs
        "feature": [b / 255.0 for b in digest[:4]],
    }


FEATURES_DDL = (
    "media_id bigint, media_type string, n_bytes bigint, "
    "content_hash string, feature array<double>"
)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    type_col: str = "media_type",
    fake: bool = True,
) -> DataFrame:
    """Decode + featurize each media blob via mapInPandas (Arrow batches).
    Output drops the payload — only small feature rows flow downstream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, t, fake)
                for p, t in zip(pdf[payload_col], pdf[type_col])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "media_type": pdf[type_col].values,
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "content_hash": [f["content_hash"] for f in feats],
                    "feature": [f["feature"] for f in feats],
                }
            )

    return df.mapInPandas(run, FEATURES_DDL)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 1024,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """Frame-sampling stub: emits one row per sampled "frame" (byte-window
    stand-in).  Real implementation would seek keyframes; the Spark shape —
    one input row fanning out to N output rows inside mapInPandas — is the
    part that matters and is real."""

    out_ddl = "media_id bigint, frame_no int, frame_hash string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, hashes = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if not fake:
                    raise NotImplementedError("real frame extraction not available")
                payload = payload or b""
                for i in range(0, max(len(payload), 1), every_n_bytes):
                    ids.append(mid)
                    frame_nos.append(i // every_n_bytes)
                    hashes.append(
                        hashlib.md5(payload[i : i + every_n_bytes]).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": frame_nos, "frame_hash": hashes}
            )

    return df.mapInPandas(run, out_ddl)


def resize_media(
    df: DataFrame,
    target_bytes: int = 256,
    payload_col: str = "payload",
    id_col: str = "media_id",
    type_col: str = "media_type",
    fake: bool = True,
) -> DataFrame:
    """Resize/downscale stub: real implementation would decode + rescale via
    Pillow/libav; the deterministic fake truncates the payload to
    ``target_bytes`` (byte-window stand-in, same spirit as sample_frames).
    The Spark shape is the real part: Arrow-batched mapInPandas, payload
    dropped from the output so downstream stages shuffle only small rows."""
    out_ddl = (
        "media_id bigint, media_type string, orig_bytes bigint, "
        "resized_bytes bigint, resized_hash string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, types, orig, res, hashes = [], [], [], [], []
            for mid, mtype, payload in zip(
                pdf[id_col], pdf[type_col], pdf[payload_col]
            ):
                if not fake:
                    raise NotImplementedError("real media resize not available")
                payload = payload or b""
                resized = payload[:target_bytes]
                ids.append(mid)
                types.append(mtype)
                orig.append(len(payload))
                res.append(len(resized))
                hashes.append(hashlib.md5(resized).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": types,
                    "orig_bytes": orig,
                    "resized_bytes": res,
                    "resized_hash": hashes,
                }
            )

    return df.mapInPandas(run, out_ddl)


def media_table_from_text(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Build a media-shaped table from a text table (payload = UTF-8 bytes) —
    the deterministic test substrate for the plumbing above."""
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.length(F.col(text_col)).cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )
