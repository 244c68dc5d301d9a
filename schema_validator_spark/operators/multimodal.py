"""Multimodal-column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas`` stages.

Image decode/resize use Pillow WHEN AVAILABLE and audio/video decode/frame
extraction use PyAV (libav) WHEN AVAILABLE — both optional imports resolved
at call time (``fake=False`` + library present = real pixels/samples); the
deterministic ``fake`` path remains the test/oracle substrate everywhere,
and environments without the libraries get a clear NotImplementedError
instead of a silent fallback.  Everything Spark-side
is real and tested either way: the media schema, the mapInPandas batch
iteration, the UDF signatures, output schemas, and partition-preserving
behaviour.

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


def _pillow():
    """Optional import, resolved at call time so the module loads (and the
    fake path works) in environments without the decoder libraries."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _pyav():
    """Optional PyAV (libav bindings) import — same call-time pattern as
    ``_pillow``: audio/video decode is real where the library exists, the
    deterministic fake path stays the test/oracle substrate everywhere."""
    try:
        import av  # noqa: PLC0415

        return av
    except ImportError:
        return None


def _decode_stub(payload: bytes, media_type: str, fake: bool) -> dict:
    """Decoder dispatch.  ``fake=True``: deterministic pseudo-features from
    the bytes (test/oracle substrate).  ``fake=False``: real Pillow decode
    for image payloads when Pillow is importable, else NotImplementedError —
    never a silent fake fallback."""
    if fake:
        digest = hashlib.md5(payload or b"").digest()
        return {
            "n_bytes": len(payload or b""),
            "content_hash": digest.hex(),
            # fake 4-dim "embedding" from the digest — stable across runs
            "feature": [b / 255.0 for b in digest[:4]],
        }
    mtype = media_type or ""
    if mtype.startswith(("video/", "audio/")):
        av = _pyav()
        if av is None:
            raise NotImplementedError(
                "real audio/video decode needs PyAV (libav); pass fake=True "
                "for deterministic stub features"
            )
        return _av_features(av, payload, mtype)
    Image = _pillow()
    if Image is None or not mtype.startswith("image/"):
        raise NotImplementedError(
            "real decode needs Pillow (images) / PyAV (audio+video) — not "
            "available here for this media_type; pass fake=True for "
            "deterministic stub features"
        )
    import io

    with Image.open(io.BytesIO(payload or b"")) as img:
        rgb = img.convert("RGB")
        w, h = rgb.size
        # 4-dim feature: normalized mean R/G/B + aspect ratio
        px = rgb.resize((8, 8))  # bounded work per image
        data = list(px.getdata())
        n = len(data) or 1
        means = [sum(c[i] for c in data) / (255.0 * n) for i in range(3)]
        return {
            "n_bytes": len(payload or b""),
            "content_hash": hashlib.md5(payload or b"").hexdigest(),
            "feature": means + [w / float(h or 1)],
        }


def _av_features(av, payload: bytes, mtype: str) -> dict:
    """Real audio/video features via PyAV.  Video: first keyframe's mean
    R/G/B + aspect ratio (mirrors the Pillow image feature).  Audio: mean
    absolute amplitude of the first decoded frame + normalized sample rate,
    padded to the fixed 4-dim feature width."""
    import io

    with av.open(io.BytesIO(payload or b"")) as container:
        if mtype.startswith("video/"):
            stream = container.streams.video[0]
            stream.codec_context.skip_frame = "NONKEY"
            frame = next(container.decode(stream))
            rgb = frame.to_ndarray(format="rgb24").astype("float64")
            h, w = rgb.shape[0], rgb.shape[1]
            means = [float(rgb[:, :, i].mean()) / 255.0 for i in range(3)]
            feature = means + [w / float(h or 1)]
        else:
            stream = container.streams.audio[0]
            frame = next(container.decode(stream))
            samples = frame.to_ndarray().astype("float64")
            peak = max(abs(float(samples.max())), abs(float(samples.min())), 1.0)
            feature = [
                float(abs(samples).mean()) / peak,
                (stream.rate or 0) / 48000.0,
                float(frame.samples),
                0.0,
            ]
    return {
        "n_bytes": len(payload or b""),
        "content_hash": hashlib.md5(payload or b"").hexdigest(),
        "feature": feature,
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


def _real_frames(av, payload: bytes, max_frames: int):
    """Decode a video container's keyframes via PyAV: (frame_no, md5 of the
    raw rgb24 pixels) per keyframe, capped at ``max_frames``.  skip_frame =
    NONKEY makes the demuxer skip non-key packets — bounded work per row even
    on long clips."""
    import io

    out = []
    with av.open(io.BytesIO(payload or b"")) as container:
        stream = container.streams.video[0]
        stream.codec_context.skip_frame = "NONKEY"
        for n, frame in enumerate(container.decode(stream)):
            if n >= max_frames:
                break
            rgb = frame.to_ndarray(format="rgb24")
            out.append((n, hashlib.md5(rgb.tobytes()).hexdigest()))
    return out


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 1024,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = True,
    max_frames: int = 64,
) -> DataFrame:
    """Sampled frames, one output row per frame: with ``fake=False`` + PyAV
    importable the payload is really demuxed and its keyframes decoded
    (``_real_frames`` — at most ``max_frames`` per row); the deterministic
    fake hashes fixed byte windows instead (test/oracle substrate).  The
    Spark shape is identical either way — one input row fanning out to N
    output rows inside Arrow-batched mapInPandas, payload never emitted."""

    out_ddl = "media_id bigint, frame_no int, frame_hash string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        av = None
        if not fake:
            av = _pyav()
            if av is None:
                raise NotImplementedError(
                    "real frame extraction needs PyAV (libav); pass "
                    "fake=True for the deterministic byte-window stub"
                )
        for pdf in batches:
            ids, frame_nos, hashes = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = payload or b""
                if not fake:
                    for n, h in _real_frames(av, payload, max_frames):
                        ids.append(mid)
                        frame_nos.append(n)
                        hashes.append(h)
                    continue
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
    """Resize/downscale: with ``fake=False`` + Pillow importable, images are
    really decoded and thumbnailed (longest side ≤ ``target_bytes`` px,
    re-encoded PNG); the deterministic fake truncates the payload to
    ``target_bytes`` BYTES (byte-window stand-in, same spirit as
    sample_frames).  The Spark shape is the real part either way:
    Arrow-batched mapInPandas, payload dropped from the output so downstream
    stages shuffle only small rows."""
    out_ddl = (
        "media_id bigint, media_type string, orig_bytes bigint, "
        "resized_bytes bigint, resized_hash string"
    )

    def _real_resize(payload: bytes, mtype: str) -> bytes:
        Image = _pillow()
        if Image is None or not (mtype or "").startswith("image/"):
            raise NotImplementedError(
                "real media resize needs Pillow and an image payload; "
                "pass fake=True for the deterministic byte-window stub"
            )
        import io

        with Image.open(io.BytesIO(payload)) as img:
            img.thumbnail((target_bytes, target_bytes))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            return buf.getvalue()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, types, orig, res, hashes = [], [], [], [], []
            for mid, mtype, payload in zip(
                pdf[id_col], pdf[type_col], pdf[payload_col]
            ):
                payload = payload or b""
                resized = (
                    payload[:target_bytes] if fake else _real_resize(payload, mtype)
                )
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
