"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with a typed metadata struct, the
standard layout for multimodal training corpora at warehouse scale:

    media(media_id long, kind string, content binary,
          meta struct<width int, height int, sample_rate int,
                      n_frames int, codec string>)

Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages — the Spark-side contract (schema, batch shape,
partition pass-through) is real and tested. Codecs auto-detect at import:
PIL (image) and cv2 (video) are used when importable, the stdlib ``wave``
module (audio) is always real, and anything undetected or undecodable
falls back to a deterministic, clearly-marked stub (``_decode_stub``) so
the operator is total and the oracle stays exact on synthetic payloads.
Batches stream through Arrow, so peak memory is O(batch), not
O(partition), and the stage is embarrassingly parallel — partition count
alone governs 100 TB throughput.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_digest", T.StringType(), False),
        T.StructField("decoded_width", T.IntegerType(), True),
        T.StructField("decoded_height", T.IntegerType(), True),
        T.StructField("sampled_frames", T.IntegerType(), True),
        T.StructField("feature_norm", T.DoubleType(), True),
        # provenance: 'real' = an actual codec decoded the payload,
        # 'stub' = deterministic fallback — consumers can filter out
        # undecodable media instead of trusting fabricated dimensions
        T.StructField("decode_status", T.StringType(), False),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from documents.text — the binary
    column is the UTF-8 payload, metadata derives from doc properties. Used
    because the driver's testdata has no true media table; the plumbing is
    identical for real bytes."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            (F.col("n_chars") % 1920).cast("int").alias("width"),
            (F.col("n_chars") % 1080).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") % 300).cast("int").alias("n_frames"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )


def _decode_stub(content: bytes, kind: str) -> dict:
    """STUB decoder — deterministic fake in place of PIL/ffmpeg/librosa.

    Real deployments replace this with the actual codec; everything around
    it (Arrow batching, schema, partitioning) is production-shaped. The fake
    derives stable pseudo-features from the bytes so tests are exact.
    """
    n = len(content)
    checksum = sum(content[:64]) if n else 0
    if kind == "image":
        return {"width": (checksum % 64) + 1, "height": (n % 64) + 1, "frames": None}
    if kind == "video":
        return {"width": (checksum % 32) + 1, "height": (n % 32) + 1, "frames": (n % 300) + 1}
    return {"width": None, "height": None, "frames": None}


def _decode_image_pil(content: bytes) -> dict:
    from io import BytesIO

    from PIL import Image

    with Image.open(BytesIO(content)) as img:
        if img.width <= 0 or img.height <= 0:
            raise ValueError("degenerate image dimensions")
        return {"width": int(img.width), "height": int(img.height), "frames": None}


def _decode_audio_wave(content: bytes) -> dict:
    """Real WAV decode via the stdlib ``wave`` module — always available."""
    import wave
    from io import BytesIO

    with wave.open(BytesIO(content), "rb") as w:
        return {"width": None, "height": None, "frames": int(w.getnframes())}


def _decode_video_cv2(content: bytes) -> dict:
    import tempfile

    import cv2

    with tempfile.NamedTemporaryFile(suffix=".bin") as f:
        f.write(content)
        f.flush()
        cap = cv2.VideoCapture(f.name)
        try:
            if not cap.isOpened():
                raise ValueError("cv2 cannot open payload")
            w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
            # some cv2 backends report isOpened()=True for unreadable
            # payloads but return 0 properties — that's a failed decode,
            # not a 0×0 video
            if w <= 0 or h <= 0 or n <= 0:
                raise ValueError("cv2 opened payload but decoded no frames")
            return {"width": w, "height": h, "frames": n}
        finally:
            cap.release()


def _detect_codecs() -> dict:
    """Probe for real codecs at import time; absent libraries simply leave
    that kind on the stub. The stdlib `wave` audio path is always real."""
    codecs: dict = {"audio": _decode_audio_wave}
    try:  # pragma: no cover - environment-dependent
        from PIL import Image  # noqa: F401

        codecs["image"] = _decode_image_pil
    except ImportError:
        pass
    try:  # pragma: no cover - environment-dependent
        import cv2  # noqa: F401

        codecs["video"] = _decode_video_cv2
    except ImportError:
        pass
    return codecs


REAL_CODECS = _detect_codecs()


def decode_media(content: bytes, kind: str, *, force_stub: bool = False) -> dict:
    """Real codec when one is detected AND the payload actually decodes;
    deterministic stub otherwise. Fallback (not failure) on undecodable
    bytes keeps the operator total — corrupt media in a 100 TB corpus must
    degrade to a row, not kill the stage — and the returned ``status``
    ('real'/'stub') records the provenance so consumers can filter rather
    than trust fabricated dimensions. The broad catch is deliberate for the
    same reason (codecs raise heterogeneous error types on corrupt bytes);
    the status column is what keeps the swallowing honest.
    """
    codec = None if force_stub else REAL_CODECS.get(kind)
    if codec is not None:
        try:
            return {**codec(content), "status": "real"}
        except Exception:
            pass
    return {**_decode_stub(content, kind), "status": "stub"}


def extract_features(
    media: DataFrame, target_frames: int = 8, *, force_stub: bool = False
) -> DataFrame:
    """Decode → resize → frame-sample → featurize as one mapInPandas stage.

    One Arrow batch in, one batch out; no shuffle — this chains onto the
    scan. Frame sampling keeps min(n_frames, target_frames).

    ``force_stub=True`` pins every row to the deterministic stub decoder
    regardless of which real codecs this process can import — required for
    any oracle-compared path, because REAL_CODECS is probed per-process and
    the DuckDB oracle models only the stub arithmetic; without the pin,
    a payload that happens to decode under an installed codec (or a
    driver/executor codec-availability skew) silently breaks hash parity.
    """
    import hashlib

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                content = bytes(row.content)
                decoded = decode_media(content, row.kind, force_stub=force_stub)
                frames = decoded["frames"]
                out.append(
                    {
                        "media_id": row.media_id,
                        "kind": row.kind,
                        "n_bytes": len(content),
                        "content_digest": hashlib.md5(content).hexdigest(),
                        "decoded_width": decoded["width"],
                        "decoded_height": decoded["height"],
                        "sampled_frames": None if frames is None else min(frames, target_frames),
                        "feature_norm": float(sum(content[:32])) / 255.0 if content else 0.0,
                        "decode_status": decoded["status"],
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(process, FEATURE_SCHEMA)


# DuckDB oracle for the stub feature pipeline: every stub feature (byte
# length, md5 digest, first-64-byte checksum arithmetic, frame sampling,
# first-32-byte norm) is exactly expressible over the same utf-8 payload.
# Bytes are recovered from hex(content) via a 256-row printf lookup; the
# integer sums and the final /255.0 division are exact IEEE, so no rounding
# gate is needed.
SQL_MEDIA_FEATURES = """
WITH hexmap AS (
    SELECT i, printf('%02X', i) AS h FROM range(0, 256) t(i)
),
media AS (
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS kind,
           text AS txt,
           encode(text) AS content
    FROM documents
),
sized AS (
    SELECT media_id, kind, txt,
           octet_length(content) AS n_bytes,
           upper(hex(content)) AS hx
    FROM media
),
head_bytes AS (
    SELECT s.media_id, p.p, m.i AS byte_val
    FROM sized s
    JOIN range(1, 65) p(p) ON p.p <= s.n_bytes
    JOIN hexmap m ON m.h = substr(s.hx, 2 * p.p - 1, 2)
),
checks AS (
    SELECT media_id,
           SUM(byte_val) AS checksum64,
           SUM(CASE WHEN p <= 32 THEN byte_val ELSE 0 END) AS checksum32
    FROM head_bytes GROUP BY media_id
)
SELECT s.media_id,
       s.kind,
       CAST(s.n_bytes AS BIGINT) AS n_bytes,
       md5(s.txt) AS content_digest,
       CASE s.kind WHEN 'image' THEN CAST((COALESCE(c.checksum64, 0) % 64) + 1 AS INTEGER)
                   WHEN 'video' THEN CAST((COALESCE(c.checksum64, 0) % 32) + 1 AS INTEGER)
       END AS decoded_width,
       CASE s.kind WHEN 'image' THEN CAST((s.n_bytes % 64) + 1 AS INTEGER)
                   WHEN 'video' THEN CAST((s.n_bytes % 32) + 1 AS INTEGER)
       END AS decoded_height,
       CASE s.kind WHEN 'video' THEN CAST(LEAST((s.n_bytes % 300) + 1, 8) AS INTEGER)
       END AS sampled_frames,
       CASE WHEN s.n_bytes > 0
            THEN CAST(COALESCE(c.checksum32, 0) AS DOUBLE) / CAST(255.0 AS DOUBLE)
            ELSE CAST(0.0 AS DOUBLE) END AS feature_norm,
       'stub' AS decode_status
FROM sized s LEFT JOIN checks c USING (media_id)
"""
# ^ decode_status is constant 'stub' in the oracle because the synthetic
# payloads are UTF-8 text that no real codec accepts (wave needs RIFF magic,
# PIL/cv2 need container headers) — every row takes the fallback path.


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_signals.io.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    # force_stub: this is the oracle-compared entry; SQL_MEDIA_FEATURES
    # models only the stub branch (decode_status='stub'), so real-codec
    # autodetection must not leak in here. Production feature extraction
    # should call extract_features() directly without the pin.
    return extract_features(synthesize_media(docs), force_stub=True)
