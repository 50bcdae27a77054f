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

from spark_signals.checkpoint import pin

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


# The ONE spelling of synthesize_media's synthetic kind mapping for every
# DuckDB twin — an oracle that re-derived it inline could silently drift
# from the Spark mapping below (advisor r9 low #3).
SQL_MEDIA_KIND = (
    "CASE WHEN doc_id % 3 = 0 THEN 'image' "
    "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END"
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from documents.text — the binary
    column is the UTF-8 payload, metadata derives from doc properties. Used
    because the driver's testdata has no true media table; the plumbing is
    identical for real bytes. The kind CASE below is mirrored verbatim by
    ``SQL_MEDIA_KIND`` (pinned equal in tests)."""
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


# ------------------------------------------------ planted-twin parity arm
# The synthetic corpus has no GLOBALLY byte-similar documents (its
# near-dups share prefixes only, which a whole-payload resize rightly
# ignores), so the decoded-grid near-dup face would hash-match on 0 rows
# at every sf — a green that asserts nothing (r10 verdict #2). The parity
# FIXTURE therefore plants deterministic near-dup twins: every TWIN_MOD-th
# sufficiently-long document gets a copy with a 2-char mid-document edit —
# exactly the perturbation the bucket-mean grid is designed to absorb —
# under media_id + TWIN_ID_OFFSET. The offset is divisible by 3 so the
# twin would land on the same synthetic kind as its source either way;
# the kind is still derived from the SOURCE doc_id explicitly. Operator
# code is untouched: planting is a fixture concern, mirrored verbatim in
# the DuckDB twin (sql_media_planted_cte).
TWIN_MOD = 50
TWIN_MIN_CHARS = 400
TWIN_ID_OFFSET = 3_000_000


def synthesize_media_planted(docs: DataFrame) -> DataFrame:
    """``synthesize_media`` plus deterministic near-dup twins (see the
    planted-twin note above). Used by the oracle-compared decoded-grid
    face so the driver artifact proves detection, not just agreement."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    # char-based halves in BOTH engines; 'qq' replaces chars h+1..h+2
    twin_text = F.expr(
        "concat(substring(text, 1, cast(floor(length(text) / 2) AS INT)), 'qq', "
        "substring(text, cast(floor(length(text) / 2) AS INT) + 3))"
    )
    twins = (
        docs.filter(
            (F.col("doc_id") % TWIN_MOD == 0)
            & (F.length("text") >= TWIN_MIN_CHARS)
        )
        .select(
            (F.col("doc_id") + TWIN_ID_OFFSET).alias("media_id"),
            kind.alias("kind"),
            F.encode(twin_text, "utf-8").alias("content"),
            F.struct(
                (F.col("n_chars") % 1920).cast("int").alias("width"),
                (F.col("n_chars") % 1080).cast("int").alias("height"),
                F.lit(16000).alias("sample_rate"),
                (F.col("n_chars") % 300).cast("int").alias("n_frames"),
                F.lit("stub").alias("codec"),
            ).alias("meta"),
        )
    )
    return synthesize_media(docs).unionByName(twins)


def sql_media_planted_cte() -> str:
    """DuckDB body of the planted media relation (media_id, kind, content)
    — the verbatim twin of synthesize_media_planted."""
    return f"""
  SELECT doc_id AS media_id,
         {SQL_MEDIA_KIND} AS kind,
         encode(text) AS content
  FROM documents
  UNION ALL
  SELECT doc_id + {TWIN_ID_OFFSET} AS media_id,
         {SQL_MEDIA_KIND} AS kind,
         encode(substr(text, 1, length(text) // 2) || 'qq'
                || substr(text, length(text) // 2 + 3)) AS content
  FROM documents
  WHERE doc_id % {TWIN_MOD} = 0 AND length(text) >= {TWIN_MIN_CHARS}"""


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
SQL_MEDIA_FEATURES = f"""
WITH hexmap AS (
    SELECT i, printf('%02X', i) AS h FROM range(0, 256) t(i)
),
media AS (
    SELECT doc_id AS media_id,
           {SQL_MEDIA_KIND} AS kind,
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


# ------------------------------------------------- perceptual-hash near-dup
# dHash-style difference hash + banded hamming blocking: bit_i = 1 iff
# byte_i > byte_{i+1} over the first PHASH_BYTES+1 payload bytes (missing
# bytes read as 0), giving a 64-bit signature that is stable under small
# payload edits. Candidates must share one of PHASH_BANDS 8-bit bands
# (pigeonhole: hamming <= PHASH_MAX_HAMMING = PHASH_BANDS - 1 guarantees a
# shared band), then the exact hamming distance verifies candidates only —
# the same blocked, never-O(n²) shape as the text dedup family, applied to
# opaque binary media columns. On real corpora the signature input is the
# DECODED luma/sample grid from the Arrow decode stage (extract_features);
# here it runs on the raw bytes so the stub arithmetic stays oracle-exact —
# the blocking, banding, and verify plumbing are identical either way.
PHASH_BITS = 64
PHASH_BANDS = 8
PHASH_MAX_HAMMING = PHASH_BANDS - 1
# skew guard: a band value shared by more than this many media rows is a
# template/padding artifact (e.g. a constant header); dropping it bounds
# the per-key pair fanout at C(cap, 2) — see WINNOW_FP_MAX_DOCS.
PHASH_BAND_MAX_DOCS = 50
# payload floor: below ~9 bytes the 64-bit signature is mostly the zero
# pad, so two unrelated tiny payloads hash near-identically (advisor r9
# low #2) — such rows carry no dHash evidence and are excluded from
# near-dup entirely (real media is KBs; sub-9-byte "media" is truncation
# debris a curation pass should surface via media_features, not pair up)
PHASH_MIN_BYTES = 9


def media_phash_signatures(media: DataFrame) -> DataFrame:
    """media_id, kind → 64-char '0'/'1' dHash signature, zero-shuffle.

    Byte values come from hex(content) pairs (JVM-side, UDF-free); docs
    shorter than 65 bytes zero-pad, so the operator is total on any binary
    payload.
    """
    bits = PHASH_BITS
    bytes_expr = (
        f"transform(sequence(1, {bits + 1}), j -> CASE WHEN j <= length(content) "
        f"THEN cast(conv(substring(hex(content), 2 * j - 1, 2), 16, 10) AS INT) "
        f"ELSE 0 END)"
    )
    sig = (
        f"array_join(transform(sequence(1, {bits}), i -> "
        f"IF(element_at(bs, i) > element_at(bs, i + 1), '1', '0')), '')"
    )
    return (
        media.select("media_id", "kind", "content")
        .withColumn("bs", F.expr(bytes_expr))
        .select("media_id", "kind", F.expr(sig).alias("sig"))
    )


def media_phash_neardup(
    media: DataFrame,
    max_hamming: int = PHASH_MAX_HAMMING,
    band_max_docs: int = PHASH_BAND_MAX_DOCS,
    min_bytes: int = PHASH_MIN_BYTES,
) -> DataFrame:
    """Near-duplicate media pairs: (media_a, media_b, kind, hamming) with
    hamming <= ``max_hamming`` over the 64-bit dHash. Payloads shorter
    than ``min_bytes`` are excluded up front (zero-pad dominates their
    signature — see PHASH_MIN_BYTES).

    Shape at 100 TB: signatures chain onto the scan (no shuffle), then the
    band long-form aggregates TWICE on (kind, band, band_value): a
    count-only pass whose survivors (2 <= count <= ``band_max_docs``)
    semi-join back, THEN the per-key media list collects over surviving
    keys only — so the ``collect_list`` buffer never materializes a hot
    key (the constant zero-pad band of short payloads, a template header:
    such keys are dropped by the count FILTER before any list exists; the
    count pass is map-side-combined longs, safe at any skew). Pair
    expansion is then a per-row higher-order function over a <= cap
    array, and one groupBy(pair) dedupes. Hamming verification runs on
    candidate pairs only; no aggregation buffer exceeds ``band_max_docs``
    structs.
    """
    sigs = media_phash_signatures(
        media.filter(F.length("content") >= min_bytes)
    )
    # Generate over a cheap literal sequence, band key sliced AFTER the
    # explode: Generate over an HOF-built array re-evaluates its
    # construction per output row (see util.explode_strings), so the
    # signature chain must never be the generator input.
    bands = (
        sigs.select("media_id", "kind", "sig")
        .select(
            "media_id",
            "kind",
            "sig",
            F.explode(F.expr(f"sequence(0, {PHASH_BANDS - 1})")).alias("band"),
        )
        .withColumn("bkey", F.expr("substring(sig, band * 8 + 1, 8)"))
    )
    return _phash_pairs_from_sigs(bands, max_hamming, band_max_docs)


def sql_media_phash_neardup(
    max_hamming: int = PHASH_MAX_HAMMING,
    band_max_docs: int = PHASH_BAND_MAX_DOCS,
    min_bytes: int = PHASH_MIN_BYTES,
) -> str:
    bits = PHASH_BITS
    return f"""
WITH media AS (
  SELECT doc_id AS media_id,
         {SQL_MEDIA_KIND} AS kind,
         encode(text) AS content
  FROM documents
),
hx AS (
  SELECT media_id, kind, octet_length(content) AS n, upper(hex(content)) AS h
  FROM media
  WHERE octet_length(content) >= {min_bytes}
),
sigs AS (
  SELECT media_id, kind,
    array_to_string(list_transform(range(1, {bits + 1}), i ->
      CASE WHEN (CASE WHEN i <= n THEN ('0x' || substr(h, 2 * i - 1, 2))::INT ELSE 0 END)
              > (CASE WHEN i + 1 <= n THEN ('0x' || substr(h, 2 * i + 1, 2))::INT ELSE 0 END)
           THEN '1' ELSE '0' END), '') AS sig
  FROM hx
),
bands AS (
  SELECT media_id, kind, sig, b AS band, substr(sig, b * 8 + 1, 8) AS bkey
  FROM sigs, (SELECT unnest(range(0, {PHASH_BANDS})) AS b)
),
kept AS (
  SELECT kind, band, bkey FROM bands GROUP BY 1, 2, 3
  HAVING COUNT(*) BETWEEN 2 AND {band_max_docs}
),
cand AS (
  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
                  a.kind AS kind, a.sig AS sig_a, b.sig AS sig_b
  FROM bands a
  JOIN bands b ON a.kind = b.kind AND a.band = b.band AND a.bkey = b.bkey
  JOIN kept k ON k.kind = a.kind AND k.band = a.band AND k.bkey = a.bkey
  WHERE a.media_id < b.media_id
),
scored AS (
  SELECT media_a, media_b, kind,
    len(list_filter(range(1, {bits + 1}),
        i -> substr(sig_a, i, 1) <> substr(sig_b, i, 1))) AS hamming
  FROM cand
)
SELECT media_a, media_b, kind, CAST(hamming AS INT) AS hamming
FROM scored WHERE hamming <= {max_hamming}"""


# ---------------------------------------------- decoded-grid near-dup path
# The PRODUCTION dHash input: real perceptual hashing signs the DECODED
# sample grid (grayscale-resized pixels / PCM samples), not container
# bytes — container re-encodes (quality change, metadata strip) rewrite
# the bytes but barely move the decoded grid. extract_sample_grid is the
# Arrow decode stage that emits a fixed GRID_BYTES-long luma/sample grid
# per row (real codec when available and the payload decodes, else the
# deterministic stride-sample stub, status-tagged like decode_media), and
# media_phash_neardup_decoded chains the standard JVM-side banded dHash
# over that grid — decode is the ONLY Python stage; blocking, banding and
# verify stay whole-stage-codegen exactly as in the raw-byte path.
GRID_BYTES = PHASH_BITS + 1

GRID_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("grid", T.BinaryType(), False),
        T.StructField("grid_status", T.StringType(), False),
    ]
)


def _stub_grid(content: bytes, n_cells: int = GRID_BYTES) -> bytes:
    """Deterministic decode stand-in modeling a real area-average resize:
    cell c is the INTEGER mean of the payload bytes in its bucket
    [c*n//cells, (c+1)*n//cells) — averaging is what makes real dHash
    robust to small edits (a point-sample grid shifts wholesale on any
    insertion; bucket means barely move), and integer floor-division
    keeps the DuckDB twin bit-exact. Payloads shorter than the grid fall
    back to evenly-strided point samples; empty payloads yield an empty
    grid."""
    n = len(content)
    if n == 0:
        return b""
    if n < n_cells:
        return bytes(content[(i * (n - 1)) // (n_cells - 1)] for i in range(n_cells))
    out = []
    for c in range(n_cells):
        lo, hi = (c * n) // n_cells, ((c + 1) * n) // n_cells
        bucket = content[lo:hi]
        out.append(sum(bucket) // len(bucket))
    return bytes(out)


def _real_grid(content: bytes, kind: str, n_cells: int = GRID_BYTES) -> bytes:
    """Decoded luma/sample grid via the real codec for ``kind`` — raises
    on any decode problem (caller falls back to the stub)."""
    from io import BytesIO

    if kind == "image":
        from PIL import Image

        with Image.open(BytesIO(content)) as img:
            return img.convert("L").resize((n_cells, 1)).tobytes()
    if kind == "audio":
        import wave

        with wave.open(BytesIO(content), "rb") as w:
            frames = w.readframes(w.getnframes())
        if not frames:
            raise ValueError("no audio frames")
        # first byte of each sample frame, stride-sampled to the grid
        step = max(w.getsampwidth() * w.getnchannels(), 1)
        samples = frames[::step]
        return _stub_grid(samples, n_cells)
    raise ValueError(f"no grid decoder for kind={kind}")


def extract_sample_grid(
    media: DataFrame, *, force_stub: bool = False
) -> DataFrame:
    """media → (media_id, kind, grid, grid_status): the decode stage of
    the decoded-grid near-dup path, one Arrow batch in/out, no shuffle
    (chains onto the scan like extract_features). ``force_stub`` pins the
    stub for oracle-compared paths, same contract as extract_features."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                content = bytes(row.content)
                grid, status = None, "stub"
                if not force_stub and row.kind in REAL_CODECS:
                    try:
                        grid, status = _real_grid(content, row.kind), "real"
                    except Exception:
                        grid = None
                if grid is None:
                    grid = _stub_grid(content)
                out.append(
                    {
                        "media_id": row.media_id,
                        "kind": row.kind,
                        "grid": grid,
                        "grid_status": status,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in GRID_SCHEMA.fields])

    return media.mapInPandas(process, GRID_SCHEMA)


def media_phash_neardup_decoded(
    media: DataFrame,
    max_hamming: int = PHASH_MAX_HAMMING,
    band_max_docs: int = PHASH_BAND_MAX_DOCS,
    min_bytes: int = PHASH_MIN_BYTES,
    *,
    force_stub: bool = False,
) -> DataFrame:
    """Near-duplicate media pairs over the DECODED grid — the production
    face of media_phash_neardup: (media_a, media_b, kind, hamming).

    Shape at 100 TB: one embarrassingly-parallel Arrow decode pass
    (per-row cost is the codec, peak memory O(batch)), then the identical
    banded blocking as the raw-byte operator. The PAYLOAD floor applies
    BEFORE decoding, same rationale as the raw path: a sub-``min_bytes``
    payload stretches into a near-constant grid, and two unrelated tiny
    payloads would hash identically (all-zero signature) and fake a
    hamming-0 pair — such rows carry no dHash evidence either way. The
    band-frequency cap still drops constant-grid template keys among the
    surviving rows."""
    grids = extract_sample_grid(
        media.filter(F.length("content") >= min_bytes), force_stub=force_stub
    )
    return media_phash_neardup(
        grids.select("media_id", "kind", F.col("grid").alias("content")),
        max_hamming,
        band_max_docs,
        min_bytes=1,  # grids are fixed-length once the payload floor passed
    )


def _sql_decoded_bands_ctes(min_bytes: int, *, planted: bool = False) -> str:
    """media → hx → grids → sigs → bands as one CTE chunk — THE spelling
    of the decoded-grid signature chain, shared by the pair oracle
    (sql_media_phash_neardup_decoded) and the incremental snapshot oracle
    (sql_media_phash_incr_snapshot) so the two twins can never drift."""
    bits = PHASH_BITS
    cells = GRID_BYTES
    # 1-based hex lookup of 0-based payload position p: substr(h, 2*p+1, 2)
    byte_at = lambda p: f"('0x' || substr(h, 2 * ({p}) + 1, 2))::INT"  # noqa: E731
    # long payloads: cell c = integer mean of bytes in [c*n//cells, (c+1)*n//cells)
    bucket_mean = (
        f"list_aggregate(list_transform("
        f"range((c * n) // {cells}, ((c + 1) * n) // {cells}), "
        f"p -> {byte_at('p')}), 'sum') "
        f"// (((c + 1) * n) // {cells} - (c * n) // {cells})"
    )
    # short payloads: evenly-strided point samples (matches _stub_grid)
    point_sample = byte_at(f"(c * (n - 1)) // {cells - 1}")
    media_body = (
        sql_media_planted_cte()
        if planted
        else f"""
  SELECT doc_id AS media_id,
         {SQL_MEDIA_KIND} AS kind,
         encode(text) AS content
  FROM documents"""
    )
    return f"""media AS ({media_body}
),
hx AS (
  SELECT media_id, kind, octet_length(content) AS n, upper(hex(content)) AS h
  FROM media
  WHERE octet_length(content) >= {min_bytes}
),
grids AS (
  SELECT media_id, kind,
    CASE WHEN n >= {cells}
         THEN list_transform(range(0, {cells}), c -> {bucket_mean})
         ELSE list_transform(range(0, {cells}), c -> {point_sample}) END AS g
  FROM hx
),
sigs AS (
  SELECT media_id, kind,
    array_to_string(list_transform(range(1, {bits + 1}),
      i -> CASE WHEN g[i] > g[i + 1] THEN '1' ELSE '0' END), '') AS sig
  FROM grids
),
bands AS (
  SELECT media_id, kind, sig, b AS band, substr(sig, b * 8 + 1, 8) AS bkey
  FROM sigs, (SELECT unnest(range(0, {PHASH_BANDS})) AS b)
)"""


def sql_media_phash_neardup_decoded(
    max_hamming: int = PHASH_MAX_HAMMING,
    band_max_docs: int = PHASH_BAND_MAX_DOCS,
    min_bytes: int = PHASH_MIN_BYTES,
    *,
    planted: bool = False,
) -> str:
    """Oracle twin of the STUB branch of media_phash_neardup_decoded
    (force_stub=True): the bucket-mean grid is exact integer arithmetic
    over hex(content) (sum // width, mirroring _stub_grid), then the same
    sig/band/kept/cand/score chain as sql_media_phash_neardup.

    ``planted=True`` swaps in the planted-twin media relation
    (sql_media_planted_cte) — the driver face uses this so the artifact
    records detected pairs instead of a vacuous 0-row agreement."""
    bits = PHASH_BITS
    return f"""
WITH {_sql_decoded_bands_ctes(min_bytes, planted=planted)},
kept AS (
  SELECT kind, band, bkey FROM bands GROUP BY 1, 2, 3
  HAVING COUNT(*) BETWEEN 2 AND {band_max_docs}
),
cand AS (
  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
                  a.kind AS kind, a.sig AS sig_a, b.sig AS sig_b
  FROM bands a
  JOIN bands b ON a.kind = b.kind AND a.band = b.band AND a.bkey = b.bkey
  JOIN kept k ON k.kind = a.kind AND k.band = a.band AND k.bkey = a.bkey
  WHERE a.media_id < b.media_id
),
scored AS (
  SELECT media_a, media_b, kind,
    len(list_filter(range(1, {bits + 1}),
        i -> substr(sig_a, i, 1) <> substr(sig_b, i, 1))) AS hamming
  FROM cand
)
SELECT media_a, media_b, kind, CAST(hamming AS INT) AS hamming
FROM scored WHERE hamming <= {max_hamming}"""


# ------------------------------------------- incremental media near-dup
# The media twin of dedup.dedup_incremental_neardup (text) — continuous
# media ingestion against a PERSISTED decoded-grid dHash band index, so a
# nightly media drop near-dups against the whole admitted history in
# O(batch) work, never a history re-decode. One structural improvement
# over the text lane: a dHash signature is 64 bits, so the index rows
# carry the FULL signature — historical verification is pure index
# arithmetic (hamming on the joined rows) and the historical PAYLOADS are
# never read at all (the text lane must re-shingle candidate docs; media
# candidates cost zero storage reads beyond the index itself). At
# warehouse scale store the index bucketed on (kind, band, bkey) so the
# batch probe shuffles only the batch side.
PHASH_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("band", T.IntegerType(), False),
        T.StructField("bkey", T.StringType(), False),
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sig", T.StringType(), False),
    ]
)


def _grid_bands(
    media: DataFrame, min_bytes: int, *, force_stub: bool = False
) -> DataFrame:
    """(media_id, kind, sig, band, bkey): decoded-grid dHash band rows —
    payload floor BEFORE decode, then the standard signature/band slicing
    (the exact chain media_phash_neardup_decoded blocks on)."""
    grids = extract_sample_grid(
        media.filter(F.length("content") >= min_bytes), force_stub=force_stub
    )
    sigs = media_phash_signatures(
        grids.select("media_id", "kind", F.col("grid").alias("content"))
    )
    return (
        sigs.select(
            "media_id",
            "kind",
            "sig",
            F.explode(F.expr(f"sequence(0, {PHASH_BANDS - 1})")).alias("band"),
        )
        .withColumn("bkey", F.expr("substring(sig, band * 8 + 1, 8)"))
    )


def media_phash_index(
    media: DataFrame,
    min_bytes: int = PHASH_MIN_BYTES,
    *,
    force_stub: bool = False,
) -> DataFrame:
    """The persistable decoded-grid band index of a media snapshot:
    (kind, band, bkey, media_id, sig), PHASH_BANDS rows per admitted
    media row."""
    return _grid_bands(media, min_bytes, force_stub=force_stub).select(
        "kind", "band", "bkey", "media_id", "sig"
    )


def media_phash_incremental(
    new_media: DataFrame,
    index: DataFrame,
    max_hamming: int = PHASH_MAX_HAMMING,
    band_max_docs: int = PHASH_BAND_MAX_DOCS,
    min_bytes: int = PHASH_MIN_BYTES,
    *,
    force_stub: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Near-dup an incoming media batch against a persisted dHash band
    index without re-decoding history. Returns ``(survivors,
    index_delta)``:

    * ``survivors`` — batch rows whose decoded grid verified (hamming >
      ``max_hamming``) against every historical index candidate and every
      smaller-media_id batch row (greedy first-wins, the deterministic
      rule of the batch operator).
    * ``index_delta`` — the survivors' band+signature rows to APPEND.

    Shape at 100 TB: ONE Arrow decode pass over the batch (payload floor
    first), band rows probe the index by (kind, band, bkey) equi-join —
    with the index bucketed on that key, only the batch side shuffles —
    and verification is hamming arithmetic on the candidate rows' carried
    signatures: history is touched only through the index. Within-batch
    pairs reuse media_phash_neardup's count-capped banding, so no
    aggregation buffer exceeds ``band_max_docs``. Idempotent: replaying
    an admitted batch against the updated index yields zero survivors
    (every row hamming-0-matches its own index entry).
    """
    bands_b = _grid_bands(new_media, min_bytes, force_stub=force_stub).persist()
    try:
        hamming = F.expr(
            f"aggregate(sequence(1, {PHASH_BITS}), 0, (acc, i) -> "
            f"acc + IF(substring(sig_new, i, 1) = substring(sig_old, i, 1), 0, 1))"
        )
        hist_dups = (
            bands_b.join(
                index.select(
                    "kind", "band", "bkey", F.col("sig").alias("sig_old")
                ),
                ["kind", "band", "bkey"],
            )
            .select(
                F.col("media_id").alias("media_new"),
                F.col("sig").alias("sig_new"),
                "sig_old",
            )
            .distinct()
            .filter(hamming <= max_hamming)
            .select(F.col("media_new").alias("media_id"))
            .distinct()
        )
        # within-batch: greedy first-wins over the batch's own grids —
        # media_b of every verified pair drops; the band/verify chain runs
        # directly on the already-computed signature relation
        batch_pairs = _phash_pairs_from_sigs(
            bands_b.select("media_id", "kind", "sig", "band", "bkey"),
            max_hamming,
            band_max_docs,
        )
        batch_dups = batch_pairs.select(
            F.col("media_b").alias("media_id")
        ).distinct()
        drops = hist_dups.unionByName(batch_dups).distinct()
        survivors = new_media.join(drops, "media_id", "left_anti").transform(pin)
        delta = (
            bands_b.join(survivors.select("media_id"), "media_id", "left_semi")
            .select("kind", "band", "bkey", "media_id", "sig")
            .transform(pin)
        )
        return survivors, delta
    finally:
        bands_b.unpersist()


def _phash_pairs_from_sigs(
    band_rows: DataFrame, max_hamming: int, band_max_docs: int
) -> DataFrame:
    """(media_a, media_b, kind, hamming) pairs from pre-computed band rows
    — the count-capped collect/expand/verify core of media_phash_neardup,
    factored so the incremental path shares ONE pairing discipline with
    the batch operator instead of re-deriving it."""
    kept_keys = (
        band_rows.groupBy("kind", "band", "bkey")
        .agg(F.count(F.lit(1)).alias("n_docs_key"))
        .filter((F.col("n_docs_key") >= 2) & (F.col("n_docs_key") <= band_max_docs))
        .select("kind", "band", "bkey")
    )
    grouped = (
        band_rows.join(kept_keys, ["kind", "band", "bkey"], "left_semi")
        .groupBy("kind", "band", "bkey")
        .agg(F.sort_array(F.collect_list(F.struct("media_id", "sig"))).alias("ds"))
    )
    pair_arr = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds) - i - 1), "
        "y -> struct(x.media_id AS media_a, x.sig AS sig_a, "
        "y.media_id AS media_b, y.sig AS sig_b))))"
    )
    cand = (
        grouped.select("kind", F.explode(pair_arr).alias("p"))
        .select("kind", "p.*")
        .groupBy("media_a", "media_b")
        .agg(
            F.min("kind").alias("kind"),
            F.min("sig_a").alias("sig_a"),
            F.min("sig_b").alias("sig_b"),
        )
    )
    hamming = F.expr(
        f"aggregate(sequence(1, {PHASH_BITS}), 0, (acc, i) -> "
        f"acc + IF(substring(sig_a, i, 1) = substring(sig_b, i, 1), 0, 1))"
    )
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("media_a", "media_b", "kind", "hamming")
    )


# Driver-checkable face of the incremental media lane: snapshot/batch
# split by media_id mod — the PLANTED media relation so both drop paths
# carry evidence at sf0.01 (a planted twin whose source landed in the
# snapshot exercises the history probe; a twin sharing the batch with its
# source exercises the within-batch rule). The batch is the upper mod
# range because the twin offset shifts media_id by 3 mod 7 — a same-side
# split (any mod dividing TWIN_ID_OFFSET) would never separate a twin
# from its source.
MEDIA_INCR_SPLIT_MOD = 7
MEDIA_INCR_BATCH_MIN = 4  # batch = media_id % MOD >= this; snapshot below


def media_phash_incr_snapshot(docs: DataFrame) -> DataFrame:
    """(media_id, kind, n_bytes): the incremental media lane's batch
    SURVIVORS under the deterministic snapshot/batch split — the same
    checked-face convention as dedup_incr_neardup_snapshot."""
    media = synthesize_media_planted(docs)
    mod = F.col("media_id") % MEDIA_INCR_SPLIT_MOD
    snap = media.filter(mod < MEDIA_INCR_BATCH_MIN)
    batch = media.filter(mod >= MEDIA_INCR_BATCH_MIN)
    idx = media_phash_index(snap, force_stub=True)
    survivors, _delta = media_phash_incremental(batch, idx, force_stub=True)
    return survivors.select(
        "media_id", "kind", F.length("content").cast("bigint").alias("n_bytes")
    )


def sql_media_phash_incr_snapshot(
    max_hamming: int = PHASH_MAX_HAMMING,
    band_max_docs: int = PHASH_BAND_MAX_DOCS,
    min_bytes: int = PHASH_MIN_BYTES,
) -> str:
    """DuckDB mirror of :func:`media_phash_incr_snapshot`: the shared
    decoded-bands chain over the planted media relation, split into
    snapshot/batch band rows, then the exact drop rules of
    media_phash_incremental — uncapped history probe (distinct
    (new, sig_new, sig_old) triples, hamming verify) plus the count-capped
    within-batch pair chain — and the batch anti-join."""
    bits = PHASH_BITS
    ham = lambda a, b: (  # noqa: E731
        f"len(list_filter(range(1, {bits + 1}), "
        f"i -> substr({a}, i, 1) <> substr({b}, i, 1)))"
    )
    mod, lo = MEDIA_INCR_SPLIT_MOD, MEDIA_INCR_BATCH_MIN
    return f"""
WITH {_sql_decoded_bands_ctes(min_bytes, planted=True)},
snapb AS (SELECT * FROM bands WHERE media_id % {mod} < {lo}),
batchb AS (SELECT * FROM bands WHERE media_id % {mod} >= {lo}),
histdrop AS (
  SELECT DISTINCT media_new AS media_id FROM (
    SELECT DISTINCT b.media_id AS media_new, b.sig AS sig_new, s.sig AS sig_old
    FROM batchb b
    JOIN snapb s ON b.kind = s.kind AND b.band = s.band AND b.bkey = s.bkey
  ) WHERE {ham("sig_new", "sig_old")} <= {max_hamming}
),
keptb AS (
  SELECT kind, band, bkey FROM batchb GROUP BY 1, 2, 3
  HAVING COUNT(*) BETWEEN 2 AND {band_max_docs}
),
candb AS (
  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
                  a.sig AS sig_a, b.sig AS sig_b
  FROM batchb a
  JOIN batchb b ON a.kind = b.kind AND a.band = b.band AND a.bkey = b.bkey
  JOIN keptb k ON k.kind = a.kind AND k.band = a.band AND k.bkey = a.bkey
  WHERE a.media_id < b.media_id
),
batchdrop AS (
  SELECT DISTINCT media_b AS media_id FROM candb
  WHERE {ham("sig_a", "sig_b")} <= {max_hamming}
),
drops AS (SELECT media_id FROM histdrop UNION SELECT media_id FROM batchdrop)
SELECT m.media_id, m.kind, CAST(octet_length(m.content) AS BIGINT) AS n_bytes
FROM media m
WHERE m.media_id % {mod} >= {lo}
  AND m.media_id NOT IN (SELECT media_id FROM drops)"""
