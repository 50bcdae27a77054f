"""Feature-hashed text embeddings + the chunk→embed→index composition.

``hash_embed`` is the hashing trick (Weinberger et al. 2009, "Feature
Hashing for Large Scale Multitask Learning"): each word hashes to one of
``dim`` buckets with a ±1 sign, the vector is the signed bucket counts,
L2-normalized. It is a real sparse-projection bag-of-words embedding —
cosine between hash-embeddings approximates token-overlap similarity — and
it is exactly the kind of column a neural embedder would later replace:
the index build, cell training, and ANN probing downstream are embedding-
agnostic (same contract as the multimodal stub decoder: the pluggable
stage is isolated, the Spark plumbing is real and tested).

Scale shape: explode → one md5 per word → groupBy (key, bucket) integer
sums (map-side combined) → one groupBy (key) assembling the dim-array from
a bucket map. Two hash shuffles carrying ints, no UDFs; normalization is a
per-row pass gridded to 1e-6 so the vectors are engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_signals.datapipe.text import words_col
from spark_signals.datapipe.util import explode_strings, spread_small_input

EMBED_DIM = 64
# chunk vec_id = doc_id * CHUNK_KEY_BASE + chunk_index; chunking at
# stride >= 1 over documents bounds chunk_index far below this
CHUNK_KEY_BASE = 1_000_000


def hash_embed(
    df: DataFrame, text_col: str = "text", key_cols: tuple[str, ...] = ("doc_id",),
    dim: int = EMBED_DIM,
) -> DataFrame:
    """key_cols → ``embedding array<float>`` (L2-normalized, 1e-6 grid).

    Bucket = first 8 md5 hex chars mod dim; sign = parity of the 9th hex
    nibble — one md5 per token, both derivable identically in DuckDB.
    Token-free rows get the zero vector (guarded normalization).
    """
    words = explode_strings(
        df.select(*key_cols, words_col(F.col(text_col)).alias("words")),
        F.col("words"),
        "word",
        *key_cols,
    ).filter(F.col("word") != "")
    hashed = words.select(
        *key_cols,
        (
            F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long")
            % F.lit(dim)
        ).alias("bucket"),
        F.when(
            F.conv(F.substring(F.md5("word"), 9, 1), 16, 10).cast("long") % 2 == 0,
            F.lit(1),
        ).otherwise(F.lit(-1)).alias("sign"),
    )
    sums = hashed.groupBy(*key_cols, "bucket").agg(F.sum("sign").alias("v"))
    assembled = (
        sums.groupBy(*key_cols)
        .agg(F.map_from_entries(F.collect_list(F.struct("bucket", "v"))).alias("m"))
        .select(
            *key_cols,
            F.expr(
                f"transform(sequence(0, {dim - 1}), d -> "
                "cast(coalesce(element_at(m, cast(d as bigint)), 0) as double))"
            ).alias("raw"),
        )
    )
    norm = F.sqrt(F.expr("aggregate(raw, 0D, (s, v) -> s + v * v)"))
    unit = F.expr(
        "transform(raw, v -> cast(floor(v / greatest(nrm, 1e-300) * 1e6 + 0.5000001) / 1e6 as float))"
    )
    return assembled.withColumn("nrm", norm).select(
        *key_cols, unit.alias("embedding")
    )


def embed_chunks(docs: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """chunk → hash-embed: (vec_id, doc_id, chunk_index, embedding), with
    vec_id = doc_id·CHUNK_KEY_BASE + chunk_index so the relation drops
    straight into the ANN operators (they key on a single bigint)."""
    from spark_signals.datapipe.chunk import chunk_documents

    chunks = chunk_documents(spread_small_input(docs))
    emb = hash_embed(
        chunks, text_col="chunk_text", key_cols=("doc_id", "chunk_index"), dim=dim
    )
    return emb.select(
        (F.col("doc_id") * CHUNK_KEY_BASE + F.col("chunk_index")).alias("vec_id"),
        "doc_id",
        "chunk_index",
        "embedding",
    )


def embed_chunks_parity(docs: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """Scalar parity projection of :func:`embed_chunks` — the oracle/driver
    compare hashes CELLS, and array cells are representation-fragile across
    pandas materializations, so the vector is summarized as exact scalars:
    an md5 over the gridded integer components (components are k/1e6 on the
    1e-6 grid; float32 storage round-trips k exactly for |k| ≤ 1e6 ≪ 2^24,
    so floor(v·1e6 + 0.5) recovers k bit-identically in both engines),
    plus the nonzero count and the gridded L1 mass."""
    emb = embed_chunks(docs, dim)
    comps = F.expr("transform(embedding, v -> cast(floor(v * 1e6 + 0.5D) as bigint))")
    return emb.select(
        "vec_id",
        "doc_id",
        "chunk_index",
        F.md5(F.concat_ws(",", comps)).alias("emb_digest"),
        F.expr("size(filter(embedding, v -> v != 0F))").alias("emb_nnz"),
        F.expr(
            "aggregate(transform(embedding, v -> abs(cast(floor(v * 1e6 + 0.5D) as bigint))), 0L, (s, v) -> s + v)"
        ).alias("emb_l1_u"),
    )


def sql_embed_chunks_parity(dim: int = EMBED_DIM) -> str:
    return f"""
WITH e AS ({sql_embed_chunks(dim)}),
g AS (
  SELECT vec_id, doc_id, chunk_index,
         list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS comps,
         embedding
  FROM e
)
SELECT vec_id, doc_id, chunk_index,
       md5(array_to_string(comps, ',')) AS emb_digest,
       CAST(len(list_filter(embedding, v -> v <> 0)) AS INT) AS emb_nnz,
       CAST(list_sum(list_transform(comps, v -> abs(v))) AS BIGINT) AS emb_l1_u
FROM g"""


def sql_embed_chunks(dim: int = EMBED_DIM) -> str:
    from spark_signals.datapipe.chunk import sql_chunk_documents

    return f"""
WITH chunks AS ({sql_chunk_documents()}),
w AS (
  SELECT doc_id, chunk_index,
         unnest(list_filter(string_split(chunk_text, ' '), x -> x <> '')) AS word
  FROM chunks
),
h AS (
  SELECT doc_id, chunk_index,
         ('0x' || substring(md5(word), 1, 8))::BIGINT % {dim} AS bucket,
         CASE WHEN ('0x' || substring(md5(word), 9, 1))::BIGINT % 2 = 0 THEN 1 ELSE -1 END AS sign
  FROM w
),
s AS (
  SELECT doc_id, chunk_index, bucket, SUM(sign) AS v
  FROM h GROUP BY doc_id, chunk_index, bucket
),
a AS (
  SELECT doc_id, chunk_index, map_from_entries(list(row(bucket, v))) AS m
  FROM s GROUP BY doc_id, chunk_index
),
r AS (
  -- DuckDB map extraction m[d] yields a LIST (empty when absent): [1]
  -- unwraps it, COALESCE supplies the zero bucket
  SELECT doc_id, chunk_index,
         list_transform(range(0, {dim}), d -> CAST(COALESCE(m[d][1], 0) AS DOUBLE)) AS raw
  FROM a
),
n AS (
  SELECT doc_id, chunk_index, raw,
         sqrt(list_sum(list_transform(raw, v -> v * v))) AS nrm
  FROM r
)
SELECT CAST(doc_id * {CHUNK_KEY_BASE} + chunk_index AS BIGINT) AS vec_id,
       doc_id, CAST(chunk_index AS INT) AS chunk_index,
       list_transform(raw, v -> CAST(floor(v / greatest(nrm, 1e-300) * 1e6 + 0.5000001) / 1e6 AS FLOAT)) AS embedding
FROM n"""
