"""Overlapping document chunking — the retrieval/embedding-prep face of the
corpus: long documents split into fixed-size word windows with overlap, the
unit RAG indexes and embedding models actually consume.

Whitespace inside a chunk is normalized to single spaces (the chunk is
rebuilt from the token array — same convention as the passage digests), so
chunk text is deterministic and engine-identical. One per-row explode, no
shuffles at all: chunking is scan-speed at any corpus size, and chunk
identity (doc_id, chunk_index) is stable across runs — an incremental
embedding pipeline can upsert by it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_signals.datapipe.text import words_col
from spark_signals.datapipe.util import spread_small_input

CHUNK_WORDS = 80
CHUNK_OVERLAP = 16


def chunk_documents(
    docs: DataFrame, chunk_words: int = CHUNK_WORDS, overlap: int = CHUNK_OVERLAP
) -> DataFrame:
    """(doc_id, chunk_index, start_word, n_chunk_words, chunk_text): word
    windows of ``chunk_words`` advancing by ``chunk_words - overlap``; the
    final partial window is kept (every word belongs to ≥1 chunk).
    Token-free documents yield no chunks."""
    if not 0 <= overlap < chunk_words:
        raise ValueError("need 0 <= overlap < chunk_words")
    stride = chunk_words - overlap
    base = (
        spread_small_input(docs)
        .select("doc_id", words_col(F.col("text")).alias("words"))
        .filter(F.size("words") > 0)
    )
    # number of chunks = 1 + ceil(max(n - chunk, 0) / stride), spelled with
    # integer arithmetic: (n - overlap - 1) div stride is the last index
    # whose window still contains a new word
    last_idx = F.expr(
        f"greatest((size(words) - {overlap} - 1) div {stride}, 0)"
    )
    out = base.select(
        "doc_id",
        "words",
        F.size("words").alias("n_words"),
        F.explode(F.sequence(F.lit(0), last_idx)).alias("chunk_index"),
    )
    start = F.col("chunk_index") * stride  # 0-based word offset
    piece = F.slice(F.col("words"), start + 1, chunk_words)
    return out.select(
        "doc_id",
        "chunk_index",
        start.cast("bigint").alias("start_word"),
        F.size(piece).cast("bigint").alias("n_chunk_words"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def sql_chunk_documents(
    chunk_words: int = CHUNK_WORDS, overlap: int = CHUNK_OVERLAP
) -> str:
    stride = chunk_words - overlap
    return f"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\x0b\f\r]+'), w -> w <> '') AS words
  FROM documents
),
e AS (
  SELECT doc_id, words,
         unnest(range(0, greatest((len(words) - {overlap} - 1) // {stride}, 0) + 1)) AS chunk_index
  FROM d WHERE len(words) > 0
)
SELECT doc_id, CAST(chunk_index AS INT) AS chunk_index,
       CAST(chunk_index * {stride} AS BIGINT) AS start_word,
       CAST(len(words[(chunk_index * {stride} + 1):(chunk_index * {stride} + {chunk_words})]) AS BIGINT) AS n_chunk_words,
       array_to_string(words[(chunk_index * {stride} + 1):(chunk_index * {stride} + {chunk_words})], ' ') AS chunk_text
FROM e"""
