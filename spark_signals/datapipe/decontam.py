"""Benchmark decontamination: flag training documents sharing word n-grams
with an evaluation/benchmark subset.

The standard pre-training hygiene step (GPT-3 appendix C, arXiv:2005.14165;
PaLM §7): any training document that shares at least one long word-n-gram
with a benchmark document is contaminated and must be dropped or scrubbed
before training.

Scale shape (100 TB): the benchmark side is small by nature (eval suites are
thousands of documents, not billions), so its distinct n-gram digest set
broadcasts; the training corpus explodes to (doc_id, digest) rows and
equi-joins the broadcast set — candidate matching never shuffles the corpus.
The only corpus-keyed shuffle is the per-doc overlap count aggregation
(partial-aggregated map-side). No UDFs — shingling and hashing are
higher-order `pyspark.sql.functions` inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_signals.datapipe.text import SQL_SHINGLES, shingles_col, words_col
from spark_signals.datapipe.util import spread_small_input

# 5-word grams: long enough that cross-document collisions imply shared
# provenance on this corpus, short enough that near-duplicate documents
# (the synthetic corpus's contamination analog) actually collide.
DECONTAM_NGRAM = 5
# the synthetic corpus has no designated eval split; source='src0' stands in
# as the benchmark subset (deterministic, ~1/n_sources of the corpus)
EVAL_SOURCE = "src0"


def _ngram_digests(docs: DataFrame, n: int) -> DataFrame:
    """doc_id → distinct md5 digests of the document's word n-grams."""
    from spark_signals.datapipe.util import explode_strings

    df = spread_small_input(docs).withColumn("words", words_col(F.col("text")))
    df = df.withColumn("grams", F.array_distinct(shingles_col(n)))
    # string round-trip explode: one lambda evaluation per document (see
    # util.explode_strings — the naive Generate re-evaluates per output row)
    return explode_strings(df, F.col("grams"), "g", "doc_id").select(
        "doc_id", F.md5("g").alias("digest")
    )


def decontaminate_against(
    train: DataFrame, eval_docs: DataFrame, n: int = DECONTAM_NGRAM
) -> DataFrame:
    """Per-training-document contamination report against an ARBITRARY
    benchmark DataFrame — the production entry point: real eval suites live
    outside the training corpus, arrive as their own small relation, and
    broadcast regardless of where they came from.

    ``eval_docs`` needs only a ``text`` column (a ``doc_id`` is synthesized
    if absent — the digest set never leaves this function). Returns every
    training document with the count of distinct n-gram digests it shares
    with ANY eval document, and the is_contaminated gate (overlap > 0).
    Documents shorter than n words hash their whole text as one gram
    (shingles_col's fallback), so short exact-duplicates of eval docs are
    still caught.
    """
    if "doc_id" not in eval_docs.columns:
        eval_docs = eval_docs.withColumn("doc_id", F.monotonically_increasing_id())
    eval_digests = (
        _ngram_digests(eval_docs.select("doc_id", "text"), n)
        .select("digest")
        .distinct()
    )
    overlaps = (
        _ngram_digests(train, n)
        .join(F.broadcast(eval_digests), "digest")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    n_overlap = F.coalesce(F.col("n_overlap"), F.lit(0).cast("long"))
    return (
        train.select("doc_id", "source")
        .join(overlaps, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            n_overlap.alias("n_overlapping_ngrams"),
            (n_overlap > 0).alias("is_contaminated"),
        )
    )


def decontaminate(
    docs: DataFrame, eval_source: str = EVAL_SOURCE, n: int = DECONTAM_NGRAM
) -> DataFrame:
    """Source-predicate convenience split over a single corpus (the driver
    query's shape: the synthetic corpus has no external eval suite, so
    source='src0' stands in). Delegates to :func:`decontaminate_against`."""
    return decontaminate_against(
        docs.filter(F.col("source") != eval_source),
        docs.filter(F.col("source") == eval_source),
        n,
    )


def sql_decontaminate(
    eval_source: str = EVAL_SOURCE, n: int = DECONTAM_NGRAM, source: str = "documents"
) -> str:
    """Oracle SQL parameterized over the source relation (curate composes
    this over canon_documents; see dedup.sql_dedup_passages)."""
    return f"""
WITH d AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+'), w -> w <> '') AS words
  FROM {source}
),
s AS (
  SELECT doc_id, source, list_distinct({SQL_SHINGLES(n)}) AS grams FROM d
),
g AS (
  SELECT doc_id, source, md5(unnest(grams)) AS digest FROM s
),
ev AS (
  SELECT DISTINCT digest FROM g WHERE source = '{eval_source}'
),
ov AS (
  SELECT g.doc_id, count(*) AS n_overlap
  FROM g JOIN ev USING (digest)
  WHERE g.source <> '{eval_source}'
  GROUP BY g.doc_id
)
SELECT d.doc_id, d.source,
       CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlapping_ngrams,
       coalesce(ov.n_overlap, 0) > 0 AS is_contaminated
FROM d LEFT JOIN ov ON d.doc_id = ov.doc_id
WHERE d.source <> '{eval_source}'"""
