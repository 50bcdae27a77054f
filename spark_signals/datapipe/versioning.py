"""Corpus snapshot diffing — the data-versioning audit between two crawls
or pipeline runs.

Every managed training corpus is re-materialized periodically (new crawl,
re-run curation, upstream fix); the first question is always "what
changed?" — which documents were added, removed, or rewritten, and how
much of the corpus moved. The diff keys on the SHARED content identity
(``dedup.content_digest``), so padding/case-only rewrites do not count as
changes, exactly like the dedup and streaming lanes.

Shape at 100 TB: each snapshot contributes (doc_id, digest) rows —
digests computed map-side, text dropped before any shuffle — and the two
sides meet in ONE doc_id-keyed groupBy over their union (no full-outer
join: an outer join of two corpus-sized relations forces a sort-merge
plan; max-of-one-sided-null aggregation is the same result with a plain
hash aggregate). Output is corpus-sized; the summary is one more tiny agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_signals.datapipe.dedup import SQL_CONTENT_DIGEST, content_digest


def corpus_diff(old_docs: DataFrame, new_docs: DataFrame) -> DataFrame:
    """(doc_id, status) for every doc_id present in either snapshot:
    ``added`` (new only), ``removed`` (old only), ``changed`` (both, digest
    differs), ``unchanged`` (both, digest equal)."""
    old_d = old_docs.select(
        "doc_id",
        content_digest(F.col("text")).alias("od"),
        F.lit(None).cast("string").alias("nd"),
    )
    new_d = new_docs.select(
        "doc_id",
        F.lit(None).cast("string").alias("od"),
        content_digest(F.col("text")).alias("nd"),
    )
    g = (
        old_d.unionByName(new_d)
        .groupBy("doc_id")
        .agg(F.max("od").alias("od"), F.max("nd").alias("nd"))
    )
    status = (
        F.when(F.col("od").isNull(), "added")
        .when(F.col("nd").isNull(), "removed")
        .when(F.col("od") != F.col("nd"), "changed")
        .otherwise("unchanged")
    )
    return g.select("doc_id", status.alias("status"))


# Driver-checkable face: two deterministic snapshot views of `documents` —
# v1 drops doc_id % 3 == 0, v2 drops % 4 == 0 (so both one-sided statuses
# occur) and rewrites the text of doc_id % 10 == 0 (so 'changed' occurs).
DIFF_V1_MOD = 3
DIFF_V2_MOD = 4
DIFF_EDIT_MOD = 10
DIFF_EDIT_SUFFIX = " rev2"


def corpus_diff_snapshot(docs: DataFrame) -> DataFrame:
    v1 = docs.filter(F.col("doc_id") % DIFF_V1_MOD != 0)
    v2 = docs.filter(F.col("doc_id") % DIFF_V2_MOD != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % DIFF_EDIT_MOD == 0,
            F.concat(F.col("text"), F.lit(DIFF_EDIT_SUFFIX)),
        ).otherwise(F.col("text")),
    )
    return corpus_diff(v1, v2)


def sql_corpus_diff_snapshot(source: str = "documents") -> str:
    dig = SQL_CONTENT_DIGEST.format(col="text")
    return f"""
WITH v1 AS (
  SELECT doc_id, {dig} AS d FROM {source} WHERE doc_id % {DIFF_V1_MOD} <> 0
),
v2src AS (
  SELECT doc_id,
         CASE WHEN doc_id % {DIFF_EDIT_MOD} = 0 THEN text || '{DIFF_EDIT_SUFFIX}'
              ELSE text END AS text
  FROM {source} WHERE doc_id % {DIFF_V2_MOD} <> 0
),
v2 AS (SELECT doc_id, {dig} AS d FROM v2src),
u AS (
  SELECT doc_id, d AS od, CAST(NULL AS VARCHAR) AS nd FROM v1
  UNION ALL
  SELECT doc_id, CAST(NULL AS VARCHAR) AS od, d AS nd FROM v2
),
g AS (SELECT doc_id, max(od) AS od, max(nd) AS nd FROM u GROUP BY doc_id)
SELECT doc_id,
       CASE WHEN od IS NULL THEN 'added'
            WHEN nd IS NULL THEN 'removed'
            WHEN od <> nd THEN 'changed'
            ELSE 'unchanged' END AS status
FROM g"""


def diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n_docs) — the one-line audit row per diff status."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))
