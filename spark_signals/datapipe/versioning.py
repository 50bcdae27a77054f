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


# ----------------------------------------------- distribution drift monitor
# Population-stability-index bins for the token-length distribution: log2
# length bands (0..PSI_BINS-1, top band clamped). Laplace +1 smoothing
# keeps every band's share strictly positive so ln(q/p) is total — the
# standard PSI recipe for monitoring ingest drift between corpus versions.
PSI_BINS = 10


def quality_drift_psi(old_docs: DataFrame, new_docs: DataFrame) -> DataFrame:
    """Distribution drift between two corpus versions — the monitoring
    read a continuously-ingested training corpus checks before retraining:
    per log2-token-length band, document shares in OLD vs NEW and the
    band's PSI contribution ``(q − p)·ln(q/p)`` (sum the column for the
    scalar PSI; > 0.2 is the conventional "investigate" line).

    Exactness: band counts are integer aggregates; shares divide by the
    smoothed totals (identical IEEE divisions on both engines), ln is
    libm on both sides (the UNIGRAM-grid precedent), and the contribution
    grids to 1e-9 — fine enough that real drift survives and coarse
    enough that a 1-ulp ln divergence cannot flip a digit. Cost: one
    map-side-combined aggregate per version to PSI_BINS rows; the band
    relation is fixed-size at any corpus scale.
    """
    from spark_signals.datapipe.text import n_tokens_col

    spark = old_docs.sparkSession

    def binned(d: DataFrame, name: str) -> DataFrame:
        ntok = n_tokens_col(F.col("text"), "bpe")
        b = F.least(
            F.floor(F.log2(ntok + F.lit(1.0))).cast("long"),
            F.lit(PSI_BINS - 1).cast("long"),
        )
        return d.select(b.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias(name)
        )
    bins = spark.range(PSI_BINS).select(F.col("id").alias("bin"))
    o = binned(old_docs, "n_old")
    n = binned(new_docs, "n_new")
    joined = (
        bins.join(o, "bin", "left")
        .join(n, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
    )
    tot = joined.agg(
        F.sum("n_old").alias("tot_old"), F.sum("n_new").alias("tot_new")
    )
    g = joined.crossJoin(F.broadcast(tot))
    p = (F.col("n_old") + F.lit(1)).cast("double") / (
        F.col("tot_old") + F.lit(PSI_BINS)
    )
    q = (F.col("n_new") + F.lit(1)).cast("double") / (
        F.col("tot_new") + F.lit(PSI_BINS)
    )
    contrib = (q - p) * F.log(q / p)
    grid9 = F.floor(contrib * F.lit(1e9) + F.lit(0.5000001)) / F.lit(1e9)
    return g.select(
        "bin",
        "n_old",
        "n_new",
        (F.floor(p * F.lit(1e9) + F.lit(0.5000001)) / F.lit(1e9)).alias("share_old"),
        (F.floor(q * F.lit(1e9) + F.lit(0.5000001)) / F.lit(1e9)).alias("share_new"),
        grid9.alias("psi_contrib"),
    )


def quality_drift_snapshot(docs: DataFrame) -> DataFrame:
    """Driver-checkable face over the established two-snapshot views
    (corpus_diff_snapshot's v1/v2: membership differs by the %3/%4 drops,
    content by the rev2 edits) — a real, small distribution shift."""
    v1 = docs.filter(F.col("doc_id") % DIFF_V1_MOD != 0)
    v2 = docs.filter(F.col("doc_id") % DIFF_V2_MOD != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % DIFF_EDIT_MOD == 0,
            F.concat(F.col("text"), F.lit(DIFF_EDIT_SUFFIX)),
        ).otherwise(F.col("text")),
    )
    return quality_drift_psi(v1, v2)


def sql_quality_drift_snapshot(source: str = "documents") -> str:
    from spark_signals.datapipe.text import sql_n_tokens

    ntok = sql_n_tokens("text", "bpe")
    return f"""
WITH v1 AS (
  SELECT text FROM {source} WHERE doc_id % {DIFF_V1_MOD} <> 0
),
v2 AS (
  SELECT CASE WHEN doc_id % {DIFF_EDIT_MOD} = 0 THEN text || '{DIFF_EDIT_SUFFIX}'
              ELSE text END AS text
  FROM {source} WHERE doc_id % {DIFF_V2_MOD} <> 0
),
ob AS (
  SELECT least(CAST(floor(log2({ntok} + 1.0)) AS BIGINT), {PSI_BINS - 1}) AS bin,
         count(*) AS n_old
  FROM v1 GROUP BY 1
),
nb AS (
  SELECT least(CAST(floor(log2({ntok} + 1.0)) AS BIGINT), {PSI_BINS - 1}) AS bin,
         count(*) AS n_new
  FROM v2 GROUP BY 1
),
bins AS (SELECT unnest(range(0, {PSI_BINS})) AS bin),
j AS (
  SELECT b.bin,
         CAST(COALESCE(o.n_old, 0) AS BIGINT) AS n_old,
         CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new
  FROM bins b LEFT JOIN ob o ON o.bin = b.bin LEFT JOIN nb n ON n.bin = b.bin
),
t AS (SELECT CAST(SUM(n_old) AS BIGINT) AS tot_old, CAST(SUM(n_new) AS BIGINT) AS tot_new FROM j),
g AS (
  SELECT j.*, t.tot_old, t.tot_new,
         CAST(n_old + 1 AS DOUBLE) / (tot_old + {PSI_BINS}) AS p,
         CAST(n_new + 1 AS DOUBLE) / (tot_new + {PSI_BINS}) AS q
  FROM j CROSS JOIN t
)
SELECT bin, n_old, n_new,
       floor(p * 1e9 + 0.5000001) / 1e9 AS share_old,
       floor(q * 1e9 + 0.5000001) / 1e9 AS share_new,
       floor((q - p) * ln(q / p) * 1e9 + 0.5000001) / 1e9 AS psi_contrib
FROM g"""
