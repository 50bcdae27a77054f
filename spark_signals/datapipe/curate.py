"""Composed curation pipeline: one call from raw documents to an audited
keep/drop decision.

Chains the individual operators — exact dedup, passage-duplication profile,
Gopher-style repetition stats, unigram-LM fluency band, PII scrub — into a
single relation keyed by doc_id, with a ``keep`` verdict and a
``drop_reasons`` array recording WHY a document fell out (the audit trail
curation pipelines need: silent drops are undiagnosable at 100 TB).

Shape at scale: every component is its own blocking-based DAG (documented
in SCALE.md); the composition joins their per-doc outputs back on doc_id —
hash-partitioned equi-joins on the primary key, which AQE plans as
broadcasts while any side is small and as co-partitioned shuffles beyond.
The text column rides through ONCE (from the scrub branch, already
redacted); all other branches contribute only scalar flags.

Drop policy (each reason recorded independently):
  * ``exact_dup``      — not the canonical copy of its content digest
  * ``dup_heavy``      — >30% of passages duplicated corpus-wide
  * ``repetitive``     — Gopher repetition gate
  * ``low_fluency``    — bottom LM band
  * ``contaminated``   — shares a long word-n-gram with the eval subset
                         (GPT-3-style benchmark decontamination; new r6)
  * ``length_outlier`` — outside the per-language length percentile band
                         (sketch-threshold path; new r6)
  * ``has_pii``        — PII matched (kept by default: redaction already
                         applied; listed so downstream can drop if policy
                         demands — flag-only reason)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_signals.datapipe import decontam as DC
from spark_signals.datapipe import dedup as D
from spark_signals.datapipe import scrub as S
from spark_signals.datapipe import text as T

# reasons that actually drop a document (has_pii is informational)
DROP_REASONS = [
    "exact_dup",
    "dup_heavy",
    "repetitive",
    "low_fluency",
    "contaminated",
    "length_outlier",
]


def curate(docs: DataFrame) -> DataFrame:
    exact = D.dedup_exact(docs).select(
        "doc_id", F.col("is_duplicate").alias("exact_dup")
    )
    # corpus-level passes (passage dup, LM model, length percentiles,
    # eval-digest set) run on the EXACT-DEDUPED corpus: otherwise the
    # canonical copy of a duplicated document is itself flagged dup_heavy
    # by its own duplicates, duplicate mass skews the LM's unigram
    # distribution AND the length percentile thresholds (the CCNet
    # ordering: dedup first, corpus statistics after). Per-doc passes
    # (repetition, PII) see every row. Non-canonical rows get NULL→false
    # for the canon-computed flags — they already carry exact_dup.
    canon = docs.join(
        exact.filter(~F.col("exact_dup")).select("doc_id"), "doc_id"
    )
    passages = D.dedup_passages(canon).select("doc_id", "is_dup_heavy")
    rep = T.repetition_stats(docs).select("doc_id", "is_repetitive")
    lm = T.unigram_lm_quality(canon).select(
        "doc_id", (F.col("lm_band") == "low").alias("low_fluency"), "lm_band"
    )
    contam = DC.decontaminate(canon).select("doc_id", "is_contaminated")
    in_band = T.length_band_approx(canon).select("doc_id", F.lit(True).alias("in_band"))
    # length_outlier only applies to canonical docs that FAILED the band;
    # the canon flag distinguishes "outlier" from "not evaluated (dup)"
    canon_ids = canon.select("doc_id", F.lit(True).alias("is_canon"))
    pii = S.pii_scrub(docs).select("doc_id", "source", "has_pii", "text_clean")

    flags = (
        pii.join(exact, "doc_id")
        .join(passages, "doc_id", "left")
        .join(rep, "doc_id", "left")
        .join(lm, "doc_id", "left")
        .join(contam, "doc_id", "left")
        .join(in_band, "doc_id", "left")
        .join(canon_ids, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.col("exact_dup"),
            F.coalesce("is_dup_heavy", F.lit(False)).alias("dup_heavy"),
            F.coalesce("is_repetitive", F.lit(False)).alias("repetitive"),
            F.coalesce("low_fluency", F.lit(False)).alias("low_fluency"),
            F.coalesce("is_contaminated", F.lit(False)).alias("contaminated"),
            (
                F.coalesce("is_canon", F.lit(False))
                & ~F.coalesce("in_band", F.lit(False))
            ).alias("length_outlier"),
            "lm_band",
            "has_pii",
            "text_clean",
        )
    )
    reason_arr = F.filter(
        F.array(
            *[
                F.when(F.col(r), F.lit(r)).otherwise(F.lit(None))
                for r in DROP_REASONS
            ]
        ),
        lambda x: x.isNotNull(),
    )
    # drop_reasons rides as a comma-joined STRING, not an array — scalar
    # cells hash identically across the driver's pandas materialization of
    # both engines, where list cells are representation-fragile
    return flags.select(
        "doc_id",
        "source",
        "lm_band",
        "has_pii",
        F.concat_ws(",", reason_arr).alias("drop_reasons"),
        (F.size(reason_arr) == 0).alias("keep"),
        "text_clean",
    )


def curate_stats(docs: DataFrame) -> DataFrame:
    """Per-source curation audit: document counts, keeps, and one count per
    drop reason (+ the informational has_pii) — the dashboard row a 100 TB
    curation run reports per ingest source. One S-row aggregate over the
    curate() relation; reasons are tested with array membership, never
    substring matching (reason names could substring-collide)."""
    c = curate(docs)
    reasons = F.split(F.col("drop_reasons"), ",")
    sums = [
        F.sum(F.array_contains(reasons, r).cast("long")).alias(f"n_{r}")
        for r in DROP_REASONS
    ]
    return (
        c.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            *sums,
            F.sum(F.col("has_pii").cast("long")).alias("n_has_pii"),
        )
    )


def sql_curate_stats() -> str:
    reason_sums = ",\n       ".join(
        f"CAST(SUM(CASE WHEN list_contains(string_split(drop_reasons, ','), '{r}') THEN 1 ELSE 0 END) AS BIGINT) AS n_{r}"
        for r in DROP_REASONS
    )
    return f"""
SELECT source,
       count(*) AS n_docs,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       {reason_sums},
       CAST(SUM(CASE WHEN has_pii THEN 1 ELSE 0 END) AS BIGINT) AS n_has_pii
FROM ({sql_curate()}) t
GROUP BY source"""


def sql_curate() -> str:
    """DuckDB mirror: each component's oracle SQL as a CTE, joined on
    doc_id with the same reason/keep derivation."""
    reasons = ", ".join(
        f"CASE WHEN {r} THEN '{r}' ELSE NULL END" for r in DROP_REASONS
    )
    return f"""
WITH exact AS (
  SELECT doc_id, is_duplicate AS exact_dup FROM ({D.SQL_DEDUP_EXACT}) t
),
canon_documents AS (
  SELECT d.* FROM documents d JOIN exact e USING (doc_id) WHERE NOT e.exact_dup
),
passages AS (
  SELECT doc_id, is_dup_heavy
  FROM ({D.sql_dedup_passages(source="canon_documents")}) t
),
rep AS (
  SELECT doc_id, is_repetitive FROM ({T.SQL_REPETITION()}) t
),
lm AS (
  SELECT doc_id, lm_band = 'low' AS low_fluency, lm_band
  FROM ({T.SQL_UNIGRAM_LM(source="canon_documents")}) t
),
contam AS (
  SELECT doc_id, is_contaminated
  FROM ({DC.sql_decontaminate(source="canon_documents")}) t
),
band AS (
  SELECT doc_id, true AS in_band
  FROM ({T.SQL_LENGTH_BAND_APPROX(source="canon_documents")}) t
),
pii AS (
  SELECT doc_id, source, has_pii, text_clean FROM ({S.sql_pii_scrub()}) t
),
flags AS (
  SELECT p.doc_id, p.source,
         e.exact_dup,
         COALESCE(g.is_dup_heavy, false) AS dup_heavy,
         COALESCE(r.is_repetitive, false) AS repetitive,
         COALESCE(l.low_fluency, false) AS low_fluency,
         COALESCE(c.is_contaminated, false) AS contaminated,
         (NOT e.exact_dup) AND NOT COALESCE(b.in_band, false) AS length_outlier,
         l.lm_band, p.has_pii, p.text_clean
  FROM pii p
  JOIN exact e USING (doc_id)
  LEFT JOIN passages g USING (doc_id)
  LEFT JOIN rep r USING (doc_id)
  LEFT JOIN lm l USING (doc_id)
  LEFT JOIN contam c USING (doc_id)
  LEFT JOIN band b USING (doc_id)
)
SELECT doc_id, source, lm_band, has_pii,
       COALESCE(array_to_string(list_filter([{reasons}], x -> x IS NOT NULL), ','), '') AS drop_reasons,
       len(list_filter([{reasons}], x -> x IS NOT NULL)) = 0 AS keep,
       text_clean
FROM flags"""
