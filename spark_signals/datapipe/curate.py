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


def curate(docs: DataFrame, exact: DataFrame | None = None) -> DataFrame:
    # ``exact`` optionally supplies a precomputed dedup_exact relation so a
    # pipeline emitting several audit artifacts (this composition + the
    # filter-ablation grid both consume the digest pass) shares ONE digest
    # shuffle instead of re-running it per artifact (r16 verdict #5); the
    # no-arg face — the oracle-checked one — is unchanged.
    exact = (exact if exact is not None else D.dedup_exact(docs)).select(
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


def curate_stats(docs: DataFrame, curated: DataFrame | None = None) -> DataFrame:
    """Per-source curation audit: document counts, keeps, and one count per
    drop reason (+ the informational has_pii) — the dashboard row a 100 TB
    curation run reports per ingest source. One S-row aggregate over the
    curate() relation; reasons are tested with array membership, never
    substring matching (reason names could substring-collide).

    ``curated`` optionally supplies an already-materialized curate()
    relation: the curation pipeline example computes the verdicts once
    (pinned) for the keep decision, and this report then aggregates that
    relation instead of re-running the whole multi-operator curate chain a
    second time (r16 verdict #5). Default face unchanged."""
    c = curated if curated is not None else curate(docs)
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


# ------------------------------------------------------- filter ablation grid
# Flag thresholds for the ablation dimensions (deliberately the CHEAP
# row-local proxies, not the full curate() chain: the grid's job is fast
# what-if arithmetic over filter interactions, re-run at every threshold
# proposal — the full audited decision stays curate()'s).
ABLATION_SHORT_WORDS = 10      # f_short: fewer words than this
ABLATION_QUALITY_MIN = 0.25    # f_lowq: deterministic quality score below


def filter_ablation(
    docs: DataFrame,
    stats: DataFrame | None = None,
    exact: DataFrame | None = None,
) -> DataFrame:
    """Quality-filter ablation grid: document/token mass under EVERY
    combination of filter flags, via ``CUBE`` over the flag columns.

    Answers the questions a filter-tuning pass actually asks — "how much
    mass does each filter uniquely claim", "what returns if I relax X",
    "how big is the overlap between the duplicate filter and the quality
    filter" — in ONE relation instead of 2^k filtered re-counts. Cells
    where a dimension is aggregated-away carry ``'all'``; flag dimensions
    are emitted as strings ('y'/'n'/'all') so the grid has no nullable
    booleans (cross-engine NULL-boolean pandas representation is fragile;
    the aggregation NULL is the only NULL either engine produces here —
    ENFORCED by coalescing every flag to a defined boolean pre-cube, not
    just assumed of the inputs). NULL-text docs carry no content digest
    and are excluded by the dedup_exact join — they hold 0 tokens, so
    the grid's mass arithmetic is unaffected.

    Dimensions: f_dup (exact-digest duplicate), f_short (< {short} words),
    f_lowq (quality score < {q}), f_nonen (lang ≠ 'en'). ``n_dropped``
    counts docs any flag would drop under the OR-policy.

    Scale: one digest shuffle (dedup_exact) + one doc_id equi-join + one
    grouping-sets aggregate. Spark plans CUBE as a single Expand +
    hash-aggregate — partial-aggregated map-side, one shuffle whose key
    space is 16 grouping sets × ≤16 flag combos; output ≤ 3^4 rows at any
    corpus size. Token sums are associative BIGINT adds.
    """
    from spark_signals.datapipe import dedup as DD

    # ``stats`` / ``exact`` optionally supply precomputed text_stats /
    # dedup_exact relations so a pipeline emitting several audit
    # artifacts shares those passes instead of re-running them per
    # artifact (r15 advisory)
    st = (stats if stats is not None else T.text_stats(docs)).select(
        "doc_id", "lang", "n_words", "n_tokens_bpe", "quality_score"
    )
    ex = (exact if exact is not None else DD.dedup_exact(docs)).select(
        "doc_id", F.col("is_duplicate").alias("f_dup")
    )
    # every flag is coalesced to a DEFINED boolean before the cube: the
    # dim() decode below reads NULL as "aggregated away", so a data-level
    # NULL reaching the grouping columns (NULL text -> NULL n_words /
    # quality_score -> NULL comparison) would silently bucket into the
    # 'all' marginals and corrupt the y+n=all arithmetic (r15 advisory).
    # Policy: unevaluable = not flagged (false), matching the OR-drop
    # arithmetic's NULL-is-kept behavior.
    flags = st.join(ex, "doc_id").select(
        "n_tokens_bpe",
        F.coalesce(F.col("f_dup"), F.lit(False)).alias("f_dup"),
        F.coalesce(
            F.col("n_words") < F.lit(ABLATION_SHORT_WORDS), F.lit(False)
        ).alias("f_short"),
        F.coalesce(
            F.col("quality_score") < F.lit(ABLATION_QUALITY_MIN), F.lit(False)
        ).alias("f_lowq"),
        (F.coalesce(F.col("lang"), F.lit("")) != F.lit("en")).alias("f_nonen"),
    )
    dropped = (
        (F.col("f_dup") | F.col("f_short") | F.col("f_lowq") | F.col("f_nonen"))
        .cast("long")
    )
    dims = ("f_dup", "f_short", "f_lowq", "f_nonen")
    # GROUPING(c), not c IS NULL, marks the aggregated-away cells (r16
    # advisory): the grouping bit is the engine's own statement of which
    # grouping set a row belongs to, so the 'all' decode stays correct even
    # if a data-level NULL ever slipped past the coalesces above — instead
    # of silently merging into the marginals. The DuckDB oracle keeps the
    # IS NULL decode; the two agree exactly BECAUSE the coalesces hold, and
    # the degenerate/NULL-text tests pin that they do.
    cube = flags.cube(*dims).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_tokens_bpe").cast("long")).alias("n_tokens"),
        F.sum(dropped).alias("n_dropped"),
        *[F.grouping(c).alias(f"_g_{c}") for c in dims],
    )

    def dim(c: str) -> F.Column:
        return (
            F.when(F.col(f"_g_{c}") == 1, F.lit("all"))
            .when(F.col(c), F.lit("y"))
            .otherwise(F.lit("n"))
            .alias(c)
        )

    return cube.select(
        *[dim(c) for c in dims],
        "n_docs", "n_tokens", "n_dropped",
    )


filter_ablation.__doc__ = filter_ablation.__doc__.format(
    short=ABLATION_SHORT_WORDS, q=ABLATION_QUALITY_MIN
)


def sql_filter_ablation() -> str:
    def dim(c: str) -> str:
        return f"CASE WHEN {c} IS NULL THEN 'all' WHEN {c} THEN 'y' ELSE 'n' END AS {c}"

    # the trailing n_docs guard exists for ONE case: an EMPTY corpus,
    # where DuckDB's CUBE emits the global () grouping-set row (count 0)
    # while Spark emits nothing. Observed cells always have n_docs >= 1,
    # so on any non-empty corpus the guard is a no-op; with it, both
    # engines agree on empty input too (degenerate-input sweep).
    return f"""
WITH st AS (
  SELECT doc_id, lang, n_words, n_tokens_bpe, quality_score
  FROM ({T.SQL_TEXT_STATS()}) t
),
ex AS (
  SELECT doc_id, is_duplicate AS f_dup FROM ({D.SQL_DEDUP_EXACT}) t
),
flags AS (
  -- flags coalesced to defined booleans pre-CUBE: the decode reads NULL
  -- as "aggregated away", so data NULLs must never reach the grouping
  -- columns (mirrors the Spark side; r15 advisory)
  SELECT st.n_tokens_bpe,
         COALESCE(ex.f_dup, false) AS f_dup,
         COALESCE(st.n_words < {ABLATION_SHORT_WORDS}, false) AS f_short,
         COALESCE(st.quality_score < CAST({ABLATION_QUALITY_MIN!r} AS DOUBLE), false) AS f_lowq,
         COALESCE(st.lang, '') <> 'en' AS f_nonen
  FROM st JOIN ex USING (doc_id)
),
cube_agg AS (
  SELECT f_dup, f_short, f_lowq, f_nonen,
         count(*) AS n_docs,
         CAST(SUM(CAST(n_tokens_bpe AS BIGINT)) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN f_dup OR f_short OR f_lowq OR f_nonen THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
  FROM flags
  GROUP BY CUBE (f_dup, f_short, f_lowq, f_nonen)
)
SELECT {dim('f_dup')}, {dim('f_short')}, {dim('f_lowq')}, {dim('f_nonen')},
       n_docs, n_tokens, n_dropped
FROM cube_agg
WHERE n_docs > 0"""
