"""PII detection and redaction for training-data curation.

Regex-only (emails, IPv4, SSN-style ids, phone-style numbers) so the whole
stage is per-row JVM work — zero shuffles, codegen'd, embarrassingly
parallel across input splits; at 100 TB this runs at scan speed. Patterns
are restricted to the syntax subset where Java regex (Spark) and RE2
(DuckDB) agree — no lookaround, no backreferences — so the oracle holds the
redacted text byte-for-byte.

Redaction order is fixed (EMAIL → SSN → PHONE → IPV4) and each category is
counted on the ORIGINAL text before any replacement, so counts are
independent of the rewrite cascade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# category → (pattern, replacement token); dict order IS the redaction order
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
}


def pii_scrub(docs: DataFrame) -> DataFrame:
    """Per-document PII counts + redacted text.

    Counts run against the original text; the redacted text applies every
    category's replacement in the fixed ``PII_PATTERNS`` order.
    """
    counts = {
        name: F.regexp_count(F.col("text"), F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, (pat, _) in PII_PATTERNS.items()
    }
    clean = F.col("text")
    for pat, token in PII_PATTERNS.values():
        clean = F.regexp_replace(clean, pat, token)
    total = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return (
        docs.select("doc_id", "source", F.col("text"), *counts.values())
        .withColumn("n_pii_total", total)
        .select(
            "doc_id",
            "source",
            *[f"n_{name}" for name in PII_PATTERNS],
            "n_pii_total",
            (F.col("n_pii_total") > 0).alias("has_pii"),
            clean.alias("text_clean"),
        )
    )


def sql_pii_scrub() -> str:
    count_cols = ",\n       ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, (pat, _) in PII_PATTERNS.items()
    )
    clean = "text"
    for pat, token in PII_PATTERNS.values():
        clean = f"regexp_replace({clean}, '{pat}', '{token}', 'g')"
    total = " + ".join(f"n_{name}" for name in PII_PATTERNS)
    return f"""
WITH c AS (
  SELECT doc_id, source, text,
       {count_cols}
  FROM documents
)
SELECT doc_id, source, {', '.join('n_' + n for n in PII_PATTERNS)},
       {total} AS n_pii_total,
       ({total}) > 0 AS has_pii,
       {clean} AS text_clean
FROM c"""


# ---------------------------------------------------------- k-anonymity audit
# Default quasi-identifier grain: (lang, source, character-length band).
# k is the classic re-identification floor; the coarse band is the
# one-step generalization remediation (4 fine bands -> 1 coarse band).
KANON_K = 5
KANON_BAND_CHARS = 256
KANON_COARSE_FACTOR = 4

from dataclasses import dataclass  # noqa: E402


@dataclass(frozen=True)
class QISpec:
    """The quasi-identifier set the k-anonymity gate audits — a release
    gate rotates QI sets (add a URL domain, a license tag) without a code
    change, so the whole lane (batch report, incremental state,
    continuous gate) is parameterized by this spec. The state schema
    derives from it: ``key_cols`` + ``band_fine`` + ``n_docs``.

    ``key_cols`` name categorical columns present in the input (derive a
    column first — e.g. ``withColumn("domain", ...)`` — to audit a
    computed identifier); ``band_col`` is the numeric column quantized
    into fine bands of ``band_width``, with ``coarse_factor`` fine bands
    merging into one generalization step. The default is the
    oracle-checked (lang, source, char-band) face."""

    key_cols: tuple[str, ...] = ("lang", "source")
    band_col: str = "n_chars"
    band_width: int = KANON_BAND_CHARS
    coarse_factor: int = KANON_COARSE_FACTOR
    k: int = KANON_K


DEFAULT_QI = QISpec()


def kanonymity_report(docs: DataFrame, spec: QISpec = DEFAULT_QI) -> DataFrame:
    """k-anonymity audit over the documents' quasi-identifier metadata —
    the privacy-side release gate PII regexes don't cover: a document whose
    (lang, source, length-band) combination is shared by fewer than k
    others is re-identifiable from metadata alone even with the text fully
    redacted (Sweeney 2002, k-anonymity).

    Per fine QI group: its population, the ``suppressed`` verdict
    (population < k), and the same verdict after one generalization step
    (length band widened {factor}×) — so the report shows BOTH what a
    release must suppress today and how much of that suppression
    generalization would recover, in one relation.

    Scale: one hash aggregate to the fine-group grain (map-side combined;
    group count « corpus size), then a window sum over the coarse key on
    that already-tiny relation — no second corpus-wide pass, no joins. At
    100 TB the fine-group relation is bounded by the QI cardinality
    (langs × sources × bands), not the row count.
    """
    return kanonymity_from_counts(qi_counts(docs, spec), spec)


kanonymity_report.__doc__ = kanonymity_report.__doc__.format(factor=KANON_COARSE_FACTOR)


def qi_counts(docs: DataFrame, spec: QISpec = DEFAULT_QI) -> DataFrame:
    """The k-anonymity STATE relation: per fine quasi-identifier group
    (``spec.key_cols`` + band_fine) document counts. Additive — counts of
    a union are the summed counts of the parts — which is what makes the
    incremental lane exact (see :func:`kanon_incremental`)."""
    return (
        docs.select(
            *spec.key_cols,
            F.floor(F.col(spec.band_col) / F.lit(spec.band_width))
            .cast("long")
            .alias("band_fine"),
        )
        .groupBy(*spec.key_cols, "band_fine")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def kanonymity_from_counts(
    counts: DataFrame, spec: QISpec = DEFAULT_QI
) -> DataFrame:
    """The k-anonymity report from a (possibly merged) QI-count relation —
    the verdict stage shared by the batch face and the incremental lane."""
    from pyspark.sql import Window

    band_coarse = F.floor(F.col("band_fine") / F.lit(spec.coarse_factor)).cast("long")
    w = Window.partitionBy(*spec.key_cols, band_coarse)
    risk = F.lit(1.0) / F.col("n_docs")
    return counts.select(
        *spec.key_cols,
        "band_fine",
        band_coarse.alias("band_coarse"),
        "n_docs",
        F.sum("n_docs").over(w).alias("n_docs_coarse"),
        (F.col("n_docs") < F.lit(spec.k)).alias("suppressed"),
        (F.sum("n_docs").over(w) < F.lit(spec.k)).alias(
            "suppressed_after_generalization"
        ),
        (F.floor(risk * F.lit(1e6) + F.lit(0.5000001)) / F.lit(1e6)).alias("risk"),
    )


def kanon_incremental(
    batch: DataFrame, counts_index: DataFrame, spec: QISpec = DEFAULT_QI
) -> tuple[DataFrame, DataFrame]:
    """One ingest step of the continuous k-anonymity gate: ``(report,
    delta)`` where ``delta`` is the batch's own QI counts (the O(batch)
    state append) and ``report`` is the CORPUS-WIDE verdict relation after
    the batch lands, computed by merging the persisted count index with
    the delta.

    Exactness: counts are associative integer sums, so index ⊕ delta
    equals the counts of the full union — chaining batches in any order
    reproduces :func:`kanonymity_report` of the whole corpus exactly
    (pinned by a chain-equals-global test). Cost: the merge and the
    verdict window run over the QI-COUNT relation, which is bounded by
    quasi-identifier cardinality (langs × sources × bands), not corpus
    size — the report after the billionth document costs the same as
    after the first batch; only the delta aggregate touches batch rows.
    """
    delta = qi_counts(batch, spec)
    merged = (
        counts_index.select(*spec.key_cols, "band_fine", "n_docs")
        .unionByName(delta)
        .groupBy(*spec.key_cols, "band_fine")
        .agg(F.sum("n_docs").alias("n_docs"))
    )
    return kanonymity_from_counts(merged, spec), delta


def sql_kanonymity_report() -> str:
    return f"""
WITH fine AS (
  SELECT lang, source,
         CAST(floor(n_chars / {KANON_BAND_CHARS}) AS BIGINT) AS band_fine,
         count(*) AS n_docs
  FROM documents
  GROUP BY 1, 2, 3
)
SELECT lang, source, band_fine,
       CAST(floor(band_fine / {KANON_COARSE_FACTOR}) AS BIGINT) AS band_coarse,
       n_docs,
       CAST(SUM(n_docs) OVER (PARTITION BY lang, source, floor(band_fine / {KANON_COARSE_FACTOR})) AS BIGINT) AS n_docs_coarse,
       n_docs < {KANON_K} AS suppressed,
       CAST(SUM(n_docs) OVER (PARTITION BY lang, source, floor(band_fine / {KANON_COARSE_FACTOR})) AS BIGINT) < {KANON_K} AS suppressed_after_generalization,
       floor(1.0 / n_docs * 1e6 + 0.5000001) / 1e6 AS risk
FROM fine"""
