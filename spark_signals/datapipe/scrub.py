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
