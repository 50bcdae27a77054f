"""Boilerplate/markup text cleaning — the normalization pass a crawl gets
BEFORE quality scoring and dedup (CCNet/RefinedWeb run exactly this shape:
strip markup, fix linebreak artifacts, canonicalize whitespace).

Zero-shuffle by construction: every rule is a per-row JVM regex, so the
operator runs at scan speed and composes in front of any datapipe stage.
Patterns are restricted to the Java-regex ∩ RE2 subset (the same contract
as the PII scrubber) so the DuckDB oracle holds the CLEANED TEXT
byte-for-byte, not just the counts.

Rule order matters and is part of the contract:

1. markup strip      — ``<...>`` tags drop (lossy-but-standard crawl
                       hygiene; angle-bracket math survives only when not
                       tag-shaped)
2. de-hyphenation    — ``word-\\n word`` → ``wordword`` (PDF/column line
                       breaks), BEFORE whitespace collapse destroys the
                       newline evidence
3. control strip     — C0 controls except \\t \\n \\r become spaces
4. whitespace fold   — any run of the explicit whitespace class
                       ``[ \\t\\n\\x0b\\f\\r]+`` → one space, then trim
                       (never Java ``\\s``, whose membership differs from
                       RE2's — the repo-wide oracle-parity rule)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) in application order — shared verbatim by the
# Spark expression and the DuckDB oracle (RE2 ∩ java.util.regex safe).
CLEAN_RULES: tuple[tuple[str, str], ...] = (
    ("<[^<>]*>", " "),                                  # markup tags
    ("([a-zA-Z])-[\\t ]*\\n[\\t ]*([a-zA-Z])", "$1$2"), # linebreak hyphens
    ("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", " "),        # C0 controls
    # explicit class, not \s: Java's \s includes \x0B, RE2's does not —
    # harmless HERE only because the C0 rule above already spaced \x0B
    # out, but the explicit form keeps the shared rule engine-identical
    # on any input (same discipline as the oracle tokenizers).
    ("[ \\t\\n\\x0b\\f\\r]+", " "),                     # whitespace fold
)


def _apply_rules(col: F.Column) -> F.Column:
    for pat, rep in CLEAN_RULES:
        col = F.regexp_replace(col, pat, rep)
    return F.trim(col)


def clean_text(docs: DataFrame) -> DataFrame:
    """(doc_id, text_clean, n_chars_clean, n_chars_removed, was_dirty):
    the canonicalized text plus audit columns — ``was_dirty`` marks rows
    the rules actually changed (the crawl-hygiene hit rate per source is
    a standard curation dashboard stat)."""
    cleaned = _apply_rules(F.col("text"))
    return docs.select(
        "doc_id",
        cleaned.alias("text_clean"),
        F.length(cleaned).alias("n_chars_clean"),
        (F.length("text") - F.length(cleaned)).alias("n_chars_removed"),
        (cleaned != F.col("text")).alias("was_dirty"),
    )


def sql_clean_text(source: str = "documents") -> str:
    expr = "text"
    for pat, rep in CLEAN_RULES:
        # DuckDB regexp_replace: \1 backreferences, 'g' for global
        duck_rep = rep.replace("$1", "\\1").replace("$2", "\\2")
        expr = f"regexp_replace({expr}, '{pat}', '{duck_rep}', 'g')"
    expr = f"trim({expr})"
    return f"""
SELECT doc_id,
       {expr} AS text_clean,
       length({expr}) AS n_chars_clean,
       length(text) - length({expr}) AS n_chars_removed,
       {expr} <> text AS was_dirty
FROM {source}"""
