"""Deterministic sampling operators for training-data pipelines.

Corpus curation needs samples that are (a) stratified — per-language /
per-source keep rates to rebalance a skewed crawl — and (b) reproducible
across runs, engines, and partitionings. ``rand()``-based sampling fails
(b): it depends on seed plumbing and row order. Content-hash gating fails
neither: a row is kept iff the first 32 bits of md5(doc_id) fall below the
stratum's rate threshold, a pure per-row predicate that pushes past scans,
needs zero shuffles, and yields the SAME sample on any engine — which also
makes it DuckDB-oracle-checkable exactly.

At 100 TB this is the right shape: no sort, no count pass, no coordination;
the sample rate is exact in expectation per stratum, and the same document
always lands on the same side (stable incremental re-runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# per-language keep rates (rebalance the en-heavy head, keep the tail)
DEFAULT_RATES = {"en": 0.5, "de": 0.25, "es": 0.25, "fr": 0.25}
DEFAULT_RATE = 0.125
_HASH_SPACE = float(2**32)


def _hash_bucket():
    # first 8 hex chars of md5 as a uniform 32-bit integer
    return F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")


def sample_stratified(
    docs: DataFrame,
    rates: dict[str, float] | None = None,
    default_rate: float = DEFAULT_RATE,
) -> DataFrame:
    rates = DEFAULT_RATES if rates is None else rates
    rate = F.lit(float(default_rate))
    for lang, r in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(float(r))).otherwise(rate)
    bucket = _hash_bucket()
    return (
        docs.withColumn("sample_bucket", bucket)
        .withColumn("keep_rate", rate)
        .filter(F.col("sample_bucket") < F.col("keep_rate") * F.lit(_HASH_SPACE))
        .select("doc_id", "lang", "source", "n_chars", "sample_bucket", "keep_rate")
    )


def sql_sample_stratified(
    rates: dict[str, float] | None = None, default_rate: float = DEFAULT_RATE
) -> str:
    """DuckDB mirror: same hash, same thresholds, same rows."""
    rates = DEFAULT_RATES if rates is None else rates
    case = "CASE "
    for lang, r in sorted(rates.items()):
        case += f"WHEN lang = '{lang}' THEN CAST({r!r} AS DOUBLE) "
    case += f"ELSE CAST({default_rate!r} AS DOUBLE) END"
    return f"""
WITH keyed AS (
  SELECT doc_id, lang, source, n_chars,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS sample_bucket,
         {case} AS keep_rate
  FROM documents
)
SELECT doc_id, lang, source, n_chars, sample_bucket, keep_rate
FROM keyed
WHERE sample_bucket < keep_rate * CAST(4294967296.0 AS DOUBLE)"""


# ---------------------------------------------------------- per-stratum quota
QUOTA_K = 20


def sample_quota(docs: DataFrame, k: int = QUOTA_K, prefilter_rate: float | None = None) -> DataFrame:
    """Deterministic per-source quota sample: exactly min(k, |stratum|) docs
    per source, chosen as the k smallest content-hash keys — the fixed-size
    counterpart of `sample_stratified`'s fixed-rate gate (data-mixing
    recipes state quotas per source, not rates).

    Hash-ordered rank is reproducible across runs, engines, and
    partitionings (same property as the rate gate), and oracle-checkable.

    Scale: rank-within-stratum needs a per-source sort, and a 100 TB corpus
    with a handful of sources would sort billions of rows per group. The
    `prefilter_rate` lever bounds that: the same hash-gate predicate used by
    `sample_stratified` cuts each stratum to ~rate·|stratum| rows BEFORE the
    sort — keeping hash < rate·2^32 preserves exactly the k smallest hashes
    whenever ≥ k rows survive, so the result is identical (asserted in
    tests). Choose rate so rate·|smallest stratum| ≫ k.
    """
    from pyspark.sql import Window

    keyed = docs.select("doc_id", "source", _hash_bucket().alias("sample_key"))
    if prefilter_rate is not None:
        keyed = keyed.filter(
            F.col("sample_key") < F.lit(float(prefilter_rate)) * F.lit(_HASH_SPACE)
        )
    w = Window.partitionBy("source").orderBy("sample_key", "doc_id")
    return (
        keyed.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .select("doc_id", "source", "sample_key", "sample_rank")
    )


def sql_sample_quota(k: int = QUOTA_K) -> str:
    return f"""
WITH keyed AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS sample_key
  FROM documents
),
r AS (
  SELECT doc_id, source, sample_key,
         row_number() OVER (PARTITION BY source ORDER BY sample_key, doc_id) AS sample_rank
  FROM keyed
)
SELECT doc_id, source, sample_key, CAST(sample_rank AS INTEGER) AS sample_rank
FROM r WHERE sample_rank <= {k}"""
