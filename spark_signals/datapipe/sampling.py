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

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_signals.parity import sround

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


# ------------------------------------------------------ temperature sampling
# Multilingual/multi-source rebalancing (mC4 / PaLM / NLLB recipe): sample
# source i with probability ∝ n_i^TAU. TAU < 1 flattens the crawl's head —
# the keep RATE per source works out to r_i = C · n_i^(TAU-1) (big sources
# keep a smaller fraction), with C normalizing the expected total to
# BUDGET_FRAC of the corpus. Rates are capped at 1 and NOT re-normalized
# after capping (single-pass closed form — the standard recipe; iterative
# water-filling would re-spread the capped mass).
TEMPERATURE_TAU = 0.7
TEMPERATURE_BUDGET_FRAC = 0.5


def sample_temperature(
    docs: DataFrame,
    tau: float = TEMPERATURE_TAU,
    budget_frac: float = TEMPERATURE_BUDGET_FRAC,
) -> DataFrame:
    """Temperature-based source rebalancing with the same deterministic
    hash gate as :func:`sample_stratified`.

    Shape at 100 TB: one tiny per-source count aggregate (map-side
    combined, S rows out) broadcasts back onto the corpus; the keep
    decision is then a pure per-row integer predicate — no sort, no
    second corpus shuffle. Determinism across engines: the only float ops
    (pow for n^TAU) land on a 1e-6 grid as an int64 rate, and the gate
    compares bucket·1e6 < rate_u·2^32 in exact int64 arithmetic (both
    sides < 2^63), so the kept set is bit-reproducible and
    oracle-checkable.
    """
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_source"))
    # C = budget_frac · N / Σ n_i^tau  →  r_i = C · n_i^(tau-1), capped at 1
    norm = counts.agg(
        F.sum(F.pow(F.col("n_source").cast("double"), F.lit(float(tau)))).alias("z"),
        F.sum("n_source").alias("n_total"),
    )
    rates = counts.crossJoin(F.broadcast(norm)).select(
        "source",
        "n_source",
        F.least(
            F.lit(1.0),
            F.lit(float(budget_frac))
            * F.col("n_total").cast("double")
            * F.pow(F.col("n_source").cast("double"), F.lit(float(tau) - 1.0))
            / F.col("z"),
        ).alias("keep_rate"),
    )
    rates = rates.select(
        "source",
        "n_source",
        (F.floor(F.col("keep_rate") * F.lit(1e6) + F.lit(0.5000001)))
        .cast("bigint")
        .alias("keep_rate_u"),
    )
    bucket = _hash_bucket()
    return (
        docs.join(F.broadcast(rates), "source")
        .withColumn("sample_bucket", bucket)
        # exact int64 gate: bucket/2^32 < rate_u/1e6  ⇔  bucket·1e6 < rate_u·2^32
        .filter(
            F.col("sample_bucket") * F.lit(1_000_000)
            < F.col("keep_rate_u") * F.lit(2**32)
        )
        .select("doc_id", "source", "n_source", "keep_rate_u", "sample_bucket")
    )


# --------------------------------------------------------- mixture manifest
MIXTURE_BUDGET_TOKENS = 100_000  # tiny default for the synthetic corpus


def mixture_manifest(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    budget_tokens: int = MIXTURE_BUDGET_TOKENS,
    token_counter: str | None = None,
    group_col: str = "source",
) -> DataFrame:
    """Data-mixing plan: per source, how many tokens the training mix wants
    and the repeat factor over what the source has (the 'epochs per source'
    table every pretraining data card publishes — >1 means the source is
    seen multiple times, <1 means it is subsampled).

    ``weights`` are target mixture shares (normalized here; default uniform
    across observed sources). Explicit weights are STRICT: every observed
    source must have a key and every key must match an observed source — a
    typo'd name used to silently zero a corpus slice's share (advisor r06);
    now either side mismatching raises at execution, via a plan-side
    ``raise_error`` on the full-outer join of weights against observed
    sources (no driver-side collect — the check is an S-row broadcast
    join, distributed and lazy like the rest of the plan).

    Token supply is priced by the SAME counter sequence packing uses
    (:func:`spark_signals.datapipe.text.n_tokens_col`, default whitespace)
    so Σ ``n_tokens_available`` equals Σ ``pack_sequences().n_tokens`` on
    the same corpus (pinned by a reconciliation test). One S-row aggregate
    + closed-form per-row arithmetic; repeat_factor grids to 1e-6 so the
    manifest is engine-exact.
    """
    from spark_signals.datapipe.text import TOKEN_COUNTER_DEFAULT, n_tokens_col

    counter = TOKEN_COUNTER_DEFAULT if token_counter is None else token_counter
    counts = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens_col(F.col("text"), counter)).alias("n_tokens_available"),
    )
    if weights:
        total_w = math.fsum(weights.values())  # exactly-rounded: order-free shares
        wdf = docs.sparkSession.createDataFrame(
            [(s, float(wt) / total_w) for s, wt in sorted(weights.items())],
            f"{group_col} string, weight_share double",
        )
        joined = counts.join(F.broadcast(wdf), group_col, "full_outer")
        # the error branches are load-bearing inside target_share itself, so
        # column pruning can never drop the validation
        share = (
            F.when(
                F.col("n_docs").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "mixture_manifest: weight key matches no observed "
                        ),
                        F.lit(group_col + ": "),
                        F.col(group_col),
                    )
                ).cast("double"),
            )
            .when(
                F.col("weight_share").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit("mixture_manifest: group missing from weights: "),
                        F.col(group_col),
                    )
                ).cast("double"),
            )
            .otherwise(F.col("weight_share"))
        )
        shared = joined.withColumn("target_share", share).drop("weight_share")
    else:
        n_sources = counts.select(F.count(F.lit(1)).alias("s"))
        shared = counts.crossJoin(F.broadcast(n_sources)).withColumn(
            "target_share", F.lit(1.0) / F.col("s")
        ).drop("s")
    target = F.col("target_share") * F.lit(float(budget_tokens))
    repeat = F.floor(
        target / F.col("n_tokens_available") * F.lit(1e6) + F.lit(0.5000001)
    ) / F.lit(1e6)
    return shared.select(
        group_col,
        "n_docs",
        "n_tokens_available",
        F.floor(target + F.lit(0.5000001)).cast("bigint").alias("target_tokens"),
        repeat.alias("repeat_factor"),
        F.ceil(repeat).cast("bigint").alias("epochs"),
    )


def sql_mixture_manifest(
    budget_tokens: int = MIXTURE_BUDGET_TOKENS,
    weights: dict[str, float] | None = None,
    group_col: str = "source",
    token_counter: str | None = None,
) -> str:
    """Oracle twin of :func:`mixture_manifest`: uniform shares by default,
    or the normalized explicit-``weights`` shares (validation is a Spark
    plan behavior; the oracle mirrors the happy path). ``token_counter``
    mirrors the Spark side's pluggable pricing currency (r7 advisory: a
    non-default counter used to silently fall back to whitespace here,
    breaking oracle parity)."""
    from spark_signals.datapipe.text import TOKEN_COUNTER_DEFAULT, sql_n_tokens

    counter = TOKEN_COUNTER_DEFAULT if token_counter is None else token_counter

    if weights:
        total_w = math.fsum(weights.values())  # exactly-rounded: order-free shares
        case = f"CASE {group_col} "
        for src, wt in sorted(weights.items()):
            case += f"WHEN '{src}' THEN CAST({float(wt) / total_w!r} AS DOUBLE) "
        share = case + "END"
        shares_cte = "s AS (SELECT 1 AS one)"
    else:
        share = "(1.0 / n_sources)"
        shares_cte = "s AS (SELECT count(*) AS n_sources FROM counts)"
    return f"""
WITH counts AS (
  SELECT {group_col}, count(*) AS n_docs,
         CAST(SUM({sql_n_tokens("text", counter)}) AS BIGINT) AS n_tokens_available
  FROM documents GROUP BY {group_col}
),
{shares_cte}
SELECT {group_col}, n_docs, n_tokens_available,
       CAST(floor({share} * {budget_tokens} + 0.5000001) AS BIGINT) AS target_tokens,
       floor({share} * {budget_tokens} / n_tokens_available * 1e6 + 0.5000001) / 1e6 AS repeat_factor,
       CAST(ceil(floor({share} * {budget_tokens} / n_tokens_available * 1e6 + 0.5000001) / 1e6) AS BIGINT) AS epochs
FROM counts CROSS JOIN s"""


def _budget_targets(budget_tokens: int, weights: dict[str, float]) -> dict[str, int]:
    """Exact integer apportionment of ``budget_tokens`` across sources by
    ``weights`` (largest-remainder / Hamilton method, ties by source
    name): targets are nonnegative ints summing EXACTLY to the budget.
    Computed driver-side from the two literal inputs, so both engines
    receive identical target literals — no float share ever reaches a
    plan.

    ``math.fsum`` (exactly-rounded summation) makes the normalization
    permutation-invariant: plain float ``sum()`` is order-dependent, and
    for near-tied quotas the rounding difference flips which source wins
    the largest-remainder unit — two semantically-equal weight dicts in
    different insertion orders apportioned differently (found by
    ``test_budget_apportionment_properties``, falsifying example pinned
    there)."""
    if budget_tokens < 0:
        raise ValueError("budget_tokens must be nonnegative")
    for s, w in weights.items():
        if float(w) < 0:
            raise ValueError(f"weight for {s!r} must be nonnegative, got {w!r}")
    total = math.fsum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    quota = {s: budget_tokens * (float(w) / total) for s, w in weights.items()}
    base = {s: int(quota[s]) for s in quota}
    leftover = budget_tokens - sum(base.values())
    for s in sorted(quota, key=lambda s: (-(quota[s] - base[s]), s))[:leftover]:
        base[s] += 1
    return base


def mixture_budget_manifest(
    docs: DataFrame,
    budget_tokens: int = MIXTURE_BUDGET_TOKENS // 10,
    weights: dict[str, float] | None = None,
    group_col: str = "source",
    token_counter: str | None = None,
) -> DataFrame:
    """The KEEP-LIST form of the mixing plan: which documents make the cut
    when the trainer wants EXACTLY ``budget_tokens`` tokens at the given
    mixture — "sample 1T tokens at these weights", the operator a data
    card's mixture table is actually executed with. :func:`mixture_manifest`
    prices the plan (rates + epochs per source); this one materializes it
    as a deterministic document selection.

    Two exact-integer stages:

    1. apportion the budget into per-source integer targets — explicit
       ``weights`` via driver-side largest remainder (identical literals
       to both engines, strict key validation like mixture_manifest);
       default uniform via in-engine equal split (B div S, the first
       B mod S sources by name take +1) since S is data-dependent;
    2. per source, keep documents in md5-hash order (an unbiased
       without-replacement sample, stable as the corpus grows) while the
       running token total has not yet reached the target: a document is
       kept iff the tokens BEFORE it are < target, so the budget is
       overshot by less than one document and never undershot while
       supply lasts. A source with fewer tokens than its target keeps
       everything (the repeat-factor/epochs story for topping up is
       mixture_manifest's).

    Output: one row per kept document (doc_id, group, n_tokens,
    cum_tokens, target_tokens) — the manifest a shard writer consumes
    and an auditor can re-add.

    Shape at 100 TB: pricing is a per-row projection; the targets
    relation is S rows broadcast; the fill is ONE hash-partitioned
    window (exchange on group + in-partition sort on the hash), i.e. the
    same single-shuffle shape as any per-source ranking; integer window
    sums keep it partition-count- and engine-exact (Σ tokens < 2^63).
    """
    from pyspark.sql import Window

    from spark_signals.datapipe.text import TOKEN_COUNTER_DEFAULT, n_tokens_col

    counter = TOKEN_COUNTER_DEFAULT if token_counter is None else token_counter
    priced = docs.select(
        "doc_id",
        group_col,
        n_tokens_col(F.col("text"), counter).cast("bigint").alias("n_tokens"),
        _hash_bucket().alias("bucket"),
    )
    observed = priced.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    if weights:
        tmap = _budget_targets(budget_tokens, weights)
        tdf = docs.sparkSession.createDataFrame(
            sorted(tmap.items()), f"{group_col} string, target_tokens long"
        )
        joined = observed.join(F.broadcast(tdf), group_col, "full_outer")
        # strict key validation, plan-side like mixture_manifest (r06
        # advisory: a typo'd weight key must fail loudly, not zero a slice)
        target = (
            F.when(
                F.col("n_docs").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit("mixture_budget_manifest: weight key matches no "),
                        F.lit("observed " + group_col + ": "),
                        F.col(group_col),
                    )
                ).cast("long"),
            )
            .when(
                F.col("target_tokens").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit("mixture_budget_manifest: observed " + group_col),
                        F.lit(" has no weight key: "),
                        F.col(group_col),
                    )
                ).cast("long"),
            )
            .otherwise(F.col("target_tokens"))
        )
        targets = joined.select(group_col, target.alias("target_tokens"))
    else:
        whole = Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        n_sources = F.count(F.lit(1)).over(whole)
        rn = F.row_number().over(Window.orderBy(group_col))
        b = F.lit(int(budget_tokens)).cast("bigint")
        base = ((b - b % n_sources) / n_sources).cast("bigint")
        targets = observed.select(
            group_col,
            (base + F.when(rn <= b % n_sources, F.lit(1)).otherwise(F.lit(0))).alias(
                "target_tokens"
            ),
        )
    fill = (
        Window.partitionBy(group_col)
        .orderBy("bucket", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        priced.join(F.broadcast(targets), group_col)
        .withColumn("cum_tokens", F.sum("n_tokens").over(fill))
        .filter(F.col("cum_tokens") - F.col("n_tokens") < F.col("target_tokens"))
        .select("doc_id", group_col, "n_tokens", "cum_tokens", "target_tokens")
    )


def sql_mixture_budget_manifest(
    budget_tokens: int = MIXTURE_BUDGET_TOKENS // 10,
    weights: dict[str, float] | None = None,
    group_col: str = "source",
    token_counter: str | None = None,
) -> str:
    """Oracle twin of :func:`mixture_budget_manifest` (happy path; the
    strict-weights validation is a Spark plan behavior)."""
    from spark_signals.datapipe.text import TOKEN_COUNTER_DEFAULT, sql_n_tokens

    counter = TOKEN_COUNTER_DEFAULT if token_counter is None else token_counter
    if weights:
        tmap = _budget_targets(budget_tokens, weights)
        case = f"CASE {group_col} " + " ".join(
            f"WHEN '{s}' THEN CAST({t} AS BIGINT)" for s, t in sorted(tmap.items())
        ) + " END"
        tgt_cte = f"""tgt AS (
  SELECT {group_col}, {case} AS target_tokens FROM srcs
)"""
    else:
        tgt_cte = f"""tgt AS (
  SELECT {group_col},
         CAST({budget_tokens} // (SELECT count(*) FROM srcs) AS BIGINT)
         + CASE WHEN row_number() OVER (ORDER BY {group_col})
                     <= {budget_tokens} % (SELECT count(*) FROM srcs)
                THEN 1 ELSE 0 END AS target_tokens
  FROM srcs
)"""
    return f"""
WITH priced AS (
  SELECT doc_id, {group_col},
         CAST({sql_n_tokens("text", counter)} AS BIGINT) AS n_tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS bucket
  FROM documents
),
srcs AS (SELECT DISTINCT {group_col} FROM priced),
{tgt_cte},
cum AS (
  SELECT p.doc_id, p.{group_col}, p.n_tokens,
         SUM(p.n_tokens) OVER (PARTITION BY p.{group_col}
                               ORDER BY p.bucket, p.doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum_tokens,
         t.target_tokens
  FROM priced p JOIN tgt t USING ({group_col})
)
SELECT doc_id, {group_col}, n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens, target_tokens
FROM cum WHERE cum_tokens - n_tokens < target_tokens"""


# ------------------------------------------------------- dataset splitting
# Held-out evaluation needs train/val/test cuts that are (a) disjoint and
# exhaustive, (b) stable across runs/engines/partitionings, and (c) safe
# under incremental corpus growth (a document never migrates between
# splits when new documents arrive). The same md5 hash gate as the
# samplers gives all three: the split is a pure function of doc_id.
SPLIT_VAL_FRAC = 0.05
SPLIT_TEST_FRAC = 0.05


def split_train_val_test(
    docs: DataFrame,
    val_frac: float = SPLIT_VAL_FRAC,
    test_frac: float = SPLIT_TEST_FRAC,
) -> DataFrame:
    """(doc_id, lang, source, n_chars, split): deterministic 3-way split.

    bucket < test·2^32         → 'test'
    bucket < (test+val)·2^32   → 'val'
    else                       → 'train'

    Scale: per-row predicate over the hash bucket — no shuffle, no count
    pass, pushes past the scan; splits stay stable as the corpus grows
    because membership depends only on the document's own id."""
    if val_frac < 0 or test_frac < 0 or val_frac + test_frac >= 1:
        raise ValueError("need val_frac, test_frac >= 0 with val+test < 1")
    bucket = _hash_bucket()
    split = (
        F.when(bucket < F.lit(float(test_frac)) * F.lit(_HASH_SPACE), F.lit("test"))
        .when(
            bucket < F.lit(float(test_frac + val_frac)) * F.lit(_HASH_SPACE),
            F.lit("val"),
        )
        .otherwise(F.lit("train"))
    )
    return docs.select("doc_id", "lang", "source", "n_chars", split.alias("split"))


def sql_split_train_val_test(
    val_frac: float = SPLIT_VAL_FRAC, test_frac: float = SPLIT_TEST_FRAC
) -> str:
    return f"""
WITH keyed AS (
  SELECT doc_id, lang, source, n_chars,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS bucket
  FROM documents
)
SELECT doc_id, lang, source, n_chars,
       CASE
         WHEN bucket < CAST({test_frac!r} AS DOUBLE) * 4294967296.0 THEN 'test'
         WHEN bucket < CAST({test_frac + val_frac!r} AS DOUBLE) * 4294967296.0 THEN 'val'
         ELSE 'train'
       END AS split
FROM keyed"""


def sql_sample_temperature(
    tau: float = TEMPERATURE_TAU, budget_frac: float = TEMPERATURE_BUDGET_FRAC
) -> str:
    return f"""
WITH counts AS (
  SELECT source, count(*) AS n_source FROM documents GROUP BY source
),
norm AS (
  SELECT SUM(pow(CAST(n_source AS DOUBLE), CAST({tau!r} AS DOUBLE))) AS z,
         SUM(n_source) AS n_total
  FROM counts
),
rates AS (
  SELECT source, n_source,
         CAST(floor(least(CAST(1.0 AS DOUBLE),
             CAST({budget_frac!r} AS DOUBLE) * CAST(n_total AS DOUBLE)
             * pow(CAST(n_source AS DOUBLE), CAST({tau!r} AS DOUBLE) - 1.0) / z
           ) * 1e6 + 0.5000001) AS BIGINT) AS keep_rate_u
  FROM counts CROSS JOIN norm
),
keyed AS (
  SELECT d.doc_id, d.source, r.n_source, r.keep_rate_u,
         ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT AS sample_bucket
  FROM documents d JOIN rates r USING (source)
)
SELECT doc_id, source, n_source, keep_rate_u, sample_bucket
FROM keyed
WHERE sample_bucket * 1000000 < keep_rate_u * 4294967296"""


# ----------------------------------------------- DSIR importance scoring
# Data Selection with Importance Resampling (Xie et al. 2023): score raw
# documents by the log-likelihood ratio of hashed n-gram bag models of a
# TARGET corpus (the distribution you want more of — wiki, textbooks,
# curated seed data) vs the RAW corpus, then keep raw docs in proportion
# to the ratio. The production recipe behind "make CommonCrawl look like
# Wikipedia" data selection, and the generative-model counterpart of the
# discriminative quality classifier (classifier.quality_logreg).
DSIR_BUCKETS = 4096  # hashed-feature vocabulary (Xie et al. use 10k-ish)
_LR_GRID = 1_000_000


def dsir_logratio(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(doc_id, n_terms, logratio_u, avg_logratio): per raw document, the
    summed log p_target/p_raw over its hashed unigram buckets (Laplace
    +1 smoothing over the bucket vocabulary). ``logratio_u`` is the exact
    int64 sum of per-BUCKET 1e-6-gridded log-ratios, so cross-engine and
    cross-partitioning sums are bit-stable (the lm_unigram_quality
    contract); positive = looks more like the target.

    Shape at 100 TB: two corpus explode+count aggregates (map-side
    combined) reduce both corpora to n_buckets-row models; the D-row
    log-ratio table broadcasts onto the raw corpus's exploded words — one
    shuffle per corpus for the counts, one for the per-doc sum, nothing
    pairwise anywhere. The bucket spine is a literal sequence, so buckets
    unseen in either corpus still carry their smoothed prior."""
    from spark_signals.datapipe.text import words_col
    from spark_signals.datapipe.util import explode_strings

    def bucket(col: F.Column) -> F.Column:
        return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % F.lit(
            n_buckets
        )

    def bucket_counts(docs: DataFrame) -> DataFrame:
        w = explode_strings(
            docs.select(words_col(F.col("text")).alias("words")), F.col("words"), "word"
        ).filter(F.col("word") != "")
        return w.groupBy(bucket(F.col("word")).alias("b")).agg(
            F.count(F.lit(1)).alias("c")
        )

    spark = raw_docs.sparkSession
    spine = spark.range(n_buckets).select(F.col("id").alias("b"))
    tgt = bucket_counts(target_docs)
    raw = bucket_counts(raw_docs)
    # coalesce: an EMPTY corpus sums to NULL in Spark but COUNT(*)=0 in
    # the oracle — pin both to 0 so the smoothed prior still prices docs
    t_tot = tgt.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("t_total"))
    r_tot = raw.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("r_total"))
    model = (
        spine.join(tgt.withColumnRenamed("c", "tc"), "b", "left")
        .join(raw.withColumnRenamed("c", "rc"), "b", "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "b",
            F.floor(
                F.log(
                    (
                        (F.coalesce("tc", F.lit(0)) + F.lit(1.0))
                        / (F.col("t_total") + F.lit(float(n_buckets)))
                    )
                    / (
                        (F.coalesce("rc", F.lit(0)) + F.lit(1.0))
                        / (F.col("r_total") + F.lit(float(n_buckets)))
                    )
                )
                * F.lit(float(_LR_GRID))
                + F.lit(0.5000001)
            )
            .cast("long")
            .alias("lr_u"),
        )
    )
    doc_words = explode_strings(
        raw_docs.select("doc_id", words_col(F.col("text")).alias("words")),
        F.col("words"),
        "word",
        "doc_id",
    ).filter(F.col("word") != "")
    scored = doc_words.select("doc_id", bucket(F.col("word")).alias("b")).join(
        F.broadcast(model), "b"
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("lr_u").alias("logratio_u"),
    ).select(
        "doc_id",
        "n_terms",
        "logratio_u",
        (F.col("logratio_u").cast("double") / F.col("n_terms") / F.lit(float(_LR_GRID))).alias(
            "avg_logratio"
        ),
    )


def dsir_snapshot(docs: DataFrame, target_source: str = "src0") -> DataFrame:
    """Driver-checkable face: one source plays the curated TARGET, every
    other source is the RAW pool being scored."""
    target = docs.filter(F.col("source") == target_source)
    raw = docs.filter(F.col("source") != target_source)
    return dsir_logratio(raw, target)


def sql_dsir_logratio(
    n_buckets: int = DSIR_BUCKETS, target_source: str = "src0"
) -> str:
    """Oracle twin of :func:`dsir_snapshot` — same md5 bucket lanes, same
    smoothing arithmetic in the same operation order, per-bucket grid
    before the int64 doc sum."""
    from spark_signals.datapipe.text import ASCII_LO, ASCII_UP

    lower = f"translate(text, '{ASCII_UP}', '{ASCII_LO}')"
    words = f"list_filter(string_split_regex({lower}, '[ \t\n\x0b\f\r]+'), w -> w <> '')"
    return f"""
WITH tgtw AS (
  SELECT ('0x' || substring(md5(word), 1, 8))::BIGINT % {n_buckets} AS b
  FROM (SELECT unnest({words}) AS word FROM documents WHERE source = '{target_source}')
),
raww AS (
  SELECT doc_id, ('0x' || substring(md5(word), 1, 8))::BIGINT % {n_buckets} AS b
  FROM (SELECT doc_id, unnest({words}) AS word FROM documents WHERE source <> '{target_source}')
),
tc AS (SELECT b, COUNT(*)::BIGINT AS tc FROM tgtw GROUP BY b),
rc AS (SELECT b, COUNT(*)::BIGINT AS rc FROM raww GROUP BY b),
tt AS (SELECT COUNT(*)::BIGINT AS t_total FROM tgtw),
rt AS (SELECT COUNT(*)::BIGINT AS r_total FROM raww),
spine AS (SELECT unnest(range(0, {n_buckets})) AS b),
model AS (
  SELECT s.b,
         CAST(floor(ln(((COALESCE(tc.tc, 0) + 1.0) / (tt.t_total + {n_buckets}.0))
                      / ((COALESCE(rc.rc, 0) + 1.0) / (rt.r_total + {n_buckets}.0)))
                    * {_LR_GRID}.0 + 0.5000001) AS BIGINT) AS lr_u
  FROM spine s
  LEFT JOIN tc ON tc.b = s.b
  LEFT JOIN rc ON rc.b = s.b
  CROSS JOIN tt CROSS JOIN rt
)
SELECT w.doc_id,
       COUNT(*)::BIGINT AS n_terms,
       SUM(m.lr_u)::BIGINT AS logratio_u,
       CAST(SUM(m.lr_u) AS DOUBLE) / COUNT(*) / {_LR_GRID}.0 AS avg_logratio
FROM raww w JOIN model m ON m.b = w.b
GROUP BY w.doc_id"""


# --------------------------------------------------- curriculum schedule
# Temperature-ANNEALED mixing: modern pretraining runs don't hold the
# mixture fixed — they start near raw supply shares (T≈1, the cheap web
# mass dominates) and flatten toward uniform late in training so rare /
# curated sources get their epochs when they matter most (the "data
# curriculum" in the Doremi/DataComp-LM lineage). Each epoch's row set is
# exactly a mixture_manifest at that epoch's temperature.
CURRICULUM_EPOCHS = 4
CURRICULUM_T_START = 1.0
CURRICULUM_T_END = 2.5


def mixture_curriculum(
    docs: DataFrame,
    epochs: int = CURRICULUM_EPOCHS,
    t_start: float = CURRICULUM_T_START,
    t_end: float = CURRICULUM_T_END,
    budget_tokens_per_epoch: int = MIXTURE_BUDGET_TOKENS,
    token_counter: str | None = None,
    group_col: str = "source",
) -> DataFrame:
    """Per-epoch annealed mixture schedule: (epoch, group, temperature,
    n_tokens_available, weight, target_tokens, repeat_factor), with
    weight_g(e) ∝ supply_g^(1/T_e) normalized within the epoch and T_e
    linear from ``t_start`` (epoch 1) to ``t_end`` (final epoch).

    Shape at 100 TB: ONE corpus-scale token-pricing aggregate (the same
    S-row relation mixture_manifest builds, map-side combined); everything
    after is closed-form arithmetic over S×E rows plus an E-row
    normalization join — nothing corpus-sized moves twice. The only float
    op (pow) lands on the 1e-6 grid before any downstream use, the same
    determinism contract as sample_temperature."""
    from spark_signals.datapipe.text import TOKEN_COUNTER_DEFAULT, n_tokens_col

    counter = TOKEN_COUNTER_DEFAULT if token_counter is None else token_counter
    spark = docs.sparkSession
    counts = docs.groupBy(group_col).agg(
        F.sum(n_tokens_col(F.col("text"), counter)).alias("n_tokens_available")
    )
    edf = spark.range(1, epochs + 1).select(F.col("id").alias("epoch"))
    if epochs == 1:
        temp = F.lit(float(t_start))
    else:
        temp = F.lit(float(t_start)) + (
            F.lit(float(t_end)) - F.lit(float(t_start))
        ) * (F.col("epoch") - F.lit(1)).cast("double") / F.lit(float(epochs - 1))
    crossed = counts.crossJoin(F.broadcast(edf)).select(
        "epoch",
        group_col,
        "n_tokens_available",
        sround(temp, 6).alias("temperature"),
        F.pow(
            F.col("n_tokens_available").cast("double"), F.lit(1.0) / temp
        ).alias("powered"),
    )
    z = crossed.groupBy("epoch").agg(F.sum("powered").alias("z"))
    weight = sround(F.col("powered") / F.col("z"), 6)
    target = F.floor(
        weight * F.lit(float(budget_tokens_per_epoch)) + F.lit(0.5000001)
    ).cast("bigint")
    return (
        crossed.join(F.broadcast(z), "epoch")
        .select(
            "epoch",
            group_col,
            "temperature",
            "n_tokens_available",
            weight.alias("weight"),
            target.alias("target_tokens"),
            (
                F.floor(
                    target.cast("double")
                    / F.col("n_tokens_available")
                    * F.lit(1e6)
                    + F.lit(0.5000001)
                )
                / F.lit(1e6)
            ).alias("repeat_factor"),
        )
    )


def sql_mixture_curriculum(
    epochs: int = CURRICULUM_EPOCHS,
    t_start: float = CURRICULUM_T_START,
    t_end: float = CURRICULUM_T_END,
    budget_tokens_per_epoch: int = MIXTURE_BUDGET_TOKENS,
    token_counter: str | None = None,
    group_col: str = "source",
) -> str:
    """Oracle twin of :func:`mixture_curriculum`."""
    from spark_signals.datapipe.text import TOKEN_COUNTER_DEFAULT, sql_n_tokens

    counter = TOKEN_COUNTER_DEFAULT if token_counter is None else token_counter
    if epochs == 1:
        temp = f"CAST({float(t_start)!r} AS DOUBLE)"
    else:
        temp = (
            f"(CAST({float(t_start)!r} AS DOUBLE) + "
            f"(CAST({float(t_end)!r} AS DOUBLE) - CAST({float(t_start)!r} AS DOUBLE))"
            f" * CAST(epoch - 1 AS DOUBLE) / CAST({float(epochs - 1)!r} AS DOUBLE))"
        )
    grid = "floor({x} * 1e6 + 0.5000001) / 1e6"
    w = grid.format(x="(powered / z)")
    tgt = f"CAST(floor({w} * CAST({float(budget_tokens_per_epoch)!r} AS DOUBLE) + 0.5000001) AS BIGINT)"
    return f"""
WITH counts AS (
  SELECT {group_col},
         CAST(SUM({sql_n_tokens("text", counter)}) AS BIGINT) AS n_tokens_available
  FROM documents GROUP BY {group_col}
),
epochs AS (SELECT CAST(unnest(range(1, {epochs + 1})) AS BIGINT) AS epoch),
crossed AS (
  SELECT epoch, {group_col}, n_tokens_available,
         {grid.format(x=temp)} AS temperature,
         pow(CAST(n_tokens_available AS DOUBLE), 1.0 / {temp}) AS powered
  FROM counts CROSS JOIN epochs
),
z AS (SELECT epoch, SUM(powered) AS z FROM crossed GROUP BY epoch)
SELECT c.epoch, c.{group_col}, c.temperature, c.n_tokens_available,
       {w} AS weight,
       {tgt} AS target_tokens,
       floor(CAST({tgt} AS DOUBLE) / c.n_tokens_available * 1e6 + 0.5000001) / 1e6 AS repeat_factor
FROM crossed c JOIN z USING (epoch)"""


# ------------------------------------------------ split leakage (eval QA)
def split_leakage_report(
    docs: DataFrame,
    val_frac: float = SPLIT_VAL_FRAC,
    test_frac: float = SPLIT_TEST_FRAC,
    split_rel: DataFrame | None = None,
    pairs_rel: DataFrame | None = None,
) -> DataFrame:
    """Eval-integrity QA: near-duplicate pairs grouped by the splits they
    land in — a val/test document with a near-dup twin in train leaks
    training signal into evaluation even after benchmark decontamination
    (Lee et al. 2022 §6.2 measure exactly this val↔train overlap
    inflating perplexity wins). Deterministic-hash splits do NOT prevent
    it: near-duplicates hash independently, so they straddle splits at
    the background dup rate.

    Composes the verified MinHash-LSH pair relation with the
    hash-bucket split: one row per (split_lo, split_hi) class —
    ``is_cross_split`` marks the leakage classes, within-split classes
    stay as the dup-density baseline. ``n_docs`` counts distinct
    documents involved on either side; ``max_jaccard_u`` is the hottest
    pair on the exact 1e-6 grid (the repo's float-parity currency).
    Remediation is the existing machinery: route flagged pairs through
    dedup_clusters' canonical rule, or re-split at the CLUSTER grain
    (hash the canonical doc_id, the Lee-et-al. recommendation).

    Shape at 100 TB: the pair relation is the banding-bounded,
    candidate-verified MinHash output (never all-pairs); the split
    relation is a per-row projection; attaching splits is two doc_id
    equi-joins with the (small) pair side driving; the report aggregate
    is three-ish rows. Nothing new shuffles the corpus.
    """
    from spark_signals.datapipe.dedup import dedup_minhash_lsh

    pairs = pairs_rel if pairs_rel is not None else dedup_minhash_lsh(docs)
    spl = (
        split_rel
        if split_rel is not None
        else split_train_val_test(docs, val_frac, test_frac).select("doc_id", "split")
    )
    j = (
        pairs.join(
            spl.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")),
            "doc_a",
        )
        .join(
            spl.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")),
            "doc_b",
        )
        .select(
            F.least("split_a", "split_b").alias("split_lo"),
            F.greatest("split_a", "split_b").alias("split_hi"),
            "doc_a",
            "doc_b",
            F.floor(F.col("jaccard") * 1e6 + F.lit(0.5000001))
            .cast("bigint")
            .alias("j_u"),
        )
    )
    per_pair = j.groupBy("split_lo", "split_hi").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.max("j_u").alias("max_jaccard_u"),
    )
    members = j.select("split_lo", "split_hi", F.col("doc_a").alias("doc_id")).unionByName(
        j.select("split_lo", "split_hi", F.col("doc_b").alias("doc_id"))
    )
    per_doc = members.groupBy("split_lo", "split_hi").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    return per_pair.join(per_doc, ["split_lo", "split_hi"]).select(
        "split_lo",
        "split_hi",
        (F.col("split_lo") != F.col("split_hi")).alias("is_cross_split"),
        F.col("n_pairs").cast("bigint"),
        F.col("n_docs").cast("bigint"),
        F.col("max_jaccard_u").cast("bigint"),
    )


def sql_split_leakage_report(
    val_frac: float = SPLIT_VAL_FRAC, test_frac: float = SPLIT_TEST_FRAC
) -> str:
    from spark_signals.datapipe.dedup import SQL_DEDUP_MINHASH

    return f"""
WITH pairs AS (
  SELECT doc_a, doc_b,
         CAST(floor(jaccard * 1e6 + 0.5000001) AS BIGINT) AS j_u
  FROM ({SQL_DEDUP_MINHASH}) mh
),
spl AS (
  SELECT doc_id,
         CASE
           WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                < CAST({test_frac!r} AS DOUBLE) * 4294967296.0 THEN 'test'
           WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                < CAST({test_frac + val_frac!r} AS DOUBLE) * 4294967296.0 THEN 'val'
           ELSE 'train'
         END AS split
  FROM documents
),
j AS (
  SELECT least(sa.split, sb.split) AS split_lo,
         greatest(sa.split, sb.split) AS split_hi,
         p.doc_a, p.doc_b, p.j_u
  FROM pairs p
  JOIN spl sa ON sa.doc_id = p.doc_a
  JOIN spl sb ON sb.doc_id = p.doc_b
),
per_pair AS (
  SELECT split_lo, split_hi, COUNT(*) AS n_pairs, MAX(j_u) AS max_jaccard_u
  FROM j GROUP BY split_lo, split_hi
),
members AS (
  SELECT split_lo, split_hi, doc_a AS doc_id FROM j
  UNION ALL
  SELECT split_lo, split_hi, doc_b AS doc_id FROM j
),
per_doc AS (
  SELECT split_lo, split_hi, COUNT(DISTINCT doc_id) AS n_docs
  FROM members GROUP BY split_lo, split_hi
)
SELECT p.split_lo, p.split_hi,
       p.split_lo <> p.split_hi AS is_cross_split,
       CAST(p.n_pairs AS BIGINT) AS n_pairs,
       CAST(d.n_docs AS BIGINT) AS n_docs,
       CAST(p.max_jaccard_u AS BIGINT) AS max_jaccard_u
FROM per_pair p JOIN per_doc d USING (split_lo, split_hi)"""


def split_train_val_test_clustered(
    docs: DataFrame,
    val_frac: float = SPLIT_VAL_FRAC,
    test_frac: float = SPLIT_TEST_FRAC,
) -> DataFrame:
    """The leakage-proof split — :func:`split_leakage_report`'s
    remediation, implemented: bucket on the near-dup CLUSTER id instead
    of the doc id, so every detected near-duplicate twin lands in the
    SAME split by construction (re-splitting at the cluster grain, the
    Lee-et-al.-2022 recommendation). Returns (doc_id, cluster_id,
    split); singleton documents keep cluster_id = doc_id, so on a
    dup-free corpus this IS :func:`split_train_val_test`.

    The split fractions now apportion CLUSTERS, not documents — on real
    corpora (dup clusters are a small minority and sizes are Zipfian)
    the realized doc-level fractions drift negligibly; the report face
    quantifies the residual (zero cross-split pairs, by construction,
    for every pair the detector finds — undetected sub-threshold twins
    remain, as they do under any detector).

    Shape at 100 TB: the CC labels are the existing O(log n)
    alternating-star passes over the banding-bounded pair relation; the
    split is then a per-row hash of the label. One doc_id equi-join
    attaches labels to documents.
    """
    from spark_signals.datapipe.dedup import dedup_clusters

    cl = dedup_clusters(docs).select("doc_id", "cluster_id")
    bucket = F.conv(
        F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    split = (
        F.when(bucket < F.lit(float(test_frac)) * F.lit(_HASH_SPACE), F.lit("test"))
        .when(
            bucket < F.lit(float(test_frac + val_frac)) * F.lit(_HASH_SPACE),
            F.lit("val"),
        )
        .otherwise(F.lit("train"))
    )
    return cl.select("doc_id", "cluster_id", split.alias("split"))


def _sql_km_pairs_cc(val_frac: float, test_frac: float) -> str:
    """Shared oracle CTE chain: KM-family MinHash pairs (the SAME banding
    the Spark side uses — never mixed with SQL_DEDUP_CLUSTERS' alternate
    banding, so pairs and clusters stay one formulation end-to-end) →
    recursive connected components → cluster-hash split."""
    from spark_signals.datapipe.dedup import SQL_DEDUP_MINHASH

    return f"""
pairs AS (
  SELECT doc_a, doc_b,
         CAST(floor(jaccard * 1e6 + 0.5000001) AS BIGINT) AS j_u
  FROM ({SQL_DEDUP_MINHASH}) mh
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach AS (
  SELECT doc_id AS node, doc_id AS comp FROM documents
  UNION
  SELECT e.src AS node, r.comp
  FROM reach r JOIN edges e ON e.dst = r.node
),
comp AS (
  SELECT node AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY node
),
spl AS (
  SELECT doc_id, cluster_id,
         CASE
           WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))::BIGINT
                < CAST({test_frac!r} AS DOUBLE) * 4294967296.0 THEN 'test'
           WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))::BIGINT
                < CAST({test_frac + val_frac!r} AS DOUBLE) * 4294967296.0 THEN 'val'
           ELSE 'train'
         END AS split
  FROM comp
)"""


def sql_split_train_val_test_clustered(
    val_frac: float = SPLIT_VAL_FRAC, test_frac: float = SPLIT_TEST_FRAC
) -> str:
    return f"""
WITH RECURSIVE {_sql_km_pairs_cc(val_frac, test_frac)}
SELECT doc_id, cluster_id, split FROM spl"""


def split_then_verify(
    docs: DataFrame,
    val_frac: float = SPLIT_VAL_FRAC,
    test_frac: float = SPLIT_TEST_FRAC,
) -> tuple[DataFrame, DataFrame]:
    """The split-then-verify stage a curation pipeline runs before
    publishing splits: the CLUSTER-grain split and the leakage report
    evaluated against it, from ONE shared MinHash pass. Returns
    ``(splits, report)`` — splits is (doc_id, cluster_id, split) (the
    :func:`split_train_val_test_clustered` schema, same md5(cluster)
    bucket arithmetic), report is :func:`split_leakage_report` over that
    split, whose emptiness of cross-split classes is the publishable
    proof. ONE MinHash pass: the pair relation is already pinned
    (materialized) inside dedup_minhash_lsh, so the cluster labels and
    the report read the same blocks — measured at decade scale this
    halves the proof face (296 s -> 127.5 s, SCALE.md r13) vs
    recomputing pairs inside dedup_clusters."""
    from spark_signals.datapipe.dedup import connected_components, dedup_minhash_lsh

    pairs = dedup_minhash_lsh(docs)
    comp = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        docs.select(F.col("doc_id").alias("id")),
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("comp").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    splits = comp.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        F.when(bucket < F.lit(float(test_frac)) * F.lit(_HASH_SPACE), F.lit("test"))
        .when(
            bucket < F.lit(float(test_frac + val_frac)) * F.lit(_HASH_SPACE),
            F.lit("val"),
        )
        .otherwise(F.lit("train"))
        .alias("split"),
    )
    report = split_leakage_report(
        docs,
        val_frac,
        test_frac,
        split_rel=splits.select("doc_id", "split"),
        pairs_rel=pairs,
    )
    return splits, report


def split_leakage_clustered(
    docs: DataFrame,
    val_frac: float = SPLIT_VAL_FRAC,
    test_frac: float = SPLIT_TEST_FRAC,
) -> DataFrame:
    """:func:`split_leakage_report` evaluated against the CLUSTERED split
    — the verified-zero face: every pair the detector finds has both
    members in one cluster, hence one split, so the report contains
    within-split classes ONLY (the dup-density baseline) and its
    emptiness of cross-split rows is the remediation's proof, checked
    value-level like everything else. (The report half of
    :func:`split_then_verify`.)"""
    return split_then_verify(docs, val_frac, test_frac)[1]


def sql_split_leakage_clustered(
    val_frac: float = SPLIT_VAL_FRAC, test_frac: float = SPLIT_TEST_FRAC
) -> str:
    return f"""
WITH RECURSIVE {_sql_km_pairs_cc(val_frac, test_frac)},
j AS (
  SELECT least(sa.split, sb.split) AS split_lo,
         greatest(sa.split, sb.split) AS split_hi,
         p.doc_a, p.doc_b, p.j_u
  FROM pairs p
  JOIN spl sa ON sa.doc_id = p.doc_a
  JOIN spl sb ON sb.doc_id = p.doc_b
),
per_pair AS (
  SELECT split_lo, split_hi, COUNT(*) AS n_pairs, MAX(j_u) AS max_jaccard_u
  FROM j GROUP BY split_lo, split_hi
),
members AS (
  SELECT split_lo, split_hi, doc_a AS doc_id FROM j
  UNION ALL
  SELECT split_lo, split_hi, doc_b AS doc_id FROM j
),
per_doc AS (
  SELECT split_lo, split_hi, COUNT(DISTINCT doc_id) AS n_docs
  FROM members GROUP BY split_lo, split_hi
)
SELECT p.split_lo, p.split_hi,
       p.split_lo <> p.split_hi AS is_cross_split,
       CAST(p.n_pairs AS BIGINT) AS n_pairs,
       CAST(d.n_docs AS BIGINT) AS n_docs,
       CAST(p.max_jaccard_u AS BIGINT) AS max_jaccard_u
FROM per_pair p JOIN per_doc d USING (split_lo, split_hi)"""
