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

from spark_signals.checkpoint import pin

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
         list_filter(string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\x0b\f\r]+'), w -> w <> '') AS words
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


# ------------------------------------------------- fuzzy (near-dup) decontam
DECONTAM_FUZZY_JACCARD = 0.5  # match the GPT-3-appendix-style fuzzy gate


def _fuzzy_verified(
    train: "DataFrame",
    eval_docs: "DataFrame",
    threshold: float,
    bench_col: str | None = None,
) -> "DataFrame":
    """The ONE band-probe/verify chain both fuzzy faces share: training
    docs probe the broadcast eval band index, exact shingle Jaccard
    verifies candidates only, and the verified matches aggregate per
    (``bench_col``?, doc_id) as (n_eval_matches, max_jaccard_u) on the
    1e-6 int grid. The batch signatures persist for the call and the
    (small) verified relation returns materialized, so callers never
    reference the unpersisted lineage."""
    from spark_signals.datapipe.dedup import (
        NUM_HASHES,
        _band_keys,
        _km_row_sigs,
        _with_shingles,
        band_index,
    )

    group_cols = ([bench_col] if bench_col else []) + ["doc_id"]
    idx = band_index(eval_docs.select("doc_id", "text"))
    if bench_col:
        idx = idx.join(eval_docs.select("doc_id", bench_col), "doc_id")
    idx = idx.select(
        "band",
        "k1",
        "k2",
        *([bench_col] if bench_col else []),
        F.col("doc_id").alias("eval_id"),
    )
    sh_t = _km_row_sigs(
        _with_shingles(train).select("doc_id", "shingles"),
        "shingles",
        NUM_HASHES,
        "shingles",
    ).persist()
    try:
        cand = (
            _band_keys(sh_t)
            .join(F.broadcast(idx), ["band", "k1", "k2"])
            .select(*group_cols, "eval_id")
            .distinct()
        )
        eval_sh = _with_shingles(
            eval_docs.select("doc_id", "text").join(
                cand.select(F.col("eval_id").alias("doc_id")).distinct(),
                "doc_id",
                "left_semi",
            )
        ).select(F.col("doc_id").alias("eval_id"), F.col("shingles").alias("sh_e"))
        inter = F.size(F.array_intersect("sh_t", "sh_e"))
        union = F.size("sh_t") + F.size("sh_e") - inter
        jac_u = F.floor(
            inter.cast("double") / union * F.lit(1e6) + F.lit(0.5000001)
        ).cast("long")
        return (
            cand.join(
                sh_t.select("doc_id", F.col("shingles").alias("sh_t")), "doc_id"
            )
            .join(eval_sh, "eval_id")
            .select(*group_cols, jac_u.alias("jaccard_u"))
            .filter(F.col("jaccard_u") >= F.lit(int(threshold * 1e6)))
            .groupBy(*group_cols)
            .agg(
                F.count(F.lit(1)).alias("n_eval_matches"),
                F.max("jaccard_u").alias("max_jaccard_u"),
            )
            .transform(pin)
        )
    finally:
        sh_t.unpersist()




def decontaminate_neardup(
    train: DataFrame,
    eval_docs: DataFrame,
    threshold: float = DECONTAM_FUZZY_JACCARD,
) -> DataFrame:
    """Fuzzy decontamination: flag training documents that NEAR-duplicate
    an eval document (paraphrased or lightly-edited leakage the exact
    n-gram gate misses): (doc_id, source, n_eval_matches, max_jaccard_u,
    is_contaminated_fuzzy). ``max_jaccard_u`` is the best verified shingle
    Jaccard on the 1e-6 int grid (0 when unmatched).

    Reuses the incremental near-dup machinery with the EVAL SET as the
    indexed snapshot (dedup.band_index): training docs probe the eval
    band index by equi-join, exact Jaccard verifies candidates only —
    the eval suite is tiny, so the index broadcasts and the corpus never
    shuffles anything but its candidate pairs. The probe/verify chain is
    :func:`_fuzzy_verified`, shared verbatim with the per-benchmark face
    (:func:`decontam_fuzzy_report`) so the two cannot drift.
    """
    if "doc_id" not in eval_docs.columns:
        eval_docs = eval_docs.withColumn("doc_id", F.monotonically_increasing_id())
    verified = _fuzzy_verified(train, eval_docs, threshold)
    return (
        train.select("doc_id", "source")
        .join(verified, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_eval_matches", F.lit(0).cast("long")).alias(
                "n_eval_matches"
            ),
            F.coalesce("max_jaccard_u", F.lit(0).cast("long")).alias(
                "max_jaccard_u"
            ),
            (F.coalesce("n_eval_matches", F.lit(0)) > 0).alias(
                "is_contaminated_fuzzy"
            ),
        )
    )


def decontaminate_fuzzy(
    docs: DataFrame,
    eval_source: str = EVAL_SOURCE,
    threshold: float = DECONTAM_FUZZY_JACCARD,
) -> DataFrame:
    """Driver face: source-predicate split, same as :func:`decontaminate`."""
    return decontaminate_neardup(
        docs.filter(F.col("source") != eval_source),
        docs.filter(F.col("source") == eval_source),
        threshold,
    )


def sql_decontaminate_fuzzy(
    eval_source: str = EVAL_SOURCE,
    threshold: float = DECONTAM_FUZZY_JACCARD,
    source: str = "documents",
) -> str:
    """Oracle twin of :func:`decontaminate_fuzzy`: the scoped minhash CTEs
    for both splits, band-key candidates, exact-Jaccard verify, per-doc
    best match."""
    from spark_signals.datapipe.dedup import _sql_minhash_ctes

    thr_u = int(threshold * 1e6)
    return f"""
WITH evald AS (SELECT * FROM {source} WHERE source = '{eval_source}'),
traind AS (SELECT * FROM {source} WHERE source <> '{eval_source}'),
{_sql_minhash_ctes("evald", "e_")},
{_sql_minhash_ctes("traind", "t_")},
cand AS (
  SELECT DISTINCT t.doc_id, e.doc_id AS eval_id
  FROM t_bands t JOIN e_bands e
    ON t.band = e.band AND t.k1 = e.k1 AND t.k2 = e.k2
),
verified AS (
  SELECT c.doc_id,
         COUNT(*)::BIGINT AS n_eval_matches,
         MAX(jaccard_u)::BIGINT AS max_jaccard_u
  FROM (
    SELECT c.doc_id, c.eval_id,
           CAST(floor(CAST(len(list_intersect(ts.shingles, es.shingles)) AS DOUBLE)
             / (len(ts.shingles) + len(es.shingles) - len(list_intersect(ts.shingles, es.shingles)))
             * 1e6 + 0.5000001) AS BIGINT) AS jaccard_u
    FROM cand c
    JOIN t_sh ts ON ts.doc_id = c.doc_id
    JOIN e_sh es ON es.doc_id = c.eval_id
  ) c
  WHERE jaccard_u >= {thr_u}
  GROUP BY c.doc_id
)
SELECT d.doc_id, d.source,
       COALESCE(v.n_eval_matches, 0)::BIGINT AS n_eval_matches,
       COALESCE(v.max_jaccard_u, 0)::BIGINT AS max_jaccard_u,
       COALESCE(v.n_eval_matches, 0) > 0 AS is_contaminated_fuzzy
FROM traind d LEFT JOIN verified v USING (doc_id)"""


# ----------------------------------------------- multi-benchmark report
# An eval battery is many suites, and the go/no-go question is per-suite:
# "which benchmarks does this corpus leak, and how badly?" — the table a
# data card publishes next to its decontamination method. One train-side
# digest pass serves EVERY benchmark at once: eval digests carry their
# suite name through the broadcast, so adding a 50th benchmark adds k rows
# to the broadcast, not a 50th corpus scan.
REPORT_BENCHES = ("src0", "src1")  # driver face: two sources stand in


def decontam_report(
    train: DataFrame, benchmarks: DataFrame, n: int = DECONTAM_NGRAM
) -> DataFrame:
    """Per-benchmark leakage summary: (bench, n_eval_docs,
    n_contaminated_train_docs, n_overlap_pairs, contamination_rate).

    ``benchmarks`` needs (bench, doc_id, text). A training document counts
    once per benchmark it overlaps (distinct (bench, doc_id) after the
    digest join); contamination_rate divides by the total training-doc
    count on the 1e-6 grid. Shape at 100 TB: ONE training-corpus digest
    explode joined against the broadcast (bench, digest) relation, a
    (bench, doc_id) dedup aggregate bounded by true overlap volume, and
    S-row marginals — benchmarks never touch the corpus a second time."""
    ev = (
        _ngram_digests(benchmarks.select("doc_id", "text"), n)
        .join(benchmarks.select("doc_id", "bench"), "doc_id")
        .select("bench", "digest")
        .distinct()
    )
    ev_sizes = benchmarks.groupBy("bench").agg(
        F.countDistinct("doc_id").alias("n_eval_docs")
    )
    hits = (
        _ngram_digests(train, n)
        .join(F.broadcast(ev), "digest")
        .groupBy("bench", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    per_bench = hits.groupBy("bench").agg(
        F.count(F.lit(1)).alias("n_contaminated_train_docs"),
        F.sum("n_overlap").cast("bigint").alias("n_overlap_pairs"),
    )
    total = train.agg(F.count(F.lit(1)).alias("n_train"))
    return (
        ev_sizes.join(per_bench, "bench", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "bench",
            "n_eval_docs",
            F.coalesce("n_contaminated_train_docs", F.lit(0).cast("long")).alias(
                "n_contaminated_train_docs"
            ),
            F.coalesce("n_overlap_pairs", F.lit(0).cast("long")).alias(
                "n_overlap_pairs"
            ),
            (
                F.floor(
                    F.coalesce("n_contaminated_train_docs", F.lit(0)).cast(
                        "double"
                    )
                    / F.col("n_train")
                    * F.lit(1e6)
                    + F.lit(0.5000001)
                )
                / F.lit(1e6)
            ).alias("contamination_rate"),
        )
    )


def decontam_report_snapshot(
    docs: DataFrame, benches: tuple[str, ...] = REPORT_BENCHES,
    n: int = DECONTAM_NGRAM,
) -> DataFrame:
    """Driver-checkable face: sources in ``benches`` stand in as two eval
    suites; everything else is the training corpus."""
    bench_list = list(benches)
    benchmarks = docs.filter(F.col("source").isin(bench_list)).select(
        "doc_id", "text", F.col("source").alias("bench")
    )
    train = docs.filter(~F.col("source").isin(bench_list))
    return decontam_report(train, benchmarks, n)


def sql_decontam_report(
    benches: tuple[str, ...] = REPORT_BENCHES,
    n: int = DECONTAM_NGRAM,
    source: str = "documents",
) -> str:
    in_list = ", ".join(f"'{b}'" for b in benches)
    return f"""
WITH d AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\x0b\f\r]+'), w -> w <> '') AS words
  FROM {source}
),
s AS (
  SELECT doc_id, source, list_distinct({SQL_SHINGLES(n)}) AS grams FROM d
),
g AS (
  SELECT doc_id, source, md5(unnest(grams)) AS digest FROM s
),
ev AS (
  SELECT DISTINCT source AS bench, digest FROM g WHERE source IN ({in_list})
),
ev_sizes AS (
  SELECT source AS bench, count(DISTINCT doc_id) AS n_eval_docs
  FROM {source} WHERE source IN ({in_list}) GROUP BY source
),
hits AS (
  SELECT ev.bench, g.doc_id, count(*) AS n_overlap
  FROM g JOIN ev USING (digest)
  WHERE g.source NOT IN ({in_list})
  GROUP BY ev.bench, g.doc_id
),
per_bench AS (
  SELECT bench, count(*) AS n_contaminated_train_docs,
         CAST(SUM(n_overlap) AS BIGINT) AS n_overlap_pairs
  FROM hits GROUP BY bench
),
total AS (
  SELECT count(*) AS n_train FROM {source} WHERE source NOT IN ({in_list})
)
SELECT e.bench,
       CAST(e.n_eval_docs AS BIGINT) AS n_eval_docs,
       CAST(coalesce(p.n_contaminated_train_docs, 0) AS BIGINT) AS n_contaminated_train_docs,
       CAST(coalesce(p.n_overlap_pairs, 0) AS BIGINT) AS n_overlap_pairs,
       floor(CAST(coalesce(p.n_contaminated_train_docs, 0) AS DOUBLE) / t.n_train * 1e6 + 0.5000001) / 1e6 AS contamination_rate
FROM ev_sizes e LEFT JOIN per_bench p USING (bench) CROSS JOIN total t"""


# --------------------------------------- benchmark x source contamination
def decontam_source_matrix(
    train: DataFrame, benchmarks: DataFrame, n: int = DECONTAM_NGRAM
) -> DataFrame:
    """WHERE the contamination lives: per (bench, source) cell, the
    training documents of that SOURCE overlapping that benchmark — the
    triage drill-down behind :func:`decontam_report`'s per-benchmark
    totals. A heavy cell says "this crawl carries GSM8K" and the
    remediation is source-scoped (drop/scrub one ingest lane), not a
    corpus-wide scrub; release sign-off wants exactly this matrix next
    to the overlap matrix (provenance) and the k-anonymity gate.

    Per cell: ``n_contaminated_docs`` (distinct train docs of the source
    hitting the bench), ``n_overlap_pairs`` (their distinct-digest hit
    volume), and ``source_rate`` (contaminated share OF THAT SOURCE,
    1e-6 grid). Only non-zero cells are emitted — output is bounded by
    benches × sources at any corpus size.

    Shape at 100 TB: the SAME one-pass plan as decontam_report — one
    training-corpus digest explode joined against the broadcast
    (bench, digest) relation, a (bench, doc_id) dedup aggregate bounded
    by true overlap volume, one overlap-bounded doc_id join to recover
    the source, and a broadcast of the S-row source totals. The corpus
    is never touched a second time.
    """
    ev = (
        _ngram_digests(benchmarks.select("doc_id", "text"), n)
        .join(benchmarks.select("doc_id", "bench"), "doc_id")
        .select("bench", "digest")
        .distinct()
    )
    hits = (
        _ngram_digests(train, n)
        .join(F.broadcast(ev), "digest")
        .groupBy("bench", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    cells = (
        hits.join(train.select("doc_id", "source"), "doc_id")
        .groupBy("bench", "source")
        .agg(
            F.count(F.lit(1)).alias("n_contaminated_docs"),
            F.sum("n_overlap").cast("bigint").alias("n_overlap_pairs"),
        )
    )
    src_totals = train.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_source_docs")
    )
    return cells.join(F.broadcast(src_totals), "source").select(
        "bench",
        "source",
        "n_contaminated_docs",
        "n_overlap_pairs",
        "n_source_docs",
        (
            F.floor(
                F.col("n_contaminated_docs").cast("double")
                / F.col("n_source_docs")
                * F.lit(1e6)
                + F.lit(0.5000001)
            )
            / F.lit(1e6)
        ).alias("source_rate"),
    )


def decontam_source_matrix_snapshot(
    docs: DataFrame, benches: tuple[str, ...] = REPORT_BENCHES,
    n: int = DECONTAM_NGRAM,
) -> DataFrame:
    """Driver-checkable face: the decontam_report_snapshot split (sources
    in ``benches`` stand in as eval suites, the rest is training)."""
    bench_list = list(benches)
    benchmarks = docs.filter(F.col("source").isin(bench_list)).select(
        "doc_id", "text", F.col("source").alias("bench")
    )
    train = docs.filter(~F.col("source").isin(bench_list))
    return decontam_source_matrix(train, benchmarks, n)


def sql_decontam_source_matrix(
    benches: tuple[str, ...] = REPORT_BENCHES,
    n: int = DECONTAM_NGRAM,
    source: str = "documents",
) -> str:
    in_list = ", ".join(f"'{b}'" for b in benches)
    return f"""
WITH d AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\x0b\f\r]+'), w -> w <> '') AS words
  FROM {source}
),
s AS (
  SELECT doc_id, source, list_distinct({SQL_SHINGLES(n)}) AS grams FROM d
),
g AS (
  SELECT doc_id, source, md5(unnest(grams)) AS digest FROM s
),
ev AS (
  SELECT DISTINCT source AS bench, digest FROM g WHERE source IN ({in_list})
),
hits AS (
  SELECT ev.bench, g.doc_id, count(*) AS n_overlap
  FROM g JOIN ev USING (digest)
  WHERE g.source NOT IN ({in_list})
  GROUP BY ev.bench, g.doc_id
),
cells AS (
  SELECT h.bench, t.source,
         count(*) AS n_contaminated_docs,
         CAST(SUM(h.n_overlap) AS BIGINT) AS n_overlap_pairs
  FROM hits h JOIN {source} t USING (doc_id)
  GROUP BY h.bench, t.source
),
src_totals AS (
  SELECT source, count(*) AS n_source_docs
  FROM {source} WHERE source NOT IN ({in_list}) GROUP BY source
)
SELECT c.bench, c.source,
       CAST(c.n_contaminated_docs AS BIGINT) AS n_contaminated_docs,
       c.n_overlap_pairs,
       CAST(s.n_source_docs AS BIGINT) AS n_source_docs,
       floor(CAST(c.n_contaminated_docs AS DOUBLE) / s.n_source_docs * 1e6 + 0.5000001) / 1e6 AS source_rate
FROM cells c JOIN src_totals s USING (source)"""


def decontam_fuzzy_report(
    train: DataFrame,
    benchmarks: DataFrame,
    threshold: float = DECONTAM_FUZZY_JACCARD,
) -> DataFrame:
    """Per-benchmark FUZZY leakage aggregate: (bench, n_fuzzy_contaminated,
    n_fuzzy_matches, fuzzy_jaccard_u_max). ``benchmarks`` needs
    (bench, doc_id, text).

    The multi-suite face of :func:`decontaminate_neardup`, with the same
    one-pass discipline as :func:`decontam_report`: the probe/verify chain
    is :func:`_fuzzy_verified` (shared verbatim with the single-suite
    face, the bench key carried through the broadcast index) — the
    training corpus is shingled and signed ONCE, and adding a benchmark
    adds broadcast rows, never a second corpus scan. Per-bench marginals
    aggregate exact int64s (counts and 1e-6-gridded Jaccard), so the
    result is partitioning-independent. Benchmarks with zero fuzzy hits
    emit no row here; :func:`decontam_suite_report` coalesces them to 0.
    """
    verified = _fuzzy_verified(train, benchmarks, threshold, bench_col="bench")
    return verified.groupBy("bench").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fuzzy_contaminated"),
        F.sum("n_eval_matches").cast("bigint").alias("n_fuzzy_matches"),
        F.max("max_jaccard_u").cast("bigint").alias("fuzzy_jaccard_u_max"),
    )


def decontam_suite_report(
    docs: DataFrame,
    benches: tuple[str, ...] = REPORT_BENCHES,
    n: int = DECONTAM_NGRAM,
    threshold: float = DECONTAM_FUZZY_JACCARD,
) -> DataFrame:
    """The chained decontamination evidence query: per-benchmark EXACT
    n-gram leakage (decontam_report's columns) side-by-side with the FUZZY
    near-dup leakage aggregate, one row per benchmark.

    Consolidation face for the driver contract: one checked slot carries
    the evidence of decontam_report AND decontam_fuzzy — the exact columns
    pin the digest-broadcast overlap chain, and the fuzzy columns change
    if any band-probe candidate or verified Jaccard drifts. The train set
    is docs outside EVERY bench (the report's convention), so both arms
    score the same corpus.
    """
    bench_list = list(benches)
    benchmarks = docs.filter(F.col("source").isin(bench_list)).select(
        "doc_id", "text", F.col("source").alias("bench")
    )
    train = docs.filter(~F.col("source").isin(bench_list))
    exact = decontam_report(train, benchmarks, n)
    fuzzy = decontam_fuzzy_report(train, benchmarks, threshold)
    zero = F.lit(0).cast("bigint")
    return exact.join(fuzzy, "bench", "left").select(
        exact["*"],
        F.coalesce("n_fuzzy_contaminated", zero).alias("n_fuzzy_contaminated"),
        F.coalesce("n_fuzzy_matches", zero).alias("n_fuzzy_matches"),
        F.coalesce("fuzzy_jaccard_u_max", zero).alias("fuzzy_jaccard_u_max"),
    )


def sql_decontam_suite_report(
    benches: tuple[str, ...] = REPORT_BENCHES,
    n: int = DECONTAM_NGRAM,
    threshold: float = DECONTAM_FUZZY_JACCARD,
    source: str = "documents",
) -> str:
    """Oracle twin of :func:`decontam_suite_report`."""
    from spark_signals.datapipe.dedup import _sql_minhash_ctes

    in_list = ", ".join(f"'{b}'" for b in benches)
    thr_u = int(threshold * 1e6)
    return f"""
WITH d AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\x0b\f\r]+'), w -> w <> '') AS words
  FROM {source}
),
s AS (
  SELECT doc_id, source, list_distinct({SQL_SHINGLES(n)}) AS grams FROM d
),
g AS (
  SELECT doc_id, source, md5(unnest(grams)) AS digest FROM s
),
ev AS (
  SELECT DISTINCT source AS bench, digest FROM g WHERE source IN ({in_list})
),
ev_sizes AS (
  SELECT source AS bench, count(DISTINCT doc_id) AS n_eval_docs
  FROM {source} WHERE source IN ({in_list}) GROUP BY source
),
hits AS (
  SELECT ev.bench, g.doc_id, count(*) AS n_overlap
  FROM g JOIN ev USING (digest)
  WHERE g.source NOT IN ({in_list})
  GROUP BY ev.bench, g.doc_id
),
per_bench AS (
  SELECT bench, count(*) AS n_contaminated_train_docs,
         CAST(SUM(n_overlap) AS BIGINT) AS n_overlap_pairs
  FROM hits GROUP BY bench
),
total AS (
  SELECT count(*) AS n_train FROM {source} WHERE source NOT IN ({in_list})
),
traind AS (SELECT * FROM {source} WHERE source NOT IN ({in_list})),
evald AS (SELECT doc_id, text, source AS bench FROM {source} WHERE source IN ({in_list})),
{_sql_minhash_ctes("traind", "t_")},
{_sql_minhash_ctes("evald", "e_")},
cand AS (
  SELECT DISTINCT t.doc_id, ev2.bench, e.doc_id AS eval_id
  FROM t_bands t JOIN e_bands e
    ON t.band = e.band AND t.k1 = e.k1 AND t.k2 = e.k2
  JOIN evald ev2 ON ev2.doc_id = e.doc_id
),
vr AS (
  SELECT bench, doc_id,
         COUNT(*)::BIGINT AS n_eval_matches,
         MAX(jaccard_u)::BIGINT AS max_jaccard_u
  FROM (
    SELECT c.bench, c.doc_id,
           CAST(floor(CAST(len(list_intersect(ts.shingles, es.shingles)) AS DOUBLE)
             / (len(ts.shingles) + len(es.shingles) - len(list_intersect(ts.shingles, es.shingles)))
             * 1e6 + 0.5000001) AS BIGINT) AS jaccard_u
    FROM cand c
    JOIN t_sh ts ON ts.doc_id = c.doc_id
    JOIN e_sh es ON es.doc_id = c.eval_id
  )
  WHERE jaccard_u >= {thr_u}
  GROUP BY bench, doc_id
),
fagg AS (
  SELECT bench, count(*)::BIGINT AS n_fuzzy_contaminated,
         SUM(n_eval_matches)::BIGINT AS n_fuzzy_matches,
         MAX(max_jaccard_u)::BIGINT AS fuzzy_jaccard_u_max
  FROM vr GROUP BY bench
)
SELECT e.bench,
       CAST(e.n_eval_docs AS BIGINT) AS n_eval_docs,
       CAST(coalesce(p.n_contaminated_train_docs, 0) AS BIGINT) AS n_contaminated_train_docs,
       CAST(coalesce(p.n_overlap_pairs, 0) AS BIGINT) AS n_overlap_pairs,
       floor(CAST(coalesce(p.n_contaminated_train_docs, 0) AS DOUBLE) / t.n_train * 1e6 + 0.5000001) / 1e6 AS contamination_rate,
       CAST(coalesce(f.n_fuzzy_contaminated, 0) AS BIGINT) AS n_fuzzy_contaminated,
       CAST(coalesce(f.n_fuzzy_matches, 0) AS BIGINT) AS n_fuzzy_matches,
       CAST(coalesce(f.fuzzy_jaccard_u_max, 0) AS BIGINT) AS fuzzy_jaccard_u_max
FROM ev_sizes e LEFT JOIN per_bench p USING (bench)
CROSS JOIN total t LEFT JOIN fagg f USING (bench)"""


# ------------------------------------------- contamination span localization
def decontam_spans(
    docs: DataFrame,
    eval_source: str = EVAL_SOURCE,
    k: int = DECONTAM_NGRAM,
) -> DataFrame:
    """WHERE a training document collides with the benchmark: maximal word
    spans whose every overlapping k-gram appears verbatim in the eval
    subset — the span-grain refinement of :func:`decontaminate` (which
    only counts overlapping n-grams per doc). The output is the scrub
    work-order: cut (doc_id, span_start..span_end) instead of dropping
    the whole page, the surgical variant of the GPT-3 appendix-C
    treatment.

    Returns (doc_id, span_start, span_end, span_words, n_windows) — the
    dedup_exact_spans geometry (0-based word positions, end inclusive),
    built on the same windows/islands core (dedup._span_wins /
    dedup._span_islands), so the two families stay tie-break- and
    grain-consistent.

    Shape at 100 TB: the benchmark digest set is eval-suite-sized and
    BROADCASTS; training windows explode to (doc_id, pos, digest) rows
    (linear) and semi-join the broadcast set map-side — the only
    corpus-keyed shuffle is the per-doc island sort, over HIT rows only.
    """
    from spark_signals.datapipe.dedup import _span_islands, _span_wins

    ev = (
        _span_wins(docs.filter(F.col("source") == eval_source), k)
        .select("digest")
        .distinct()
    )
    hits = (
        _span_wins(docs.filter(F.col("source") != eval_source), k)
        .join(F.broadcast(ev), "digest")
        .select("doc_id", "pos", F.lit(False).alias("is_canon"))
    )
    return _span_islands(hits, k).select(
        "doc_id",
        F.col("_start").cast("int").alias("span_start"),
        (F.col("_last") + F.lit(k - 1)).cast("int").alias("span_end"),
        (F.col("_last") - F.col("_start") + F.lit(k)).cast("int").alias(
            "span_words"
        ),
        F.col("_n").cast("int").alias("n_windows"),
    )


def sql_decontam_spans(
    eval_source: str = EVAL_SOURCE, k: int = DECONTAM_NGRAM, source: str = "documents"
) -> str:
    return f"""
WITH d AS (
  SELECT doc_id, source,
         COALESCE(list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'), w -> w <> ''), []) AS raw
  FROM {source}
),
dl AS (
  SELECT doc_id, source,
         list_transform(raw, w -> translate(w, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ' || chr(1), 'abcdefghijklmnopqrstuvwxyz')) AS words
  FROM d
),
w AS (
  SELECT doc_id, source, CAST(i AS BIGINT) AS pos,
         md5(array_to_string(words[(i+1):(i+{k})], ' ')) AS digest
  FROM dl, unnest(range(0, len(words) - {k} + 1)) AS t(i)
  WHERE len(words) >= {k}
),
ev AS (SELECT DISTINCT digest FROM w WHERE source = '{eval_source}'),
h AS (
  SELECT w.doc_id, w.pos FROM w JOIN ev USING (digest)
  WHERE w.source <> '{eval_source}'
),
f AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
               OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + {k}
              THEN 1 ELSE 0 END AS new_span
  FROM h
),
g AS (
  SELECT doc_id, pos,
         SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS span_id
  FROM f
)
SELECT doc_id,
       CAST(MIN(pos) AS INT) AS span_start,
       CAST(MAX(pos) + {k - 1} AS INT) AS span_end,
       CAST(MAX(pos) - MIN(pos) + {k} AS INT) AS span_words,
       CAST(COUNT(*) AS INT) AS n_windows
FROM g
GROUP BY doc_id, span_id"""


def decontam_scrub(
    docs: DataFrame,
    eval_source: str = EVAL_SOURCE,
    k: int = DECONTAM_NGRAM,
) -> DataFrame:
    """APPLY the :func:`decontam_spans` work-order: re-emit every training
    document with its benchmark-colliding spans cut — the surgical
    alternative to :func:`decontaminate`'s whole-document drop (GPT-3
    appendix C discusses both; scrubbing keeps the page's clean remainder
    in the corpus). Benchmark spans have no canonical occurrence to keep
    (the eval suite is external by definition), so EVERY contaminated
    island is cut — dedup._strip_from_hits with all-False canon flags,
    which keeps the two families' rebuild semantics identical
    (case-preserving tokens, whitespace collapse, was_modified contract).

    Returns (doc_id, text_dedup, n_words, n_cut_words, n_cut_spans,
    was_modified) over the TRAINING split only.

    Shape at 100 TB: decontam_spans' broadcast probe plus the strip tail —
    the cut-interval relation is island-sized, its join back is
    row-preserving on doc_id, and the rebuild is the per-row
    higher-order filter. Corpus text shuffles nowhere.
    """
    from spark_signals.datapipe.dedup import _span_wins, _strip_from_hits

    train = docs.filter(F.col("source") != eval_source)
    ev = (
        _span_wins(docs.filter(F.col("source") == eval_source), k)
        .select("digest")
        .distinct()
    )
    hits = (
        _span_wins(train, k)
        .join(F.broadcast(ev), "digest")
        .select("doc_id", "pos", F.lit(False).alias("is_canon"))
    )
    return _strip_from_hits(train, hits, k)


def sql_decontam_scrub(
    eval_source: str = EVAL_SOURCE, k: int = DECONTAM_NGRAM, source: str = "documents"
) -> str:
    return f"""
WITH d AS (
  SELECT doc_id, source,
         COALESCE(list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'), w -> w <> ''), []) AS raw
  FROM {source}
),
dl AS (
  SELECT doc_id, source, raw,
         list_transform(raw, w -> translate(w, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ' || chr(1), 'abcdefghijklmnopqrstuvwxyz')) AS cmp
  FROM d
),
w AS (
  SELECT doc_id, source, CAST(i AS BIGINT) AS pos,
         md5(array_to_string(cmp[(i+1):(i+{k})], ' ')) AS digest
  FROM dl, unnest(range(0, len(raw) - {k} + 1)) AS t(i)
  WHERE len(raw) >= {k}
),
ev AS (SELECT DISTINCT digest FROM w WHERE source = '{eval_source}'),
h AS (
  SELECT w.doc_id, w.pos FROM w JOIN ev USING (digest)
  WHERE w.source <> '{eval_source}'
),
f AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
               OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + {k}
              THEN 1 ELSE 0 END AS new_span
  FROM h
),
g AS (
  SELECT doc_id, pos,
         SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS span_id
  FROM f
),
cuts AS (
  SELECT doc_id,
         list(struct_pack(s := _start, e := _end)) AS ivs,
         COUNT(*) AS _spans,
         SUM(_end - _start + 1) AS _cut
  FROM (
    SELECT doc_id, MIN(pos) AS _start, MAX(pos) + {k - 1} AS _end
    FROM g GROUP BY doc_id, span_id
  ) GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(CASE WHEN c.ivs IS NULL THEN array_to_string(d.raw, ' ')
            ELSE array_to_string(
              list_filter(d.raw, (w, i) -> len(list_filter(c.ivs,
                x -> (i-1) >= x.s AND (i-1) <= x.e)) = 0), ' ')
       END, '') AS text_dedup,
       CAST(len(d.raw) AS INT) AS n_words,
       CAST(COALESCE(c._cut, 0) AS INT) AS n_cut_words,
       CAST(COALESCE(c._spans, 0) AS INT) AS n_cut_spans,
       COALESCE(c._cut, 0) > 0 AS was_modified
FROM dl d LEFT JOIN cuts c USING (doc_id)
WHERE d.source <> '{eval_source}'"""
