"""Quality classifier: distributed logistic regression over text features.

The GPT-3 data recipe (arXiv:2005.14165 appendix A) trains a classifier to
separate a curated corpus from raw crawl and keeps crawl documents the
classifier scores as curated-like. This module is that filter, Spark-first:
the trainer is batch gradient descent where every step is one broadcast
join + one exact integer aggregate — the same iterate-materialize shape as
the k-means trainer (similarity.kmeans_train).

Determinism contract (what makes a float TRAINER oracle-checkable):

* Features are closed-form per-row expressions over exact integers
  (ratios are single correctly-rounded IEEE divisions, identical in any
  engine); the one libm call (ln(1+n_words)) lands on a 1e-6 grid.
* Each row's gradient contribution is gridded to an int64 at 1e-9 and the
  per-step gradient is the EXACT int64 sum of those units — so the
  gradient is independent of partitioning, row order, and engine (the
  float-sum order-dependence that normally makes distributed GD
  irreproducible is removed structurally, same trick as the unigram LM's
  int64 log-prob units).
* Weights re-grid to 1e-9 after every update; the sigmoid's exp() may
  differ by ulps across engines but every consumer reads it only through
  a grid (the repo-wide sround policy).

The label is the curated-subset stand-in ``source = 'src0'`` (the same
convention as decontam.EVAL_SOURCE — the synthetic corpus has no real
curated split). At 100 TB: the feature projection is scan-speed, each GD
step is one map-side-combined aggregate over ~B rows producing d+1 ints,
and scoring is a broadcast of d+1 weights — the trainer costs ITERS
aggregate passes, scoring is free at scan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_signals.checkpoint import pin

LABEL_SOURCE = "src0"  # the curated-subset stand-in (see decontam.EVAL_SOURCE)
LOGREG_ITERS = 5
LOGREG_LR = 1.0
GRAD_GRID = 1_000_000_000  # 1e-9 gradient/weight grid (int64 units)
PROB_DP = 6  # output probability grid

# feature names in weight order (w0 is the bias)
FEATURES = ["punct_ratio", "stopword_ratio", "mean_word_len_s", "log_words_s"]


def _grid9(col: F.Column) -> F.Column:
    return (
        F.floor(col * F.lit(float(GRAD_GRID)) + F.lit(0.5000001))
        / F.lit(float(GRAD_GRID))
    )


def logreg_features(docs: DataFrame, label: F.Column | None = None) -> DataFrame:
    """(doc_id, y, f1..f4): per-row, closed-form, engine-identical.

    ``label`` is the positive-class predicate, evaluated over the
    text_stats projection (doc_id/lang/source + stats columns); the default
    is the in-corpus ``source = LABEL_SOURCE`` stand-in.

    Scaling is FIXED affine (documented constants), not corpus
    standardization — a mean/std pass would reintroduce order-dependent
    float sums for no modeling benefit at this feature scale.
    """
    from spark_signals.datapipe.text import text_stats

    st = text_stats(docs)
    y = (F.col("source") == LABEL_SOURCE) if label is None else label
    mean_len = F.col("n_chars").cast("double") / F.greatest(
        F.col("n_words"), F.lit(1)
    )
    log_words = F.floor(
        F.log(F.lit(1.0) + F.col("n_words")) * F.lit(1e6) + F.lit(0.5000001)
    ) / F.lit(1e6)
    return st.select(
        "doc_id",
        y.cast("int").alias("y"),
        F.col("punct_ratio").alias("f1"),
        F.col("stopword_ratio").alias("f2"),
        (mean_len / F.lit(10.0)).alias("f3"),
        (log_words / F.lit(10.0)).alias("f4"),
    )


def _sigmoid(z: F.Column) -> F.Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_train(
    docs: DataFrame,
    iters: int = LOGREG_ITERS,
    lr: float = LOGREG_LR,
    label: F.Column | None = None,
) -> DataFrame:
    """One-row DataFrame of trained weights (w0=bias, w1..w4).

    Each Lloyd-style step composes: broadcast the 1-row weights onto the
    persisted features, per-row gridded-int64 gradient units, one exact
    aggregate, a weight update — then an eager checkpoint so the plan stays
    fixed-depth (see kmeans_train's rationale; r05 measured the lazy
    alternative at ~10s of pure plan re-evaluation)."""
    feats = logreg_features(docs, label).persist()
    try:
        w = feats.sparkSession.range(1).select(
            *[F.lit(0.0).alias(f"w{j}") for j in range(5)]
        ).transform(pin)
        for _ in range(iters):
            z = (
                F.col("w0")
                + F.col("w1") * F.col("f1")
                + F.col("w2") * F.col("f2")
                + F.col("w3") * F.col("f3")
                + F.col("w4") * F.col("f4")
            )
            err = _sigmoid(z) - F.col("y")  # dL/dz per row
            xs = [F.lit(1.0), F.col("f1"), F.col("f2"), F.col("f3"), F.col("f4")]
            scored = feats.crossJoin(F.broadcast(w))
            grad = scored.agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(
                        F.floor(err * x * F.lit(float(GRAD_GRID)) + F.lit(0.5000001))
                        .cast("long")
                    ).alias(f"g{j}")
                    for j, x in enumerate(xs)
                ],
            )
            w = (
                w.crossJoin(F.broadcast(grad))
                .select(
                    *[
                        _grid9(
                            F.col(f"w{j}")
                            - F.lit(float(lr))
                            * (F.col(f"g{j}").cast("double") / F.lit(float(GRAD_GRID)))
                            / F.col("n")
                        ).alias(f"w{j}")
                        for j in range(5)
                    ]
                )
                .transform(pin)
            )
        return w
    finally:
        feats.unpersist()


def logreg_score(docs: DataFrame, weights: DataFrame) -> DataFrame:
    """Score any corpus with an already-trained 1-row weights frame:
    (doc_id, source, quality_prob, is_high_quality). Broadcasts the d+1
    weights — pure scan-speed, no training pass."""
    feats = logreg_features(docs)
    z = (
        F.col("w0")
        + F.col("w1") * F.col("f1")
        + F.col("w2") * F.col("f2")
        + F.col("w3") * F.col("f3")
        + F.col("w4") * F.col("f4")
    )
    prob = F.floor(
        _sigmoid(z) * F.lit(10.0**PROB_DP) + F.lit(0.5000001)
    ) / F.lit(10.0**PROB_DP)
    return (
        docs.select("doc_id", "source")
        .join(feats.drop("y"), "doc_id")
        .crossJoin(F.broadcast(weights))
        .select(
            "doc_id",
            "source",
            prob.alias("quality_prob"),
            (prob > F.lit(0.5)).alias("is_high_quality"),
        )
    )


def quality_logreg(
    docs: DataFrame, iters: int = LOGREG_ITERS, lr: float = LOGREG_LR
) -> DataFrame:
    """Per-document curated-likeness score from the in-corpus stand-in
    label (source = LABEL_SOURCE) — the oracle-checked driver query. For
    the real GPT-3 recipe (external curated exemplars scoring a crawl),
    use :func:`quality_logreg_against`."""
    return logreg_score(docs, logreg_train(docs, iters, lr))


_DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def quality_logreg_against(
    crawl: DataFrame,
    curated: DataFrame,
    iters: int = LOGREG_ITERS,
    lr: float = LOGREG_LR,
) -> DataFrame:
    """The GPT-3 appendix-A recipe shape (mirrors ``decontaminate_against``):
    train curated-vs-crawl on the UNION of an external curated exemplar set
    and the crawl, then score the CRAWL with those weights — not the
    in-sample source stand-in.

    Exemplar rows are re-keyed to negative doc_ids before the union so the
    two corpora can share ids; the label is simply doc_id < 0. Scale shape
    is unchanged: ITERS broadcast-join+aggregate passes over
    |curated| + |crawl| rows, then one scan-speed scoring pass over the
    crawl."""
    ext = curated.select(*_DOC_COLS).withColumn(
        "doc_id", -F.col("doc_id") - F.lit(1).cast("long")
    )
    train = ext.unionByName(crawl.select(*_DOC_COLS))
    w = logreg_train(train, iters, lr, label=F.col("doc_id") < 0)
    return logreg_score(crawl, w)


HOLDOUT_FRAC_DEFAULT = 0.2
_HASH_SPACE32 = float(2**32)


def logreg_holdout_metrics(
    docs: DataFrame,
    holdout_frac: float = HOLDOUT_FRAC_DEFAULT,
    iters: int = LOGREG_ITERS,
    lr: float = LOGREG_LR,
) -> DataFrame:
    """Held-out evaluation: deterministic hash split (same md5 gate as the
    sampling operators — reproducible on any engine/partitioning), train on
    the keep side, score the held-out side, report one row of
    (n_train, n_test, n_correct, accuracy). In-sample scoring says nothing
    about whether the classifier generalizes — this does."""
    gate = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint") < F.lit(float(holdout_frac)) * F.lit(_HASH_SPACE32)
    test = docs.filter(gate)
    train = docs.filter(~gate)
    w = logreg_train(train, iters, lr)
    scored = logreg_score(test, w).withColumn(
        "y", (F.col("source") == LABEL_SOURCE).cast("int")
    )
    n_train = train.count()
    return scored.agg(
        F.lit(n_train).alias("n_train"),
        F.count(F.lit(1)).alias("n_test"),
        F.sum(
            (F.col("is_high_quality").cast("int") == F.col("y")).cast("long")
        ).alias("n_correct"),
        (
            F.sum((F.col("is_high_quality").cast("int") == F.col("y")).cast("double"))
            / F.count(F.lit(1))
        ).alias("accuracy"),
    )


def sql_quality_logreg(iters: int = LOGREG_ITERS, lr: float = LOGREG_LR) -> str:
    """DuckDB mirror with the GD loop UNROLLED into CTEs w0..w{iters} —
    the same fixed-iteration trick as sql_kmeans_centroids. Every gradient
    is the exact int64 sum of per-row gridded units, so the weights agree
    with the Spark trainer bit-for-bit after each step's 1e-9 grid."""
    from spark_signals.datapipe.text import SQL_TEXT_STATS

    g = float(GRAD_GRID)
    feats = f"""feats AS (
  SELECT doc_id, source,
         CASE WHEN source = '{LABEL_SOURCE}' THEN 1 ELSE 0 END AS y,
         punct_ratio AS f1,
         stopword_ratio AS f2,
         (CAST(n_chars AS DOUBLE) / greatest(n_words, 1)) / 10.0 AS f3,
         (floor(ln(1.0 + n_words) * 1e6 + 0.5000001) / 1e6) / 10.0 AS f4
  FROM ({SQL_TEXT_STATS()}) t
)"""
    ctes = [feats, "w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4)"]
    xs = ["1.0", "f1", "f2", "f3", "f4"]
    for i in range(1, iters + 1):
        err = (
            f"(1.0 / (1.0 + exp(-(w.w0 + w.w1*f.f1 + w.w2*f.f2 + w.w3*f.f3 + w.w4*f.f4))) - f.y)"
        )
        gsums = ", ".join(
            f"SUM(CAST(floor({err} * {x} * {g!r} + 0.5000001) AS BIGINT)) AS g{j}"
            for j, x in enumerate(xs)
        )
        ctes.append(
            f"""g{i} AS (
  SELECT count(*) AS n, {gsums}
  FROM feats f CROSS JOIN w{i - 1} w
)"""
        )
        ws = ", ".join(
            f"floor((w.w{j} - {lr!r} * (CAST(g.g{j} AS DOUBLE) / {g!r}) / g.n) * {g!r} + 0.5000001) / {g!r} AS w{j}"
            for j in range(5)
        )
        ctes.append(f"w{i} AS (SELECT {ws} FROM w{i - 1} w CROSS JOIN g{i} g)")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT f.doc_id, f.source,
       floor((1.0 / (1.0 + exp(-(w.w0 + w.w1*f.f1 + w.w2*f.f2 + w.w3*f.f3 + w.w4*f.f4))))
             * 1e{PROB_DP} + 0.5000001) / 1e{PROB_DP} AS quality_prob,
       floor((1.0 / (1.0 + exp(-(w.w0 + w.w1*f.f1 + w.w2*f.f2 + w.w3*f.f3 + w.w4*f.f4))))
             * 1e{PROB_DP} + 0.5000001) / 1e{PROB_DP} > 0.5 AS is_high_quality
FROM feats f CROSS JOIN w{iters} w"""
    )
