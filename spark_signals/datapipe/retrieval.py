"""BM25 lexical retrieval over the document corpus — the sparse half of a
retrieval stack (the dense half is datapipe.embed + datapipe.similarity).

Training-data pipelines use lexical top-k constantly: sourcing domain
exemplars for the quality classifier, pulling decontamination candidates
for an eval question, building retrieval corpora for RAG evals. BM25
(Robertson-Sparck Jones; the Okapi form every search engine implements)
needs only two aggregates the tf-idf stage already computes.

Determinism contract: idf/length-normalization run through ln() (libm),
so scores grid to 1e-6 BEFORE the rank order, ties break on doc_id — the
same cross-engine discipline as tfidf_top_terms.

Shape at 100 TB: query terms are a constant ≤q-element set, so scoring is
ONE explode → semi-filter on the broadcast term set → (doc_id, word) count
agg → join with the q-row df relation → per-doc weighted sum; the final
top-k is a TakeOrdered heap, no global sort. The corpus shuffles only as
matched (doc_id, term) pairs — documents containing no query term never
leave their scan partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_signals.datapipe.text import ASCII_LO, ASCII_UP, words_col

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 25
# default probe: mid-frequency terms of the synthetic corpus (callers pass
# their own query)
BM25_DEFAULT_QUERY = ("hash", "join", "spark")


def _grid6(col: F.Column) -> F.Column:
    return F.floor(col * F.lit(1e6) + F.lit(0.5000001)) / F.lit(1e6)


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...] = BM25_DEFAULT_QUERY,
    k: int = BM25_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query:
    (doc_id, score, n_matched_terms, rank).

    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the non-negative Okapi
    variant. |d| counts whitespace tokens (the shared token currency);
    avgdl is exact (int64 total / N as one IEEE division).
    """
    from spark_signals.datapipe.util import explode_strings

    terms = sorted(set(query_terms))
    term_arr = F.array(*[F.lit(t) for t in terms])
    base = docs.select("doc_id", words_col(F.col("text")).alias("words"))
    lens = base.select("doc_id", F.size("words").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    words = explode_strings(base, F.col("words"), "word", "doc_id").filter(
        F.array_contains(term_arr, F.col("word"))
    )
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    per_term = (
        tf.join(F.broadcast(dfreq), "word")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "word",
            (
                idf
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
                )
            ).alias("w_score"),
        )
    )
    scored = per_term.groupBy("doc_id").agg(
        _grid6(F.sum("w_score")).alias("score"),
        F.count(F.lit(1)).alias("n_matched_terms"),
    )
    # rank over the ≤k survivors of a TakeOrdered heap (orderBy+limit) via
    # one sort_array aggregate — window-free (see kmeans_seeds)
    topped = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    agg = topped.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("score")).alias("neg_s"),
                    F.col("doc_id").alias("doc_id"),
                    F.col("score").alias("score"),
                    F.col("n_matched_terms").alias("n_matched_terms"),
                )
            )
        ).alias("a")
    )
    return agg.select(F.posexplode("a").alias("pos", "s")).select(
        F.col("s.doc_id").alias("doc_id"),
        F.col("s.score").alias("score"),
        F.col("s.n_matched_terms").alias("n_matched_terms"),
        (F.col("pos") + 1).alias("rank"),
    )


def sql_bm25_topk(
    query_terms: tuple[str, ...] = BM25_DEFAULT_QUERY,
    k: int = BM25_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    source: str = "documents",
) -> str:
    terms = ", ".join(f"'{t}'" for t in sorted(set(query_terms)))
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(translate(text, '{ASCII_UP}', '{ASCII_LO}'), '\\s+'), w -> w <> '') AS words
  FROM {source}
),
lens AS (SELECT doc_id, len(words) AS dl FROM base),
stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM lens),
words AS (
  SELECT doc_id, unnest(words) AS word FROM base
),
tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM words
  WHERE word IN ({terms}) GROUP BY 1, 2
),
dfreq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
per_term AS (
  SELECT tf.doc_id,
         ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf * CAST({k1 + 1.0!r} AS DOUBLE))
           / (tf.tf + CAST({k1!r} AS DOUBLE)
              * (CAST({1.0 - b!r} AS DOUBLE)
                 + CAST({b!r} AS DOUBLE) * lens.dl
                   / (CAST(stats.total_dl AS DOUBLE) / stats.n_docs))) AS w_score
  FROM tf JOIN dfreq USING (word) JOIN lens USING (doc_id) CROSS JOIN stats
),
scored AS (
  SELECT doc_id,
         floor(SUM(w_score) * 1e6 + 0.5000001) / 1e6 AS score,
         COUNT(*) AS n_matched_terms
  FROM per_term GROUP BY 1
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT doc_id, score, n_matched_terms, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {k}"""
