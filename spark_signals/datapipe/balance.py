"""Corpus-composition diagnostics: what's actually IN the mix, by topic.

Before fixing mixture weights, a data team asks two questions the source
column alone can't answer: what does each embedding-space cluster (a
cheap topic proxy) contain per source, and how does each source spread
across clusters? SemDeDup-era pipelines (Abbas et al. 2023; the FineWeb/
Dolma data cards) all publish exactly this cluster × source table —
over-represented clusters are down-weighted, single-source clusters are
audited for crawl artifacts.

``cluster_composition`` reuses the retrieval stack's trained IVF index
(embed → Lloyd k-means → assignment) and reduces the corpus to one
(cluster_id, source) count aggregate; every share is computed by joining
the k×S counts relation against its own two tiny marginals — after the
index build, nothing bigger than k×S rows moves anywhere, at any corpus
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _grid6(col: F.Column) -> F.Column:
    return F.floor(col * F.lit(1e6) + F.lit(0.5000001)) / F.lit(1e6)


def cluster_composition(
    docs: DataFrame,
    n_cells: int | None = None,
    iters: int | None = None,
) -> DataFrame:
    """(cluster_id, source, n_docs, cluster_share, source_share):
    ``cluster_share`` = this source's fraction of the cluster (what the
    topic is made of), ``source_share`` = this cluster's fraction of the
    source (where the source's mass lives). Shares grid to 1e-6; rows
    ordered by keys for determinism at the driver compare.

    Shape at 100 TB: the index build is build_dense_ivf_index's amortized
    cost (shared with retrieval serving — build once, read twice); the
    composition itself is one map-side-combinable count aggregate to k×S
    rows plus two k/S-row marginal joins."""
    from spark_signals.datapipe.retrieval import build_dense_ivf_index

    _emb, _cents, cells = build_dense_ivf_index(docs, n_cells, iters)
    assigned = docs.select("doc_id", "source").join(
        cells.withColumnRenamed("vec_id", "doc_id"), "doc_id"
    )
    counts = assigned.groupBy("cluster_id", "source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    c_tot = counts.groupBy("cluster_id").agg(F.sum("n_docs").alias("c_total"))
    s_tot = counts.groupBy("source").agg(F.sum("n_docs").alias("s_total"))
    return (
        counts.join(F.broadcast(c_tot), "cluster_id")
        .join(F.broadcast(s_tot), "source")
        .select(
            "cluster_id",
            "source",
            "n_docs",
            _grid6(F.col("n_docs") / F.col("c_total")).alias("cluster_share"),
            _grid6(F.col("n_docs") / F.col("s_total")).alias("source_share"),
        )
    )


def sql_cluster_composition(
    n_cells: int | None = None,
    iters: int | None = None,
    source: str = "documents",
) -> str:
    """Oracle twin: the shared demb chain feeds the unrolled k-means CTEs
    and final assignment (exactly the dense_ivf oracle's training), then
    one grouped count + two marginal joins."""
    from spark_signals.datapipe.retrieval import _sql_demb_ctes
    from spark_signals.datapipe.similarity import (
        KMEANS_ITERS,
        KMEANS_K,
        _sql_kmeans_ctes,
        sql_kmeans_assign_cte,
    )

    n_cells = KMEANS_K if n_cells is None else n_cells
    iters = KMEANS_ITERS if iters is None else iters
    kmeans = ",\n".join(_sql_kmeans_ctes(n_cells, iters, source="corpus"))
    return f"""
WITH {_sql_demb_ctes(source)},
corpus AS (SELECT doc_id AS vec_id, embedding FROM demb),
{kmeans},
{sql_kmeans_assign_cte(iters)},
counts AS (
  SELECT a.cluster_id, d.source, COUNT(*)::BIGINT AS n_docs
  FROM afin a JOIN {source} d ON d.doc_id = a.vec_id
  GROUP BY 1, 2
),
ctot AS (SELECT cluster_id, SUM(n_docs) AS c_total FROM counts GROUP BY 1),
stot AS (SELECT source, SUM(n_docs) AS s_total FROM counts GROUP BY 1)
SELECT c.cluster_id, c.source, c.n_docs,
       floor(CAST(c.n_docs AS DOUBLE) / ct.c_total * 1e6 + 0.5000001) / 1e6 AS cluster_share,
       floor(CAST(c.n_docs AS DOUBLE) / st.s_total * 1e6 + 0.5000001) / 1e6 AS source_share
FROM counts c
JOIN ctot ct USING (cluster_id)
JOIN stot st USING (source)"""
