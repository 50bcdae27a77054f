"""Randomized cross-engine differential fuzzer: Spark vs DuckDB.

Extends the fixed oracle suite (SURVEY.md §5 "rebuild strategy") with
property-style coverage: each seed draws a random query from a small grammar
over the `events` table — grouped aggregations (sum/avg/min/max/count/
stddev_pop/conditional sum, optional filters, modulo-bucketed keys) and
window queries (lag-k, rolling rows-frame aggregates with deterministic
(ts, event_id) ordering) — renders it BOTH as a Spark DataFrame plan and as
DuckDB SQL, and diffs the results exactly (after the cross-engine `sround`
rounding from spark_signals.parity on multi-row float aggregates).

The grammar deliberately stays inside the reference's semantic envelope
(SURVEY.md §2.3-2.4: trailing ROWS frames, lag, population stddev, CASE
aggregates) so every failure is a real parity bug in an operator family the
engine claims.

Usage: python tools/fuzz_differential.py [sf_dir] [n_queries] [seed]
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_signals.io.sources import read_table
from spark_signals.parity import sround
from tools.oracle_check import compare, duck_connection

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

# (tag, spark agg builder, sql template, rounding dp or None for exact)
AGGS = [
    ("sum", lambda: F.sum("value"), "SUM(value)", 6),
    ("avg", lambda: F.avg("value"), "AVG(value)", 6),
    ("min", lambda: F.min("value"), "MIN(value)", None),
    ("max", lambda: F.max("value"), "MAX(value)", None),
    ("cnt", lambda: F.count("value"), "COUNT(value)", None),
    ("sd", lambda: F.stddev_pop("value"), "STDDEV_POP(value)", 6),
]


def _sql_round(expr: str, dp: int | None) -> str:
    if dp is None:
        return expr
    return f"floor(({expr}) * 1e{dp} + 0.5000001) / 1e{dp}"


def gen_agg_query(rng: random.Random):
    """Random grouped aggregation → (name, spark_builder, sql)."""
    where_sql, sp_filters = [], []
    if rng.random() < 0.6:
        c = round(rng.uniform(10, 300), 2)
        op = rng.choice(["<", ">="])
        where_sql.append(f"value {op} {c}")
        sp_filters.append(
            (F.col("value") < c) if op == "<" else (F.col("value") >= c)
        )
    if rng.random() < 0.4:
        types = sorted(rng.sample(EVENT_TYPES, rng.randint(2, 4)))
        where_sql.append("event_type IN (%s)" % ", ".join(f"'{t}'" for t in types))
        sp_filters.append(F.col("event_type").isin(types))

    keys_sql, sp_keys = [], []
    if rng.random() < 0.7:
        keys_sql.append("event_type")
        sp_keys.append(F.col("event_type"))
    if rng.random() < 0.5:
        k = rng.randint(2, 7)
        keys_sql.append(f"user_id % {k} AS bucket")
        sp_keys.append((F.col("user_id") % k).alias("bucket"))
    if rng.random() < 0.3:
        # A1/A4 shape: event-time bucket aggregation (tumble analog)
        unit = rng.choice(["hour", "day"])
        keys_sql.append(f"date_trunc('{unit}', ts) AS tbucket")
        sp_keys.append(F.date_trunc(unit, "ts").alias("tbucket"))

    n_aggs = rng.randint(1, 3)
    picks = rng.sample(AGGS, n_aggs)
    agg_sql, sp_aggs = [], []
    for i, (tag, sp_fn, sql_tpl, dp) in enumerate(picks):
        alias = f"a{i}_{tag}"
        agg_sql.append(f"{_sql_round(sql_tpl, dp)} AS {alias}")
        col = sp_fn()
        if dp is not None:
            col = sround(col, dp)
        sp_aggs.append(col.alias(alias))
    # conditional aggregate (A1-style CASE sum) sometimes
    if rng.random() < 0.4:
        c2 = round(rng.uniform(50, 250), 2)
        agg_sql.append(
            _sql_round(f"SUM(CASE WHEN value < {c2} THEN value * value ELSE 0.0 END)", 6)
            + " AS a_case"
        )
        sp_aggs.append(
            sround(
                F.sum(F.when(F.col("value") < c2, F.col("value") * F.col("value")).otherwise(0.0)),
                6,
            ).alias("a_case")
        )

    sql = "SELECT "
    sql += ", ".join(keys_sql + agg_sql)
    sql += " FROM events"
    if where_sql:
        sql += " WHERE " + " AND ".join(where_sql)
    if keys_sql:
        sql += " GROUP BY " + ", ".join(k.split(" AS ")[0] for k in keys_sql)

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = read_table(spark, sf_dir, "events")
        for f in sp_filters:
            df = df.filter(f)
        if sp_keys:
            return df.groupBy(*sp_keys).agg(*sp_aggs)
        return df.agg(*sp_aggs)

    name = "agg[" + ",".join(t for t, *_ in picks) + (";grouped" if keys_sql else ";global") + "]"
    return name, build, sql


WINDOW_AGGS = [
    ("ravg", lambda: F.avg("value"), "AVG(value)", 6),
    ("rsum", lambda: F.sum("value"), "SUM(value)", 6),
    ("rmin", lambda: F.min("value"), "MIN(value)", None),
    ("rmax", lambda: F.max("value"), "MAX(value)", None),
    ("rsd", lambda: F.stddev_pop("value"), "STDDEV_POP(value)", 6),
]


def gen_window_query(rng: random.Random):
    """Random lag / trailing-rows-frame window query (SURVEY §2.3 shapes)."""
    part = rng.choice(["user_id", "event_type"])
    over_sql = f"PARTITION BY {part} ORDER BY ts, event_id"
    w = Window.partitionBy(part).orderBy("ts", "event_id")

    where_sql, sp_filter = "", None
    if rng.random() < 0.4:
        c = round(rng.uniform(10, 300), 2)
        where_sql = f" WHERE value >= {c}"
        sp_filter = F.col("value") >= c

    shape = rng.random()
    if shape < 0.3:
        k = rng.randint(1, 5)
        wcol = F.lag("value", k).over(w)
        wsql = f"LAG(value, {k}) OVER ({over_sql})"
        dp = None
        tag = f"lag{k}"
    elif shape < 0.5:
        # W6 forward-fill: sparsify value with a CASE, then
        # last_value IGNORE NULLS over unbounded preceding, seeded with 0
        c = round(rng.uniform(50, 250), 2)
        sparse_sql = f"CASE WHEN value < {c} THEN value END"
        sparse = F.when(F.col("value") < c, F.col("value"))
        wcol = F.coalesce(
            F.last(sparse, ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            F.lit(0.0),
        )
        wsql = (
            f"COALESCE(LAST_VALUE(({sparse_sql}) IGNORE NULLS) OVER ({over_sql} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0)"
        )
        dp = None
        tag = f"ffill{c}"
    else:
        tag, sp_fn, sql_tpl, dp = rng.choice(WINDOW_AGGS)
        frame = rng.randint(2, 80)
        wcol = sp_fn().over(w.rowsBetween(-(frame - 1), 0))
        wsql = (
            f"{sql_tpl.split('(')[0]}(value) OVER ({over_sql} "
            f"ROWS BETWEEN {frame - 1} PRECEDING AND CURRENT ROW)"
        )
        tag = f"{tag}{frame}"
    if dp is not None:
        wcol = sround(wcol, dp)
        wsql = _sql_round(wsql, dp)

    sql = f"SELECT event_id, {wsql} AS wval FROM events{where_sql}"

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = read_table(spark, sf_dir, "events")
        if sp_filter is not None:
            df = df.filter(sp_filter)
        return df.select("event_id", wcol.alias("wval"))

    return f"win[{tag};{part}]", build, sql


def gen_join_query(rng: random.Random):
    """J3/J4-shape: orders ⋈ customer (inner or left) with grouped
    aggregates over the joined relation, dim side broadcast."""
    how = rng.choice(["inner", "left"])
    sql_join = "JOIN" if how == "inner" else "LEFT JOIN"
    where_sql, sp_filter = "", None
    if rng.random() < 0.5:
        c = rng.choice(["'O'", "'F'", "'P'"])
        where_sql = f" WHERE o_orderstatus = {c}"
        sp_filter = F.col("o_orderstatus") == c.strip("'")

    picks = rng.sample(
        [
            ("cnt", lambda: F.count("o_orderkey"), "COUNT(o_orderkey)", None),
            ("sum", lambda: F.sum("o_totalprice"), "SUM(o_totalprice)", 2),
            ("avg", lambda: F.avg("o_totalprice"), "AVG(o_totalprice)", 6),
            ("max", lambda: F.max("o_totalprice"), "MAX(o_totalprice)", None),
        ],
        rng.randint(1, 3),
    )
    agg_sql, sp_aggs = [], []
    for i, (tag, sp_fn, sql_tpl, dp) in enumerate(picks):
        alias = f"j{i}_{tag}"
        agg_sql.append(f"{_sql_round(sql_tpl, dp)} AS {alias}")
        col = sp_fn()
        if dp is not None:
            col = sround(col, dp)
        sp_aggs.append(col.alias(alias))

    sql = (
        "SELECT c_mktsegment, " + ", ".join(agg_sql)
        + f" FROM customer {sql_join} orders ON c_custkey = o_custkey{where_sql}"
        + " GROUP BY c_mktsegment"
    )
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        customer = read_table(spark, sf_dir, "customer")
        orders = read_table(spark, sf_dir, "orders")
        df = customer.join(
            orders, customer.c_custkey == orders.o_custkey, how
        )
        if sp_filter is not None:
            df = df.filter(sp_filter)
        return df.groupBy("c_mktsegment").agg(*sp_aggs)

    return f"join[{how}{';filtered' if where_sql else ''}]", build, sql


# ------------------------------------------------- text-operator fuzzing
# Atom pools for generated corpora: plain ASCII, case variety, unicode
# neighborhoods where engine case/regex semantics could diverge, PII-shaped
# fragments, and whitespace variety. Every seed builds a fresh corpus and
# runs one text operator through BOTH engines.
_WORDS = ["alpha", "beta", "Gamma", "DELTA", "the", "and", "for", "x1", "42"]
_UNICODE = ["İstanbul", "straße", "FUSS", "naïve", "ΣΙΣΥΦΟΣ", "ＦＵＬＬ", "…"]
_PII = ["a@b.io", "10.0.0.1", "123-45-6789", "415-555-1234", "not@", "1.2.3"]
_WS = [" ", "  ", "\t", " "]


def _gen_docs(rng: random.Random, n_docs: int = 40) -> list[str]:
    texts = []
    for _ in range(n_docs):
        pool = _WORDS * 4 + _UNICODE + _PII
        k = rng.randint(0, 30)
        texts.append(rng.choice(_WS).join(rng.choice(pool) for _ in range(k)))
    # force duplicates (dedup families need collisions to be meaningful)
    for _ in range(n_docs // 5):
        texts.append(texts[rng.randrange(len(texts))])
    return texts


def gen_text_query(rng: random.Random):
    """Random text operator over a random generated corpus."""
    from spark_signals.datapipe import classifier as CL
    from spark_signals.datapipe import curate as CU
    from spark_signals.datapipe import decontam as DC
    from spark_signals.datapipe import dedup as DD
    from spark_signals.datapipe import pack as PK
    from spark_signals.datapipe import sampling as SM
    from spark_signals.datapipe import scrub as SC
    from spark_signals.datapipe import versioning as VER
    from spark_signals.datapipe import text as TX

    ops = [
        ("text_stats", TX.text_stats, TX.SQL_TEXT_STATS()),
        ("lang_id", TX.lang_id, TX.SQL_LANG_ID()),
        ("fingerprint", TX.fingerprint, TX.SQL_FINGERPRINT()),
        ("unigram_lm", TX.unigram_lm_quality, TX.SQL_UNIGRAM_LM()),
        ("bigram_lm", TX.bigram_lm_quality, TX.SQL_BIGRAM_LM()),
        ("dedup_exact", DD.dedup_exact, DD.SQL_DEDUP_EXACT),
        ("dedup_passages", DD.dedup_passages, DD.SQL_DEDUP_PASSAGES),
        ("dedup_exact_spans", DD.dedup_exact_spans, DD.sql_dedup_exact_spans()),
        (
            "dedup_exact_spans_strip",
            DD.dedup_exact_spans_strip,
            DD.sql_dedup_exact_spans_strip(),
        ),
        (
            "dedup_exact_spans_attrib",
            DD.dedup_exact_spans_attrib,
            DD.sql_dedup_exact_spans_attrib(),
        ),
        ("pii_scrub", SC.pii_scrub, SC.sql_pii_scrub()),
        ("decontaminate", DC.decontaminate, DC.sql_decontaminate()),
        ("decontam_spans", DC.decontam_spans, DC.sql_decontam_spans()),
        ("decontam_scrub", DC.decontam_scrub, DC.sql_decontam_scrub()),
        ("sample_temperature", SM.sample_temperature, SM.sql_sample_temperature()),
        ("pack_sequences", PK.pack_sequences, PK.sql_pack_sequences()),
        ("quality_logreg", CL.quality_logreg, CL.sql_quality_logreg()),
        # r14: the token-budget keep-list (a small budget so random tiny
        # corpora still exercise the cut) and the packing tuning report
        (
            "mixture_budget_manifest",
            lambda d: SM.mixture_budget_manifest(d, budget_tokens=97),
            SM.sql_mixture_budget_manifest(budget_tokens=97),
        ),
        (
            "pack_efficiency",
            PK.pack_efficiency_report,
            PK.sql_pack_efficiency_report(),
        ),
        # r15: the release-audit quartet — random tiny corpora exercise
        # the CUBE null-vs-'all' mapping, the cluster attribution, the
        # QI banding, and the estimator gridding against the same oracles
        ("filter_ablation", CU.filter_ablation, CU.sql_filter_ablation()),
        ("token_yield", DD.token_yield_report, DD.sql_token_yield_report()),
        ("kanon", SC.kanonymity_report, SC.sql_kanonymity_report()),
        (
            "minhash_calibration",
            DD.minhash_calibration_report,
            DD.sql_minhash_calibration_report(),
        ),
        ("source_overlap", DD.source_overlap_matrix, DD.sql_source_overlap_matrix()),
        (
            "quality_drift",
            VER.quality_drift_snapshot,
            VER.sql_quality_drift_snapshot(),
        ),
        # r16: the continuous-provenance pair — random corpora fuzz the
        # incremental-equals-batch identity (the oracle IS the batch
        # matrix SQL) and the bench×source cell accounting; the sampled
        # calibration path runs against its own parameterized oracle
        (
            "source_overlap_incr",
            DD.source_overlap_incr_snapshot,
            DD.sql_source_overlap_matrix(),
        ),
        (
            "minhash_calibration_sampled",
            lambda d: DD.minhash_calibration_report(d, sample_bands=1),
            DD.sql_minhash_calibration_report(sample_bands=1),
        ),
        (
            "decontam_source_matrix",
            DC.decontam_source_matrix_snapshot,
            DC.sql_decontam_source_matrix(),
        ),
    ]
    tag, op, sql = ops[rng.randrange(len(ops))]
    texts = _gen_docs(rng)

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        return op(
            spark.createDataFrame(
                [(i, t, "en", f"src{i % 3}", len(t)) for i, t in enumerate(texts)],
                "doc_id long, text string, lang string, source string, n_chars long",
            )
        )

    def register(con) -> None:
        import pandas as pd

        con.register(
            "documents",
            pd.DataFrame(
                {
                    "doc_id": range(len(texts)),
                    "text": texts,
                    "lang": "en",
                    "source": [f"src{i % 3}" for i in range(len(texts))],
                    "n_chars": [len(t) for t in texts],
                }
            ),
        )

    return f"text_{tag}", build, sql, register


def run_fuzz(spark: SparkSession, sf_dir: str, n: int, seed: int, verbose: bool = True):
    """Run n random differential checks; returns list of (name, message) failures."""
    rng = random.Random(seed)
    con = duck_connection(sf_dir)
    failures = []
    for i in range(n):
        r = rng.random()
        if r < 0.3:
            gen = gen_window_query
        elif r < 0.6:
            gen = gen_agg_query
        elif r < 0.75:
            gen = gen_join_query
        else:
            gen = gen_text_query
        out = gen(rng)
        register = None
        if len(out) == 4:
            name, build, sql, register = out
        else:
            name, build, sql = out
        try:
            if register is not None:
                # generated corpus replaces the parquet-backed documents view
                c = __import__("duckdb").connect()
                register(c)
                ok, msg = compare(name, build(spark, sf_dir), sql, c)
            else:
                ok, msg = compare(name, build(spark, sf_dir), sql, con)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        if not ok:
            failures.append((name, f"{msg} | sql: {sql}"))
        if verbose:
            print(f"[{'PASS' if ok else 'FAIL'}] #{i} {name}: {msg}")
    return failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    from spark_signals.session import get_spark

    spark = get_spark("fuzz-differential")
    failures = run_fuzz(spark, sf_dir, n, seed)
    print(f"\n{len(failures)} failures")
    for name, msg in failures:
        print(f"  {name}: {msg}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
