"""Relational / control-plane operator coverage on the TPC-H-ish tables.

The reference runs this class of SQL against Postgres from its CLI tools and
Grafana dashboards (SURVEY.md §2.5 J3-J5, §2.4 A5-A6, §2.7 sorts/limits):
run listings (join + order + limit), strategy summaries (left join + FILTER
aggregates), existence checks (anti/semi joins), and top-k panels. Here they
are expressed as Catalyst plans over the driver's star schema, plus a
TPC-H-Q1-style pricing rollup exercising map-side partial aggregation.

Scale notes: dimension tables (customer, nation, region) are broadcast —
`F.broadcast` pins the hint so the fact-side scan never shuffles for the
join. Top-k goes through TakeOrderedAndProject (no global sort). Aggregates
are partial-before-shuffle by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_signals.io.sources import read_table
from spark_signals.parity import sround

TOPK_LIMIT = 200
LISTING_LIMIT = 100


def q_runs_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — inner join + ORDER BY ... DESC LIMIT (reference:
    scripts/strategy_runs.py:26-37 lists runs joined to strategies).

    orders ⋈ customer stands in for strategy_runs ⋈ strategies. The
    customer side is broadcast; the limit plans as TakeOrderedAndProject.
    """
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner")
        .select("o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice", "c_name", "c_mktsegment")
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(LISTING_LIMIT)
    )


SQL_RUNS_LISTING = f"""
SELECT o_orderkey, o_orderdate, o_orderstatus, o_totalprice, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
ORDER BY o_orderdate DESC, o_orderkey DESC
LIMIT {LISTING_LIMIT}"""


def q_strategy_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 + A5 — left join + grouped FILTER aggregates (reference:
    scripts/strategy_manager.py:337-350 summarizes strategies with
    COUNT(*) FILTER / MIN(...) FILTER over their runs)."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    joined = customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
    return joined.groupBy("c_mktsegment").agg(
        F.countDistinct("c_custkey").alias("n_customers"),
        F.count("o_orderkey").alias("n_orders"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open_orders"),
        F.min(F.when(F.col("o_orderstatus") == "O", F.col("o_orderdate"))).alias(
            "first_open_orderdate"
        ),
    )


SQL_STRATEGY_SUMMARY = """
SELECT c_mktsegment,
       COUNT(DISTINCT c_custkey) AS n_customers,
       COUNT(o_orderkey) AS n_orders,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open_orders,
       MIN(o_orderdate) FILTER (WHERE o_orderstatus = 'O') AS first_open_orderdate
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment"""


def q_parts_never_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — anti-join (reference: strategy_manager.py:176-184 deletes
    strategies WHERE NOT EXISTS runs)."""
    part = read_table(spark, sf_dir, "part")
    early = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1995-06-01")
    )
    return part.join(
        early, part.p_partkey == early.l_partkey, "left_anti"
    ).select("p_partkey", "p_name", "p_brand", "p_type")


SQL_PARTS_NEVER_SHIPPED = """
SELECT p_partkey, p_name, p_brand, p_type
FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey
                    AND l.l_shipdate < TIMESTAMP '1995-06-01 00:00:00')"""


def q_orders_with_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (EXISTS) companion to J5."""
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    return orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


SQL_ORDERS_WITH_LINEITEMS = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)"""


def q_topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 top-k — ORDER BY value DESC LIMIT n with a deterministic
    tiebreak (reference: Grafana overview.json:46 'ORDER BY event_time DESC
    LIMIT 200'). Plans as TakeOrderedAndProject — per-partition heaps, no
    global sort."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy(F.desc("value"), F.desc("event_id"))
        .limit(TOPK_LIMIT)
    )


SQL_TOPK_EVENTS = f"""
SELECT event_id, ts, user_id, event_type, value
FROM events ORDER BY value DESC, event_id DESC LIMIT {TOPK_LIMIT}"""


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary on lineitem — grouped sums/avgs with
    map-side partial aggregation; the driver's hourly-rollup shape at
    warehouse scale."""
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    agg = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    # one withColumns projection instead of 7 chained withColumn ops (each
    # re-analyzes the whole plan on the driver; see parity._round_cols)
    return agg.withColumns(
        {
            **{c: sround(F.col(c), 2)
               for c in ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"]},
            **{c: sround(F.col(c), 6) for c in ["avg_qty", "avg_price", "avg_disc"]},
        }
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       floor((SUM(l_quantity)) * 1e2 + 0.5000001) / 1e2 AS sum_qty,
       floor((SUM(l_extendedprice)) * 1e2 + 0.5000001) / 1e2 AS sum_base_price,
       floor((SUM(l_extendedprice * (1.0 - l_discount))) * 1e2 + 0.5000001) / 1e2 AS sum_disc_price,
       floor((SUM(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax))) * 1e2 + 0.5000001) / 1e2 AS sum_charge,
       floor((AVG(l_quantity)) * 1e6 + 0.5000001) / 1e6 AS avg_qty,
       floor((AVG(l_extendedprice)) * 1e6 + 0.5000001) / 1e6 AS avg_price,
       floor((AVG(l_discount)) * 1e6 + 0.5000001) / 1e6 AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus"""


def q_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join (fact ⋈ fact ⋈ broadcast dim) + grouped revenue — the
    shape of the reference's Grafana per-instrument panels at scale."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(_revenue_sum_u().alias("revenue_u"), F.count(F.lit(1)).alias("n_items"))
    )
    return agg.select(
        "c_mktsegment", "o_orderstatus",
        sround(F.col("revenue_u").cast("double") / F.lit(1e4), 2).alias("revenue"),
        "n_items",
    )


def _revenue_sum_u():
    """Σ revenue as exact dp=4 integer micro-units: the per-row term
    l_extendedprice·(1−l_discount) has exactly 4 decimals (2+2), so the
    grid recovers it exactly and the BIGINT SUM is order-independent — a
    raw double SUM at ~1e9 magnitude carries a summation-order ulp that
    straddled the dp=2 output grid at sf0.1."""
    from spark_signals.rounding import micro_units

    return F.sum(
        micro_units(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4)
    )


SQL_SEGMENT_REVENUE = """
SELECT c_mktsegment, o_orderstatus,
       floor((CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1e4 + 0.5000001) AS BIGINT)) AS DOUBLE) / 1e4)
             * 1e2 + 0.5000001) / 1e2 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, o_orderstatus"""


def _bucketed_order_tables(spark: SparkSession, sf_dir: str):
    """Build-once bucketed copies of the two fact tables, co-located on the
    order key (write-once, join-many amortization — io.sinks.write_bucketed).
    Rebuilt only when absent from the session catalog; the data lives under
    the system temp dir keyed by scale factor."""
    import os
    import tempfile

    from spark_signals.io.sinks import write_bucketed

    key = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    li_t, od_t = f"lineitem_bkt_{key}", f"orders_bkt_{key}"
    if not (spark.catalog.tableExists(li_t) and spark.catalog.tableExists(od_t)):
        base = os.path.join(tempfile.gettempdir(), f"spark_signals_bkt_{key}")
        write_bucketed(
            read_table(spark, sf_dir, "lineitem"), li_t,
            os.path.join(base, "lineitem"), key="l_orderkey",
        )
        write_bucketed(
            read_table(spark, sf_dir, "orders"), od_t,
            os.path.join(base, "orders"), key="o_orderkey",
        )
    return spark.table(li_t), spark.table(od_t)


def q_segment_revenue_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """segment_revenue over co-located bucketed fact tables: the fact⋈fact
    join runs with ZERO exchanges (both sides pre-hashed on the order key;
    tests/test_plans.py asserts it), leaving the group-by as the query's
    only shuffle. This is the nightly-join shape at 100 TB: pay the bucket
    shuffle once at ingest, join shuffle-free forever after. Same oracle as
    the scan-based form — identical results, different physical plan."""
    li, orders = _bucketed_order_tables(spark, sf_dir)
    customer = read_table(spark, sf_dir, "customer")
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), F.col("o_custkey") == customer.c_custkey)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(_revenue_sum_u().alias("revenue_u"), F.count(F.lit(1)).alias("n_items"))
    )
    return agg.select(
        "c_mktsegment", "o_orderstatus",
        sround(F.col("revenue_u").cast("double") / F.lit(1e4), 2).alias("revenue"),
        "n_items",
    )


def q_nation_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-chained snowflake join: supplier ⋈ nation ⋈ region with
    grouped account-balance stats (A6-style control-plane counting)."""
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    agg = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.avg("s_acctbal").alias("avg_acctbal"),
            F.max("s_acctbal").alias("max_acctbal"),
        )
    )
    return agg.withColumn("avg_acctbal", sround(F.col("avg_acctbal"), 6))


SQL_NATION_REGION_ROLLUP = """
SELECT r_name, COUNT(*) AS n_suppliers,
       floor((AVG(s_acctbal)) * 1e6 + 0.5000001) / 1e6 AS avg_acctbal,
       MAX(s_acctbal) AS max_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name"""


SESSION_GAP = "30 minutes"


def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 beyond-parity: gap-based sessionization via Spark's native
    ``session_window`` (30-min inactivity gap per user).

    The reference uses tumbling windows only (SURVEY.md §2.8 T6), but
    session windows are first-class in Spark batch AND Structured
    Streaming, so the engine exposes them. The oracle reproduces the
    semantics with the classic island detection (lag → new-session flag →
    running sum); session_end = last event + gap, matching Spark's
    definition exactly.

    Scale: one shuffle on user_id; the session assembly is a merging
    aggregation (map-side partial sessions merged in reduce) — the same
    plan shape Spark uses for streaming session windows with watermark
    state eviction.
    """
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", SESSION_GAP).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), sround(F.sum("value"), 6).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


SQL_USER_SESSIONS = """
WITH g AS (
  SELECT user_id, ts, value,
    -- >= not >: Spark session windows are half-open [t, t+gap), so an event
    -- arriving exactly gap-after the previous one starts a NEW session
    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_s
  FROM events
), s AS (
  SELECT user_id, ts, value,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM g
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       floor((SUM(value)) * 1e6 + 0.5000001) / 1e6 AS sum_value
FROM s GROUP BY user_id, sid"""


def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event_type (p50/p95/p99) — the
    SLO-style quantile reporting the reference's healthchecks imply
    (BASELINE.md lag/staleness SLOs), as an exact single-pass aggregate.

    Scale note: exact percentile shuffles all values per group (sort-based
    aggregate). At 100 TB the drop-in scale path is
    ``F.percentile_approx`` (t-digest sketch, map-side combinable,
    rescan-free) — same call site, bounded error; the exact form stays the
    correctness oracle at test scale.
    """
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        sround(F.percentile("value", 0.5), 6).alias("p50"),
        sround(F.percentile("value", 0.95), 6).alias("p95"),
        sround(F.percentile("value", 0.99), 6).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


SQL_VALUE_PERCENTILES = """
SELECT event_type,
  floor((quantile_cont(value, 0.5)) * 1e6 + 0.5000001) / 1e6 AS p50,
  floor((quantile_cont(value, 0.95)) * 1e6 + 0.5000001) / 1e6 AS p95,
  floor((quantile_cont(value, 0.99)) * 1e6 + 0.5000001) / 1e6 AS p99,
  count(*) AS n
FROM events GROUP BY event_type"""


# t-digest-style sketch accuracy knob for the approx path: Spark documents
# the relative rank error as <= 1/accuracy, so 10_000 → ±0.01% rank error
PERCENTILE_APPROX_ACCURACY = 10_000


def q_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB drop-in for q_value_percentiles: percentile_approx — a
    map-side-combinable sketch (one partial-aggregated shuffle carrying
    fixed-size sketches per group, no per-group value sort). Sketch results
    are engine-specific, so this query is verified against the EXACT form
    within the sketch's rank-error bound (tests/), not against DuckDB."""
    ev = read_table(spark, sf_dir, "events")
    acc = F.lit(PERCENTILE_APPROX_ACCURACY)
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, acc).alias("p50"),
        F.percentile_approx("value", 0.95, acc).alias("p95"),
        F.percentile_approx("value", 0.99, acc).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


def q_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 beyond-parity: 2h sliding window, 1h slide — each event lands in
    exactly 2 epoch-aligned windows (Spark native ``window(col, w, s)``;
    works unchanged under readStream + watermark).

    The oracle expands the slide set (k ∈ {0,1} hour offsets from the
    event's hour) — the standard relational emulation of sliding windows.
    """
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), sround(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_events",
            "sum_value",
        )
    )


SQL_SLIDING_WINDOW_COUNTS = """
WITH slides AS (SELECT unnest(range(0, 2)) AS k)
SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS win_start,
       date_trunc('hour', ts) - k * INTERVAL 1 HOUR + INTERVAL 2 HOUR AS win_end,
       count(*) AS n_events,
       floor((SUM(value)) * 1e6 + 0.5000001) / 1e6 AS sum_value
FROM events, slides
GROUP BY 1, 2"""


RELATIONAL_QUERIES = {
    "runs_listing_join_topn": (q_runs_listing, SQL_RUNS_LISTING),
    "strategy_summary_filter_agg": (q_strategy_summary, SQL_STRATEGY_SUMMARY),
    "anti_join_parts_never_shipped": (q_parts_never_shipped, SQL_PARTS_NEVER_SHIPPED),
    "semi_join_has_lineitems": (q_orders_with_lineitems, SQL_ORDERS_WITH_LINEITEMS),
    "topk_events": (q_topk_events, SQL_TOPK_EVENTS),
    "pricing_summary_q1": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "segment_revenue_3way_join": (q_segment_revenue, SQL_SEGMENT_REVENUE),
    "segment_revenue_bucketed": (q_segment_revenue_bucketed, SQL_SEGMENT_REVENUE),
    "nation_region_rollup": (q_nation_region_rollup, SQL_NATION_REGION_ROLLUP),
    "session_window_per_user": (q_user_sessions, SQL_USER_SESSIONS),
    "value_percentiles_exact": (q_value_percentiles, SQL_VALUE_PERCENTILES),
    "sliding_window_counts": (q_sliding_window_counts, SQL_SLIDING_WINDOW_COUNTS),
}
