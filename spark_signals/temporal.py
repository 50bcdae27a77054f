"""Temporal join operators Spark lacks natively: as-of join and range join.

Market-data staples (trade→latest-quote attachment, trailing-window
context) that Flink/kdb expose as primitives. Both are expressed here as
compositions of existing DataFrame ops — no UDFs, no cross joins — so
Catalyst/Tungsten run them at full codegen speed and the shapes scale:

* as-of join: union the two streams, ONE window stage per key ordered by
  (time, side, tiebreak), forward-fill the right side's values with
  last(ignorenulls), keep left rows. One shuffle + one sort regardless of
  input sizes (no per-row probing, no range explosion). The same trick the
  positions stage uses for W4 forward-fill.
* range join ("all right rows in [t-Δ, t)"): time-bucket both sides at Δ
  granularity, explode each left row to its two candidate buckets, bucket
  equi-join, exact bound filter, aggregate. Work is O(matches), never
  O(|L|·|R|) — the naive inequality join Spark would otherwise plan as
  BroadcastNestedLoop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_values: list[str],
    left_time: str = "event_time",
    right_time: str = "event_time",
    tiebreak: str | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """For every left row, attach the most recent right row with
    right_time <= left_time within the same ``on`` key (trade→quote).

    ``right_values`` are the right columns to carry (suffixed nothing —
    they must not collide with left columns). ``tiebreak`` orders rows
    within equal timestamps (right-before-left is always enforced, so an
    exactly-simultaneous right row IS visible to the left row).
    ``tolerance`` (an INTERVAL string, e.g. ``"5 minutes"``) nulls the
    attached values when the matched right row is older than the bound —
    the staleness guard real tickers need.
    """
    rt = "_asof_rt"
    l2 = left.withColumn("_tag", F.lit(1)).withColumn(rt, F.lit(None).cast("timestamp"))
    # the tiebreak must ride along on the right side even when it isn't a
    # carried value column (it orders simultaneous right rows)
    extra = (
        [tiebreak]
        if tiebreak is not None
        and tiebreak in right.columns
        and tiebreak not in right_values
        else []
    )
    r2 = (
        right.select(on, F.col(right_time).alias(left_time), *right_values, *extra)
        .withColumn("_tag", F.lit(0))
        .withColumn(rt, F.col(left_time))
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    order = [F.col(left_time), F.col("_tag")]
    if tiebreak is not None:
        order.append(F.col(tiebreak))
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[c for c in left.columns],
        "_tag",
        F.last(rt, ignorenulls=True).over(w).alias(rt),
        *[F.last(v, ignorenulls=True).over(w).alias(v) for v in right_values],
    )
    out = filled.filter(F.col("_tag") == 1).drop("_tag")
    if tolerance is not None:
        fresh = F.col(rt) >= F.col(left_time) - F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            *[c for c in left.columns],
            F.when(fresh, F.col(rt)).alias(rt),
            *[F.when(fresh, F.col(v)).alias(v) for v in right_values],
        )
    return out.withColumnRenamed(rt, "matched_time")


def range_join_agg(
    left: DataFrame,
    right: DataFrame,
    on: str,
    window: str,
    aggs: list[Column],
    left_time: str = "event_time",
    right_time: str = "event_time",
    left_id: str = "sequence",
    window_seconds: int | None = None,
) -> DataFrame:
    """Aggregate all right rows with right_time in [left_time - window,
    left_time) per left row, keyed by ``on``. Zero-match left rows survive
    with null aggregates (COALESCE counts at the call site). ``left_id``
    must make left rows unique within (on, left_time) ties.

    ``window`` is an INTERVAL string; ``window_seconds`` its length (derived
    for plain "N second(s)/minute(s)/hour(s)" forms).
    """
    if window_seconds is None:
        n, unit = window.split()
        window_seconds = int(n) * {
            "second": 1, "minute": 60, "hour": 3600, "day": 86400,
        }[unit.rstrip("s")]
    span = F.lit(int(window_seconds) * 1_000_000)
    # cast-to-timestamp is a no-op for TIMESTAMP inputs and makes NTZ inputs
    # (e.g. frames built straight off timestamp-µs parquet) legal for
    # unix_micros — exact under the pinned UTC session TZ
    lb = F.floor(F.unix_micros(F.col(left_time).cast("timestamp")) / span)
    rb = F.floor(F.unix_micros(F.col(right_time).cast("timestamp")) / span)

    lkeys = left.select(
        on, F.col(left_time), *[c for c in left.columns if c not in (on, left_time)]
    )
    exploded = lkeys.withColumn("_b", F.explode(F.array(lb - 1, lb)))
    r2 = right.withColumn("_b", rb).withColumnRenamed(right_time, "_rt").select(
        F.col(on).alias("_rk"), "_b", "_rt",
        *[c for c in right.columns if c not in (on, right_time)],
    )
    in_range = (F.col("_rt") >= F.col(left_time) - F.expr(f"INTERVAL {window}")) & (
        F.col("_rt") < F.col(left_time)
    )
    joined = exploded.join(
        r2, (F.col(on) == F.col("_rk")) & (exploded["_b"] == r2["_b"]), "inner"
    ).filter(in_range)
    grouped = joined.groupBy(on, left_time, left_id).agg(*aggs)
    return lkeys.join(grouped, [on, left_time, left_id], "left")


# ------------------------------------------------------------ driver queries
def _trades_quotes(ticks: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Shared trade/quote split for the as-of queries: odd-sequence rows
    play trades, even-sequence rows with valid quotes play the quote
    stream."""
    trades = ticks.filter(F.col("sequence") % 2 == 1).select(
        "product_id", "event_time", "sequence", "price"
    )
    quotes = ticks.filter(
        (F.col("sequence") % 2 == 0)
        & F.col("best_bid").isNotNull()
        & F.col("best_ask").isNotNull()
    ).select(
        "product_id",
        "event_time",
        F.col("sequence").alias("q_seq"),
        F.col("best_bid").alias("q_bid"),
        F.col("best_ask").alias("q_ask"),
    )
    return trades, quotes


def _q_asof(spark, sf_dir: str, tolerance: str | None) -> DataFrame:
    from spark_signals.io.sources import load_ticks

    trades, quotes = _trades_quotes(load_ticks(spark, sf_dir))
    return asof_join(
        trades, quotes, on="product_id",
        right_values=["q_bid", "q_ask", "q_seq"], tiebreak="q_seq",
        tolerance=tolerance,
    )


def q_asof_trade_quote(spark, sf_dir: str) -> DataFrame:
    """As-of join on the tick stream: every trade gets the latest
    at-or-before quote per product."""
    return _q_asof(spark, sf_dir, tolerance=None)


def q_asof_tolerance(spark, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound: same trade→quote attachment, but a
    quote older than 12 hours is nulled out instead of carried forward — the
    tolerance guard real tickers need (kdb aj0 + staleness window). At sf0.01
    (~1 tick / 11 h / instrument) the bound leaves both fresh and stale
    matches, so both branches are exercised."""
    return _q_asof(spark, sf_dir, tolerance="12 hours")


def _sql_asof(tolerance_sql: str | None = None) -> str:
    """DuckDB oracle for the as-of queries; ``tolerance_sql`` (e.g.
    ``"INTERVAL 12 HOUR"``) adds the staleness nulling projection. One
    builder for both variants so the shared union+window CTE cannot drift."""
    from spark_signals import oracle

    if tolerance_sql is None:
        final = "SELECT product_id, event_time, sequence, price, matched_time, q_bid, q_ask, q_seq"
    else:
        fresh = f"matched_time >= event_time - {tolerance_sql}"
        final = (
            "SELECT product_id, event_time, sequence, price,\n"
            + ",\n".join(
                f"       CASE WHEN {fresh} THEN {c} END AS {c}"
                for c in ("matched_time", "q_bid", "q_ask", "q_seq")
            )
        )
    return (
        "WITH "
        + oracle.ticks_cte().strip()
        + """,
trades AS (
  SELECT product_id, event_time, sequence, price FROM ticks WHERE sequence % 2 = 1
),
quotes AS (
  SELECT product_id, event_time, sequence AS q_seq, best_bid AS q_bid, best_ask AS q_ask
  FROM ticks
  WHERE sequence % 2 = 0 AND best_bid IS NOT NULL AND best_ask IS NOT NULL
),
u AS (
  SELECT product_id, event_time, 1 AS tag, sequence, price,
         CAST(NULL AS TIMESTAMP) AS matched_time,
         CAST(NULL AS DOUBLE) AS q_bid, CAST(NULL AS DOUBLE) AS q_ask,
         CAST(NULL AS BIGINT) AS q_seq
  FROM trades
  UNION ALL
  SELECT product_id, event_time, 0, NULL, NULL, event_time, q_bid, q_ask, q_seq
  FROM quotes
),
f AS (
  SELECT product_id, event_time, tag, sequence, price,
         last_value(matched_time IGNORE NULLS) OVER w AS matched_time,
         last_value(q_bid IGNORE NULLS) OVER w AS q_bid,
         last_value(q_ask IGNORE NULLS) OVER w AS q_ask,
         last_value(q_seq IGNORE NULLS) OVER w AS q_seq
  FROM u
  WINDOW w AS (PARTITION BY product_id ORDER BY event_time, tag, q_seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
"""
        + final
        + "\nFROM f WHERE tag = 1"
    )


def q_range_tick_stats(spark, sf_dir: str) -> DataFrame:
    """Range join: per trade, count + average price of ALL ticks in the
    trailing day — the rolling-context aggregation kdb's wj/Flink's interval
    join provide."""
    from spark_signals.io.sources import load_ticks
    from spark_signals.parity import sround

    ticks = load_ticks(spark, sf_dir)
    trades = ticks.filter(F.col("sequence") % 2 == 1).select(
        "product_id", "event_time", "sequence"
    )
    prices = ticks.select("product_id", "event_time", F.col("price").alias("r_price"))
    out = range_join_agg(
        trades, prices, on="product_id", window="1 day",
        aggs=[
            F.count("r_price").alias("n_prior"),
            F.avg("r_price").alias("avg_prior_price"),
        ],
    )
    return out.select(
        "product_id", "event_time", "sequence",
        F.coalesce(F.col("n_prior"), F.lit(0)).alias("n_prior"),
        sround(F.col("avg_prior_price"), 6).alias("avg_prior_price"),
    )


def _sql_range() -> str:
    from spark_signals import oracle

    return (
        "WITH "
        + oracle.ticks_cte().strip()
        + """,
trades AS (
  SELECT product_id, event_time, sequence FROM ticks WHERE sequence % 2 = 1
)
SELECT t.product_id, t.event_time, t.sequence,
       COUNT(r.price) AS n_prior,
       floor((AVG(r.price)) * 1e6 + 0.5000001) / 1e6 AS avg_prior_price
FROM trades t
LEFT JOIN ticks r
  ON r.product_id = t.product_id
 AND r.event_time >= t.event_time - INTERVAL 1 DAY
 AND r.event_time < t.event_time
GROUP BY t.product_id, t.event_time, t.sequence"""
    )


TEMPORAL_QUERIES = {
    "asof_join_trade_quote": (q_asof_trade_quote, _sql_asof()),
    "asof_join_tolerance": (q_asof_tolerance, _sql_asof("INTERVAL 12 HOUR")),
    "range_join_tick_stats": (q_range_tick_stats, _sql_range()),
}
