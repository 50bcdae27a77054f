"""Skew mitigation utilities — salting for hot keys.

Market data is Zipf-skewed (one instrument can dominate a partition). Two
mechanisms cover it at scale:

* AQE's skew-join / skew-partition splitting (enabled in session.py) handles
  most cases at runtime with no plan changes.
* For deterministic control — or engines/ops AQE can't split (e.g. a
  big-big join with one pathological key) — ``salted_join`` spreads the hot
  key across N salt buckets by replicating the build side N ways.

The grouped-aggregation case needs no salting in Spark: partial aggregation
(map-side combine) already reduces each partition's hot key to one row
before the shuffle — visible as the partial/final HashAggregate pair in
every aggregate plan in this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join with hot-key salting.

    The big side gets a random-but-deterministic salt (hash of all columns
    mod N); the small side is replicated N ways with every salt value. The
    join key becomes (key, salt), so a single hot key spreads over N tasks
    instead of one straggler. Cost: small side × N — use only when the
    small side is modest but too big (or too skew-critical) to broadcast.
    """
    big_salted = big.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("_salt")
    small_replicated = small.select("*", salts)
    joined = big_salted.join(small_replicated, on=[on, "_salt"], how=how)
    return joined.drop("_salt")
