"""Split each query's wall into plan-CONSTRUCTION vs EXECUTION.

Usage: python tools/construct_profile.py [query ...]

For every bench HEADLINE query (or the given names): best-of-N of
(a) fn(spark, sf_dir) alone — driver-side DataFrame construction, and
(b) fn(spark, sf_dir) + noop write — the bench's timed unit.
Queries whose build eagerly materializes (persist+pin lifecycles) charge
that execution to (a) by design; the (b)-(a) gap is then the noop re-read.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import bench
    import __spark_entry__ as entrymod
    from spark_signals.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("PROFILE_PASSES", "5"))
    spark = get_spark("construct-profile")
    qs = {**entrymod.queries(), **entrymod.extended_queries()}
    names = sys.argv[1:] or bench.HEADLINE
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    print(f"{'query':34s} {'construct':>9s} {'execute':>9s} {'total':>9s}")
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        cons, tot = [], []
        for _ in range(passes):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            cons.append(t1 - t0)
            tot.append(t2 - t0)
        c, t = min(cons), min(tot)
        print(f"{name:34s} {c:9.3f} {t - c:9.3f} {t:9.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
