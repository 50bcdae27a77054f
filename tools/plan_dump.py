"""Dump .explain('formatted') for queries into plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/plan_dump.py <tag> <suffix> [query ...]

With no query names, dumps every bench.py HEADLINE query. Plans are captured
at $SPARK_GRAFT_SF_DIR (default sf0.1) — the same relation the bench times —
so Exchange counts / join strategies / PushedFilters in the committed files
match the benched plans. Planning only: nothing is executed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]

    import bench
    import __spark_entry__ as entrymod
    from spark_signals.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-dump")
    qs = {**entrymod.queries(), **entrymod.extended_queries()}
    if not names:
        names = bench.HEADLINE
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
