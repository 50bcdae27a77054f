"""Self-check replicating the driver's DuckDB-oracle comparison.

Runs every __spark_entry__ query at a given scale factor, runs its oracle SQL
in DuckDB over the same parquet tables, and compares row count, column names,
and exact cell values (after sorting columns by name and rows by all columns).

Usage: python tools/oracle_check.py [--extended] [sf_dir] [query ...]

--extended also sweeps the queries RETIRED from the driver contract
(redundant with checked siblings; see __spark_entry__.RETIRED) so they keep
the same value-level verification the driver would have given them, plus
the INCOMING operators queued for a driver slot at the next rotation.
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                df[c] = s.dt.tz_convert("UTC").dt.tz_localize(None)
        elif s.dtype == object:
            df[c] = s.map(lambda v: float(v) if isinstance(v, (int,)) else v)
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def compare(name: str, spark_df, sql: str, con) -> tuple[bool, str]:
    t0 = time.time()
    sp = canon(spark_df.toPandas())
    t_spark = time.time() - t0
    t0 = time.time()
    du = canon(con.execute(sql).fetchdf())
    t_duck = time.time() - t0
    if list(sp.columns) != list(du.columns):
        return False, f"schema mismatch: spark={list(sp.columns)} duck={list(du.columns)}"
    if len(sp) != len(du):
        return False, f"rowcount mismatch: spark={len(sp)} duck={len(du)}"
    bad = []
    for c in sp.columns:
        a, b = sp[c], du[c]
        # The driver hashes raw cell values, so int64 5 vs float64 5.0 is a
        # red even when every value is numerically equal. Flag dtype-kind
        # drift (int vs float) as a failure instead of silently coercing —
        # this is exactly the laxness that hid the SUM(BIGINT)->HUGEINT->
        # float64 oracle bug for three rounds.
        a_num = pd.api.types.is_numeric_dtype(a) and not pd.api.types.is_bool_dtype(a)
        b_num = pd.api.types.is_numeric_dtype(b) and not pd.api.types.is_bool_dtype(b)
        if a_num and b_num and (
            pd.api.types.is_float_dtype(a) != pd.api.types.is_float_dtype(b)
        ):
            bad.append(
                f"{c}: dtype-kind mismatch spark={a.dtype} duck={b.dtype} "
                f"(driver hash distinguishes int from float)"
            )
            continue
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            aa = a.astype(float).to_numpy()
            bb = b.astype(float).to_numpy()
            neq = ~((np.isnan(aa) & np.isnan(bb)) | (aa == bb))
            if neq.any():
                i = int(np.argmax(neq))
                bad.append(f"{c}: {int(neq.sum())} diffs, e.g. row {i}: {aa[i]!r} vs {bb[i]!r}")
        else:
            av = a.where(pd.notna(a), None)
            bv = b.where(pd.notna(b), None)
            neq = ~(av.eq(bv) | (pd.isna(a) & pd.isna(b)))
            if neq.any():
                i = int(np.argmax(neq.to_numpy()))
                bad.append(f"{c}: {int(neq.sum())} diffs, e.g. row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}")
    if bad:
        return False, "; ".join(bad[:5])
    return True, f"OK rows={len(sp)} spark={t_spark:.1f}s duck={t_duck:.2f}s"


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    extended = "--extended" in argv
    if extended:
        argv.remove("--extended")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entrymod
    from spark_signals.session import get_spark

    spark = get_spark("oracle-check")
    con = duck_connection(sf_dir)
    qs = entrymod.queries()
    oq = entrymod.oracle_sql()
    if extended:
        qs = {**qs, **entrymod.extended_queries(), **entrymod.incoming_queries()}
        oq = {**oq, **entrymod.extended_oracle_sql(), **entrymod.incoming_oracle_sql()}

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oq:
            df = fn(spark, sf_dir)
            print(f"[rows-only] {name}: rows={df.count()}")
            continue
        try:
            ok, msg = compare(name, fn(spark, sf_dir), oq[name], con)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        status = "PASS" if ok else "FAIL"
        if not ok:
            failures += 1
        print(f"[{status}] {name}: {msg}")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
