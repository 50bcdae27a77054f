"""Cross-engine differential fuzzing as a CI gate (fixed seeds).

Deeper runs: python tools/fuzz_differential.py <sf_dir> <n> <seed>.
"""
from __future__ import annotations

from tools.fuzz_differential import run_fuzz

SF = "/root/testdata/sf0.001"


def test_random_agg_and_window_queries_match_duckdb(spark):
    # n=30 so the grown text-op pool (11 operators as of r06) still gets
    # multiple draws per op family per CI run
    failures = run_fuzz(spark, SF, n=30, seed=2024, verbose=False)
    assert not failures, failures
