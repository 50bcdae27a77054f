"""Deploy/retire lifecycle (spark_signals.control.manager) — the reference's
strategy_manager contract: deploy registers a run THEN submits; a failed
submission ends the run instead of leaving it dangling; retire ends active
runs and only deletes run-free strategies. The submission itself is faked
with stub scripts so the lifecycle is tested hermetically (the real
scripts/submit_spark_job.sh is exercised separately as a dry-run print)."""

from __future__ import annotations

import os
import stat

from spark_signals.control.manager import main
from spark_signals.control.runs import RunStore


def _stub_script(tmp_path, name: str, exit_code: int) -> str:
    p = tmp_path / name
    p.write_text(f"#!/usr/bin/env bash\nexit {exit_code}\n")
    os.chmod(p, os.stat(p).st_mode | stat.S_IEXEC)
    return str(p)


def _deploy_args(tmp_path, *extra: str) -> list[str]:
    return [
        "--runs-root", str(tmp_path / "control"),
        "deploy",
        "--strategy", "sma_cross",
        "--source", "/root/testdata/sf0.001",
        "--out", str(tmp_path / "out"),
        *extra,
    ]


def test_deploy_dry_run_registers_run_without_submitting(tmp_path, capsys):
    rc = main(_deploy_args(tmp_path))
    assert rc == 0
    out = capsys.readouterr().out
    assert "Dry run" in out and "STRATEGY_RUN_ID=" in out
    store = RunStore(str(tmp_path / "control"))
    assert "sma_cross" in store.strategies()
    active = store.active_runs()
    assert len(active) == 1 and active[0]["run_type"] == "BACKTEST"


def test_deploy_execute_success_keeps_run_active(tmp_path):
    ok = _stub_script(tmp_path, "submit_ok.sh", 0)
    rc = main(_deploy_args(tmp_path, "--execute", "--submit-script", ok))
    assert rc == 0
    assert len(RunStore(str(tmp_path / "control")).active_runs()) == 1


def test_deploy_execute_failure_ends_the_run(tmp_path):
    bad = _stub_script(tmp_path, "submit_bad.sh", 3)
    rc = main(_deploy_args(tmp_path, "--execute", "--submit-script", bad))
    assert rc == 3
    assert RunStore(str(tmp_path / "control")).active_runs() == []


def test_end_existing_closes_prior_runs(tmp_path):
    main(_deploy_args(tmp_path))
    main(_deploy_args(tmp_path, "--end-existing"))
    store = RunStore(str(tmp_path / "control"))
    assert len(store.active_runs()) == 1
    assert len(store.list_runs()) == 2


def test_retire_ends_runs_and_guards_delete(tmp_path, capsys):
    main(_deploy_args(tmp_path))
    root = ["--runs-root", str(tmp_path / "control")]
    rc = main([*root, "retire", "--strategy", "sma_cross"])
    assert rc == 0
    store = RunStore(str(tmp_path / "control"))
    assert store.active_runs() == []
    # delete refused while runs reference the strategy (anti-join guard)
    rc = main([*root, "retire", "--strategy", "sma_cross", "--delete"])
    assert rc == 1
    assert "sma_cross" in store.strategies()


def test_list_prints_strategies_and_runs(tmp_path, capsys):
    main(_deploy_args(tmp_path))
    capsys.readouterr()
    rc = main(["--runs-root", str(tmp_path / "control"), "list"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sma_cross" in out and "ACTIVE" in out


def test_submit_wrapper_forwards_args(tmp_path):
    """The real submit_spark_job.sh execs spark-submit with the job file and
    pass-through args — verified with a fake spark-submit that records its
    argv."""
    import subprocess

    rec = tmp_path / "argv.txt"
    fake = tmp_path / "spark-submit"
    fake.write_text(f'#!/usr/bin/env bash\necho "$@" > {rec}\n')
    os.chmod(fake, os.stat(fake).st_mode | stat.S_IEXEC)
    env = {
        **os.environ,
        "SPARK_SUBMIT_BIN": str(fake),
        "SPARK_MASTER": "local[2]",
        "STRATEGY_MODULE": "sma_cross",
    }
    subprocess.run(
        ["scripts/submit_spark_job.sh", "--mode", "batch", "--source", "x", "--out", "y"],
        env=env, cwd="/root/repo", check=True, capture_output=True,
    )
    argv = rec.read_text()
    assert "--master local[2]" in argv
    assert "run_job.py --mode batch --source x --out y" in argv
