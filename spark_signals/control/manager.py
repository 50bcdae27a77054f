"""Deploy/retire lifecycle CLI — the reference's strategy_manager analog.

Mirrors scripts/strategy_manager.py in the reference (command_deploy at
:237-290, command_retire at :293-333): ``deploy`` registers the strategy,
opens a run in the RunStore, builds the job environment, and invokes the
submission wrapper (scripts/submit_spark_job.sh → spark-submit); a failed
submission ends the run instead of leaving it dangling. ``retire`` ends
active runs and, with --delete, removes the strategy (guarded: only when no
runs reference it, same anti-join-shaped rule as RunStore.retire_strategy).

Usage::

    python -m spark_signals.control.manager deploy \
        --strategy sma_cross --mode batch \
        --source /root/testdata/sf0.001 --source-kind events \
        --out /tmp/out [--execute] [--end-existing]

    python -m spark_signals.control.manager retire --strategy sma_cross
    python -m spark_signals.control.manager list

Without --execute, deploy is a dry run: the run is registered and the exact
submission command + environment are printed (the reference's default too).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

from spark_signals.control.runs import RunStore

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_RUNS_ROOT = os.path.join(REPO_ROOT, "spark-warehouse", "control")
MODE_TO_RUN_TYPE = {"batch": "BACKTEST", "stream": "LIVE"}


def _store(args: argparse.Namespace) -> RunStore:
    return RunStore(args.runs_root)


def command_deploy(args: argparse.Namespace) -> int:
    store = _store(args)
    store.upsert_strategy(args.strategy, description=args.description, module=args.strategy)

    if args.end_existing:
        ended = 0
        for r in store.active_runs():
            if r["strategy"] == args.strategy:
                store.end_run(r["run_id"])
                ended += 1
        if ended:
            print(f"Ended {ended} existing run(s) for {args.strategy!r}.")

    run = store.start_run(
        args.strategy,
        MODE_TO_RUN_TYPE[args.mode],
        parameters={"source": args.source, "out": args.out, "mode": args.mode},
    )
    print(f"Created strategy run {run.run_id} for {args.strategy!r}.")

    env = {
        **os.environ,
        "STRATEGY_MODULE": args.strategy,
        "STRATEGY_RUN_ID": run.run_id,
        "EXECUTION_MODE": args.mode,
    }
    submit = args.submit_script or os.path.join(REPO_ROOT, "scripts", "submit_spark_job.sh")
    command = [
        submit,
        "--mode", args.mode,
        "--source", args.source,
        "--source-kind", args.source_kind,
        "--out", args.out,
        "--strategy", args.strategy,
    ]

    if not args.execute:
        shown = " ".join(
            f"{k}={env[k]}" for k in ("STRATEGY_MODULE", "STRATEGY_RUN_ID", "EXECUTION_MODE")
        )
        print("Dry run: not executing submission.")
        print(f"Invoke manually: {shown} {' '.join(command)}")
        return 0

    try:
        subprocess.run(command, env=env, cwd=REPO_ROOT, check=True)
    except (subprocess.CalledProcessError, OSError) as exc:
        # never leave a dangling active run behind a failed submission
        # (reference strategy_manager.py:277-283)
        store.end_run(run.run_id)
        code = getattr(exc, "returncode", 1)
        print(
            f"Submission failed ({exc}); strategy run {run.run_id} marked as ended.",
            file=sys.stderr,
        )
        return int(code) or 1
    print("Submission successful.")
    return 0


def command_retire(args: argparse.Namespace) -> int:
    store = _store(args)
    ended = 0
    for r in store.active_runs():
        if r["strategy"] == args.strategy:
            store.end_run(r["run_id"])
            ended += 1
    print(f"Ended {ended} active run(s) for {args.strategy!r}.")
    if args.delete:
        if store.retire_strategy(args.strategy):
            print(f"Deleted strategy {args.strategy!r}.")
        else:
            print(
                f"Strategy {args.strategy!r} still has recorded runs; not deleted "
                "(delete requires a run-free strategy).",
                file=sys.stderr,
            )
            return 1
    return 0


def command_list(args: argparse.Namespace) -> int:
    store = _store(args)
    strategies = store.strategies()
    active = {r["run_id"] for r in store.active_runs()}
    print(f"strategies ({len(strategies)}):")
    for name, meta in sorted(strategies.items()):
        print(f"  {name}: module={meta['module']} {meta.get('description', '')}".rstrip())
    print("recent runs:")
    for r in store.list_runs(limit=args.limit):
        state = "ACTIVE" if r["run_id"] in active else "ended"
        print(f"  {r['run_id'][:8]} {r['strategy']:<12} {r['run_type']:<8} {state} {r['started_at']}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="spark_signals.control.manager")
    ap.add_argument("--runs-root", default=os.environ.get("SPARK_SIGNALS_RUNS_ROOT", DEFAULT_RUNS_ROOT))
    sub = ap.add_subparsers(dest="command", required=True)

    dep = sub.add_parser("deploy", help="register a run and submit the job")
    dep.add_argument("--strategy", required=True)
    dep.add_argument("--mode", choices=sorted(MODE_TO_RUN_TYPE), default="batch")
    dep.add_argument("--source", required=True)
    dep.add_argument("--source-kind", choices=["events", "prices"], default="events")
    dep.add_argument("--out", required=True)
    dep.add_argument("--description", default="")
    dep.add_argument("--end-existing", action="store_true")
    dep.add_argument("--execute", action="store_true", help="actually run the submission (default: dry run)")
    dep.add_argument("--submit-script", default=None, help=argparse.SUPPRESS)
    dep.set_defaults(func=command_deploy)

    ret = sub.add_parser("retire", help="end active runs (and optionally delete the strategy)")
    ret.add_argument("--strategy", required=True)
    ret.add_argument("--delete", action="store_true")
    ret.set_defaults(func=command_retire)

    ls = sub.add_parser("list", help="strategies + recent runs")
    ls.add_argument("--limit", type=int, default=20)
    ls.set_defaults(func=command_list)
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    raise SystemExit(main())
