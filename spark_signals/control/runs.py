"""Control plane: strategy catalog + run lifecycle — D4, D5, D6.

The reference keeps `strategies` / `strategy_runs` in Postgres with
ON CONFLICT upserts, INSERT..RETURNING run creation, UPDATE-to-end, and a
CHECK constraint on run_type (reference docker/postgres/init/02_schema.sql:
5-31, scripts/strategy_manager.py:109-169, scripts/strategy_runs.py:62-97).
Here it is a driver-side JSON store (SURVEY.md §2.10 D5 disposition) with
the same semantics: control-plane metadata is tiny and transactional, the
wrong shape for a distributed engine — and the run rows remain queryable as
DataFrames for the J3/J4-style listings.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import uuid
from dataclasses import asdict, dataclass, field

VALID_RUN_TYPES = {"LIVE", "REPLAY", "BACKTEST", "PAPER"}  # D6 CHECK analog


@dataclass
class StrategyRun:
    run_id: str
    strategy: str
    run_type: str
    parameters: dict
    started_at: str
    ended_at: str | None = None
    created_by: str = "spark-signals"


class RunStore:
    """File-backed strategies/strategy_runs store."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._strategies_path = os.path.join(root, "strategies.json")
        self._runs_path = os.path.join(root, "strategy_runs.json")

    # ---------------------------------------------------------- strategies
    def _load(self, path: str) -> dict:
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        return {}

    def _save(self, path: str, data: dict) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=2, sort_keys=True)
        os.replace(tmp, path)

    def upsert_strategy(self, name: str, description: str = "", module: str = "sma_cross") -> None:
        """D4 — INSERT ... ON CONFLICT (name) DO UPDATE."""
        strategies = self._load(self._strategies_path)
        strategies[name] = {"description": description, "module": module}
        self._save(self._strategies_path, strategies)

    def strategies(self) -> dict:
        return self._load(self._strategies_path)

    # ---------------------------------------------------------------- runs
    def start_run(self, strategy: str, run_type: str, parameters: dict | None = None) -> StrategyRun:
        """D5 — INSERT ... RETURNING."""
        if run_type not in VALID_RUN_TYPES:  # D6
            raise ValueError(f"run_type must be one of {sorted(VALID_RUN_TYPES)}")
        if strategy not in self.strategies():
            raise KeyError(f"unknown strategy {strategy!r} — upsert it first")
        run = StrategyRun(
            run_id=str(uuid.uuid4()),
            strategy=strategy,
            run_type=run_type,
            parameters=parameters or {},
            started_at=dt.datetime.now(dt.timezone.utc).isoformat(),
        )
        runs = self._load(self._runs_path)
        runs[run.run_id] = asdict(run)
        self._save(self._runs_path, runs)
        return run

    def end_run(self, run_id: str) -> None:
        """D5 — UPDATE ... SET ended_at WHERE run_id."""
        runs = self._load(self._runs_path)
        if run_id not in runs:
            raise KeyError(run_id)
        runs[run_id]["ended_at"] = dt.datetime.now(dt.timezone.utc).isoformat()
        self._save(self._runs_path, runs)

    def active_runs(self) -> list[dict]:
        return [r for r in self._load(self._runs_path).values() if r["ended_at"] is None]

    def list_runs(self, limit: int = 20) -> list[dict]:
        """J3 — ordered/limited run listing."""
        runs = sorted(
            self._load(self._runs_path).values(),
            key=lambda r: (r["started_at"], r["run_id"]),
            reverse=True,
        )
        return runs[:limit]

    def retire_strategy(self, name: str) -> bool:
        """J5 — delete only when no runs reference it (anti-join-shaped
        guard, reference strategy_manager.py:176-184)."""
        runs = self._load(self._runs_path)
        if any(r["strategy"] == name for r in runs.values()):
            return False
        strategies = self._load(self._strategies_path)
        strategies.pop(name, None)
        self._save(self._strategies_path, strategies)
        return True


def load_strategy_config(path: str) -> dict:
    """Parse the reference's strategy-config JSON shape
    (configs/strategies/*.json: name/module/run_type/execution_mode/
    parameters/env_overrides) into EngineConfig overrides."""
    with open(path) as f:
        cfg = json.load(f)
    required = {"name", "module", "run_type", "parameters"}
    missing = required - set(cfg)
    if missing:
        raise ValueError(f"strategy config missing keys: {sorted(missing)}")
    if cfg["run_type"] not in VALID_RUN_TYPES:
        raise ValueError(f"invalid run_type {cfg['run_type']!r}")
    return cfg


def engine_config_from_strategy(cfg: dict):
    """configs/strategies parameters → EngineConfig (bps knobs, windows)."""
    from spark_signals.config import EngineConfig

    p = cfg.get("parameters", {})
    return EngineConfig(
        sma_fast_window=int(p.get("SMA_FAST_WINDOW", 20)),
        sma_slow_window=int(p.get("SMA_SLOW_WINDOW", 60)),
        sma_confirmation_window=int(p.get("SMA_CONFIRMATION_WINDOW", 3)),
        transaction_cost_bps=float(p.get("TRANSACTION_COST_BPS", 5)),
        slippage_bps=float(p.get("SLIPPAGE_BPS", 12)),
        strategy_run_id=cfg.get("name", "sma-cross-paper"),
        execution_mode=cfg.get("execution_mode", "paper"),
    )
