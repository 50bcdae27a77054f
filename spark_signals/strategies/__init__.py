"""Strategy registry — pluggable signal strategies.

Mirrors the reference's registry/resolution contract
(flink_jobs/strategies/__init__.py:6-26): a name→module-path alias map,
dotted-path fallback, runtime registration, and a duck-typed
``build_pipeline`` check at resolution (reference __main__.py:25-32).

A strategy module exposes::

    def build_pipeline(ticks: DataFrame, cfg: EngineConfig) -> PipelineOutputs

taking the watermarked tick DataFrame (batch or streaming source — the same
logical plan serves both) and returning the full output bundle. Strategies
that outgrow SQL expressions can register pandas_udf / applyInPandas stages
inside their builder — the extension point the reference reserves via
``prepare_environment`` (reference README.md:71-74).
"""

from __future__ import annotations

from importlib import import_module

STRATEGY_REGISTRY: dict[str, str] = {
    "sma_cross": "spark_signals.strategies.sma_cross",
    "ewma_zscore": "spark_signals.strategies.ewma_zscore",
    "breakout": "spark_signals.strategies.breakout",
}


def get_strategy_module(name: str):
    """Resolve a strategy name (or dotted path) to its module and validate
    the build_pipeline contract."""
    path = STRATEGY_REGISTRY.get(name, name)
    if "." not in path:
        path = f"spark_signals.strategies.{path}"
    module = import_module(path)
    if not hasattr(module, "build_pipeline"):
        raise TypeError(f"strategy module {path!r} does not define build_pipeline")
    return module


def register_strategy(name: str, module_path: str) -> None:
    """Register or update a strategy alias at runtime."""
    STRATEGY_REGISTRY[name] = module_path
