"""spark-signals: a PySpark-native streaming analytics engine.

A ground-up Spark rebuild of the query/data-processing capabilities of the
reference system (KitHaywood/flink-signals): keyed market-tick ingestion,
normalization (mid-price, tick returns, rolling volatility), SMA-crossover
signal detection with confirmation debounce, sparse-signal forward-fill into
continuous positions, a parameterized paper-trading cost model, and event-time
tumbling-window performance metrics with hourly rollups — all expressed as
declarative DataFrame plans that Catalyst optimizes, shared between a
deterministic batch/backtest mode and a Structured Streaming mode.
"""

from spark_signals.config import EngineConfig
from spark_signals.session import get_spark

__all__ = ["EngineConfig", "get_spark"]
__version__ = "0.1.0"
