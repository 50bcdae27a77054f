from spark_signals.io.sources import PRICES_RAW_SCHEMA, load_ticks, read_prices_raw

__all__ = ["PRICES_RAW_SCHEMA", "load_ticks", "read_prices_raw"]
