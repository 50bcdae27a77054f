"""spark-submit entry file: a file-path launcher for ``python -m
spark_signals`` (spark-submit takes a script path, not a module name).
Submitted by scripts/submit_spark_job.sh; all arguments pass through."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from spark_signals.__main__ import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
