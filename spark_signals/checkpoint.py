"""One lineage-truncation helper for every stage-boundary pin.

Iterative operators (connected components, Lloyd rounds, BPE merge
rounds) and wide-fan-out pipelines truncate lineage at stage boundaries:
without the cut, every downstream action re-runs Catalyst analysis over
the whole accumulated tree — the r12 curate-example measurement (432 s →
51 s at sf0.001, byte-identical output) was pure driver-side replanning
tax. Every such boundary in the library routes through :func:`pin`
(``df.transform(pin)``) so ONE config key decides the durability story:

* default — ``localCheckpoint(eager=True)``: executor-local blocks,
  zero external storage, fastest. Right for single-node runs and for any
  job that simply re-runs on failure; blocks are UNRECOVERABLE on
  executor loss.
* ``spark.signals.checkpointDir`` set (``spark.conf.set(...)`` or
  ``--conf`` at submit) — a RELIABLE ``checkpoint(eager=True)`` under
  that directory: blocks land on the cluster's fault-tolerant store
  (HDFS/S3) and survive executor loss. The 100 TB durability switch,
  flipped in one place instead of editing ~40 call sites.

RETENTION under the reliable mode: Spark deletes reliable-checkpoint
files only when ``spark.cleaner.referenceTracking.cleanCheckpoints``
is true (a STATIC SparkConf key — it configures the ContextCleaner at
SparkContext construction, so set it at submit time alongside the
durability flag, not via ``spark.conf.set`` mid-session). Without it a
long-lived session accumulates one checkpoint directory per pin()
until the application exits; Spark never reclaims them, and the
curate-example ``_checkpoint_scope`` cleanup only unpersists
localCheckpoint blocks. Recommended submit-time pairing::

    --conf spark.signals.checkpointDir=hdfs://.../ck \\
    --conf spark.cleaner.referenceTracking.cleanCheckpoints=true

For batch jobs that exit per run, the per-application subdirectory can
instead be removed by the job scheduler after success.

The key is read per call, so a long-lived session can turn durability on
for a critical job and off again; ``setCheckpointDir`` is applied once
per (SparkContext, dir) — Spark creates a fresh unique subdirectory per
application under the given path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CHECKPOINT_DIR_KEY = "spark.signals.checkpointDir"

# setCheckpointDir is apply-once per (application, configured dir): Spark's
# getCheckpointDir returns the per-app UNIQUE SUBDIR it created, never the
# configured path, so the only way to avoid re-setting (and spawning a new
# subdir) on every pin is to remember what we applied ourselves.
_applied: dict[str, str] = {}


def pin(df: DataFrame) -> DataFrame:
    """Truncate lineage at a stage boundary (see module docstring).

    Streaming DataFrames pass through untouched — micro-batch plans are
    bounded by the sink epoch and checkpointing is the query's job.
    """
    if df.isStreaming:
        return df
    spark = df.sparkSession
    ckdir = spark.conf.get(CHECKPOINT_DIR_KEY, None)
    if not ckdir:
        return df.localCheckpoint(eager=True)
    sc = spark.sparkContext
    app = sc.applicationId
    if _applied.get(app) != ckdir:
        sc.setCheckpointDir(ckdir)
        _applied[app] = ckdir
    return df.checkpoint(eager=True)
