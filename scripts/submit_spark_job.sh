#!/usr/bin/env bash
set -euo pipefail

# Submit the spark_signals job via spark-submit — the deploy-time analog of
# the reference's scripts/submit_flink_job.sh (flink run -m jobmanager:8081).
#
# Usage: scripts/submit_spark_job.sh [job args...]
#   job args are passed through to `python -m spark_signals`
#   (--mode batch|stream --source DIR --out DIR --strategy NAME ...)
#
# Environment:
#   SPARK_MASTER        cluster master (default local[*]); on a real cluster
#                       e.g. yarn, k8s://..., spark://host:7077
#   SPARK_SUBMIT_BIN    spark-submit binary (default: from PATH)
#   SPARK_SUBMIT_FLAGS  extra flags, e.g. "--deploy-mode cluster
#                       --num-executors 1000 --executor-memory 16g"
#   STRATEGY_MODULE / STRATEGY_RUN_ID / EXECUTION_MODE
#                       forwarded to the job (set by the deploy manager)

REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
MASTER=${SPARK_MASTER:-local[*]}
SUBMIT=${SPARK_SUBMIT_BIN:-spark-submit}
FLAGS=${SPARK_SUBMIT_FLAGS:-}

echo "Submitting spark_signals job to ${MASTER} (strategy=${STRATEGY_MODULE:-sma_cross})"
# shellcheck disable=SC2086
exec "${SUBMIT}" \
  --master "${MASTER}" \
  --name "spark-signals-${STRATEGY_MODULE:-sma_cross}" \
  --conf "spark.executorEnv.STRATEGY_RUN_ID=${STRATEGY_RUN_ID:-}" \
  ${FLAGS} \
  "${REPO_ROOT}/scripts/run_job.py" "$@"
