#!/usr/bin/env bash
# Host-parallel ingestion launcher for TPU-VM pods (the SLURM-launcher role,
# reference preprocessing/1_slurm_ingest.sh).
#
# Run the same command on every pod host (e.g. via `gcloud compute tpus
# tpu-vm ssh --worker=all`); each host ingests a disjoint shard of the work
# list (--shard-hosts uses jax.process_index).
#
# Usage: ./1_tpu_ingest.sh <raw_root> <output_root> [preset] [max_parallel]
#   preset: cardiorespiratory (ECG PPG ABD THX, default) | neural (EOG-L EOG-R)
set -euo pipefail

RAW_ROOT=${1:?raw dataset root}
OUT_ROOT=${2:?output root}
PRESET=${3:-cardiorespiratory}
MAX_PARALLEL=${4:-$(nproc)}

case "$PRESET" in
  cardiorespiratory) COLUMNS="ECG PPG ABD THX" ;;
  neural) COLUMNS="EOG-L EOG-R" ;;
  *) echo "Unknown preset: $PRESET" >&2; exit 1 ;;
esac

SCRIPT_DIR=$(cd "$(dirname "$0")" && pwd)

for DATASET in shhs mesa cfs chat ccshs mros wsc; do
  if [ -d "$RAW_ROOT/$DATASET" ]; then
    echo "=== Ingesting $DATASET ($COLUMNS) with $MAX_PARALLEL workers ==="
    python "$SCRIPT_DIR/1_ingest.py" \
      --folder "$RAW_ROOT/$DATASET" \
      --output-folder "$OUT_ROOT" \
      --columns $COLUMNS \
      --max-parallel "$MAX_PARALLEL" \
      --shard-hosts
  fi
done
