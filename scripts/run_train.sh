#!/usr/bin/env bash
# Launch training (reference scripts/run_train.sh used torchrun; a JAX job
# is single-controller per host — on a TPU pod, run this on every host).
set -euo pipefail
CFG=${1:-train_configs/loraadapter_simple_myriad_finetune.yaml}
shift || true
python train.py --cfg-path "$CFG" "$@"
