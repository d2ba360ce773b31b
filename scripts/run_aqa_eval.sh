#!/usr/bin/env bash
# Single-chip AQA evaluation (reference scripts/run_aqa_eval.sh).
set -euo pipefail
CFG=${1:-eval_configs/myriad.yaml}
shift || true
python evaluation_aqa_dataset.py --cfg-path "$CFG" --task_type 1cls --split mvtec --bs 8 "$@"
