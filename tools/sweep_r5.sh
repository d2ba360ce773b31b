#!/bin/bash
# Round-5 steered TPU sweep (VERDICT r4 next #3/#4/#5/#7).
# Every CLI below serializes on the chip-fence lock (common/tpu_lock.py),
# so rows can never time-slice the chip with each other or with the
# driver's bench — the r4 contamination class is structurally gone.
# Rows are idempotent (skipped when their .log exists); the queue
# self-terminates, leaving the chip idle for the driver window.
#   1. burst_block8       — block-KV-layout flagship A/B (vs 6.48 vmap r4)
#   2. harness_b48        — clean b48 greedy phase split (VERDICT r3 #4)
#                           + warms the driver-bench programs/cache
#   3. harness_engine_b48 — engine-backed eval path decision row
#   4. bench_headline     — exactly as the driver runs it (armed ckpt if
#                           .runs/bench_ckpt.json exists)
#   5. engine_spec_ckpt   — spec inside the engine (armed ckpt only)
#   6. block-size sensitivity + trickle under the block layout
# Queue with:
#   nohup bash tools/sweep_r5.sh > /root/repo/.runs/r5_drive.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/root/repo/.runs/sweep_r5}
mkdir -p "$OUT"

run() {  # run <name> <cmd...>
  name=$1; shift
  if [ -f "$OUT/$name.log" ]; then return 0; fi
  echo "=== $name: $* ===" | tee -a "$OUT/summary.log"
  timeout 5400 "$@" > "$OUT/$name.log.part" 2>&1
  mv "$OUT/$name.log.part" "$OUT/$name.log"
  tail -1 "$OUT/$name.log" | tee -a "$OUT/summary.log"
}

run burst_block8 python tools/engineprobe.py --mode burst --requests 192 \
  --slots 48 --segment 32 --block 8
run harness_b48 python bench.py --ckpt none
run harness_engine_b48 python bench.py --engine --ckpt none
run bench_headline python bench.py
if [ -f /root/repo/.runs/bench_ckpt.json ]; then
  CKPT=$(python -c "import json;print(json.load(open('/root/repo/.runs/bench_ckpt.json'))['ckpt'])")
  run engine_spec_ckpt python tools/engineprobe.py --mode burst \
    --requests 96 --slots 24 --segment 16 --spec 3 --ckpt "$CKPT"
fi
run trickle_block8 python tools/engineprobe.py --mode trickle --arrive 16 \
  --requests 192 --slots 48 --segment 32 --block 8
run burst_block16 python tools/engineprobe.py --mode burst --requests 192 \
  --slots 48 --segment 32 --block 16
run burst_block48 python tools/engineprobe.py --mode burst --requests 192 \
  --slots 48 --segment 32 --block 48
echo "=== sweep_r5 done ===" | tee -a "$OUT/summary.log"
