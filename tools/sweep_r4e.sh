#!/bin/bash
# Round-4e steered TPU sweep — replaces r4_queue.sh's fixed tail order
# with priority order once train_to_spec has armed the checkpoint:
#   1. burst_block8       — the block-KV-layout flagship A/B (vs 6.48 vmap)
#   2. harness_b48        — b48 greedy phase split (VERDICT r3 #4) + warms
#                           the driver-bench fixed-batch cache
#   3. bench_headline     — the armed spec headline exactly as the driver
#                           runs it (harness rides the t2s eval cache)
#   4. harness_engine_b48 — engine-backed eval path decision row
#   5. engine_spec_ckpt   — spec inside the engine on the trained ckpt
#                           (VERDICT r3 #3; per-row mode, 24 slots)
#   6. block-size sensitivity + trickle under the block layout
# Queue with:
#   nohup bash tools/sweep_r4e.sh > /root/repo/.runs/r4e_drive.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/root/repo/.runs/sweep_r4e}
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
run bench_headline python bench.py
if [ -f /root/repo/.runs/bench_ckpt.json ]; then
  CKPT=$(python -c "import json;print(json.load(open('/root/repo/.runs/bench_ckpt.json'))['ckpt'])")
  run engine_spec_ckpt python tools/engineprobe.py --mode burst \
    --requests 96 --slots 24 --segment 16 --spec 3 --ckpt "$CKPT"
fi
run harness_engine_b48 python bench.py --engine --ckpt none
run trickle_block8 python tools/engineprobe.py --mode trickle --arrive 16 \
  --requests 192 --slots 48 --segment 32 --block 8
run burst_block16 python tools/engineprobe.py --mode burst --requests 192 \
  --slots 48 --segment 32 --block 16
run burst_block48 python tools/engineprobe.py --mode burst --requests 192 \
  --slots 48 --segment 32 --block 48
echo "=== sweep_r4e done ===" | tee -a "$OUT/summary.log"
