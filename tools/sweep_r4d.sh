#!/bin/bash
# Round-4d TPU sweep: the block KV layout on the serving engine, plus the
# engine-backed eval harness (both landed after sweep_r4c).  Queue with:
#   nohup bash tools/sweep_r4d.sh > /tmp/sweep_r4d_drive.log 2>&1 &
set -u
OUT=${1:-/tmp/sweep_r4d}
mkdir -p "$OUT"

run() {  # run <name> <env or -> <cmd...>
  name=$1; envs=$2; shift 2
  echo "=== $name [$envs]: $* ===" | tee -a "$OUT/summary.log"
  if [ "$envs" = "-" ]; then
    timeout 5400 "$@" > "$OUT/$name.log" 2>&1
  else
    timeout 5400 env $envs "$@" > "$OUT/$name.log" 2>&1
  fi
  tail -1 "$OUT/$name.log" | tee -a "$OUT/summary.log"
}

# 1. burst with the block layout (the headline A/B vs r4d's 6.48 vmap)
run burst_block8 - python tools/engineprobe.py --mode burst --requests 192 \
  --slots 48 --segment 32 --block 8
# 2. block-size sensitivity: one dus per step (48) vs finer allocation
run burst_block16 - python tools/engineprobe.py --mode burst --requests 192 \
  --slots 48 --segment 32 --block 16
run burst_block48 - python tools/engineprobe.py --mode burst --requests 192 \
  --slots 48 --segment 32 --block 48
# 3. trickle under the block layout (partial-block admission waste shows
#    up here if anywhere)
run trickle_block8 - python tools/engineprobe.py --mode trickle --arrive 16 \
  --requests 192 --slots 48 --segment 32 --block 8
# 4. shipping harness at the headline profile: the --bench line now
#    carries per-phase means (collate/dispatch/wait/hflush) — the
#    VERDICT r3 #4 gap decomposition at b48.  --ckpt none: these are the
#    GREEDY controls; an armed .runs/bench_ckpt.json must not turn them
#    into spec runs
run harness_b48 - python bench.py --ckpt none
# 5. the engine-backed harness at the same profile: if it beats the
#    fixed-batch number, it becomes the shipping eval path (greedy-only:
#    the block layout refuses spec per-row frontiers)
run harness_engine_b48 - python bench.py --engine --ckpt none
echo "=== sweep_r4d done ===" | tee -a "$OUT/summary.log"
