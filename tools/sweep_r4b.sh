#!/bin/bash
# Round-4b: engine reruns after the lazy-embed OOM fix + single-roundtrip
# tick.  Compiles are warm from sweep_r4 (persistent XLA cache).
set -u
OUT=${1:-/tmp/sweep_r4b}
mkdir -p "$OUT"

eprobe() {
  name=$1; shift
  echo "=== engineprobe $name: $* ===" | tee -a "$OUT/summary.log"
  timeout 5400 python tools/engineprobe.py "$@" > "$OUT/engine_$name.log" 2>&1
  tail -1 "$OUT/engine_$name.log" | tee -a "$OUT/summary.log"
}

# burst peak vs bench.py fixed-batch 14.06 img/s at the same slot count
eprobe burst --mode burst --requests 192 --slots 48 --segment 64
# segment ladder at 48 slots: occupancy (short segments release finished
# rows sooner) vs per-tick sync cost
eprobe burst_s32 --mode burst --requests 192 --slots 48 --segment 32
eprobe trickle --mode trickle --arrive 16 --requests 192 --slots 48 --segment 32
# multi-turn chat serving, slots self-sized to the KV budget
eprobe chat --mode chat --turns 4 --slots 16 --segment 32

echo "=== sweep_r4b done ===" | tee -a "$OUT/summary.log"
