#!/bin/bash
# Round-4c: per-row KV write impl A/B inside the real engine program, plus
# the chat/trickle reruns that crashed mid-4b on the (since-fixed) Pallas
# block-shape rule.  Each impl variant is a fresh segment-program compile.
set -u
OUT=${1:-/tmp/sweep_r4c}
mkdir -p "$OUT"

eprobe() {
  name=$1; shift
  echo "=== engineprobe $name: $* [MYRIAD_KV_WRITE=${MYRIAD_KV_WRITE:-auto}] ===" | tee -a "$OUT/summary.log"
  timeout 5400 python tools/engineprobe.py "$@" > "$OUT/engine_$name.log" 2>&1
  tail -1 "$OUT/engine_$name.log" | tee -a "$OUT/summary.log"
}

# the A/B: identical burst workload, three write impls
MYRIAD_KV_WRITE=pallas  eprobe burst_pallas  --mode burst --requests 192 --slots 48 --segment 32
MYRIAD_KV_WRITE=vmap    eprobe burst_vmap    --mode burst --requests 192 --slots 48 --segment 32
MYRIAD_KV_WRITE=scatter eprobe burst_scatter --mode burst --requests 192 --slots 48 --segment 32
unset MYRIAD_KV_WRITE

# 4b casualties: multi-turn chat (slots self-sized to KV budget), trickle
eprobe chat    --mode chat --turns 4 --slots 16 --segment 32
eprobe trickle --mode trickle --arrive 16 --requests 192 --slots 48 --segment 32

echo "=== sweep_r4c done ===" | tee -a "$OUT/summary.log"
