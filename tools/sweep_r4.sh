#!/bin/bash
# Round-4 TPU measurement queue — the serving-engine numbers VERDICT r3
# ranked first (sweep_r3c.sh steps 8+9 never ran before round end).
# Usage: bash tools/sweep_r4.sh [outdir]   (run serially; one chip)
set -u
OUT=${1:-/tmp/sweep_r4}
mkdir -p "$OUT"

eprobe() {
  name=$1; shift
  echo "=== engineprobe $name: $* ===" | tee -a "$OUT/summary.log"
  timeout 5400 python tools/engineprobe.py "$@" > "$OUT/engine_$name.log" 2>&1
  tail -1 "$OUT/engine_$name.log" | tee -a "$OUT/summary.log"
}

# 1. engine peak vs bench.py's fixed batch at the same slot count
#    (bench b48 fixed-batch = 14.06-14.09 img/s; burst req/s is the
#    engine's answer with per-row completion + admission overheads)
eprobe burst --mode burst --requests 192 --slots 48 --segment 64
# 2. open-loop arrivals: utilization while slots churn
eprobe trickle --mode trickle --arrive 16 --requests 192 --slots 48 --segment 64
# 3. spec inside the engine at the spec-optimal slot count (random
#    weights -> ~0 acceptance floor; the trained-LoRA rerun lands later)
eprobe spec --mode burst --requests 96 --slots 24 --segment 16 --spec 3
# 4. multi-turn chat serving: 16 concurrent KV-resident conversations
eprobe chat --mode chat --turns 4 --slots 16 --segment 32

# 5. single-conversation chat latency: incremental KV turns vs full
#    re-prefill (also asserts transcript equality on device)
echo "=== chatprobe ===" | tee -a "$OUT/summary.log"
timeout 4800 python tools/chatprobe.py --turns 5 --max-new 60 --spec 3 \
  > "$OUT/chatprobe.log" 2>&1
tail -5 "$OUT/chatprobe.log" | tee -a "$OUT/summary.log"

echo "=== sweep_r4 done ===" | tee -a "$OUT/summary.log"
