#!/bin/bash
# Round-3c TPU measurement queue (run serially; each bench is one process).
# Usage: bash tools/sweep_r3c.sh [outdir]
set -u
OUT=${1:-/tmp/sweep_r3c}
mkdir -p "$OUT"

run() {
  name=$1; shift
  echo "=== $name: $* ===" | tee -a "$OUT/summary.log"
  timeout 3000 python bench.py "$@" > "$OUT/$name.log" 2>&1
  tail -1 "$OUT/$name.log" | tee -a "$OUT/summary.log"
}

# 1. default repro (b48 / 9-chunk / staged / g32), fixed-batch only —
#    cached compile.  The plain `python bench.py` default now ALSO runs
#    the shipping harness subprocess (the driver headline); that is step
#    1b, with its own generous timeout.
run default --no-harness
# 1b. driver-equivalent headline: fixed-batch + harness subprocess
echo "=== headline: (default, with harness) ===" | tee -a "$OUT/summary.log"
timeout 5400 python bench.py > "$OUT/headline.log" 2>&1
tail -1 "$OUT/headline.log" | tee -a "$OUT/summary.log"
# 2. granularity 16: tighter bucket (400) + finer staged spans
run g16 --no-harness --cache-granularity 16
# 3. fewer prefill chunks at b48 (re-stream cost ~8 ms/chunk)
run chunks6 --no-harness --prefill-chunks 6
# 4. spec-oracle at granularity 16 (bucket 400 vs 416 in the verify reads)
run spec_g16 --spec 3 --spec-oracle --batch 24 --prefill-chunks 1 --cache-granularity 16
# 5. train batch 16 probe
run train_b16 --mode train --batch 16
# 6. long-KV conversation regime A/B (prefix ~2048): XLA vs auto (Pallas).
#    128-granular buckets so the per-(b,h) kernel engages pad-free (the
#    auto dispatch now requires 128-aligned T — an unaligned bucket would
#    pad-copy the whole cache per step)
run chat_xla --pad-prefix 1751 --batch 8 --decode-attn xla --cache-granularity 128
run chat_auto --pad-prefix 1751 --batch 8 --cache-granularity 128

# 7. bandwidth-ceiling attribution: is 515 GB/s the runtime or the kernel
#    pipeline?  xla vs pallas single-stream, and 2-stream aggregate.
probe() {
  name=$1; shift
  echo "=== bwprobe $name: $* ===" | tee -a "$OUT/summary.log"
  timeout 1200 python tools/bwprobe.py "$@" > "$OUT/bw_$name.log" 2>&1
  tail -1 "$OUT/bw_$name.log" | tee -a "$OUT/summary.log"
}
probe pallas --impl pallas
probe xla --impl xla
probe two_stream --impl pallas2
probe pallas_4m --impl pallas --block 1024

# 8. chat serving latency: incremental KV-cache turns vs full re-prefill
#    (also asserts transcript equality of the two paths on device)
echo "=== chatprobe ===" | tee -a "$OUT/summary.log"
timeout 4800 python tools/chatprobe.py --turns 5 --max-new 60 --spec 3 \
  > "$OUT/chatprobe.log" 2>&1
tail -5 "$OUT/chatprobe.log" | tee -a "$OUT/summary.log"

# 9. continuous-batching engine: online-regime throughput/latency at the
#    bench profile (48 slots).  burst = engine peak vs bench.py's fixed
#    batch; trickle = utilization while slots churn under open-loop
#    arrivals.  segment 64 amortizes the ~0.5s remote dispatch.
eprobe() {
  name=$1; shift
  echo "=== engineprobe $name: $* ===" | tee -a "$OUT/summary.log"
  timeout 3600 python tools/engineprobe.py "$@" > "$OUT/engine_$name.log" 2>&1
  tail -1 "$OUT/engine_$name.log" | tee -a "$OUT/summary.log"
}
eprobe burst --mode burst --requests 192 --slots 48 --segment 64
eprobe trickle --mode trickle --arrive 16 --requests 192 --slots 48 --segment 64
# spec inside the engine: prompt-lookup drafts, fewer weight passes per
# token at the online regime's spec-optimal slot count (b24, BENCH_NOTES)
eprobe spec --mode burst --requests 96 --slots 24 --segment 16 --spec 3
# multi-turn chat serving: 16 concurrent KV-resident conversations,
# O(delta) turns (vs chatprobe's single-conversation latency)
eprobe chat --mode chat --turns 4 --slots 16 --segment 32
