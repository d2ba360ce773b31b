#!/bin/bash
# Round-5b steered block-layout matrix (after the r5a findings):
#   * 48-slot block-8 compiles (layout fix holds) but RESOURCE_EXHAUSTs at
#     runtime — admission prefill (320,16) temps on ~2 GiB headroom.
#   * Mitigation ladder: --admit-chunk 8 at 48 slots first (halves the
#     admission mini-KV + activations; prefill programs already cached),
#     then 40 slots if still OOM, with per-row controls at matched slots.
# Rows serialize on the chip lock and self-terminate.
#   nohup bash tools/sweep_r5b.sh > /root/repo/.runs/r5b_drive.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/root/repo/.runs/sweep_r5b}
mkdir -p "$OUT"

run() {  # run <name> <cmd...>
  name=$1; shift
  if [ -f "$OUT/$name.log" ]; then return 0; fi
  echo "=== $name: $* ===" | tee -a "$OUT/summary.log"
  timeout 5400 "$@" > "$OUT/$name.log.part" 2>&1
  mv "$OUT/$name.log.part" "$OUT/$name.log"
  tail -1 "$OUT/$name.log" | tee -a "$OUT/summary.log"
}

# 1. the mitigation at full 48 slots (cached programs: fast warm)
run burst_block8_ac8 python tools/engineprobe.py --mode burst --requests 192 \
  --slots 48 --segment 32 --block 8 --admit-chunk 8
# 2. fallback capacity point + its per-row control (A/B at matched slots)
if ! grep -q '"value"' "$OUT/burst_block8_ac8.log" 2>/dev/null; then
  run burst_block8_s40 python tools/engineprobe.py --mode burst \
    --requests 160 --slots 40 --segment 32 --block 8 --admit-chunk 8
  run burst_perrow_s40 python tools/engineprobe.py --mode burst \
    --requests 160 --slots 40 --segment 32 --block 0 --admit-chunk 8
fi
# 3. trickle under the first block config that fit
if grep -q '"value"' "$OUT/burst_block8_ac8.log" 2>/dev/null; then
  run trickle_block8_ac8 python tools/engineprobe.py --mode trickle \
    --arrive 16 --requests 192 --slots 48 --segment 32 --block 8 \
    --admit-chunk 8
else
  run trickle_block8_s40 python tools/engineprobe.py --mode trickle \
    --arrive 16 --requests 160 --slots 40 --segment 32 --block 8 \
    --admit-chunk 8
fi
echo "=== sweep_r5b done ===" | tee -a "$OUT/summary.log"
