#!/bin/bash
# Round-4 TPU measurement queue behind a tunnel watchdog.
#
# The r4 TPU backlog (VERDICT r3 next #2/#1/#4): train->spec acceptance,
# the block-layout engine A/B + harness phase split (sweep_r4d), then the
# spec-inside-engine row on the trained checkpoint.  The axon tunnel comes
# and goes (r3c lost a full sweep to it; this round's /tmp wipe lost the
# queued r4d logs), so this script probes until the backend answers and
# only then burns compile time.  Queue with:
#   nohup bash tools/r4_queue.sh > /root/repo/.runs/queue_drive.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/root/repo/.runs}
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/queue.log"; }

# ---- watchdog: wait for the tunnel ----------------------------------
probe() {
  timeout 300 python - <<'EOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
jax.devices()
np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
EOF
}
log "watchdog: probing TPU tunnel"
until probe; do
  log "tunnel down; retrying in 120s"
  sleep 120
done
log "tunnel UP — starting queue"

# ---- 1. train -> checkpoint -> measured spec acceptance -------------
# batch 4: batch 8 OOM'd at runtime even with int8 towers (r4 session).
if [ ! -f "$OUT/t2s_full.json" ]; then
  log "t2s: train_to_spec --profile full (batch 4)"
  timeout 10800 python tools/train_to_spec.py --profile full \
    --workdir "$OUT/t2s_full" --batch 4 \
    > "$OUT/t2s_full.json" 2> "$OUT/t2s_full.err" \
    && log "t2s done: $(cat "$OUT/t2s_full.json")" \
    || log "t2s FAILED (see t2s_full.err tail): $(tail -3 "$OUT/t2s_full.err" 2>/dev/null)"
fi

# ---- 1b. if training produced templated answers with real acceptance,
#          arm the bench headline (bench.py --ckpt auto reads the marker)
#          and measure the spec-inside-engine row on the same checkpoint.
if [ -f "$OUT/t2s_full.json" ] && [ ! -f "$OUT/bench_ckpt.json" ]; then
  python - "$OUT" <<'EOF'
import json, sys, os
out = sys.argv[1]
try:
    rec = json.load(open(os.path.join(out, "t2s_full.json")))
except Exception as e:
    sys.exit(f"t2s summary unreadable: {e}")
acc = rec.get("spec_acceptance") or 0.0
frac = rec.get("templated_frac") or 0.0
if acc >= 0.5 and frac >= 0.9 and rec.get("ckpt"):
    json.dump({"ckpt": rec["ckpt"], "spec": 3},
              open(os.path.join(out, "bench_ckpt.json"), "w"))
    print(f"armed bench_ckpt.json (acceptance={acc}, templated={frac})")
else:
    print(f"NOT arming bench ckpt: acceptance={acc}, templated={frac}")
EOF
fi
if [ -f "$OUT/bench_ckpt.json" ] && [ ! -f "$OUT/engine_spec_ckpt.log" ]; then
  CKPT=$(python -c "import json,sys;print(json.load(open('$OUT/bench_ckpt.json'))['ckpt'])")
  log "engineprobe: spec 3 on the trained checkpoint (VERDICT r3 #3)"
  timeout 5400 python tools/engineprobe.py --mode burst --requests 96 \
    --slots 24 --segment 16 --spec 3 --ckpt "$CKPT" \
    > "$OUT/engine_spec_ckpt.log" 2>&1
  log "engine+spec(ckpt): $(tail -1 "$OUT/engine_spec_ckpt.log")"
fi

# ---- 2. block-layout engine A/B + harness phase split ----------------
if [ ! -f "$OUT/sweep_r4d/summary.log" ]; then
  log "sweep_r4d: block A/Bs + harness phase split + --engine harness"
  bash tools/sweep_r4d.sh "$OUT/sweep_r4d" >> "$OUT/queue.log" 2>&1
  log "sweep_r4d done"
fi

# ---- 3. validate the armed headline exactly as the driver runs it ----
if [ -f "$OUT/bench_ckpt.json" ] && [ ! -f "$OUT/bench_headline.log" ]; then
  log "bench.py (driver invocation) with the armed trained-ckpt headline"
  timeout 7200 python bench.py > "$OUT/bench_headline.log" 2> "$OUT/bench_headline.err"
  log "headline: $(tail -1 "$OUT/bench_headline.log")"
fi

log "queue complete"
