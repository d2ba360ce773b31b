#!/bin/bash
# One-command re-adjudication of the SHELVED kernels (VERDICT r3 next #8).
#
# Five measured-and-rejected alternatives are kept behind flags; each was
# beaten by the shipping config on THIS jax/libtpu build, but any runtime
# update can flip the verdict.  This reruns all five A/Bs serially and
# appends the numbers to $OUT/summary.log — compare against the shipping
# baselines quoted inline (BENCH_NOTES.md has the full rationale).
#
# Usage: bash tools/sweep_shelved.sh [outdir]
set -u
OUT=${1:-/tmp/sweep_shelved}
mkdir -p "$OUT"

run() {  # run <name> <env VAR=V or ->  <bench args...>
  name=$1; envs=$2; shift 2
  echo "=== $name [$envs]: $* ===" | tee -a "$OUT/summary.log"
  if [ "$envs" = "-" ]; then
    timeout 3600 python bench.py "$@" > "$OUT/$name.log" 2>&1
  else
    timeout 3600 env $envs python bench.py "$@" > "$OUT/$name.log" 2>&1
  fi
  tail -1 "$OUT/$name.log" | tee -a "$OUT/summary.log"
}

# 0. shipping baselines at the two comparison points (cached compiles)
run base_b24 - --no-harness --batch 24 --prefill-chunks 1
run base_spec_b24 - --no-harness --spec 3 --spec-oracle --batch 24 --prefill-chunks 1

# 1. int4 group-128 weights: rejected VPU-conversion-bound (5.1 vs 8.0
#    img/s at b16 r2b; Mosaic 32-bit-only vector int arith).  Wins if a
#    Mosaic update adds 8-bit vector arithmetic.
run int4_b16 - --no-harness --quant int4 --batch 16 --prefill-chunks 1
run int8_b16 - --no-harness --batch 16 --prefill-chunks 1

# 2. native jnp.int4 storage: host transfers of S4 arrays recursed on this
#    runtime (round 2b).  Tiny standalone repro — prints OK if fixed.
echo "=== native_int4 host-transfer repro ===" | tee -a "$OUT/summary.log"
timeout 300 python - > "$OUT/native_int4.log" 2>&1 <<'EOF'
import jax, jax.numpy as jnp, numpy as np
x = jnp.arange(16, dtype=jnp.int4)
print("device->host OK:", np.asarray(x)[:4])
EOF
tail -1 "$OUT/native_int4.log" | tee -a "$OUT/summary.log"

# 3. row-grid decode attention: DMA-optimal but compute-serialized on the
#    single TensorCore (10.70 vs 11.68 img/s at b24/416 r3b).  Wins if
#    Mosaic gains multi-program overlap or megacore.
run rowgrid_b24 - --no-harness --batch 24 --prefill-chunks 1 \
  --decode-attn row --cache-granularity 32

# 4. staged SPEC verify: per-row vector-index cache writes defeat XLA's
#    in-place update under the leading-slice consumer (17.43 vs 18.39
#    spec-oracle r3b).  Wins if XLA learns in-place dynamic scatter here.
run spec_staged_b24 MYRIAD_SPEC_STAGED=1 --no-harness --spec 3 \
  --spec-oracle --batch 24 --prefill-chunks 1

# 5. head-blocked Pallas prefill at tiny tq (the K+1 verify chunks): XLA
#    fused attention won below tq=16 (16.45 vs 18.36 spec-oracle r3a).
#    MYRIAD_PREFILL_MIN_TQ=1 forces the kernel into the verify regime.
run prefill_tiny_tq_b24 MYRIAD_PREFILL_MIN_TQ=1 --no-harness --spec 3 \
  --spec-oracle --batch 24 --prefill-chunks 1

# 6. Pallas per-row KV pool writes in the serving engine: the aliased
#    reshape breaks the pool's donation chain inside the segment loop
#    (4.48 vs 6.48 req/s burst, r4d).  Wins if pallas_call aliasing learns
#    to see through contiguous reshapes (or a 4-D 1-wide T block lowers).
erun() {  # engineprobe variant of run
  name=$1; envs=$2; shift 2
  echo "=== $name [$envs]: $* ===" | tee -a "$OUT/summary.log"
  timeout 3600 env $envs python tools/engineprobe.py "$@" > "$OUT/$name.log" 2>&1
  tail -1 "$OUT/$name.log" | tee -a "$OUT/summary.log"
}
erun kvwrite_vmap MYRIAD_KV_WRITE=vmap --mode burst --requests 192 --slots 48 --segment 32
erun kvwrite_pallas MYRIAD_KV_WRITE=pallas --mode burst --requests 192 --slots 48 --segment 32

echo "=== sweep_shelved done ===" | tee -a "$OUT/summary.log"
