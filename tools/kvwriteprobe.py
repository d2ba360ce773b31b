"""A/B the per-row-frontier KV write impls on the real chip.

The serving engine writes layer K/V at per-row index vectors every decode
step; ops/kv_write.py has three impls (vmap-dus, scatter, Pallas in-place).
This probe (a) checks bit-identity on device, (b) times a realistic
engine-shaped loop: N layer pairs of (slots, H, bucket, D) int8 pools,
one position written per row per step, pools carried through a fori_loop
so donation/in-place behavior matches the engine segment program.

Microbench caveats (CLAUDE.md): fori serializes (that is what we measure
— the writes are the serialized path) and the UPDATE is loop-varying, so
VMEM caching of the big pools cannot fake the number.  The decisive
number stays the engine probe; this attributes it.

Usage: python tools/kvwriteprobe.py [--slots 48] [--bucket 416] [--layers 8]
One JSON line per impl.
"""

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from myriad_tpu.ops import kv_write


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--slots", type=int, default=48)
    p.add_argument("--bucket", type=int, default=416)
    p.add_argument("--layers", type=int, default=8,
                   help="layer pairs carried (scale results x 32/layers)")
    p.add_argument("--heads", type=int, default=32)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--impls", default="vmap,scatter,pallas")
    args = p.parse_args()

    B, H, T, D, L = args.slots, args.heads, args.bucket, args.dim, args.layers
    rng = np.random.default_rng(0)
    pools0 = tuple(
        jnp.asarray(rng.integers(-100, 100, (B, H, T, D)), jnp.int8)
        for _ in range(2 * L))
    idx0 = jnp.asarray(rng.integers(0, T - args.steps - 1, (B,)), jnp.int32)

    def loop(impl, steps, pools, idx):
        # pools are COPIED inside the jit (donation-free caller), so the
        # fixed copy cost is identical across step counts and cancels in
        # the slope; writes then run in-place on the loop carry.
        pools = jax.tree.map(lambda x: x + 0, pools)

        def body(s, carry):
            pools, idx = carry
            upd = (jnp.arange(B * H * D, dtype=jnp.int32).reshape(B, H, 1, D)
                   % 251 - 125 + s).astype(jnp.int8)
            pools = tuple(
                kv_write.kv_cache_write(bf, upd, idx, impl=impl)
                for bf in pools)
            return pools, idx + 1

        return jax.lax.fori_loop(0, steps, body, (pools, idx))

    lo, hi = args.steps, args.steps * 4
    ref = None
    for impl in args.impls.split(","):
        try:
            fns = {s: jax.jit(functools.partial(loop, impl, s)) for s in (lo, hi)}
            out, _ = fns[lo](pools0, idx0)  # warm/compile
            host = np.asarray(out[0])
        except Exception as e:  # noqa: BLE001 - report and continue the A/B
            print(json.dumps({"impl": impl, "error": str(e)[:300]}))
            continue
        if ref is None:
            ref = host
            match = True
        else:
            match = bool(np.array_equal(ref, host))
        walls = {}
        for s, fn in fns.items():
            np.asarray(fn(pools0, idx0)[0][0])  # warm (compile hi)
            t0 = time.time()
            out, _ = fn(pools0, idx0)
            np.asarray(out[0])
            walls[s] = time.time() - t0
        per_step_ms = (walls[hi] - walls[lo]) / (hi - lo) * 1e3
        # traffic if the impl rewrites the full pools each step
        full_gb = 2 * L * B * H * T * D * 2 / 1e9  # read+write, int8
        print(json.dumps({
            "impl": impl, "match_ref": match,
            "wall_lo_s": round(walls[lo], 3), "wall_hi_s": round(walls[hi], 3),
            "per_step_ms": round(per_step_ms, 3),
            "per_step_ms_32layers": round(per_step_ms * 32 / L, 3),
            "full_rewrite_would_be_ms": round(full_gb / 515 * 1e3, 3),
        }))


if __name__ == "__main__":
    main()
