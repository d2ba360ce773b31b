"""Measure this runtime's effective HBM streaming bandwidth ceiling.

Decode throughput is bound by bytes/step / effective_BW, so the question
"is the decode step at the floor?" reduces to "what BW can ANY program
sustain here?".  This probe streams a multi-GB array through a Pallas
grid-summed reduction — the same double-buffered DMA pipeline the int8
matmul uses — repeated inside ONE jit via lax.scan with a per-iteration
scalar folded into the sum (so XLA cannot hoist or cache the traversal),
and timed by host-copying the scalar result (CLAUDE.md timing rule).

This is a microbench, which this runtime's gotchas say to distrust in
both directions — but a loop-INVARIANT 6.5 GB operand cannot be
VMEM-cached, and the scan dependency defeats hoisting, so the failure
modes documented in round 2 don't apply; treat the result as an upper
bound on what model code can reach.

Usage: python tools/bwprobe.py [--gb 6.5] [--dtype int8] [--iters 8]
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sum_kernel(c_ref, x_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jnp.sum(x_ref[:].astype(jnp.float32)) + c_ref[0, 0]


@functools.partial(jax.jit, static_argnames=("block",))
def _stream_sum(x, c, block):
    n, w = x.shape
    return pl.pallas_call(
        _sum_kernel,
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(c.reshape(1, 1), x)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gb", type=float, default=6.5)
    p.add_argument("--dtype", default="int8", choices=["int8", "bfloat16"])
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--block", type=int, default=512,
                   help="rows per grid step; row width is 4096 lanes "
                        "(block 512 @ int8 = 2 MB, the int8-matmul DMA size)")
    args = p.parse_args()

    dt = jnp.dtype(args.dtype)
    w = 4096
    rows = int(args.gb * (1 << 30) / (w * dt.itemsize))
    rows -= rows % args.block
    nbytes = rows * w * dt.itemsize
    print(f"array {nbytes/2**30:.2f} GiB  ({rows}x{w} {dt.name}), "
          f"block {args.block}x{w} = {args.block*w*dt.itemsize/2**20:.1f} MB")
    x = jnp.ones((rows, w), dt)

    @jax.jit
    def passes(x, n_arr):
        def step(carry, c):
            return carry + _stream_sum(x, c, args.block)[0, 0], 0.0

        total, _ = jax.lax.scan(step, 0.0, n_arr)
        return total

    n_arr = jnp.arange(args.iters, dtype=jnp.float32)
    np.asarray(passes(x, n_arr))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(passes(x, n_arr))
    dt_s = time.perf_counter() - t0
    per_pass = dt_s / args.iters
    print(f"{args.iters} passes in {dt_s:.3f}s -> {per_pass*1e3:.2f} ms/pass "
          f"= {nbytes/per_pass/1e9:.0f} GB/s effective")


if __name__ == "__main__":
    main()
