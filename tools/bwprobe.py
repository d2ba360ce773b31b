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

Variants (--impl):
  pallas   grid-summed Pallas reduction (default; the int8-matmul pipeline)
  pallas2  TWO arrays streamed in one kernel — does a second concurrent
           DMA stream raise AGGREGATE bandwidth?  Decode streams weights
           and KV concurrently, so if aggregate > single-stream the model
           is not actually at the single-stream ceiling.
  xla      plain jnp.sum over a scan-dependent dynamic row-slice — XLA's
           own streaming pipeline.  If XLA sustains more than the Pallas
           kernel, the hot kernels have pipelining headroom; if equal,
           the ceiling is the runtime/HW.
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


def _sum2_kernel(c_ref, x_ref, y_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += (jnp.sum(x_ref[:].astype(jnp.float32))
                 + jnp.sum(y_ref[:].astype(jnp.float32)) + c_ref[0, 0])


@functools.partial(jax.jit, static_argnames=("block",))
def _stream_sum2(x, y, c, block):
    n, w = x.shape
    return pl.pallas_call(
        _sum2_kernel,
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(c.reshape(1, 1), x, y)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gb", type=float, default=6.5)
    p.add_argument("--dtype", default="int8", choices=["int8", "bfloat16"])
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--impl", default="pallas",
                   choices=["pallas", "pallas2", "xla"])
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
    if args.impl == "pallas2":
        # two half-size arrays so the TOTAL traffic matches the other impls
        rows //= 2
        rows -= rows % args.block
        nbytes = 2 * rows * w * dt.itemsize
        x = jnp.ones((rows, w), dt)
        y = jnp.ones((rows, w), dt)

        @jax.jit
        def passes(x, y, n_arr):
            def step(carry, c):
                return carry + _stream_sum2(x, y, c, args.block)[0, 0], 0.0

            total, _ = jax.lax.scan(step, 0.0, n_arr)
            return total

        run = functools.partial(passes, x, y)
    elif args.impl == "xla":
        # scan-dependent dynamic row-slice defeats hoisting/CSE of the
        # loop-invariant reduction; the slice drops <=--iters rows (<0.01%)
        x = jnp.ones((rows, w), dt)
        nsub = rows - args.iters

        @jax.jit
        def passes(x, n_arr):
            def step(carry, ci):
                xs = jax.lax.dynamic_slice(x, (ci, 0), (nsub, w))
                return carry + jnp.sum(xs, dtype=jnp.float32), 0.0

            total, _ = jax.lax.scan(step, 0.0, n_arr)
            return total

        run = functools.partial(passes, x)
        nbytes = nsub * w * dt.itemsize
    else:
        x = jnp.ones((rows, w), dt)

        @jax.jit
        def passes(x, n_arr):
            def step(carry, c):
                return carry + _stream_sum(x, c, args.block)[0, 0], 0.0

            total, _ = jax.lax.scan(step, 0.0, n_arr)
            return total

        run = functools.partial(passes, x)

    if args.impl == "xla":
        n_arr = jnp.arange(args.iters, dtype=jnp.int32)
    else:
        n_arr = jnp.arange(args.iters, dtype=jnp.float32)
    np.asarray(run(n_arr))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(n_arr))
    dt_s = time.perf_counter() - t0
    per_pass = dt_s / args.iters
    print(f"impl={args.impl}: {args.iters} passes in {dt_s:.3f}s -> "
          f"{per_pass*1e3:.2f} ms/pass "
          f"= {nbytes/per_pass/1e9:.0f} GB/s effective")


if __name__ == "__main__":
    main()
