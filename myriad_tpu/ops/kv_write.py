"""In-place KV-cache writes at per-row dynamic positions.

The continuous-batching engine (serving/engine.py) and speculative
decoding advance each batch row's cache frontier independently, so every
decode step writes layer K/V at a per-row index vector.  XLA has no
in-place representation for that: ``vmap(dynamic_update_slice)`` lowers
to a dus+select loop fusion that READS AND REWRITES the whole pool
buffer — at 48 slots x 416 positions that is ~160 MB of HBM traffic per
layer per step for one written position (~10 GB/step over 32 layers x
K,V: measured 93 ms/step on v5e where the shared-frontier fixed-batch
path runs ~25 ms).  The reference never hits this because its vLLM-free
torch path recomputes full prompts per batch (HF generate,
/root/reference/minigpt4/models/myriad.py:430-455).

Three implementations, equivalence-tested against each other:

- ``pallas``: scalar-prefetch grid — the block's POSITION in the pool is
  ``idx[b]`` (data-dependent index_map), the kernel body just copies the
  update block, and ``input_output_aliases`` pins the pool in place, so
  traffic is exactly the written rows (B x H x D bytes).
- ``scatter``: ``buf.at[b, :, idx[b]+j].set(...)`` — a real XLA scatter
  op (unique indices), which TPU executes as a serialized in-place
  row-update loop; no custom code, GSPMD-partitionable natively.
- ``vmap``: the historical vmap(dynamic_update_slice) baseline.

Start-index semantics mirror ``dynamic_update_slice``: the start is
clamped so the whole (t)-wide window fits the buffer.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _write_vmap(buf, upd, idx):
    return jax.vmap(
        lambda c, u, i: jax.lax.dynamic_update_slice(c, u, (0, i, 0))
    )(buf, upd, idx)


def _write_scatter(buf, upd, idx):
    b, _, t, _ = upd.shape
    start = jnp.clip(idx, 0, buf.shape[2] - t)  # dus clamp semantics
    rows = jnp.repeat(jnp.arange(b, dtype=idx.dtype), t)  # (b*t,)
    cols = (start[:, None] + jnp.arange(t, dtype=idx.dtype)[None, :]).reshape(-1)
    upd_rows = upd.transpose(0, 2, 1, 3).reshape(b * t, upd.shape[1], upd.shape[3])
    return buf.at[rows, :, cols].set(upd_rows, unique_indices=True,
                                     indices_are_sorted=False,
                                     mode="promise_in_bounds")


def _kv_write_kernel(idx_ref, buf_ref, upd_ref, out_ref):
    del idx_ref, buf_ref  # position consumed by the index_map; buf aliased
    out_ref[...] = upd_ref[...]


def _write_pallas(buf, upd, idx, interpret: bool = False):
    """The (T, D) axes collapse to one: a cache position is then exactly
    one D-wide block, so the written block's position is
    ``start[b] + j`` directly and the block shape is (1, H, D) — its
    last two dims are (H, D) with H equal to the full array dim, which
    satisfies Mosaic's block-divisibility rule for every head count and
    dtype (a (1, H, 1, D) 4-D block does not: T-block 1 is neither
    8-divisible nor equal to T).  The reshape is contiguous (row-major
    bitcast), so XLA aliases straight through it."""
    b, h, t, d = upd.shape
    T = buf.shape[2]
    start = jnp.clip(idx, 0, T - t).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # pool: aliased, untouched
            pl.BlockSpec((1, h, d), lambda i, j, idx_ref: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, h, d), lambda i, j, idx_ref: (i, 0, idx_ref[i] + j)
        ),
    )
    out = pl.pallas_call(
        _kv_write_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, T * d), buf.dtype),
        input_output_aliases={1: 0},  # buf (after the scalar arg) -> out
        interpret=interpret,
    )(start, buf.reshape(b, h, T * d), upd.reshape(b, h, t * d))
    return out.reshape(b, h, T, d)


_IMPLS = {
    "vmap": _write_vmap,
    "scatter": _write_scatter,
    "pallas": _write_pallas,
    # CPU-testable variant of the TPU kernel (tests/test_ops.py)
    "pallas_interpret": lambda buf, upd, idx: _write_pallas(
        buf, upd, idx, interpret=True),
}


def default_impl(upd_width: int) -> str:
    """Env override MYRIAD_KV_WRITE=pallas|scatter|vmap; auto = vmap.

    Measured on the engine burst workload (v5e, 192 req / 48 slots /
    segment 32, int8 weights+KV, r4d): vmap 6.48 req/s, pallas payload
    writes 4.48 req/s, scatter OOM (XLA materializes pool copies).  The
    pallas kernel's aliased reshape to (B, H, T*D) breaks XLA's donation
    chain inside the segment loop — the pool round-trips through a copy
    that costs more than vmap's dus+select rewrite — so it stays a
    shelved kernel behind MYRIAD_KV_WRITE=pallas (tools/sweep_shelved.sh
    re-adjudicates).  The per-position quant scales (D == 1) stay on vmap
    even when the env forces pallas: a 1-lane block violates Mosaic's
    (8, 128) block-divisibility rule (measured lowering error, sweep_r4c
    burst_pallas)."""
    env = os.environ.get("MYRIAD_KV_WRITE", "").strip()
    if env.startswith("pallas") and upd_width < 8:
        return "vmap"
    if env:
        return env
    return "vmap"


def kv_cache_write_blocks(buf: jnp.ndarray, upd: jnp.ndarray,
                          idx: jnp.ndarray) -> jnp.ndarray:
    """Per-BLOCK scalar-frontier writes — the serving engine's block KV
    layout (serving/engine.py ``block_size``).

    Rows are grouped into ``idx.shape[0]`` equal contiguous blocks; every
    row of block ``g`` writes at the SAME (traced scalar) start column
    ``idx[g]``.  That turns the write into G sequential
    ``dynamic_update_slice`` ops with scalar starts — the fixed-batch
    greedy loop's write idiom, which XLA keeps in place on the donated
    pool — so HBM traffic is exactly the written rows (B x H x t x D
    bytes) instead of vmap's full-pool dus+select rewrite (~10 GB/step at
    48 slots x 32 layers; module docstring)."""
    b, g = buf.shape[0], idx.shape[0]
    assert b % g == 0, f"{g} blocks do not divide {b} rows"
    bg = b // g
    t = upd.shape[2]
    hi = buf.shape[2] - t
    for i in range(g):
        start = jnp.clip(idx[i], 0, hi)
        buf = jax.lax.dynamic_update_slice(
            buf, upd[i * bg:(i + 1) * bg].astype(buf.dtype),
            (i * bg, 0, start, 0))
    return buf


def kv_cache_write(buf: jnp.ndarray, upd: jnp.ndarray, idx: jnp.ndarray,
                   impl: str | None = None) -> jnp.ndarray:
    """Write ``upd`` (B, H, t, D) into ``buf`` (B, H, T, D) at per-row
    start positions ``idx`` (B,), clamped to fit; returns the buffer."""
    if impl and impl.startswith("pallas") and upd.shape[-1] < 8:
        impl = "vmap"  # see default_impl: 1-lane blocks can't lower
    fn = _IMPLS[impl or default_impl(upd.shape[-1])]
    return fn(buf, upd, idx)
