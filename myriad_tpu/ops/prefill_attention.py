"""Pallas prefill attention: VMEM-resident scores, int8-KV aware.

XLA's attention materializes the per-head fp32 score tensor
(B, H, Tq, Tkv) in HBM — ~380 MiB per LLaMA layer at batch 24 — which
dominates the prefill activation footprint on one v5e chip (the batch-28
OOM margin).  At Myriad's prefill sizes the whole KV block for one
(batch, head) fits VMEM (Tkv<=512, D=128: ~100 KiB), so this kernel
computes scores, causal mask, softmax and the value contraction entirely
in VMEM — nothing of size Tq x Tkv ever touches HBM.

Causality comes from a per-row ``positions`` vector (k_pos <= q_pos), the
same predicate the model's XLA mask path uses (llama.py), so cache slots
at/after the write frontier are excluded without a mask tensor.  For an
int8 KV cache the per-position dequant scales fold into the scores/probs
(ops/attention.py note) — K/V stream into VMEM at int8 width.

Single-pass (not online-softmax flash): valid while the whole KV fits
VMEM, which holds for the AQA serving regime; ``supported()`` gates the
dispatch and longer contexts fall back to XLA.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from myriad_tpu.ops._util import make_bh_partitioned, on_tpu, round_up as _round_up

_NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, pos_ref, ks_ref, vs_ref, o_ref, *, scale,
            head_block=1):
    # blocks carry head_block heads per program: at tiny tq (speculative
    # K+1 verify chunks) one head per program is overhead-dominated —
    # blocking 8 heads amortizes the grid/program cost while every score
    # tensor still lives in VMEM.  The head loop is a static unroll.
    pos = pos_ref[0, 0]  # (tq,) int32
    for h in range(head_block):
        q = q_ref[0, h]  # (tq, d) bf16
        k = k_ref[0, h]  # (tk, d) int8 or bf16
        s = jax.lax.dot_general(
            q, k.astype(q.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (tq, tk)
        if ks_ref is not None:
            s = s * ks_ref[0, h, 0].astype(jnp.float32)[None, :]
        s = s * scale
        kiota = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kiota <= pos[:, None], s, _NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if vs_ref is not None:
            p = p * vs_ref[0, h, 0].astype(jnp.float32)[None, :]
        v = v_ref[0, h]
        o = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[0, h] = o.astype(o_ref.dtype)


def _head_block(tq: int, h: int) -> int:
    """Heads per program: 1 in the large-tq regime (compute-dominated, max
    grid parallelism); 8 at tiny tq (speculative verify chunks) where the
    per-program overhead dominates and blocking amortizes it."""
    if tq >= 16:
        return 1
    import os

    want = int(os.environ.get("MYRIAD_PREFILL_HEAD_BLOCK", "8"))
    if want == 1:
        return 1  # explicit opt-out: measure the unblocked variant
    for hb in (want, 8, 4, 2):
        if hb > 1 and h % hb == 0:
            return hb
    return 1


def supported(tq: int, tk: int, d: int) -> bool:
    """Whole-KV-in-VMEM regime (scores (tq, tk) fp32 + K/V blocks well
    under the scoped budget).  tq >= 16: at tiny query chunks (speculative
    K+1 verify feeds) even the head-blocked variant (_head_block, several
    heads per program) loses to XLA's fused attention — measured at the
    d32/b24 spec-oracle bench: 16.45 (hb=8) / 16.34 (hb=32) vs 18.36
    img/s XLA, r3 — so the dispatch keeps XLA below 16.  Override the
    floor with MYRIAD_PREFILL_MIN_TQ to re-measure on runtime updates."""
    import os

    min_tq = int(os.environ.get("MYRIAD_PREFILL_MIN_TQ", "16"))
    return min_tq <= tq <= 1024 and tk <= 1024 and d <= 256


def _local_call(q, k, v, positions, k_scale, v_scale, scale, interpret, out_dtype_name):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    quant = k_scale is not None
    hb = _head_block(tq, h)
    kernel = functools.partial(_kernel, scale=scale, head_block=hb)
    if not quant:
        kernel = (lambda qr, kr, vr, pr, orf, *, _k=kernel: _k(qr, kr, vr, pr, None, None, orf))
    # trailing-two block dims must divide (8,128) or equal the array dims,
    # so the 1-D per-row operands carry an explicit singleton axis
    in_specs = [
        pl.BlockSpec((1, hb, tq, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hb, tk, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hb, tk, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tq), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, positions[:, None, :]]
    if quant:
        in_specs += [
            pl.BlockSpec((1, hb, 1, tk), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, 1, tk), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ]
        args += [k_scale[:, :, None, :], v_scale[:, :, None, :]]
    return pl.pallas_call(
        kernel,
        grid=(b, h // hb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hb, tq, d), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, tq, d), jnp.dtype(out_dtype_name)),
        interpret=interpret,
    )(*args)


# -- GSPMD integration --------------------------------------------------------
# The kernel is independent per (batch, head): under a sharded mesh
# (tensor-parallel heads, data-parallel batch) each shard runs the kernel
# on its local (B_loc, H_loc) block.  custom_partitioning declares exactly
# that, so XLA partitions the custom call instead of gathering the full
# arrays around it.

@functools.lru_cache(maxsize=None)
def _partitioned(quant: bool, scale: float, interpret: bool, out_dtype_name: str):
    if quant:
        def fn(q, k, v, pos, ks, vs):
            return _local_call(q, k, v, pos, ks, vs, scale, interpret, out_dtype_name)
    else:
        def fn(q, k, v, pos):
            return _local_call(q, k, v, pos, None, None, scale, interpret, out_dtype_name)

    bh = ("b", "h", None, None)
    arg_axes = [bh, bh, bh, ("b", None)]  # q, k, v, positions (B, Tq)
    if quant:
        arg_axes += [("b", "h", None)] * 2  # (B, H, Tk) scales
    # Shardy propagation uses the einsum-like rule; the partition callback
    # then constrains T/D (and the rule's q/s/e factors) to replicated on
    # the actual lowering, inserting reshards if a caller passed them split
    rule = (
        "b h q e, b h s e, b h s e, b q, b h s, b h s -> b h q e"
        if quant else
        "b h q e, b h s e, b h s e, b q -> b h q e"
    )
    return make_bh_partitioned(fn, tuple(arg_axes), rule)


def _call(q, k, v, positions, k_scale, v_scale, scale, interpret, out_dtype_name):
    quant = k_scale is not None
    f = _partitioned(quant, float(scale), bool(interpret), out_dtype_name)
    if quant:
        return f(q, k, v, positions, k_scale, v_scale)
    return f(q, k, v, positions)


def prefill_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    positions: jnp.ndarray,
    *,
    scale: float,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """q (B,H,Tq,D) bf16; k/v (B,H,Tk,D) bf16 or int8 (+ per-position
    scales (B,H,Tk,1)); positions (B,Tq) int32 absolute query positions.
    Returns (B,H,Tq,D) in q's dtype, causal w.r.t. ``positions``."""
    b, h, tq, d = q.shape
    assert (k_scale is None) == (v_scale is None), (
        "int8-KV dequant needs BOTH k_scale and v_scale")
    if interpret is None:
        interpret = not on_tpu()
    tq_pad = _round_up(tq, 8)
    if tq_pad != tq:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, tq_pad - tq), (0, 0)])
        # padded rows mask everything out (position -1): exp(s - m) over a
        # constant row stays finite, rows are sliced off below
        positions = jnp.pad(positions, [(0, 0), (0, tq_pad - tq)],
                            constant_values=-1)
    # Mosaic has no f16 type: the (tiny) per-position scale planes enter
    # the kernel as fp32
    ks = None if k_scale is None else k_scale[..., 0].astype(jnp.float32)
    vs = None if v_scale is None else v_scale[..., 0].astype(jnp.float32)
    out = _call(q, k, v, positions.astype(jnp.int32), ks, vs,
                float(scale), bool(interpret), jnp.dtype(q.dtype).name)
    return out[:, :, :tq]
