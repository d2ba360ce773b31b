"""Pallas TPU kernel for KV-cache decode attention.

The autoregressive hot loop (BASELINE.json: "Vicuna-7B decoding runs with a
Pallas KV-cache attention kernel") computes, per (batch, head), one query
row against the full cache:

    out = softmax(q K^T * scale + mask) V

Decode attention is HBM-bandwidth bound — the whole KV cache streams
through once per token — so the kernel keeps the (T, D) K/V tiles resident
in VMEM per grid step, computes the fp32 softmax on the VPU, and writes a
single (1, D) row, avoiding the (B,H,1,T) logits round-trip to HBM that the
naive XLA path materializes between ops when fusion fails.

Falls back to interpret mode off-TPU so tests exercise the same code path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from myriad_tpu.ops._util import make_bh_partitioned, on_tpu, round_up as _round_up


def _decode_kernel(q_ref, k_ref, v_ref, m_ref, ks_ref, vs_ref, o_ref, *, scale: float):
    # block shapes: q (1,1,1,D), k/v (1,1,T,D) bf16 or int8, m (1,1,1,T),
    # optional int8-KV dequant scales ks/vs (1,1,1,T), o (1,1,1,D)
    q = q_ref[0, 0].astype(jnp.float32)  # (1, D)
    k = k_ref[0, 0].astype(jnp.float32)  # (T, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (1, T)
    if ks_ref is not None:
        # per-position K scales fold into the logits: the int8 cache is
        # never dequantized as a tensor (ops/attention.py note)
        s = s * ks_ref[0, 0].astype(jnp.float32)
    s = s * scale + m_ref[0, 0].astype(jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    if vs_ref is not None:
        p = p * vs_ref[0, 0].astype(jnp.float32)
    out = jax.lax.dot_general(
        p, v_ref[0, 0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, D)
    o_ref[0, 0] = (out / denom).astype(o_ref.dtype)


def _decode_rows_kernel(q_ref, k_ref, v_ref, m_ref, ks_ref, vs_ref, o_ref,
                        *, scale: float, num_heads: int):
    """One batch row per grid step, ALL heads resident.

    The per-(b,h) grid below issues a ~50 KB K DMA per program — 1536
    programs at batch 48 — and measured ~260 GB/s effective on the KV
    bytes (the XLA fused path does no better; decode-step batch slope,
    BENCH_NOTES r3b).  Streaming the whole (H, T, D) row per program
    turns that into two ~1.7 MB contiguous DMAs, which the Mosaic
    double-buffered pipeline sustains at near-spec bandwidth.  Heads are
    a static Python loop: each iteration is VMEM-resident compute (two
    tiny dots + one softmax), so the kernel stays DMA-bound.

    Block shapes: q (1,H,1,D), k/v (1,H,T,D) bf16|int8, m (1,1,1,T) fp32,
    optional int8-KV dequant scales ks/vs (1,H,1,T) fp32, o (1,H,1,D).
    """
    m = m_ref[0, 0].astype(jnp.float32)  # (1, T)
    for h in range(num_heads):  # static unroll: h indexes untiled dims
        q = q_ref[0, h].astype(jnp.float32)  # (1, D)
        k = k_ref[0, h].astype(jnp.float32)  # (T, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (1, T)
        if ks_ref is not None:
            s = s * ks_ref[0, h].astype(jnp.float32)
        s = s * scale + m
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        if vs_ref is not None:
            p = p * vs_ref[0, h].astype(jnp.float32)
        out = jax.lax.dot_general(
            p, v_ref[0, h].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, D)
        o_ref[0, h] = (out / denom).astype(o_ref.dtype)


def _rows_local_call(q, k, v, mask, k_scale, v_scale, scale: float,
                     interpret: bool):
    b, h, _, d = q.shape
    t = k.shape[2]
    quant = k_scale is not None
    kernel = functools.partial(_decode_rows_kernel, scale=scale, num_heads=h)
    if not quant:
        kernel = (lambda qr, kr, vr, mr, orf, *, _k=kernel:
                  _k(qr, kr, vr, mr, None, None, orf))
    in_specs = [
        pl.BlockSpec((1, h, 1, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, t, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, t, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, t), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, mask]
    if quant:
        in_specs += [
            pl.BlockSpec((1, h, 1, t), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, 1, t), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ]
        args += [k_scale, v_scale]
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, 1, d), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, d), q.dtype),
        interpret=interpret,
    )(*args)


@functools.lru_cache(maxsize=None)
def _rows_partitioned(quant: bool, scale: float, interpret: bool):
    """GSPMD wrapper: the kernel is independent per (batch row, head) — the
    head loop inside each program runs over the shard-LOCAL head count
    (scaffold shared with ops/prefill_attention via ops._util)."""
    if quant:
        def fn(q, k, v, mask, ks, vs):
            return _rows_local_call(q, k, v, mask, ks, vs, scale, interpret)
    else:
        def fn(q, k, v, mask):
            return _rows_local_call(q, k, v, mask, None, None, scale, interpret)

    bh = ("b", "h", None, None)
    arg_axes = [bh, bh, bh, ("b", None, None, None)]  # q, k, v, mask(B,1,1,T)
    if quant:
        arg_axes += [bh, bh]  # (B, H, 1, T) scales
    rule = (
        "b h q e, b h s e, b h s e, b i q s, b h q s, b h q s -> b h q e"
        if quant else
        "b h q e, b h s e, b h s e, b i q s -> b h q e"
    )
    return make_bh_partitioned(fn, tuple(arg_axes), rule)


def _decode_rows_padded(q, k, v, mask, k_scale, v_scale, scale: float,
                        interpret: bool):
    f = _rows_partitioned(k_scale is not None, float(scale), bool(interpret))
    if k_scale is not None:
        return f(q, k, v, mask, k_scale, v_scale)
    return f(q, k, v, mask)


def rows_supported(b: int, h: int, t: int, d: int, kv_dtype=None) -> bool:
    """Row-grid eligibility: T/D tile-aligned so NO pad copy of the cache is
    ever made (generation allocates 32-granular buckets), and the (H, T, D)
    K+V blocks fit double-buffered VMEM at the cache's ACTUAL width — a
    bf16 cache doubles the block size vs int8, so gating at int8 width
    would pass shapes whose real blocks blow the Mosaic VMEM budget."""
    if t % 32 != 0 or d % 128 != 0:
        return False
    itemsize = 1 if kv_dtype is None else jnp.dtype(kv_dtype).itemsize
    block_bytes = 2 * h * t * d * itemsize  # K + V at cache width
    return 2 * block_bytes <= 12 << 20


def decode_attention_rows(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Row-grid decode attention: q (B, H, 1, D); k/v (B, H, T, D) with T a
    multiple of 32 and D of 128 (see rows_supported) -> (B, H, 1, D)."""
    b, h, tq, d = q.shape
    assert tq == 1, "decode kernel handles a single query step"
    t = k.shape[2]
    assert rows_supported(b, h, t, d, kv_dtype=k.dtype), (b, h, t, d, k.dtype)
    assert (k_scale is None) == (v_scale is None), (
        "int8-KV dequant needs BOTH k_scale and v_scale")
    scale = scale if scale is not None else d**-0.5
    if interpret is None:
        interpret = not on_tpu()
    if mask is None:
        mask = jnp.zeros((b, 1, 1, t), jnp.float32)
    # the kernel applies ONE mask row to every head; a genuinely per-head
    # mask must not be silently truncated to head 0's
    assert mask.shape[1] == 1, "decode_attention_rows needs a head-broadcast mask"
    mask = jnp.broadcast_to(mask.astype(jnp.float32), (b, 1, 1, t))
    ks = None if k_scale is None else jnp.swapaxes(k_scale, -1, -2).astype(jnp.float32)
    vs = None if v_scale is None else jnp.swapaxes(v_scale, -1, -2).astype(jnp.float32)
    return _decode_rows_padded(q, k, v, mask, ks, vs, float(scale),
                               bool(interpret))


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _decode_attention_padded(q, k, v, mask, k_scale, v_scale, scale: float,
                             interpret: bool):
    b, h, _, d = q.shape
    t = k.shape[2]
    grid = (b, h)
    quant = k_scale is not None
    kernel = functools.partial(_decode_kernel, scale=scale)
    if not quant:
        kernel = (lambda qr, kr, vr, mr, orf, *, _k=kernel:
                  _k(qr, kr, vr, mr, None, None, orf))
    in_specs = [
        pl.BlockSpec((1, 1, 1, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, t, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, t, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        # the mask stays (B, 1, 1, T) in HBM — every head's program reads
        # the same row, so no H-times fp32 materialization on the hot path
        pl.BlockSpec((1, 1, 1, t), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, mask]
    if quant:
        in_specs += [
            pl.BlockSpec((1, 1, 1, t), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, t), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ]
        args += [k_scale, v_scale]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 1, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, d), q.dtype),
        interpret=interpret,
    )(*args)
    return out


def bh_supported(t: int, d: int, kv_dtype=None) -> bool:
    """Per-(b,h) kernel eligibility: the (1, 1, T, D) K and V blocks must
    fit the Mosaic scoped-VMEM budget double-buffered at the cache's
    actual width, or compilation fails at runtime instead of falling back
    to XLA.  Also requires a pad-free bucket (T a 128-multiple): an
    unaligned T forces a full K+V cache copy per decode step per layer —
    on the HBM-bound hot path that silently erases the kernel's win."""
    if t % 128 != 0 or d % 128 != 0:
        return False
    itemsize = 1 if kv_dtype is None else jnp.dtype(kv_dtype).itemsize
    block_bytes = 2 * t * d * itemsize  # K + V blocks per program
    return 2 * block_bytes <= 12 << 20  # double-buffered, under ~16M scoped


def decode_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """q: (B, H, 1, D); k/v: (B, H, T, D) bf16 or int8 with per-position
    dequant scales (B, H, T, 1); additive mask (head dim 1) -> (B, H, 1, D)."""
    b, h, tq, d = q.shape
    assert tq == 1, "decode kernel handles a single query step"
    assert (k_scale is None) == (v_scale is None), (
        "int8-KV dequant needs BOTH k_scale and v_scale")
    t = k.shape[2]
    scale = scale if scale is not None else d**-0.5
    if interpret is None:
        interpret = not on_tpu()

    t_pad = _round_up(t, 128)
    d_pad = _round_up(d, 128)
    if mask is None:
        mask = jnp.zeros((b, 1, 1, t), jnp.float32)
    assert mask.shape[1] == 1, "decode_attention needs a head-broadcast mask"
    mask = jnp.broadcast_to(mask.astype(jnp.float32), (b, 1, 1, t))
    ks = None if k_scale is None else jnp.swapaxes(k_scale, -1, -2).astype(jnp.float32)
    vs = None if v_scale is None else jnp.swapaxes(v_scale, -1, -2).astype(jnp.float32)
    if t_pad != t:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        mask = jnp.pad(mask, [(0, 0), (0, 0), (0, 0), (0, t_pad - t)],
                       constant_values=-1e9)
        if ks is not None:
            spad = [(0, 0), (0, 0), (0, 0), (0, t_pad - t)]
            ks = jnp.pad(ks, spad)
            vs = jnp.pad(vs, spad)
    if d_pad != d:
        padd = [(0, 0), (0, 0), (0, 0), (0, d_pad - d)]
        q = jnp.pad(q, padd)
        k = jnp.pad(k, padd)
        v = jnp.pad(v, padd)

    out = _decode_attention_padded(q, k, v, mask, ks, vs, float(scale),
                                   bool(interpret))
    return out[..., :d]
