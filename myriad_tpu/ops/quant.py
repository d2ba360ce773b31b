"""Int8 weight-only quantization for frozen projections.

Decode throughput on v5e is bound by streaming the frozen LLaMA weights
from HBM every token (bench: attention is ~10% of bytes, weights ~90%).
Storing kernels as int8 + per-output-channel fp32 scales halves that
traffic; the Pallas matmul dequantizes tiles in VMEM so the bf16 copy of
the weight never exists in HBM.

API:
    w8, scale = quantize_per_channel(w)        # (in,out) -> int8 + (out,)
    y = int8_matmul(x, w8, scale)              # (M,in) @ (in,out) -> (M,out)
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from myriad_tpu.ops._util import on_tpu as _on_tpu, round_up


def quantize_per_channel(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8: w (in, out) -> (w8, scale(out,))."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    w8 = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return w8, scale.astype(jnp.float32)


_round_up = round_up  # shared helper (ops/_util.py)


@jax.custom_jvp
def _w8a8_matmul(x2: jnp.ndarray, w8: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """(m, d) f32 @ int8 (d, f) with dynamic per-row activation quant.

    Defined with a custom (straight-through) derivative: the true forward
    contains round() and an int8 cast, both with zero derivative — a plain
    W8A8 matmul silently kills every gradient crossing an int8 layer, so
    LoRA/adaptor training through a frozen int8 LLM would never reach
    upstream trainables (llama_proj, VE adaptors).  The tangent treats the
    layer as the linear map x @ dequant(w8) (exact up to the activation
    quantization error); w8/scale are frozen and get no gradient.
    """
    x_amax = jnp.maximum(jnp.max(jnp.abs(x2), axis=-1, keepdims=True), 1e-8)
    x8 = jnp.clip(jnp.round(x2 * (127.0 / x_amax)), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x8, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    return acc * (x_amax / 127.0) * scale.astype(jnp.float32)


@_w8a8_matmul.defjvp
def _w8a8_matmul_jvp(primals, tangents):
    x2, w8, scale = primals
    dx = tangents[0]
    y = _w8a8_matmul(x2, w8, scale)
    # fp32 dequant-dot tangent (measured FASTER than a bf16 variant on v5e
    # — 12.7 vs 11.9 samples/s; XLA fuses the int8 convert into the dot)
    dy = jax.lax.dot_general(
        dx, w8.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale.astype(jnp.float32)[None, :]
    return y, dy


def _int8_matmul_kernel(x_ref, w_ref, s_ref, o_ref):
    # blocks: x (TM, D) bf16, w (D, TF) int8, s (1, TF) fp32, o (TM, TF)
    x = x_ref[:]
    w = w_ref[:].astype(jnp.bfloat16)  # dequant (scale applied after dot)
    acc = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype_name", "tm", "tf"))
def _int8_matmul_padded(x, w8, scale, interpret, out_dtype_name, tm, tf):
    m, d = x.shape
    f = w8.shape[1]
    out_dtype = jnp.dtype(out_dtype_name)
    grid = (m // tm, f // tf)
    return pl.pallas_call(
        _int8_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tf), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tf), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tf), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, f), out_dtype),
        interpret=interpret,
    )(x, w8, scale[None, :])


@functools.partial(jax.custom_jvp, nondiff_argnums=(3, 4, 5, 6))
def _int8_pallas_matmul(x2, w8, scale, interpret, out_dtype_name, tm, tf):
    """Differentiable wrapper over the Pallas dequant-dot kernel: like
    ``_w8a8_matmul``, the tangent treats the layer as the linear map
    x @ dequant(w8) and gives w8/scale no gradient.  Without it, any
    trainable upstream of an int8 tower that gradients must flow THROUGH
    (the expert adaptor feeding the frozen int8 Q-Former in the stage-2
    train step) dies with 'Linearization failed' — the kernel has no VJP
    (measured, r4 full-profile train_to_spec)."""
    return _int8_matmul_padded(x2, w8, scale, interpret, out_dtype_name, tm, tf)


@_int8_pallas_matmul.defjvp
def _int8_pallas_matmul_jvp(interpret, out_dtype_name, tm, tf, primals, tangents):
    x2, w8, scale = primals
    dx = tangents[0]
    y = _int8_pallas_matmul(x2, w8, scale, interpret, out_dtype_name, tm, tf)
    dy = (jax.lax.dot_general(
        dx.astype(jnp.float32), w8.astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale.astype(jnp.float32)[None, :]).astype(y.dtype)
    return y, dy


def int8_matmul(
    x: jnp.ndarray,
    w8: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    out_dtype=None,
    interpret: Optional[bool] = None,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """x (..., in) @ int8 w (in, out) * scale (out,) -> (..., out)."""
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    d = x.shape[-1]
    f = w8.shape[1]
    x2 = x.reshape(-1, d)
    m = x2.shape[0]

    on_tpu = _on_tpu()
    if use_pallas is None:
        # pallas pays off on the decode (tiny-M) shapes where the matmul is
        # weight-bandwidth-bound; large-M prefill is compute-bound and XLA's
        # fused dequant-dot handles it without VMEM-pinning issues
        use_pallas = (on_tpu and m <= 256) or (interpret is not None and interpret)
    if not use_pallas:
        # large-M path (prefill): dynamic per-row activation quant + native
        # int8 x int8 MXU matmul (W8A8).  Dequantizing weights to bf16 here
        # would write+read a full bf16 weight copy per matmul (measured 2x
        # slower prefill); int8 activations keep traffic at the int8 size
        # and double MXU throughput.
        y = _w8a8_matmul(x2.astype(jnp.float32), w8, scale)
        return y.astype(out_dtype).reshape(*lead, f)

    if interpret is None:
        interpret = not on_tpu
    # tile choice under the scoped-VMEM budget: Mosaic double-buffers every
    # block across grid steps, so 2*(x (tm,d) bf16 + w (d,tf) int8 +
    # out (tm,tf) fp32) must stay under ~14 MB of the 16 MB limit — at
    # d=11008 a (128, d) activation block with tf=512 blew the stack by
    # 436K (b32 speculative verify, m=B*(K+1)=128)
    budget = 14 << 20
    tm = 256 if m >= 256 else _round_up(max(m, 1), 16)
    cands = [c for c in (512, 256, 128) if f % c == 0] or [128]
    while True:
        fit = [c for c in cands
               if 2 * (tm * d * x2.dtype.itemsize + d * c + tm * c * 4) <= budget]
        if fit:
            tf = fit[0]
            break
        if tm <= 16:
            tf = cands[-1]
            break
        tm = max(16, tm // 2)
    m_pad = _round_up(m, tm)
    d_pad = _round_up(d, 128)
    f_pad = _round_up(f, tf)
    if m_pad != m or d_pad != d:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, d_pad - d)])
    if d_pad != d or f_pad != f:
        w8 = jnp.pad(w8, [(0, d_pad - d), (0, f_pad - f)])
        scale = jnp.pad(scale, [(0, f_pad - f)])
    y = _int8_pallas_matmul(x2, w8, scale, bool(interpret),
                            jnp.dtype(out_dtype).name, tm, tf)
    return y[:m, :f].reshape(*lead, f)


# ---------------------------------------------------------------------------
# int4 weight-only (group-wise): the post-int8 decode lever.
#
# Decode on one v5e chip is bound by streaming the frozen LLaMA weights from
# HBM every token; int8 already halved the bf16 traffic, int4 halves it
# again (6.6 GB -> 3.3 GB per step).  Scheme: symmetric round-to-nearest
# int4 with one fp32 scale per (group of INT4_GROUP input channels, output
# channel) — the standard llama.cpp-Q4/AWQ-RTN layout.  Two nibbles pack per
# uint8 byte along the INPUT dim (in-row 2i -> low nibble, 2i+1 -> high);
# the Pallas matmul unpacks + dequantizes tiles in VMEM so neither an int8
# nor a bf16 copy of the weight ever exists in HBM.
# ---------------------------------------------------------------------------

INT4_GROUP = 128


def int4_group(d: int) -> int:
    """Group size along the input dim: 128 when it divides, else the whole
    dim (keeps tiny test models valid)."""
    return INT4_GROUP if d % INT4_GROUP == 0 else d


def quantize_int4_grouped(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric group-wise int4: w (in, out) -> (packed (in//2, out) uint8,
    scale (in//group, out) fp32).  ``in`` must be even."""
    d, f = w.shape
    assert d % 2 == 0, f"int4 packing needs an even input dim, got {d}"
    g = int4_group(d)
    wf = jnp.asarray(w, jnp.float32).reshape(d // g, g, f)
    amax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -8, 7).astype(jnp.int32).reshape(d, f)
    lo = q[0::2] & 15
    hi = q[1::2] & 15
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return packed, scale.reshape(d // g, f).astype(jnp.float32)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """(in//2, out) uint8 -> (in, out) int32 values in [-8, 7]."""
    p = packed.astype(jnp.int32)
    lo = ((p & 15) ^ 8) - 8  # branch-free 4-bit sign extension
    hi = ((p >> 4) ^ 8) - 8
    d2, f = packed.shape
    return jnp.stack([lo, hi], axis=1).reshape(d2 * 2, f)


def dequant_int4(packed: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Reference dequantization to fp32 (tests / conversions)."""
    q = unpack_int4(packed).astype(jnp.float32)
    d, f = q.shape
    g = d // scale.shape[0]
    return (q.reshape(-1, g, f) * scale[:, None, :]).reshape(d, f)


def _int4_matmul_kernel(xe_ref, xo_ref, w_ref, s_ref, o_ref):
    # blocks: xe/xo (TM, TD//2) bf16 (the even/odd input columns, pre-split
    # so NO row interleave happens in-kernel — a stack+reshape relayout here
    # measured 5x slower end-to-end), w packed (TD//2, TF) uint8,
    # s (TD//G, TF) fp32, o (TM, TF) fp32 accumulated across the sequential
    # k grid dim (contraction split keeps intermediates in scoped VMEM).
    #
    # y = x_even @ dequant(lo nibbles) + x_odd @ dequant(hi nibbles):
    # packed row i holds input rows 2i (lo) and 2i+1 (hi), both in group
    # (2i)//G, so each nibble plane scales by groups of G//2 packed rows.
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        o_ref[:] = jnp.zeros_like(o_ref)

    # Mosaic legalizes vector bit ops / subtract at 32-bit width only, so
    # the nibble arithmetic runs in int32; the biased value (v ^ 8) =
    # v+8 mod 16 converts to bf16 and the -8 un-bias happens in float
    p = w_ref[:].astype(jnp.int32)
    lo = ((p & 15) ^ 8).astype(jnp.bfloat16) - 8.0
    hi = ((p >> 4) ^ 8).astype(jnp.bfloat16) - 8.0
    d2, tf = p.shape
    s = s_ref[:].astype(jnp.bfloat16)
    groups = s.shape[0]
    g2 = d2 // groups  # packed rows per scale group
    lo = (lo.reshape(groups, g2, tf) * s[:, None, :]).reshape(d2, tf)
    hi = (hi.reshape(groups, g2, tf) * s[:, None, :]).reshape(d2, tf)
    dims = (((1,), (0,)), ((), ()))
    o_ref[:] += jax.lax.dot_general(
        xe_ref[:], lo, dims, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        xo_ref[:], hi, dims, preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype_name", "tm", "tf", "nk"))
def _int4_matmul_padded(x, w4, scale, interpret, out_dtype_name, tm, tf, nk):
    m, d = x.shape
    f = w4.shape[1]
    td = d // nk
    sg = scale.shape[0] // nk
    out_dtype = jnp.dtype(out_dtype_name)
    grid = (m // tm, f // tf, nk)
    xe = x[:, 0::2]  # (m, d//2): tiny activation, split once in XLA
    xo = x[:, 1::2]
    out = pl.pallas_call(
        _int4_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, td // 2), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, td // 2), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((td // 2, tf), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((sg, tf), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tf), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, f), jnp.float32),
        interpret=interpret,
    )(xe, xo, w4, scale)
    return out.astype(out_dtype)


def int4_matmul(
    x: jnp.ndarray,
    w4: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    out_dtype=None,
    interpret: Optional[bool] = None,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """x (..., in) @ int4-packed w (in//2, out) with group scales
    (in//g, out) -> (..., out)."""
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    d = x.shape[-1]
    f = w4.shape[1]
    x2 = x.reshape(-1, d)
    m = x2.shape[0]

    on_tpu = _on_tpu()
    if use_pallas is None:
        use_pallas = (on_tpu and m <= 256) or (interpret is not None and interpret)
    if not use_pallas:
        # large-M path (prefill, compute-bound): requantize the int4 groups
        # to per-output-channel int8 on the fly (error <= the plain-int8
        # path's), then ride the existing W8A8 int8-MXU matmul.  This keeps
        # prefill weight traffic at the int8 size instead of writing a bf16
        # dequant copy (measured 2x slower for the int8 path, see above).
        q = unpack_int4(w4)  # (d, f) in [-8, 7]
        groups = scale.shape[0]
        g = d // groups
        col_amax = jnp.max(scale, axis=0) * 8.0  # (f,)
        s_col = jnp.maximum(col_amax / 127.0, 1e-8)
        ratio = scale / s_col[None, :]  # (groups, f)
        w8 = jnp.clip(
            jnp.round(q.reshape(groups, g, f).astype(jnp.float32) * ratio[:, None, :]),
            -127, 127,
        ).astype(jnp.int8).reshape(d, f)
        return int8_matmul(
            x, w8, s_col, out_dtype=out_dtype, interpret=interpret,
            use_pallas=False,
        )

    if interpret is None:
        interpret = not on_tpu
    tm = 256 if m >= 256 else _round_up(max(m, 1), 16)
    # narrower feature tiles than int8: the unpack+dequant intermediates
    # (bf16 nibble planes at (td//2, tf)) live in VMEM alongside the block
    tf = 256 if f % 256 == 0 else 128
    # split the contraction into nk sequential accumulation steps so the
    # per-step blocks + nibble-plane intermediates fit scoped VMEM.  The
    # input dim pads UP so every chunk is lane-aligned (td//2 % 128 == 0)
    # and group-aligned (td % 2*group == 0) — e.g. d=11008 -> nk=2 chunks
    # of td=5632 (d_pad=11264); a power-of-two halving can't split 11008
    # (5504 isn't 256-aligned).  Zero-padded input rows contribute nothing.
    g = d // scale.shape[0]
    nk, td = 1, d
    if d > 6144 and g == INT4_GROUP:
        nk = -(-d // 6144)  # ceil
        td = _round_up(-(-d // nk), 2 * INT4_GROUP)
    d_pad = td * nk
    m_pad = _round_up(m, tm)
    f_pad = _round_up(f, tf)
    if m_pad != m or d_pad != d:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, d_pad - d)])
    if f_pad != f or d_pad != d:
        w4 = jnp.pad(w4, [(0, (d_pad - d) // 2), (0, f_pad - f)])
        scale = jnp.pad(scale, [(0, (d_pad - d) // g), (0, f_pad - f)])
    y = _int4_matmul_padded(x2, w4, scale, bool(interpret), jnp.dtype(out_dtype).name,
                            tm, tf, nk)
    return y[:m, :f].reshape(*lead, f)


LLAMA_QUANT_PATTERN = (
    r"(k_proj|o_proj|gate_proj|up_proj|down_proj)/kernel$"
    r"|(q_proj|v_proj)/base/kernel$"
)
# EVA-ViT trunk projections (attn qkv/proj + MLP) — patch_embed is 4-D
# and skipped by the ndim check
EVA_QUANT_PATTERN = r"(qkv|attn/proj|fc1|fc2)/kernel$"
# ImageBind trunk projections; head_proj (the CLIP-space head) stays bf16
IMAGEBIND_QUANT_PATTERN = r"(in_proj|out_proj|fc1|fc2)/kernel$"
# Q-Former projections (self/cross attention + query FFN)
QFORMER_QUANT_PATTERN = (
    r"(query|key|value|attn_out|intermediate_query|output_query)/kernel$"
)


def quantize_tree(params, path_pattern: str = LLAMA_QUANT_PATTERN,
                  mode: str = "int8"):
    """Replace matching 2-D 'kernel' leaves with the quantized-Dense param
    layout (used to convert bf16-model params into serving params):

    * mode="int8" -> {'w_int8' (in,out) int8, 'scale' (out,) fp32}
    * mode="int4" -> {'w_int4' (in//2,out) uint8, 'scale4' (in//g,out) fp32}
    """
    import re

    pat = re.compile(path_pattern)

    def rec(node, path=""):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            p = f"{path}/{k}" if path else k
            if (
                k == "kernel"
                and not isinstance(v, dict)
                and getattr(v, "ndim", 0) == 2
                and pat.search(p)
            ):
                if mode == "int4":
                    w4, scale = quantize_int4_grouped(jnp.asarray(v))
                    out["w_int4"] = np.asarray(w4)
                    out["scale4"] = np.asarray(scale)
                else:
                    w8, scale = quantize_per_channel(jnp.asarray(v))
                    out["w_int8"] = np.asarray(w8)
                    out["scale"] = np.asarray(scale)
            elif isinstance(v, dict):
                out[k] = rec(v, p)
            else:
                out[k] = v
        return out

    return rec(params)
