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


def quantize_per_channel(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8: w (in, out) -> (w8, scale(out,))."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    w8 = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return w8, scale.astype(jnp.float32)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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

    on_tpu = jax.devices()[0].platform == "tpu"
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
        xf = x2.astype(jnp.float32)
        x_amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8)
        x8 = jnp.clip(jnp.round(xf * (127.0 / x_amax)), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x8, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        y = acc * (x_amax / 127.0) * scale.astype(jnp.float32)
        return y.astype(out_dtype).reshape(*lead, f)

    if interpret is None:
        interpret = not on_tpu
    tm = 256 if m >= 256 else _round_up(max(m, 1), 16)
    tf = 512 if f % 512 == 0 else 128
    m_pad = _round_up(m, tm)
    d_pad = _round_up(d, 128)
    f_pad = _round_up(f, tf)
    if m_pad != m or d_pad != d:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, d_pad - d)])
    if d_pad != d or f_pad != f:
        w8 = jnp.pad(w8, [(0, d_pad - d), (0, f_pad - f)])
        scale = jnp.pad(scale, [(0, f_pad - f)])
    y = _int8_matmul_padded(x2, w8, scale, bool(interpret), jnp.dtype(out_dtype).name,
                            tm, tf)
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


def quantize_tree(params, path_pattern: str = LLAMA_QUANT_PATTERN):
    """Replace matching 2-D 'kernel' leaves with sibling {'w_int8','scale'}
    leaves — the QuantDense param layout (used to convert bf16-model params
    into int8-model params)."""
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
                w8, scale = quantize_per_channel(jnp.asarray(v))
                out["w_int8"] = np.asarray(w8)
                out["scale"] = np.asarray(scale)
            elif isinstance(v, dict):
                out[k] = rec(v, p)
            else:
                out[k] = v
        return out

    return rec(params)
