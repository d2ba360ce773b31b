"""Attention dispatch: XLA reference path + Pallas TPU kernels.

``mha`` is the single entry point used by every model; it routes to a
Pallas kernel for the TPU decode hot path (single query timestep against a
long KV cache, BASELINE.json north-star) and otherwise relies on XLA fusion,
which already handles the prefill/training shapes well.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _xla_mha(q, k, v, mask, scale, k_scale=None, v_scale=None):
    # quantized KV (int8 payload + per-(b,h,t,1) scales): the scales fold
    # into the (B,H,Tq,Tk) logits/probs instead of dequantizing the
    # (B,H,Tk,D) cache — the int8->bf16 convert fuses into the dots, so the
    # cache streams from HBM at int8 width and no bf16 copy materializes
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k.astype(q.dtype), preferred_element_type=jnp.float32
    )
    if k_scale is not None:
        logits = logits * jnp.swapaxes(k_scale, -1, -2).astype(logits.dtype)
    logits = logits * scale
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    if v_scale is not None:
        probs = probs * jnp.swapaxes(v_scale, -1, -2).astype(probs.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v.astype(q.dtype))


from myriad_tpu.ops._util import on_tpu as _on_tpu  # noqa: E402 (shared helper)


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Multi-head attention.

    q: (B, H, Tq, D); k/v: (B, H, Tk, D); mask additive, broadcastable to
    (B, H, Tq, Tk); returns (B, H, Tq, D) in q's dtype.  k_scale/v_scale
    (B, H, Tk, 1) carry per-position dequant scales for an int8 KV cache
    (folded into logits/probs, see _xla_mha).
    """
    import os

    scale = scale if scale is not None else q.shape[-1] ** -0.5
    tq = q.shape[2]
    mode = os.environ.get("MYRIAD_DECODE_ATTN", "auto")
    if mode == "xla":
        # forced-XLA A/B anchor: bypass every kernel dispatch below
        return _xla_mha(q, k, v, mask, scale, k_scale, v_scale)
    if mode == "bh" and tq == 1:
        # force the per-(b,h) Pallas decode kernel regardless of KV length
        use_pallas = True
    if tq == 1 and mode == "row":
        from myriad_tpu.ops.decode_attention import (decode_attention_rows,
                                                     rows_supported)

        b, h, _, d = q.shape
        # row-grid kernel (one batch row per program, all heads resident):
        # measured SLOWER than XLA's fused matvec at the d32/b24 serving
        # point (10.70 vs 11.68 img/s, decode+rest 1.99 vs 1.80 s) — grid
        # programs run sequentially on the one TensorCore, so the 32
        # per-head M=1 dots serialize (~0.5 us each x 768 (b,h) pairs/layer)
        # while XLA lowers the batched matvec as fused VPU
        # multiply-reduce over the whole (B,H,T,D) block.  Kept as an
        # explicitly-forced variant (transcript-exact: bit-identical greedy
        # tokens at d32/b24 on device) for re-measurement on runtime
        # updates; NOT part of auto dispatch.
        if rows_supported(b, h, k.shape[2], d, kv_dtype=k.dtype):
            return decode_attention_rows(
                q, k, v, mask=mask, scale=scale,
                k_scale=k_scale, v_scale=v_scale,
            )
        # forced-row fallback must be LOUD: a bit-identity check or bench
        # run with an unaligned bucket would otherwise silently measure
        # the XLA path while reporting the row kernel (same hazard as the
        # forced-Pallas tq!=1 case below)
        import warnings

        warnings.warn(
            f"mha: MYRIAD_DECODE_ATTN=row forced but rows_supported("
            f"b={b}, h={h}, t={k.shape[2]}, d={d}, kv_dtype={k.dtype}) is "
            "False — falling back to the auto dispatch",
            stacklevel=2,
        )
    if use_pallas is None:
        # measured on v5e: at short KV (<=384, the AQA regime) XLA's fused
        # attention pipelines the batched heads better than the per-(b,h)
        # Pallas program (8.6 vs 10.3 ms/decode-step at d16/b16); the
        # kernel wins only once the cache is long enough to be
        # bandwidth-dominant per head (conversation mode).  It reads int8
        # KV directly, folding the per-position scales in-kernel.
        # bh_supported additionally requires a 128-aligned bucket (an
        # unaligned T forces a full K+V pad-copy per step — worse than
        # XLA) and K/V blocks that fit scoped VMEM double-buffered (an
        # oversized block fails Mosaic compilation instead of falling
        # back).
        from myriad_tpu.ops.decode_attention import bh_supported

        use_pallas = (
            _on_tpu()
            and tq == 1
            and k.shape[2] >= 2048
            and bh_supported(k.shape[2], q.shape[3], k.dtype)
            and os.environ.get("MYRIAD_DISABLE_PALLAS", "0") != "1"
        ) or os.environ.get("MYRIAD_FORCE_PALLAS", "0") == "1"
    if use_pallas and tq != 1:
        # the decode kernel is tq==1-only; a forced-Pallas test feeding a
        # multi-token chunk would otherwise silently validate the XLA path
        import warnings

        warnings.warn(
            f"mha: use_pallas forced but tq={tq} != 1 — falling back to the "
            "XLA path (decode_attention handles single-step queries only; "
            "multi-token prefill routes via ops/prefill_attention)",
            stacklevel=2,
        )
    if use_pallas and tq == 1:
        from myriad_tpu.ops.decode_attention import (bh_supported,
                                                     decode_attention)

        if not bh_supported(k.shape[2], q.shape[3], k.dtype):
            # forced path (bh / MYRIAD_FORCE_PALLAS): still runs via the
            # kernel's internal padding, but be loud — an unaligned bucket
            # pad-copies the cache per step and an oversized block can
            # fail Mosaic compilation outright
            import warnings

            warnings.warn(
                f"mha: Pallas decode forced but bh_supported(t={k.shape[2]}, "
                f"d={q.shape[3]}, kv_dtype={k.dtype}) is False — expect a "
                "per-step cache pad-copy or a Mosaic VMEM failure",
                stacklevel=2,
            )
        return decode_attention(q, k, v, mask=mask, scale=scale,
                                k_scale=k_scale, v_scale=v_scale)
    return _xla_mha(q, k, v, mask, scale, k_scale, v_scale)
