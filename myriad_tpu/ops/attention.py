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


def _xla_mha(q, k, v, mask, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-head attention.

    q: (B, H, Tq, D); k/v: (B, H, Tk, D); mask additive, broadcastable to
    (B, H, Tq, Tk); returns (B, H, Tq, D) in v's dtype.
    """
    import os

    scale = scale if scale is not None else q.shape[-1] ** -0.5
    tq = q.shape[2]
    if use_pallas is None:
        # measured on v5e: at short KV (<=384, the AQA regime) XLA's fused
        # attention pipelines the batched heads better than the per-(b,h)
        # Pallas program (8.6 vs 10.3 ms/decode-step at d16/b16); the
        # kernel wins only once the cache is long enough to be
        # bandwidth-dominant per head
        use_pallas = (
            _on_tpu()
            and tq == 1
            and k.shape[2] >= 2048
            and os.environ.get("MYRIAD_DISABLE_PALLAS", "0") != "1"
        ) or os.environ.get("MYRIAD_FORCE_PALLAS", "0") == "1"
    if use_pallas:
        from myriad_tpu.ops.decode_attention import decode_attention

        return decode_attention(q, k, v, mask=mask, scale=scale)
    return _xla_mha(q, k, v, mask, scale)
