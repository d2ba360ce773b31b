"""Shared flax building blocks with an explicit TPU dtype policy.

Policy (replaces the reference's fp16 autocast + GradScaler + fp32-LayerNorm
+ clamped-CE NaN hacks, SURVEY.md §7.1): parameters are stored in
``param_dtype``; matmuls run in ``dtype`` (bf16 on TPU); LayerNorm, softmax
and the LM loss always compute in fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: Dtype = jnp.float32
    compute_dtype: Dtype = jnp.bfloat16
    norm_dtype: Dtype = jnp.float32  # LayerNorm/softmax islands

    @staticmethod
    def fp32() -> "Policy":
        return Policy(jnp.float32, jnp.float32, jnp.float32)

    @staticmethod
    def bf16() -> "Policy":
        return Policy(jnp.float32, jnp.bfloat16, jnp.float32)

    @staticmethod
    def bf16_params() -> "Policy":
        """bf16 storage + compute (frozen-tower memory profile: the 8.6B
        frozen params must fit v5e HBM, SURVEY.md §7.3 risk 5)."""
        return Policy(jnp.bfloat16, jnp.bfloat16, jnp.float32)


def trunc_normal(std: float = 0.02) -> Callable:
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


class QuantDense(nn.Module):
    """Int8 weight-only Dense: params {w_int8 (in,out), scale (out,)
    [, bias (out,)]} — the serving layout for frozen projections.

    Halves HBM weight traffic (the decode/encode bottleneck on v5e) and
    parameter memory; the matmul dispatches to ops/quant.int8_matmul
    (Pallas dequant-in-VMEM at small M, W8A8 int8-MXU at large M)."""

    features: int
    use_bias: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from myriad_tpu.ops.quant import int8_matmul

        d = x.shape[-1]
        w8 = self.param("w_int8", nn.initializers.zeros, (d, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        y = int8_matmul(x.astype(self.dtype), w8, scale, out_dtype=self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


def maybe_quant_dense(weight_dtype: str, features: int, *, use_bias: bool,
                      dtype, param_dtype, name: str, kernel_init=None):
    """Dense or its int8 serving twin, switched by ``weight_dtype``."""
    if weight_dtype == "int8":
        return QuantDense(features, use_bias=use_bias, dtype=dtype, name=name)
    kwargs = dict(use_bias=use_bias, dtype=dtype, param_dtype=param_dtype, name=name)
    if kernel_init is not None:
        kwargs["kernel_init"] = kernel_init
    return nn.Dense(features, **kwargs)


class LayerNormFp32(nn.Module):
    """LayerNorm computed in fp32, output cast back to the input dtype.

    Mirrors the reference's fp16-safe LayerNorm subclass
    (minigpt4/models/blip2.py:119-125).
    """

    epsilon: float = 1e-6
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig = x.dtype
        y = nn.LayerNorm(
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            name="ln",
        )(x.astype(jnp.float32))
        return y.astype(orig)


def gelu_exact(x):
    """erf-based GELU — torch nn.GELU default (the reference towers' act)."""
    return nn.gelu(x, approximate=False)


class Mlp(nn.Module):
    """Transformer MLP: fc1 -> act -> fc2 (reference eva_vit.py:44-61).

    Default act is EXACT gelu: torch ``nn.GELU()`` is erf-based, and the
    tanh approximation diverges by ~1e-3 — enough to break per-tower
    activation parity (tests/test_torch_parity.py)."""

    hidden_features: int
    out_features: Optional[int] = None
    act: Callable = gelu_exact
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    weight_dtype: str = "bf16"  # "int8" -> QuantDense serving twin

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_features = self.out_features or x.shape[-1]
        dense = lambda f, name: maybe_quant_dense(
            self.weight_dtype, f, use_bias=True, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name, kernel_init=trunc_normal(),
        )
        x = dense(self.hidden_features, "fc1")(x)
        x = self.act(x)
        x = dense(out_features, "fc2")(x)
        return x


def drop_path(x: jnp.ndarray, rate: float, deterministic: bool, rng: Optional[jax.Array]) -> jnp.ndarray:
    """Stochastic depth on the batch dim (reference eva_vit.py:30-41)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


def dot_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    norm_dtype: Dtype = jnp.float32,
) -> jnp.ndarray:
    """Batched multi-head attention with an fp32 softmax island.

    q: (B, H, Tq, D); k/v: (B, H, Tk, D); bias/mask broadcastable to
    (B, H, Tq, Tk).  ``mask`` is additive (0 / -inf style) like the
    reference's extended attention masks.
    """
    d = q.shape[-1]
    scale = scale if scale is not None else d**-0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=norm_dtype)
    logits = logits.astype(norm_dtype) * scale
    if bias is not None:
        logits = logits + bias.astype(norm_dtype)
    if mask is not None:
        logits = logits + mask.astype(norm_dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)
