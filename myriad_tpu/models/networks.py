"""Trainable adaptor networks (reference minigpt4/models/networks.py).

These are the only trainable modules besides LLaMA-LoRA: the ViT feature
adaptor and the two anomaly-map encoders.  Anomaly maps are (B, H, W, 1)
channels-last here (the reference uses (B, 1, H, W)).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from myriad_tpu.models.layers import Dtype


def _normal_init(std: float = 0.02):
    return nn.initializers.normal(stddev=std)


class LoraAdaptorV2(nn.Module):
    """Residual low-rank linear pair 1408 -> r -> 1408 (networks.py:71-93)."""

    dims: int = 1408
    input_dim: int = 4  # bottleneck rank
    out_dim: int = -1
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_dim = self.out_dim if self.out_dim != -1 else self.dims
        h = nn.Dense(self.input_dim, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, kernel_init=_normal_init(), name="conv1")(x)
        h = nn.Dense(out_dim, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, kernel_init=_normal_init(), name="conv2")(h)
        if out_dim != x.shape[-1]:
            # residual zero-padded into the larger output (networks.py:86-89)
            pad = jnp.zeros_like(h)
            pad = pad.at[..., : x.shape[-1]].set(x.astype(h.dtype))
            return h + pad
        return h + x.astype(h.dtype)


class _ConvPyramid(nn.Module):
    """5x [conv3x3 -> ReLU -> maxpool2] turning (224,224,C) into (7,7,1024*C).

    Shared stem of VEInstructorV2/VETokenizer (networks.py:98-123,159-184).
    """

    dim_in: int = 1
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        widths = [self.dim_in * m for m in (4, 16, 64, 256, 1024)]
        for i, w in enumerate(widths):
            x = nn.Conv(w, kernel_size=(3, 3), padding=1, dtype=self.dtype,
                        param_dtype=self.param_dtype, name=f"conv_{i}")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        return x


class VEInstructorV2(nn.Module):
    """Anomaly map -> N expert tokens x out_dim for the Q-Former
    (networks.py:95-153).  version 0/1/2 -> 49/25/9 tokens; out_dim is the
    Q-Former hidden size (768 in the reference)."""

    dim_in: int = 1
    version: int = 0
    out_dim: int = 768
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @property
    def num_tokens(self) -> int:
        return {0: 49, 1: 25, 2: 9}[self.version]

    @nn.compact
    def __call__(self, maps: jnp.ndarray) -> jnp.ndarray:
        """maps: (B, 224, 224, dim_in) -> (B, num_tokens, out_dim)."""
        x = _ConvPyramid(self.dim_in, self.dtype, self.param_dtype, name="pyramid")(
            maps.astype(self.dtype)
        )  # (B,7,7,1024)
        if self.version == 0:
            x = nn.Conv(self.out_dim, kernel_size=(1, 1), padding=0, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="head")(x)  # (B,7,7,out_dim)
        elif self.version == 1:
            x = nn.Conv(self.dim_in * 1024, kernel_size=(3, 3), padding="VALID",
                        dtype=self.dtype, param_dtype=self.param_dtype, name="mid")(x)
            x = nn.relu(x)
            x = nn.Conv(self.out_dim, kernel_size=(1, 1), padding=0, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="head")(x)  # (B,5,5,out_dim)
        elif self.version == 2:
            x = nn.Conv(self.dim_in * 1024, kernel_size=(3, 3), padding=1,
                        dtype=self.dtype, param_dtype=self.param_dtype, name="mid")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))  # (B,3,3,1024)
            x = nn.Conv(self.out_dim, kernel_size=(1, 1), padding=0, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="head")(x)
        else:
            raise NotImplementedError(f"VEInstructorV2 version {self.version}")
        b = x.shape[0]
        return x.reshape(b, self.num_tokens, self.out_dim)


class AttentionAdaptor(nn.Module):
    """Conv-residual adaptor over the 16x16 patch grid, cls token passed
    through (reference networks.py:41-68)."""

    dims: int = 1408
    grid: int = 16
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, 1+grid^2, dims) -> same shape."""
        b = x.shape[0]
        cls_tok = x[:, 0:1]
        patches = x[:, 1:].reshape(b, self.grid, self.grid, self.dims)
        h = nn.Conv(self.dims, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(patches.astype(self.dtype))
        h = nn.Conv(self.dims, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv2")(h)
        h = h + patches.astype(h.dtype)
        return jnp.concatenate([cls_tok.astype(h.dtype),
                                h.reshape(b, self.grid * self.grid, self.dims)], axis=1)


class VETokenizerFea(nn.Module):
    """Strided-conv variant of VETokenizer (reference networks.py:313-355):
    same 9+9 token output from a smaller strided pyramid."""

    dim_in: int = 1
    llm_dim: int = 4096
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, maps: jnp.ndarray) -> jnp.ndarray:
        b = maps.shape[0]
        x = maps.astype(self.dtype)
        specs = [  # (width_mult, kernel, stride)
            (4, 3, 2), (16, 1, 1), (64, 1, 1), (256, 3, 2), (1024, 1, 1),
        ]
        for i, (m, k, s) in enumerate(specs):
            x = nn.Conv(self.dim_in * m, (k, k), strides=(s, s), padding="VALID",
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"conv_{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(self.llm_dim, (1, 1), padding=0, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="head")(x)
        # expect a 3x3 grid like the pooled variant; pool down if larger
        g = x.shape[1]
        if g > 3:
            x = nn.avg_pool(x, (g // 3, g // 3), strides=(g // 3, g // 3))
        img_prompts = x[:, :3, :3].reshape(b, 9, self.llm_dim)
        base = self.param("base_prompts", nn.initializers.normal(1.0),
                          (9, self.llm_dim), self.param_dtype)
        base = jnp.broadcast_to(base.astype(img_prompts.dtype), (b, 9, self.llm_dim))
        return jnp.concatenate([base, img_prompts], axis=1)


class VETokenizer(nn.Module):
    """Anomaly map -> 9 map tokens x 4096 + 9 learned base prompts = 18
    LLM-level expert tokens (networks.py:156-197)."""

    dim_in: int = 1
    llm_dim: int = 4096
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, maps: jnp.ndarray) -> jnp.ndarray:
        """maps: (B, 224, 224, dim_in) -> (B, 18, llm_dim)."""
        b = maps.shape[0]
        x = _ConvPyramid(self.dim_in, self.dtype, self.param_dtype, name="pyramid")(
            maps.astype(self.dtype)
        )  # (B,7,7,1024)
        x = nn.Conv(self.llm_dim, kernel_size=(5, 5), padding="VALID", dtype=self.dtype,
                    param_dtype=self.param_dtype, name="head")(x)  # (B,3,3,llm_dim)
        img_prompts = x.reshape(b, 9, self.llm_dim)
        base = self.param(
            "base_prompts", nn.initializers.normal(1.0), (9, self.llm_dim), self.param_dtype
        )
        base = jnp.broadcast_to(base.astype(img_prompts.dtype), (b, 9, self.llm_dim))
        return jnp.concatenate([base, img_prompts], axis=1)
