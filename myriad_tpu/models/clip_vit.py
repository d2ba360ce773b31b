"""CLIP ViT-L/14 vision encoder (reference minigpt4/models/clip_vit.py,
factory :242-262) — the alternative encoder selectable via
``vit_model: clip_vit_l`` (unused by the live Myriad configs).

Standard CLIP ViT: patch conv (no bias), class embedding, pre-LN stack of
residual attention blocks (GELU MLP, ratio 4), truncated to 23 layers and
no final LN for the BLIP-2 feature variant.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from myriad_tpu.models.imagebind import TorchMha
from myriad_tpu.models.layers import Dtype, Policy


class ClipBlock(nn.Module):
    num_heads: int
    dtype: Dtype
    param_dtype: Dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        ln = lambda n: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                    param_dtype=self.param_dtype, name=n)
        h = TorchMha(self.num_heads, self.dtype, self.param_dtype, name="attn")(
            ln("ln_1")(x).astype(self.dtype)
        )
        x = x + h
        m = nn.Dense(4 * dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="c_fc")(ln("ln_2")(x).astype(self.dtype))
        m = m * jax.nn.sigmoid(1.702 * m)  # CLIP QuickGELU (clip_vit.py:116)
        m = nn.Dense(dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="c_proj")(m)
        return x + m


class ClipViT(nn.Module):
    """(B,H,W,3) -> (B, 1+P, width); no final LN (clip_vit.py:169,184)."""

    img_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 23
    heads: int = 16
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @property
    def num_features(self) -> int:
        return self.width

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        if images.dtype == jnp.uint8:
            from myriad_tpu.ops.preprocess import u8_normalize

            images = u8_normalize(images, out_dtype=self.dtype)
        b = images.shape[0]
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), padding="VALID",
                    use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv1")(images.astype(self.dtype))
        x = x.reshape(b, -1, self.width)
        scale = self.width**-0.5
        cls = self.param("class_embedding", nn.initializers.normal(scale),
                         (self.width,), self.param_dtype)
        pos = self.param("positional_embedding", nn.initializers.normal(scale),
                         (x.shape[1] + 1, self.width), self.param_dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.width)), x], axis=1
        )
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="ln_pre")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        for i in range(self.layers):
            x = ClipBlock(self.heads, self.dtype, self.param_dtype,
                          name=f"resblocks_{i}")(x)
        return x


def create_clip_vit_L(img_size: int = 224, use_checkpoint: bool = False,
                      policy: Optional[Policy] = None) -> ClipViT:
    policy = policy or Policy.bf16()
    return ClipViT(
        img_size=img_size, patch_size=14, width=1024, layers=23, heads=16,
        dtype=policy.compute_dtype, param_dtype=policy.param_dtype,
    )
