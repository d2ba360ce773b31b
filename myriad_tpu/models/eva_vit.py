"""EVA-ViT-g/14 vision encoder in flax (reference minigpt4/models/eva_vit.py).

Architecture (factory at eva_vit.py:415-428): patch 14, embed 1408, depth
39, heads 16 (1408/88), mlp_ratio 4.3637 (hidden 6144 — MXU-aligned),
qkv_bias=True with the EVA quirk of a zero k-bias (eva_vit.py:76-82,
118-126), absolute position embeddings, pre-LN blocks, **no final norm**
(the caller's ln_vision handles it), optional DropPath.

TPU-native notes: NHWC layout, bf16 matmuls with fp32 LayerNorm/softmax
islands (replaces the reference's fp16 weight conversion + autocast,
eva_vit.py:397-412), optional ``jax.checkpoint`` per block instead of
torch.utils.checkpoint.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from myriad_tpu.models.layers import (
    Dtype,
    Mlp,
    Policy,
    dot_attention,
    drop_path,
    maybe_quant_dense,
    merge_heads,
    split_heads,
    trunc_normal,
)


class EvaAttention(nn.Module):
    """EVA attention: fused qkv projection, q/v biases only (no k bias)."""

    num_heads: int
    dtype: Dtype
    param_dtype: Dtype
    weight_dtype: str = "bf16"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        head_dim = dim // self.num_heads
        qkv = maybe_quant_dense(
            self.weight_dtype, 3 * dim, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, kernel_init=trunc_normal(), name="qkv",
        )(x)
        q_bias = self.param("q_bias", nn.initializers.zeros, (dim,), self.param_dtype)
        v_bias = self.param("v_bias", nn.initializers.zeros, (dim,), self.param_dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q + q_bias.astype(q.dtype)
        v = v + v_bias.astype(v.dtype)
        q, k, v = (split_heads(t, self.num_heads) for t in (q, k, v))
        out = dot_attention(q, k, v, scale=head_dim**-0.5)
        out = merge_heads(out)
        return maybe_quant_dense(
            self.weight_dtype, dim, use_bias=True, dtype=self.dtype,
            param_dtype=self.param_dtype, kernel_init=trunc_normal(), name="proj",
        )(out)


class EvaBlock(nn.Module):
    num_heads: int
    mlp_hidden: int
    drop_path_rate: float
    dtype: Dtype
    param_dtype: Dtype
    norm_eps: float = 1e-6
    weight_dtype: str = "bf16"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        def ln(name):
            return nn.LayerNorm(epsilon=self.norm_eps, dtype=jnp.float32,
                                param_dtype=self.param_dtype, name=name)

        rng = None if deterministic else self.make_rng("droppath")
        h = EvaAttention(self.num_heads, self.dtype, self.param_dtype,
                         weight_dtype=self.weight_dtype, name="attn")(
            ln("norm1")(x).astype(self.dtype)
        )
        x = x + drop_path(h, self.drop_path_rate, deterministic, rng)
        h = Mlp(self.mlp_hidden, dtype=self.dtype, param_dtype=self.param_dtype,
                weight_dtype=self.weight_dtype, name="mlp")(
            ln("norm2")(x).astype(self.dtype)
        )
        rng2 = None if deterministic else self.make_rng("droppath")
        return x + drop_path(h, self.drop_path_rate, deterministic, rng2)


class EvaViT(nn.Module):
    """EVA ViT returning all token states (B, 1+P, D) with no final norm."""

    img_size: int = 224
    patch_size: int = 14
    embed_dim: int = 1408
    depth: int = 39
    num_heads: int = 16
    mlp_ratio: float = 4.3637
    drop_path_rate: float = 0.0
    use_checkpoint: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    # "int8": frozen-tower weight-only quantization (halves the 1.0B
    # tower's HBM footprint+traffic; W8A8 int8-MXU matmuls at encode)
    weight_dtype: str = "bf16"

    @property
    def num_features(self) -> int:
        return self.embed_dim

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """images: (B, H, W, 3) normalized float -> (B, 1+P, embed_dim)."""
        b = images.shape[0]
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="patch_embed",
        )(images.astype(self.dtype))
        x = x.reshape(b, -1, self.embed_dim)  # row-major (h, w) token order

        cls_token = self.param(
            "cls_token", trunc_normal(), (1, 1, self.embed_dim), self.param_dtype
        )
        pos_embed = self.param(
            "pos_embed",
            trunc_normal(),
            (1, self.num_patches + 1, self.embed_dim),
            self.param_dtype,
        )
        x = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)).astype(x.dtype), x], axis=1)
        x = x + pos_embed.astype(x.dtype)

        mlp_hidden = int(self.embed_dim * self.mlp_ratio)
        import numpy as np

        dpr = [float(r) for r in np.linspace(0.0, self.drop_path_rate, self.depth)]
        block_cls = nn.remat(EvaBlock, static_argnums=(2,)) if self.use_checkpoint else EvaBlock
        for i in range(self.depth):
            x = block_cls(
                num_heads=self.num_heads,
                mlp_hidden=mlp_hidden,
                drop_path_rate=dpr[i],
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                weight_dtype=self.weight_dtype,
                name=f"blocks_{i}",
            )(x, deterministic)
        return x


def create_eva_vit_g(
    img_size: int = 224,
    drop_path_rate: float = 0.0,
    use_checkpoint: bool = False,
    policy: Optional[Policy] = None,
) -> EvaViT:
    """EVA-ViT-g/14 (reference eva_vit.py:415-428)."""
    policy = policy or Policy.bf16()
    return EvaViT(
        img_size=img_size,
        patch_size=14,
        embed_dim=1408,
        depth=39,
        num_heads=1408 // 88,
        mlp_ratio=4.3637,
        drop_path_rate=drop_path_rate,
        use_checkpoint=use_checkpoint,
        dtype=policy.compute_dtype,
        param_dtype=policy.param_dtype,
    )
