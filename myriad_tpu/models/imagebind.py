"""ImageBind-huge vision & text towers in flax.

Reference: vendored Meta ImageBind at minigpt4/models/model/ImageBind/
(models/imagebind_model.py:486-504 'imagebind_huge': vision 1280d x 32
blocks x 16 heads, text 1024d x 24 blocks x 16 heads, out dim 1024), with
the Myriad modification that the trunk returns intermediate tokens at
``out_layers`` [7,15,23,31] (models/transformer.py:245-287).

TPU-native deltas:

* The vision stem's PadIm2Video(repeat 2x) + Conv3d(kernel (2,14,14))
  (imagebind_model.py:152-170) collapses exactly to a 2-D conv whose kernel
  is the sum over the time axis (both frames are identical); the converter
  performs that sum.  This halves the stem FLOPs.
* Pre-norm trunk in bf16 with fp32 LayerNorm islands; intermediate taps are
  raw block outputs (no final norm), matching the reference.
* Everything is batch-first (the reference trunk runs seq-first).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from myriad_tpu.models.layers import (
    Dtype,
    dot_attention,
    maybe_quant_dense,
    merge_heads,
    split_heads,
)


@dataclasses.dataclass(frozen=True)
class ImageBindConfig:
    vision_embed_dim: int = 1280
    vision_num_blocks: int = 32
    vision_num_heads: int = 16
    text_embed_dim: int = 1024
    text_num_blocks: int = 24
    text_num_heads: int = 16
    out_embed_dim: int = 1024
    img_size: int = 224
    patch_size: int = 14
    context_length: int = 77
    vocab_size: int = 49408
    out_layers: Tuple[int, ...] = (7, 15, 23, 31)
    # "int8": weight-only quantization of the trunk projections (frozen
    # serving profile — halves the 1.0B tower's memory + HBM traffic)
    weight_dtype: str = "bf16"

    @staticmethod
    def huge(**overrides) -> "ImageBindConfig":
        return dataclasses.replace(ImageBindConfig(), **overrides)

    @staticmethod
    def tiny(**overrides) -> "ImageBindConfig":
        base = ImageBindConfig(
            vision_embed_dim=64,
            vision_num_blocks=4,
            vision_num_heads=4,
            text_embed_dim=48,
            text_num_blocks=2,
            text_num_heads=4,
            out_embed_dim=32,
            img_size=28,
            patch_size=14,
            context_length=16,
            vocab_size=64,
            out_layers=(1, 3),
        )
        return dataclasses.replace(base, **overrides)


class TorchMha(nn.Module):
    """torch.nn.MultiheadAttention layout: packed in_proj + out_proj."""

    num_heads: int
    dtype: Dtype
    param_dtype: Dtype
    weight_dtype: str = "bf16"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        dim = x.shape[-1]
        dense = lambda f, name: maybe_quant_dense(
            self.weight_dtype, f, use_bias=True, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )
        qkv = dense(3 * dim, "in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (split_heads(t, self.num_heads) for t in (q, k, v))
        out = dot_attention(q, k, v, mask=mask)
        return dense(dim, "out_proj")(merge_heads(out))


class SimpleBlock(nn.Module):
    """Pre-norm block (ImageBind transformer.py BlockWithMasking)."""

    num_heads: int
    mlp_ratio: float
    dtype: Dtype
    param_dtype: Dtype
    weight_dtype: str = "bf16"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        dim = x.shape[-1]
        ln = lambda n: nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                    param_dtype=self.param_dtype, name=n)
        dense = lambda f, name: maybe_quant_dense(
            self.weight_dtype, f, use_bias=True, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )
        h = TorchMha(self.num_heads, self.dtype, self.param_dtype,
                     weight_dtype=self.weight_dtype, name="attn")(
            ln("norm_1")(x).astype(self.dtype), mask
        )
        x = x + h
        hidden = int(dim * self.mlp_ratio)
        m = dense(hidden, "fc1")(ln("norm_2")(x).astype(self.dtype))
        m = nn.gelu(m, approximate=False)
        m = dense(dim, "fc2")(m)
        return x + m


class SimpleTrunk(nn.Module):
    """Stack of SimpleBlocks with optional pre-LN and intermediate taps."""

    num_blocks: int
    num_heads: int
    pre_transformer_ln: bool
    out_layers: Sequence[int]
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    weight_dtype: str = "bf16"

    @nn.compact
    def __call__(
        self, tokens: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        x = tokens
        if self.pre_transformer_ln:
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                             param_dtype=self.param_dtype, name="pre_ln")(
                x.astype(jnp.float32)
            ).astype(self.dtype)
        taps: List[jnp.ndarray] = []
        for i in range(self.num_blocks):
            x = SimpleBlock(self.num_heads, self.mlp_ratio, self.dtype,
                            self.param_dtype, weight_dtype=self.weight_dtype,
                            name=f"blocks_{i}")(x, mask)
            if i in self.out_layers:
                taps.append(x)
        return x, taps


class ImageBindVision(nn.Module):
    """Vision tower: (B,H,W,3) -> (cls embed (B,out_dim), taps [(B,257,1280)])."""

    config: ImageBindConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        cfg = self.config
        if images.dtype == jnp.uint8:
            from myriad_tpu.ops.preprocess import u8_normalize

            images = u8_normalize(images, out_dtype=self.dtype)
        b = images.shape[0]
        dim = cfg.vision_embed_dim
        # time-collapsed video stem (see module docstring)
        x = nn.Conv(dim, kernel_size=(cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                    use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
                    name="rgbt_stem")(images.astype(self.dtype))
        x = x.reshape(b, -1, dim)
        n_tok = x.shape[1] + 1
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, dim), self.param_dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (b, 1, dim)), x], 1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, n_tok, dim),
                         self.param_dtype)
        x = x + pos.astype(x.dtype)

        x, taps = SimpleTrunk(
            cfg.vision_num_blocks, cfg.vision_num_heads, pre_transformer_ln=True,
            out_layers=cfg.out_layers, dtype=self.dtype, param_dtype=self.param_dtype,
            weight_dtype=cfg.weight_dtype, name="trunk",
        )(x)

        # head: LN -> cls -> linear (imagebind_model.py:383-387), then L2 norm
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="head_ln")(x.astype(jnp.float32))
        h = h[:, 0]
        h = nn.Dense(cfg.out_embed_dim, use_bias=False, dtype=jnp.float32,
                     param_dtype=self.param_dtype, name="head_proj")(h)
        h = h / jnp.linalg.norm(h, axis=-1, keepdims=True)
        return h, taps


class ImageBindText(nn.Module):
    """Text tower: (B, L) token ids -> (B, out_dim) normalized embeddings.

    Causal masking, EOS-position pooling (SelectEOSAndProject) where the EOS
    is the argmax token id (CLIP convention: EOS has the highest id).
    """

    config: ImageBindConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b, l = token_ids.shape
        emb = nn.Embed(cfg.vocab_size, cfg.text_embed_dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="token_embedding")(token_ids)
        pos = self.param("pos_embed", nn.initializers.normal(0.01),
                         (1, cfg.context_length, cfg.text_embed_dim), self.param_dtype)
        x = emb + pos[:, :l].astype(emb.dtype)
        causal = jnp.tril(jnp.ones((l, l), bool))
        mask = jnp.where(causal, 0.0, -1e9)[None, None]
        x, _ = SimpleTrunk(
            cfg.text_num_blocks, cfg.text_num_heads, pre_transformer_ln=False,
            out_layers=(), dtype=self.dtype, param_dtype=self.param_dtype,
            weight_dtype=cfg.weight_dtype, name="trunk",
        )(x, mask)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="head_ln")(x.astype(jnp.float32))
        eos_idx = jnp.argmax(token_ids, axis=-1)
        h = h[jnp.arange(b), eos_idx]
        h = nn.Dense(cfg.out_embed_dim, use_bias=False, dtype=jnp.float32,
                     param_dtype=self.param_dtype, name="head_proj")(h)
        # postprocessor: normalize + learnable logit scale (cancels after the
        # prompt-ensemble mean + renormalize, kept for checkpoint parity)
        log_scale = self.param("log_logit_scale", nn.initializers.constant(jnp.log(1 / 0.07)),
                               (), self.param_dtype)
        h = h / jnp.linalg.norm(h, axis=-1, keepdims=True)
        return h * jnp.exp(log_scale)


class LinearLayerDecoder(nn.Module):
    """AnomalyGPT per-tap linear decoder 1280 -> 1024
    (reference adrefexpert_v2.py:16-29): drops the cls token, projects patch
    tokens of each tapped layer with its own Dense."""

    num_taps: int = 4
    out_dim: int = 1024
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, taps: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        assert len(taps) == self.num_taps
        outs = []
        for i, tokens in enumerate(taps):
            h = nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                         name=f"fc_{i}")(tokens[:, 1:, :])
            outs.append(h)
        return outs
