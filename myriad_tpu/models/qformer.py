"""BLIP-2 Q-Former in flax (reference minigpt4/models/Qformer.py).

Myriad uses the Q-Former in *query-only* mode: word/position embeddings and
the text-branch FFN are pruned at load (reference myriad.py:148-157), so
the live computation per layer is

    self-attention over the query tokens (bidirectional)
    cross-attention query -> image tokens on every ``cross_attention_freq``-th layer
    query-branch FFN (intermediate_query/output_query)

Post-LN residuals with BERT epsilon 1e-12.  Query tokens arrive as
embeddings (32 learned queries [+ 49 VEInstructor tokens]); the embeddings
module is just LayerNorm+dropout (Qformer.py:95-107 with input_ids=None).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from myriad_tpu.models.layers import (
    Dtype,
    dot_attention,
    maybe_quant_dense,
    merge_heads,
    split_heads,
    trunc_normal,
)


class BertSelfAttention(nn.Module):
    """BERT-style attention; cross-attention keys/values read encoder states
    of width ``encoder_width`` (Qformer.py:110-130)."""

    num_heads: int
    dtype: Dtype
    param_dtype: Dtype
    weight_dtype: str = "bf16"  # "int8" -> QuantDense serving twin

    @nn.compact
    def __call__(
        self,
        hidden: jnp.ndarray,
        kv: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        dim = hidden.shape[-1]
        kv = hidden if kv is None else kv
        dense = lambda n: maybe_quant_dense(
            self.weight_dtype, dim, use_bias=True, dtype=self.dtype,
            param_dtype=self.param_dtype, kernel_init=trunc_normal(), name=n)
        q = split_heads(dense("query")(hidden), self.num_heads)
        k = split_heads(dense("key")(kv), self.num_heads)
        v = split_heads(dense("value")(kv), self.num_heads)
        out = dot_attention(q, k, v, mask=mask)
        out = merge_heads(out)
        # BertSelfOutput: dense + residual + LayerNorm (post-LN)
        out = dense("attn_out")(out)
        out = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, param_dtype=self.param_dtype,
                           name="attn_ln")((out + hidden).astype(jnp.float32))
        return out.astype(self.dtype)


class BertQueryFfn(nn.Module):
    """Query-branch FFN: intermediate_query -> gelu -> output_query + post-LN."""

    intermediate_size: int
    dtype: Dtype
    param_dtype: Dtype
    weight_dtype: str = "bf16"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        dense = lambda f, n: maybe_quant_dense(
            self.weight_dtype, f, use_bias=True, dtype=self.dtype,
            param_dtype=self.param_dtype, kernel_init=trunc_normal(), name=n)
        h = dense(self.intermediate_size, "intermediate_query")(x)
        h = nn.gelu(h, approximate=False)
        h = dense(dim, "output_query")(h)
        h = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="ffn_ln")((h + x).astype(jnp.float32))
        return h.astype(self.dtype)


class QFormerLayer(nn.Module):
    num_heads: int
    intermediate_size: int
    has_cross_attention: bool
    dtype: Dtype
    param_dtype: Dtype
    weight_dtype: str = "bf16"

    @nn.compact
    def __call__(
        self,
        hidden: jnp.ndarray,
        encoder_states: Optional[jnp.ndarray],
        encoder_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        hidden = BertSelfAttention(self.num_heads, self.dtype, self.param_dtype,
                                   self.weight_dtype, name="attention")(hidden)
        if self.has_cross_attention:
            assert encoder_states is not None, "cross-attention layer needs image states"
            hidden = BertSelfAttention(self.num_heads, self.dtype, self.param_dtype,
                                       self.weight_dtype, name="crossattention")(
                                           hidden, kv=encoder_states, mask=encoder_mask)
        return BertQueryFfn(self.intermediate_size, self.dtype, self.param_dtype,
                            self.weight_dtype, name="ffn")(hidden)


class QFormer(nn.Module):
    """Query-only Q-Former encoder: (B, Q, 768) x (B, T, 1408) -> (B, Q, 768)."""

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    cross_attention_freq: int = 2
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    weight_dtype: str = "bf16"  # "int8" -> QuantDense serving twin

    @nn.compact
    def __call__(
        self,
        query_embeds: jnp.ndarray,
        encoder_states: jnp.ndarray,
        encoder_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        # embeddings module degenerates to LayerNorm (+dropout) on queries
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="embeddings_ln")(query_embeds.astype(jnp.float32))
        x = x.astype(self.dtype)
        if encoder_mask is not None and encoder_mask.ndim == 2:
            # (B, T) 1/0 -> additive (B, 1, 1, T)
            encoder_mask = (1.0 - encoder_mask[:, None, None, :]) * -1e4
        for i in range(self.num_layers):
            x = QFormerLayer(
                num_heads=self.num_heads,
                intermediate_size=self.intermediate_size,
                has_cross_attention=(i % self.cross_attention_freq == 0),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                weight_dtype=self.weight_dtype,
                name=f"layer_{i}",
            )(x, encoder_states.astype(self.dtype), encoder_mask)
        return x


def init_query_tokens(rng, num_query_token: int = 32, hidden_size: int = 768,
                      initializer_range: float = 0.02) -> jnp.ndarray:
    """Learned query embeddings (reference blip2.py:58-62)."""
    import jax

    return initializer_range * jax.random.normal(rng, (1, num_query_token, hidden_size))
