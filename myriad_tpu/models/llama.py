"""LLaMA (Vicuna-7B) decoder in flax with a functional KV cache.

Replaces the reference's HF fork (minigpt4/models/modeling_llama.py), whose
three deltas map here as:

* ``query_embeds``/multimodal prefix (modeling_llama.py:499-502) — the model
  natively takes ``inputs_embeds``; callers concatenate BOS/prefix/text
  embeddings before calling.
* clamped-CE fp16 NaN workaround (modeling_llama.py:695-729) — replaced by
  an fp32 cross-entropy island over bf16 activations (no clamps needed).
* ``prepare_inputs_for_generation`` embeds-first-step handling
  (modeling_llama.py:730-762) — generation is an explicit prefill +
  ``lax.while_loop`` decode over a preallocated KV cache
  (myriad_tpu/generation.py) instead of HF's Python loop.

Decode attention dispatches to a Pallas kernel on TPU
(myriad_tpu/ops/decode_attention.py) and to plain XLA elsewhere.

LoRA (q_proj/v_proj, reference myriad.py:170-178) is built into the
attention block behind ``config.use_lora``; LoRA params live under
``lora_a``/``lora_b`` so the trainable partition can select them by path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from myriad_tpu.models.layers import Dtype, merge_heads, split_heads

Cache = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: Optional[int] = None  # None -> MHA
    head_dim: Optional[int] = None
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    # LoRA finetuning (reference myriad.py:170-178: r=8, alpha=16, q/v only)
    use_lora: bool = False
    lora_rank: int = 8
    lora_alpha: int = 16
    lora_dropout: float = 0.05
    # frozen-projection storage: "bf16" (plain Dense), "int8" (weight-only
    # quant — halves decode HBM traffic) or "int4" (group-wise weight-only —
    # halves it again; ops/quant.py)
    weight_dtype: str = "bf16"
    # KV-cache storage: "bf16" or "int8" (per-token-per-head symmetric
    # quant — halves cache HBM traffic AND cache memory, the lever that
    # lets full-depth Vicuna serve at batch 16 on one v5e chip)
    kv_cache_dtype: str = "bf16"
    # rematerialize layer activations in the backward pass
    # (the reference's gradient-checkpointing flag, eva_vit.py:336-337 style)
    remat: bool = False
    # Pallas prefill attention (VMEM-resident scores) on the TPU cache
    # path; partitions per-(batch, head) under GSPMD meshes
    # (ops/prefill_attention.py custom_partitioning).
    flash_prefill: bool = True
    # per-row-frontier cache writes (serving engine / speculative rewind):
    # "auto" = Pallas in-place kernel on single-device TPU, XLA elsewhere
    # (ops/kv_write.py).  Sharded serving MUST pin an XLA impl ("vmap" /
    # "scatter") — the raw Pallas call has no GSPMD partitioning rule.
    kv_write_impl: str = "auto"

    @property
    def kv_heads(self) -> int:
        return self.num_kv_heads or self.num_heads

    @property
    def dims_per_head(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads

    @staticmethod
    def vicuna_7b(**overrides) -> "LlamaConfig":
        return dataclasses.replace(LlamaConfig(), **overrides)

    @staticmethod
    def tiny(**overrides) -> "LlamaConfig":
        base = LlamaConfig(
            vocab_size=128,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            max_position_embeddings=512,
        )
        return dataclasses.replace(base, **overrides)


class RMSNorm(nn.Module):
    eps: float
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig = x.dtype
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + self.eps)
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],), self.param_dtype)
        return (xf * w.astype(jnp.float32)).astype(orig)


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for HF-convention rotary embeddings.

    positions: (B, T) int32 -> (B, T, head_dim) fp32 each; the half-split
    frequencies are repeated to fill head_dim like HF's rotate_half layout.
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, H, D); cos/sin: (B, T, D)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    return x * cos + rotated * sin


class QuantDense(nn.Module):
    """Int8 weight-only Dense: params {w_int8 (in,out), scale (out,)}."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from myriad_tpu.ops.quant import int8_matmul

        d = x.shape[-1]
        w8 = self.param("w_int8", nn.initializers.zeros, (d, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        return int8_matmul(x.astype(self.dtype), w8, scale, out_dtype=self.dtype)


class Quant4Dense(nn.Module):
    """Int4 group-wise weight-only Dense: params {w_int4 (in//2, out) uint8,
    scale (in//g, out) fp32} — halves int8's decode HBM traffic again
    (ops/quant.py int4 section)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from myriad_tpu.ops.quant import int4_group, int4_matmul

        d = x.shape[-1]
        w4 = self.param("w_int4", nn.initializers.zeros,
                        (d // 2, self.features), jnp.uint8)
        # named 'scale4' (not 'scale') so sharding rules can tell the 2-D
        # (groups, out) int4 layout from int8's 1-D (out,) by path alone
        scale = self.param("scale4", nn.initializers.ones,
                           (d // int4_group(d), self.features), jnp.float32)
        return int4_matmul(x.astype(self.dtype), w4, scale, out_dtype=self.dtype)


def _proj(config: LlamaConfig, features: int, dtype, param_dtype, name: str):
    """Frozen projection: plain Dense or a quantized serving twin."""
    if config.weight_dtype == "int8":
        return QuantDense(features, dtype=dtype, name=name)
    if config.weight_dtype == "int4":
        return Quant4Dense(features, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=False, dtype=dtype,
                    param_dtype=param_dtype, name=name)


class LoraDense(nn.Module):
    """Dense + optional low-rank update: y = xW + (alpha/r) * x A B."""

    features: int
    config: LlamaConfig
    use_bias: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.config.weight_dtype == "int8" and not self.use_bias:
            y = QuantDense(self.features, dtype=self.dtype, name="base")(x)
        elif self.config.weight_dtype == "int4" and not self.use_bias:
            y = Quant4Dense(self.features, dtype=self.dtype, name="base")(x)
        else:
            y = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="base")(x)
        if self.config.use_lora:
            cfg = self.config
            a = nn.Dense(cfg.lora_rank, use_bias=False, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         kernel_init=nn.initializers.he_uniform(), name="lora_a")
            b = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         kernel_init=nn.initializers.zeros, name="lora_b")
            h = x
            if cfg.lora_dropout > 0 and not deterministic:
                h = nn.Dropout(cfg.lora_dropout)(h, deterministic=False)
            y = y + b(a(h)) * (cfg.lora_alpha / cfg.lora_rank)
        return y


class LlamaAttention(nn.Module):
    config: LlamaConfig
    dtype: Dtype
    param_dtype: Dtype

    @nn.compact
    def __call__(
        self,
        hidden: jnp.ndarray,
        positions: jnp.ndarray,
        mask: Optional[jnp.ndarray],
        cache: Optional[Cache] = None,
        deterministic: bool = True,
        positional_only: bool = False,
        kv_limit: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, Optional[Cache]]:
        cfg = self.config
        b, t, _ = hidden.shape
        h, hk, d = cfg.num_heads, cfg.kv_heads, cfg.dims_per_head
        dense = lambda feats, name: _proj(cfg, feats, self.dtype, self.param_dtype, name)
        q = LoraDense(h * d, cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                      name="q_proj")(hidden, deterministic)
        k = dense(hk * d, "k_proj")(hidden)
        v = LoraDense(hk * d, cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                      name="v_proj")(hidden, deterministic)

        q = q.reshape(b, t, h, d)
        k = k.reshape(b, t, hk, d)
        v = v.reshape(b, t, hk, d)

        cos, sin = rope_cos_sin(positions, d, cfg.rope_theta)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        # head-major layout (B, H, T, D): cache updates touch only the new
        # slice, so decode steps never transpose the full cache
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        new_cache = None
        k_sc = v_sc = None
        if cache is not None:
            # preallocated (B, Hk, Tmax, D) buffers; write at cache["index"]
            # — a scalar in plain decode, or a (B,) vector when rows advance
            # independently (speculative decoding's per-row acceptance).
            # A FRESH cache (write index still the trace-time-concrete 0
            # that init_cache created) is built by zero-PADDING the new
            # slice instead of updating a zeros buffer: the pad has a single
            # producer, so XLA never materializes a second full-cache copy
            # during prefill (measured ~1.3 GiB of temp at 7B/batch 16).
            # Once the index is a traced loop-carry (or any nonzero), the
            # in-place dynamic_update_slice path runs as before.
            idx = cache["index"]
            fresh = (
                not isinstance(idx, jax.core.Tracer)
                and getattr(idx, "ndim", 1) == 0
                and int(idx) == 0
            )
            max_t = cache["k"].shape[2]

            def write(buf, upd):
                upd = upd.astype(buf.dtype)
                if fresh:
                    return jnp.pad(
                        upd, [(0, 0), (0, 0), (0, max_t - upd.shape[2]), (0, 0)]
                    )
                if getattr(idx, "ndim", 0) == 1:
                    from myriad_tpu.ops import kv_write

                    if idx.shape[0] != buf.shape[0]:
                        # per-BLOCK frontiers (serving engine block KV
                        # layout): contiguous row blocks share a scalar
                        # start — G in-place dus ops, no pool rewrite
                        return kv_write.kv_cache_write_blocks(buf, upd, idx)
                    # per-row frontiers (speculative rewind / legacy
                    # engine mode): route through ops/kv_write — XLA's own
                    # lowering rewrites the WHOLE pool per step (~10 GB of
                    # HBM traffic at 48 slots; kv_write.py docstring)
                    return kv_write.kv_cache_write(
                        buf, upd, idx, impl=None
                        if cfg.kv_write_impl == "auto" else cfg.kv_write_impl)
                return jax.lax.dynamic_update_slice(buf, upd, (0, 0, idx, 0))

            if "k_scale" in cache:
                # int8 KV: symmetric per-(batch, head, position) quant at
                # write; the cache is NEVER dequantized as a tensor — the
                # scales ride into mha and fold into the (small) attention
                # logits/probs, so KV streams from HBM at int8 width
                k8, ks = quantize_kv(k)
                v8, vs = quantize_kv(v)
                ck, cv = write(cache["k"], k8), write(cache["v"], v8)
                cks = write(cache["k_scale"], ks)
                cvs = write(cache["v_scale"], vs)
                new_cache = {"k": ck, "v": cv, "k_scale": cks, "v_scale": cvs,
                             "index": idx + t}
                k_all, v_all = ck, cv
                k_sc, v_sc = cks, cvs
            else:
                ck, cv = write(cache["k"], k), write(cache["v"], v)
                new_cache = {"k": ck, "v": cv, "index": idx + t}
                k_all, v_all = ck, cv
        else:
            k_all, v_all = k, v

        if cache is not None and kv_limit is not None and kv_limit < cache["k"].shape[2]:
            # staged decode (generation.GenerationConfig.staged_decode): every
            # position >= the stage's static kv_limit is masked anyway (the
            # write frontier is < kv_limit by stage construction), so attention
            # reads only the leading kv_limit slice of the cache — XLA fuses
            # the prefix slice into the dots, cutting decode-step KV streaming
            # by the invalid tail instead of streaming the full bucket.  The
            # cache CARRY stays full-size (new_cache above is unsliced).
            k_all = k_all[:, :, :kv_limit]
            v_all = v_all[:, :, :kv_limit]
            if k_sc is not None:
                k_sc = k_sc[:, :, :kv_limit]
                v_sc = v_sc[:, :, :kv_limit]

        if hk != h:
            rep = h // hk
            k_all = jnp.repeat(k_all, rep, axis=1)
            v_all = jnp.repeat(v_all, rep, axis=1)
            if k_sc is not None:
                k_sc = jnp.repeat(k_sc, rep, axis=1)
                v_sc = jnp.repeat(v_sc, rep, axis=1)

        from myriad_tpu.ops import prefill_attention as fa
        from myriad_tpu.ops.attention import mha

        use_flash = (
            cfg.flash_prefill
            and cache is not None
            and positional_only
            and t > 1
            and fa.supported(t, k_all.shape[2], d)
            and jax.devices()[0].platform == "tpu"
        )
        if use_flash:
            # chunked prefill / speculative verify: scores, causal mask and
            # softmax stay in VMEM (ops/prefill_attention.py)
            out = fa.prefill_attention(
                q, k_all, v_all, positions, scale=d**-0.5,
                k_scale=k_sc, v_scale=v_sc,
            )
        else:
            out = mha(
                q,
                k_all if k_sc is not None else k_all.astype(q.dtype),
                v_all if v_sc is not None else v_all.astype(q.dtype),
                mask=mask,
                scale=d**-0.5,
                k_scale=k_sc,
                v_scale=v_sc,
            )
        out = merge_heads(out)
        out = dense(cfg.hidden_size, "o_proj")(out)
        return out, new_cache


class LlamaMlp(nn.Module):
    config: LlamaConfig
    dtype: Dtype
    param_dtype: Dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        dense = lambda feats, name: _proj(cfg, feats, self.dtype, self.param_dtype, name)
        gate = dense(cfg.intermediate_size, "gate_proj")(x)
        up = dense(cfg.intermediate_size, "up_proj")(x)
        return dense(cfg.hidden_size, "down_proj")(nn.silu(gate) * up)


class LlamaLayer(nn.Module):
    config: LlamaConfig
    dtype: Dtype
    param_dtype: Dtype

    @nn.compact
    def __call__(self, hidden, positions, mask, cache=None, deterministic=True,
                 positional_only=False, kv_limit=None):
        cfg = self.config
        h, new_cache = LlamaAttention(cfg, self.dtype, self.param_dtype, name="self_attn")(
            RMSNorm(cfg.rms_norm_eps, self.param_dtype, name="input_layernorm")(hidden),
            positions, mask, cache, deterministic, positional_only, kv_limit,
        )
        hidden = hidden + h
        h = LlamaMlp(cfg, self.dtype, self.param_dtype, name="mlp")(
            RMSNorm(cfg.rms_norm_eps, self.param_dtype, name="post_attention_layernorm")(hidden)
        )
        return hidden + h, new_cache


class LlamaModel(nn.Module):
    """Decoder stack over ``inputs_embeds`` (multimodal-prefix friendly)."""

    config: LlamaConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
            param_dtype=self.param_dtype, name="embed_tokens",
        )
        layer_cls = (
            nn.remat(LlamaLayer, static_argnums=(5, 6, 7)) if cfg.remat else LlamaLayer
        )
        self.layers = [
            layer_cls(cfg, self.dtype, self.param_dtype, name=f"layers_{i}")
            for i in range(cfg.num_layers)
        ]
        self.norm = RMSNorm(cfg.rms_norm_eps, self.param_dtype, name="norm")

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.embed_tokens(input_ids)

    def __call__(
        self,
        inputs_embeds: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        positions: Optional[jnp.ndarray] = None,
        cache: Optional[Tuple[Cache, ...]] = None,
        deterministic: bool = True,
        kv_limit: Optional[int] = None,
        storage_positions: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Optional[Tuple[Cache, ...]]]:
        """attention_mask: (B, T_kv) 1/0 over key positions (incl. cache).

        ``kv_limit`` (static int): attend only over cache positions
        < kv_limit — exact whenever the write frontier stays below it
        (staged decode streams the valid cache prefix, not the bucket).

        ``storage_positions`` (B, T): the causal-mask bound, when cache
        STORAGE columns differ from logical token positions — the serving
        engine's block KV layout stores rows right-padded to a shared
        block frontier, so a token's column exceeds its RoPE position and
        the default ``k_pos <= positions`` predicate would cut off valid
        entries.  ``positions`` keeps feeding RoPE (logical); the bound
        runs over storage columns.  Callers supplying it must also pass
        ``attention_mask`` marking the real (non-hole) columns.

        Returns final hidden states (B, T, D) and updated caches.
        """
        b, t, _ = inputs_embeds.shape
        if cache is not None:
            kv_len = cache[0]["k"].shape[2]
            if kv_limit is not None:
                kv_len = min(kv_len, int(kv_limit))
            start = cache[0]["index"]
        else:
            kv_len = t
            start = 0

        if positions is None:
            arange = jnp.arange(t, dtype=jnp.int32)
            if getattr(start, "ndim", 0) == 1:  # per-row cache indices
                positions = start[:, None] + arange[None, :]
            else:
                positions = jnp.broadcast_to(start + arange[None, :], (b, t))

        # additive mask (B, 1, T, T_kv): causal w.r.t. each query's absolute
        # position.  With a cache this single predicate also excludes every
        # slot at/after the write frontier (cache entries live at positions
        # < the query's), so stale entries from a speculative rollback are
        # never attended to.  Combined with the optional key-padding mask.
        k_pos = jnp.arange(kv_len, dtype=jnp.int32)
        bound = positions if storage_positions is None else storage_positions
        allowed = k_pos[None, None, None, :] <= bound[:, None, :, None]
        if attention_mask is not None:
            key_ok = attention_mask[:, None, None, :].astype(bool)
            allowed = jnp.logical_and(allowed, key_ok)
        mask = jnp.where(allowed, 0.0, -1e9).astype(jnp.float32)

        hidden = inputs_embeds.astype(self.dtype)
        positional_only = attention_mask is None
        new_caches = [] if cache is not None else None
        for i, layer in enumerate(self.layers):
            layer_cache = cache[i] if cache is not None else None
            hidden, nc = layer(hidden, positions, mask, layer_cache, deterministic,
                               positional_only, kv_limit)
            if new_caches is not None:
                new_caches.append(nc)
        hidden = self.norm(hidden)
        return hidden, (tuple(new_caches) if new_caches is not None else None)


class LlamaForCausalLM(nn.Module):
    config: LlamaConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.model = LlamaModel(self.config, self.dtype, self.param_dtype, name="model")
        self.lm_head = self.param(
            "lm_head",
            nn.initializers.normal(0.02),
            (self.config.hidden_size, self.config.vocab_size),
            self.param_dtype,
        )

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.model.embed(input_ids)

    def logits(self, hidden: jnp.ndarray) -> jnp.ndarray:
        # fp32 accumulation at the sampling point (greedy bit-parity island)
        return jnp.dot(
            hidden, self.lm_head.astype(hidden.dtype), preferred_element_type=jnp.float32
        )

    def prefill(
        self,
        inputs_embeds: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        cache: Optional[Tuple[Cache, ...]] = None,
        last_index=None,
    ):
        """Prefill returning logits for the LAST position only.

        Generation never reads the other positions; materializing the full
        (B, P, vocab) fp32 logits costs ~0.5 GiB + 0.5 TFLOP per 32-image
        batch at Vicuna scale for nothing.

        ``last_index`` (traced int scalar, or a (B,) vector for per-row
        valid lengths — the serving engine's batched admission) selects a
        different single column instead — continue_generate's right-padded
        delta reads its logits at the last VALID column, not the last pad
        column.
        """
        hidden, new_cache = self.model(inputs_embeds, attention_mask, cache=cache)
        if last_index is not None:
            li = jnp.asarray(last_index, jnp.int32)
            if li.ndim == 1:
                hidden = jnp.take_along_axis(hidden, li[:, None, None], axis=1)
            else:
                hidden = jax.lax.dynamic_slice_in_dim(hidden, li, 1, axis=1)
        else:
            hidden = hidden[:, -1:]
        return self.logits(hidden), new_cache

    def __call__(
        self,
        inputs_embeds: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        positions: Optional[jnp.ndarray] = None,
        cache: Optional[Tuple[Cache, ...]] = None,
        deterministic: bool = True,
        input_ids: Optional[jnp.ndarray] = None,
        kv_limit: Optional[int] = None,
        storage_positions: Optional[jnp.ndarray] = None,
    ):
        if inputs_embeds is None:
            inputs_embeds = self.embed(input_ids)
        hidden, new_cache = self.model(
            inputs_embeds, attention_mask, positions, cache, deterministic,
            kv_limit, storage_positions
        )
        return self.logits(hidden), new_cache

    def init_params(self, rng):
        """Initialize the complete parameter tree (embeddings included)."""
        ids = jnp.zeros((1, 4), jnp.int32)
        return self.init(rng, input_ids=ids)


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 over the head dim: x (B,H,T,D) -> (x8, scale (B,H,T,1))."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return x8, scale.astype(jnp.float32)


def serving_cache_dtype(config: LlamaConfig, compute_dtype):
    """The serving KV dtype rule: int8 when the arch knob asks for it
    (halves the cache and streams it at int8 width), else the compute
    dtype.  The single source of truth for Myriad.generate, Chat, and
    bench — a new cache dtype only needs wiring here."""
    return "int8" if config.kv_cache_dtype == "int8" else compute_dtype


def init_cache(config: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> Tuple[Cache, ...]:
    """Preallocated per-layer KV buffers, head-major (B, Hk, Tmax, D).

    ``dtype`` may be the string "int8" (or jnp.int8) for a quantized cache:
    int8 payloads plus fp32 per-(batch, head, position) scales.
    """
    shape = (batch, config.kv_heads, max_len, config.dims_per_head)
    if dtype in ("int8", jnp.int8):
        # scales store fp16 (they are cast to fp32 at the logits/probs
        # multiply): fp16's 2^-11 relative grid is far below the int8
        # payload's own quantization error, and the buffers are
        # per-(b,h,t) x 2 x layers — ~120 MiB at 7B/batch 28
        sshape = shape[:-1] + (1,)
        return tuple(
            {
                "k": jnp.zeros(shape, jnp.int8),
                "v": jnp.zeros(shape, jnp.int8),
                "k_scale": jnp.zeros(sshape, jnp.float16),
                "v_scale": jnp.zeros(sshape, jnp.float16),
                "index": jnp.int32(0),
            }
            for _ in range(config.num_layers)
        )
    return tuple(
        {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype), "index": jnp.int32(0)}
        for _ in range(config.num_layers)
    )


def lm_cross_entropy(
    logits: jnp.ndarray, targets: jnp.ndarray, ignore_index: int = -100
) -> jnp.ndarray:
    """Shifted LM loss with -100 masking, fp32 (reference clamp-CE replacement).

    logits: (B, T, V); targets: (B, T) with ignore_index on masked prefix.
    """
    logits = logits[:, :-1].astype(jnp.float32)
    labels = targets[:, 1:]
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)
