"""Autoregressive generation: prefill + ``lax.while_loop`` decode.

TPU-native replacement for HF ``generate`` + StoppingCriteria (reference
evaluation_aqa_dataset.py:268-301, conversation.py:96-121): the multimodal
prefix is prefilled once into a preallocated KV cache, then a single
compiled while-loop emits tokens until every row has produced a stop
sequence or ``max_new_tokens`` is reached.

Stop handling matches the reference protocol: '###' encodes as [835] or
[2277, 29937]; rows finish independently, finished rows emit ``pad_id``.
Sampling is greedy over fp32 logits by default (the reference pledges
greedy decoding, Readme.md:42; its shipped top_p=0.01 is ≈greedy); nucleus
sampling is available for API parity.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from myriad_tpu.models.llama import LlamaConfig, LlamaForCausalLM, init_cache


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 90
    eos_token_id: int = 2
    pad_token_id: int = 0
    # '###' stop ids (evaluation_aqa_dataset.py:268-270)
    stop_single: int = 835
    stop_pair: Tuple[int, int] = (2277, 29937)
    do_sample: bool = False
    top_p: float = 0.01
    temperature: float = 1.0


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _select_token(logits: jnp.ndarray, cfg: GenerationConfig, rng) -> jnp.ndarray:
    """logits: (B, V) fp32 -> (B,) int32."""
    if not cfg.do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.maximum(cfg.temperature, 1e-6)
    # nucleus: mask everything outside the smallest set with cumprob >= top_p
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while cumulative prob (excluding current) < top_p
    keep_sorted = (cum - probs) < cfg.top_p
    threshold = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    masked = jnp.where(logits >= threshold, logits, -jnp.inf)
    return jax.random.categorical(rng, masked, axis=-1).astype(jnp.int32)


def greedy_generate(
    model: LlamaForCausalLM,
    params,
    inputs_embeds: jnp.ndarray,
    *,
    config: Optional[GenerationConfig] = None,
    rng: Optional[jax.Array] = None,
    cache_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Generate from a dense prefix. inputs_embeds: (B, P, D), equal-length
    rows (the Myriad eval batches share one prompt template, so padding
    buckets are exact).  Returns (B, max_new_tokens) int32 token ids with
    ``pad_id`` after each row's stop."""
    cfg = config or GenerationConfig()
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    b, p, _ = inputs_embeds.shape
    max_len = _round_up(p + cfg.max_new_tokens, 128)
    cache = init_cache(model.config, b, max_len, cache_dtype)

    # --- prefill ---------------------------------------------------------
    logits, cache = model.apply(params, inputs_embeds, cache=cache)
    last = _select_token(logits[:, -1].astype(jnp.float32), cfg, rng)

    # --- decode loop ------------------------------------------------------
    def cond(state):
        step, _, _, done, _, _, _ = state
        return jnp.logical_and(step < cfg.max_new_tokens - 1, ~jnp.all(done))

    def body(state):
        step, last, prev, done, cache, tokens, rng = state
        tokens = tokens.at[:, step].set(jnp.where(done, cfg.pad_token_id, last))
        embeds = model.apply(params, last[:, None], method=LlamaForCausalLM.embed)
        logits, cache = model.apply(params, embeds, cache=cache)
        rng, sub = jax.random.split(rng)
        nxt = _select_token(logits[:, -1].astype(jnp.float32), cfg, sub)
        stopped = (
            (nxt == cfg.eos_token_id)
            | (nxt == cfg.stop_single)
            | ((last == cfg.stop_pair[0]) & (nxt == cfg.stop_pair[1]))
        )
        done = done | stopped
        return step + 1, nxt, last, done, cache, tokens, rng

    tokens = jnp.full((b, cfg.max_new_tokens), cfg.pad_token_id, jnp.int32)
    done0 = (last == cfg.eos_token_id) | (last == cfg.stop_single)
    state = (jnp.int32(0), last, jnp.full((b,), -1, jnp.int32), done0, cache, tokens, rng)
    step, last, prev, done, cache, tokens, rng = jax.lax.while_loop(cond, body, state)
    tokens = tokens.at[:, step].set(jnp.where(done, cfg.pad_token_id, last))
    return tokens


def decode_stop_trimmed(token_rows, tokenizer, cfg: Optional[GenerationConfig] = None):
    """Decode generated ids to text, trimming at '###'/eos like the
    reference's ``text.split('###')[0]`` post-processing."""
    cfg = cfg or GenerationConfig()
    outs = []
    import numpy as np

    for row in np.asarray(token_rows):
        ids = []
        prev = None
        for t in row.tolist():
            if t in (cfg.eos_token_id, cfg.stop_single, cfg.pad_token_id):
                break
            if prev == cfg.stop_pair[0] and t == cfg.stop_pair[1]:
                ids.pop()
                break
            ids.append(t)
            prev = t
        outs.append(tokenizer.decode(ids))
    return outs
