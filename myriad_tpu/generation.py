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
    # split the prefill into N sequential lax.scan chunks: per-chunk
    # activation temps shrink ~N-fold and the scanned cache carry forces
    # XLA to reuse one buffer set across chunks — the batch-28/32 OOM at
    # 7B scale is prefill-temp-bound (tools/memprobe.py attribution).
    # Token-exact for ANY N and ANY prefix length (positions/causality are
    # index-based): the prefix runs as ceil(p/N)-token chunks with a
    # trailing remainder chunk — no divisibility requirement (_prefill).
    prefill_chunks: int = 1
    # KV-bucket rounding.  32 (default) keeps the bucket tile-aligned for
    # the row-grid decode-attention kernel (ops/decode_attention.py
    # rows_supported) so it never pad-copies the cache; the int8 cache
    # payload tiles pad T to 32-multiples anyway, so the only cost vs 16
    # is ≤16 masked positions of KV streaming per step.
    cache_granularity: int = 32
    # Staged decode: run the decode loop as a few sequential while_loops,
    # each attending only over the statically-sliced valid cache prefix
    # (rounded up to cache_granularity) instead of the full bucket.  Every
    # sliced-off position is mask-excluded anyway (the write frontier stays
    # below each stage's limit by construction), so tokens are unchanged;
    # decode-step KV streaming shrinks by the invalid tail (~14% of KV
    # bytes at the b48 serving point, where decode sits at ~88% of the
    # measured HBM ceiling — BENCH_NOTES r3b).  Applies to both the greedy
    # loop and speculative verify rounds (round r touches positions
    # < p + r*(K+1), so span `lim` safely runs (lim-p)//(K+1) rounds).
    staged_decode: bool = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _chunk_count(p: int, want: int) -> int:
    """Number of sequential prefill steps for a p-token prefix when `want`
    chunks are requested: chunks are ceil(p/want) tokens wide, so the
    effective step count is ceil(p / ceil(p/want)) — works for ANY p
    (no divisibility requirement; a short remainder chunk runs last)."""
    want = max(int(want), 1)
    if want <= 1 or p <= 1:
        return 1
    csz = -(-p // min(want, p))
    return -(-p // csz)


def _prefill(model, params, inputs_embeds, cache, n_chunks: int):
    """Prefill the cache, optionally in sequential scan chunks.

    Returns (last_position_logits, cache).  Chunking divides the live
    activation temps by ~n_chunks (each scan step reuses one buffer set)
    at the cost of re-streaming the weights once per chunk — decisive for
    batch 28+ at 7B scale where prefill temps are the OOM margin.

    Any prefix length is supported exactly: the prefix is split into
    ceil(p/n)-token chunks scanned sequentially, with a trailing
    remainder chunk (its own prefill call) when p isn't divisible —
    prefill is causal, so any sequential split is token-exact.
    """
    b, p, d = inputs_embeds.shape
    n = max(int(n_chunks), 1)
    if n <= 1 or p <= 1 or _chunk_count(p, n) <= 1:
        logits, cache = model.apply(params, inputs_embeds, cache=cache,
                                    method=LlamaForCausalLM.prefill)
        return logits, cache
    csz = -(-p // min(n, p))       # ceil: per-chunk width
    k, r = divmod(p, csz)          # k full chunks + r-token remainder

    def step(cache, chunk):
        logits, cache = model.apply(params, chunk, cache=cache,
                                    method=LlamaForCausalLM.prefill)
        return cache, logits

    if k >= 2:
        chunks = (inputs_embeds[:, :k * csz]
                  .reshape(b, k, csz, d).transpose(1, 0, 2, 3))
        cache, logits = jax.lax.scan(step, cache, chunks)
        last = logits[-1]
    else:
        last, cache = model.apply(params, inputs_embeds[:, :k * csz],
                                  cache=cache,
                                  method=LlamaForCausalLM.prefill)
    if r:
        last, cache = model.apply(params, inputs_embeds[:, k * csz:],
                                  cache=cache,
                                  method=LlamaForCausalLM.prefill)
    return last, cache


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


def _decode_loop(model, params, cfg: GenerationConfig, last, cache, rng,
                 stages):
    """The shared greedy/sampled decode while-loop.

    ``stages``: list of ``(kv_limit, stage_end)`` — each pair runs one
    ``lax.while_loop`` whose body attends only over cache positions
    < ``kv_limit`` (None = the full bucket) until ``step == stage_end``.
    Loop step s writes the cache at its current frontier and attends over
    everything written so far, so a stage is token-exact whenever its
    write frontier stays below ``kv_limit`` (staged decode partitions the
    steps at cache_granularity boundaries on that invariant).  Stop
    handling matches the reference protocol ('###' single/pair ids, rows
    finish independently, finished rows emit pad).  Returns
    ``(tokens, cache)`` with decode-time cache writes included.
    """
    b = last.shape[0]

    def make_body(kv_limit):
        def body(state):
            step, last, done, cache, tokens, rng = state
            tokens = tokens.at[:, step].set(jnp.where(done, cfg.pad_token_id, last))
            embeds = model.apply(params, last[:, None], method=LlamaForCausalLM.embed)
            logits, cache = model.apply(params, embeds, cache=cache,
                                        kv_limit=kv_limit)
            rng, sub = jax.random.split(rng)
            nxt = _select_token(logits[:, -1].astype(jnp.float32), cfg, sub)
            stopped = (
                (nxt == cfg.eos_token_id)
                | (nxt == cfg.stop_single)
                | ((last == cfg.stop_pair[0]) & (nxt == cfg.stop_pair[1]))
            )
            done = done | stopped
            return step + 1, nxt, done, cache, tokens, rng

        return body

    def make_cond(stage_end):
        def cond(state):
            step, _, done, _, _, _ = state
            return jnp.logical_and(step < stage_end, ~jnp.all(done))

        return cond

    tokens = jnp.full((b, cfg.max_new_tokens), cfg.pad_token_id, jnp.int32)
    done0 = (last == cfg.eos_token_id) | (last == cfg.stop_single)
    state = (jnp.int32(0), last, done0, cache, tokens, rng)
    for kv_limit, stage_end in stages:
        state = jax.lax.while_loop(make_cond(stage_end), make_body(kv_limit),
                                   state)
    step, last, done, cache, tokens, rng = state
    tokens = tokens.at[:, step].set(jnp.where(done, cfg.pad_token_id, last))
    return tokens, cache


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
    max_len = _round_up(p + cfg.max_new_tokens, cfg.cache_granularity)
    cache = init_cache(model.config, b, max_len, cache_dtype)

    # --- prefill (last-position logits only) ------------------------------
    logits, cache = _prefill(model, params, inputs_embeds, cache,
                             cfg.prefill_chunks)
    last = _select_token(logits[:, -1].astype(jnp.float32), cfg, rng)

    # --- decode loop ------------------------------------------------------
    # staged decode partitions the steps at cache_granularity boundaries
    # and runs each span with a static kv_limit (llama.py slices the cache
    # reads; every excluded position is mask-dead, tokens unchanged).
    if cfg.staged_decode:
        g = cfg.cache_granularity
        limits = list(range(_round_up(p + 2, g), max_len + 1, g)) or [max_len]
        limits[-1] = max_len
    else:
        limits = [max_len]
    stages = [(lim, min(lim - p, cfg.max_new_tokens - 1)) for lim in limits]

    tokens, _ = _decode_loop(model, params, cfg, last, cache, rng, stages)
    return tokens


def continue_generate(
    model: LlamaForCausalLM,
    params,
    new_embeds: jnp.ndarray,
    cache,
    *,
    config: Optional[GenerationConfig] = None,
    rng: Optional[jax.Array] = None,
    valid_len: Optional[jax.Array] = None,
):
    """Generate from a cache that already holds earlier-prompt KV.

    The incremental chat primitive (conversation.Chat): ``new_embeds``
    (B, T_new, D) is prefilled at the cache's current write frontier —
    positions and causal masks derive from the cache ``index``, so this is
    token-exact vs prefilling the whole concatenated prompt at once
    (tested in test_generation_invariance) — then the decode loop runs.
    Per turn, prefill cost drops from O(full history) to O(new segment);
    the reference re-runs HF generate over the entire concatenated
    conversation every turn (conversation.py:215-229).

    ``valid_len`` (traced int scalar) marks the first ``valid_len`` columns
    of ``new_embeds`` as the real delta and the rest as right-padding, so
    one compiled program serves every turn whose delta fits the padded
    width: the first token reads the logits at column valid_len-1, and the
    write frontier rewinds to start+valid_len so decode overwrites the pad
    slots before the causal mask ever admits them (pad K/V land at slots
    >= the rewound frontier, which every mask excludes until they are
    overwritten).  Requires prefill_chunks == 1 (the valid column must be
    in the one logits chunk).

    Returns ``(tokens, prompt_cache)`` where ``prompt_cache`` is the cache
    AFTER the prefill but BEFORE any decode writes: its frontier marks the
    end of the prompt, so the caller can extend the conversation next turn
    without decode-time scratch entries poisoning the prefix (the next
    turn's prefill overwrites slots past the returned frontier).

    The caller sizes the cache: frontier + T_new + max_new_tokens must fit
    the bucket.  Decode here is UNSTAGED (staged spans need a static
    frontier; chat frontiers are traced loop state), which also keeps one
    compiled program valid for every turn at a given (T_new, bucket) shape.
    """
    cfg = config or GenerationConfig()
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    b = new_embeds.shape[0]
    assert cache[0]["k"].shape[0] == b, "cache batch mismatch"
    if valid_len is not None:
        assert _chunk_count(new_embeds.shape[1], cfg.prefill_chunks) == 1, (
            "valid_len needs a single-chunk prefill (the valid column's "
            "hidden state must be in the one prefill call)")
        vl = jnp.asarray(valid_len, jnp.int32)
        start = cache[0]["index"]
        logits, cache = model.apply(params, new_embeds, cache=cache,
                                    last_index=vl - 1,
                                    method=LlamaForCausalLM.prefill)
        last_logits = logits[:, -1]
        cache = tuple(dict(c, index=start + vl) for c in cache)
    else:
        logits, cache = _prefill(model, params, new_embeds, cache,
                                 cfg.prefill_chunks)
        last_logits = logits[:, -1]
    prompt_cache = cache
    last = _select_token(last_logits.astype(jnp.float32), cfg, rng)

    stages = [(None, cfg.max_new_tokens - 1)]
    tokens, _ = _decode_loop(model, params, cfg, last, cache, rng, stages)
    return tokens, prompt_cache


def speculative_generate(
    model: LlamaForCausalLM,
    params,
    inputs_embeds: jnp.ndarray,
    *,
    config: Optional[GenerationConfig] = None,
    spec_k: int = 4,
    lookup_ids: Optional[jnp.ndarray] = None,
    oracle_drafts: Optional[jnp.ndarray] = None,
    cache_dtype=jnp.bfloat16,
    return_stats: bool = False,
    cache=None,
    valid_len: Optional[jax.Array] = None,
    return_cache: bool = False,
) -> jnp.ndarray:
    """Greedy generation with self-speculative decoding — transcript-exact.

    Decode on one chip is bound by streaming the frozen weights per token;
    verifying ``spec_k`` drafted tokens in one forward pass reads the
    weights ONCE for up to ``spec_k + 1`` emitted tokens.  Drafts come from
    an n-gram lookup over the row's own generated tokens plus the optional
    ``lookup_ids`` prompt corpus (prompt-lookup decoding: anomaly-QA
    transcripts are highly templated, so 2-gram continuations hit often);
    ``oracle_drafts`` (B, >=max_new_tokens) bypasses the lookup and is used
    by tests/benchmarks to pin the acceptance rate at 100%.

    Every emitted token is verified greedy-argmax — output is bit-identical
    to ``greedy_generate`` (tested), rows accept independently (the KV
    cache carries per-row write indices; stale entries from a rollback are
    masked by position-causality, llama.py mask note).

    ``return_stats=True`` additionally returns a dict of int32 scalars
    measured on device: ``accepted`` (draft tokens verified correct over
    active rows), ``drafted`` (draft tokens proposed over active rows) and
    ``rounds`` (verify weight passes) — acceptance rate =
    accepted/drafted, the number that places real serving between the
    n-gram floor and the oracle bound (BENCH_NOTES acceptance curve).

    Continuation mode (incremental chat): pass ``cache`` holding
    earlier-prompt KV and ``inputs_embeds`` as the new prompt delta —
    optionally right-padded with its true width in ``valid_len``, exactly
    like ``continue_generate`` — and the spec loop decodes from the
    resident prefix.  ``return_cache=True`` additionally returns the
    post-prefill/pre-decode cache for the next turn.  The caller's bucket
    must hold frontier + T_new + max_new + spec_k + 1 (a verify round
    writes K+1 positions past an active row's frontier; the fresh-cache
    path sizes this in automatically).
    """
    cfg = config or GenerationConfig()
    assert not cfg.do_sample, "speculative decoding is greedy-only"
    K = int(spec_k)
    assert K >= 1
    b, t_in, _ = inputs_embeds.shape
    max_new = cfg.max_new_tokens

    if cache is None:
        p = t_in  # static: enables staged spec limits
        max_len = _round_up(p + max_new + K + 1, cfg.cache_granularity)
        cache = init_cache(model.config, b, max_len, cache_dtype)
        # --- prefill (scalar write index, rows aligned) -------------------
        logits, cache = _prefill(model, params, inputs_embeds, cache,
                                 cfg.prefill_chunks)
        start = jnp.int32(p)
        prompt_cache = None
    else:
        assert cache[0]["k"].shape[0] == b, "cache batch mismatch"
        p = None  # dynamic frontier: unstaged only
        max_len = cache[0]["k"].shape[2]
        start0 = jnp.asarray(cache[0]["index"], jnp.int32)
        if valid_len is not None:
            assert _chunk_count(t_in, cfg.prefill_chunks) == 1, (
                "valid_len needs a single-chunk prefill")
            vl = jnp.asarray(valid_len, jnp.int32)
            logits, cache = model.apply(params, inputs_embeds, cache=cache,
                                        last_index=vl - 1,
                                        method=LlamaForCausalLM.prefill)
            start = start0 + vl
        else:
            logits, cache = _prefill(model, params, inputs_embeds, cache,
                                     cfg.prefill_chunks)
            start = start0 + t_in
        cache = tuple(dict(c, index=start) for c in cache)
        prompt_cache = cache
    last = jnp.argmax(logits[:, -1].astype(jnp.float32), axis=-1).astype(jnp.int32)
    # switch to per-row write indices for ragged acceptance
    start_rows = jnp.zeros((b,), jnp.int32) + start
    cache = tuple(dict(c, index=start_rows) for c in cache)

    buf_len = max_new + K + 1  # slack so the last window never clips
    tokens = jnp.full((b, buf_len), cfg.pad_token_id, jnp.int32)
    if lookup_ids is not None:
        lookup_ids = jnp.broadcast_to(
            jnp.asarray(lookup_ids, jnp.int32),
            (b, jnp.asarray(lookup_ids).shape[-1]),
        )
    lp = 0 if lookup_ids is None else lookup_ids.shape[1]
    if oracle_drafts is not None:
        oracle_drafts = jnp.pad(
            jnp.asarray(oracle_drafts, jnp.int32), [(0, 0), (0, K + 1)]
        )

    done0 = (last == cfg.eos_token_id) | (last == cfg.stop_single)
    state = dict(
        length=start_rows,                     # valid context fed so far
        n_emit=jnp.zeros((b,), jnp.int32),     # output tokens written
        last=last,
        prev=jnp.full((b,), -1, jnp.int32),    # token before `last` (2-gram)
        done=done0,
        cache=cache,
        tokens=tokens,
        accepted=jnp.int32(0),                 # verified draft tokens (active rows)
        drafted=jnp.int32(0),                  # proposed draft tokens (active rows)
        rounds=jnp.int32(0),                   # verify weight passes
    )

    def draft_tokens(st):
        if oracle_drafts is not None:
            # `last` is output token #n_emit, so drafts continue at #n_emit+1
            idx = (st["n_emit"] + 1)[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
            return jnp.take_along_axis(oracle_drafts, idx, axis=1)
        corpus = (
            st["tokens"] if lookup_ids is None
            else jnp.concatenate([lookup_ids, st["tokens"]], axis=1)
        )
        L = corpus.shape[1]
        pos = jnp.arange(L, dtype=jnp.int32)[None, :]
        cur = st["n_emit"] + lp  # per-row filled corpus length
        # most recent 2-gram (prev,last) match, falling back to 1-gram(last)
        nxt = jnp.concatenate(
            [corpus[:, 1:], jnp.full((b, 1), -2, jnp.int32)], axis=1
        )
        m2 = (corpus == st["prev"][:, None]) & (nxt == st["last"][:, None]) & (
            pos + 1 < cur[:, None]
        )
        m1 = (corpus == st["last"][:, None]) & (pos < cur[:, None])
        j2 = jnp.max(jnp.where(m2, pos, -1), axis=1)
        j1 = jnp.max(jnp.where(m1, pos, -1), axis=1)
        start = jnp.where(j2 >= 0, j2 + 2, j1 + 1)  # first token of the draft
        idx = jnp.clip(start[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :],
                       0, L - 1)
        return jnp.take_along_axis(corpus, idx, axis=1)

    def make_cond(max_rounds):
        def cond(st):
            live = ~jnp.all(st["done"])
            if max_rounds is None:
                return live
            return jnp.logical_and(live, st["rounds"] < max_rounds)

        return cond

    def make_body(kv_limit):
        def body(st):
            # drafts are only PROPOSALS; clamp into the vocab so an
            # out-of-range id (user-supplied oracle, corrupted corpus) can't
            # produce NaN embeddings (jnp.take fills OOB gathers) that poison
            # the verify pass
            draft = jnp.clip(draft_tokens(st), 0, model.config.vocab_size - 1)
            feed = jnp.concatenate([st["last"][:, None], draft], axis=1)  # (B, K+1)
            positions = st["length"][:, None] + jnp.arange(K + 1, dtype=jnp.int32)[None, :]
            embeds = model.apply(params, feed, method=LlamaForCausalLM.embed)
            logits, cache = model.apply(
                params, embeds, positions=positions, cache=st["cache"],
                kv_limit=kv_limit,
            )
            g = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)  # (B, K+1)
            chain = jnp.concatenate([st["last"][:, None], g], axis=1)  # (B, K+2)
            # accepted = leading drafts that match the model's own greedy tokens
            match = feed[:, 1:] == g[:, :-1]  # (B, K)
            a = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)  # (B,)

            # emit chain[0..a] with greedy_generate's exact stop semantics
            window = jnp.full((b, K + 1), cfg.pad_token_id, jnp.int32)

            def emit(j, carry):
                window, done_j, n_new = carry
                c_j = chain[:, j]
                c_n = chain[:, j + 1]
                valid = (j <= a) & ~done_j
                window = window.at[:, j].set(jnp.where(valid, c_j, cfg.pad_token_id))
                stopped = (
                    (c_n == cfg.eos_token_id)
                    | (c_n == cfg.stop_single)
                    | ((c_j == cfg.stop_pair[0]) & (c_n == cfg.stop_pair[1]))
                )
                return window, done_j | (valid & stopped), n_new + valid.astype(jnp.int32)

            done_j = st["done"]
            n_new = jnp.zeros((b,), jnp.int32)
            for j in range(K + 1):  # static unroll (K is small)
                window, done_j, n_new = emit(j, (window, done_j, n_new))

            # rows already done park their all-pad window in the buffer slack
            # past max_new so they never clobber previously-written tokens
            offset = jnp.where(st["done"], max_new, jnp.minimum(st["n_emit"], max_new - 1))
            tokens = jax.vmap(
                lambda row, w, o: jax.lax.dynamic_update_slice(row, w, (o,))
            )(st["tokens"], window, offset)

            n_emit = st["n_emit"] + n_new
            length = st["length"] + a + 1
            done = done_j | (n_emit >= max_new)
            new_last = jnp.take_along_axis(chain, (a + 1)[:, None], axis=1)[:, 0]
            new_prev = jnp.take_along_axis(chain, a[:, None], axis=1)[:, 0]
            # restore true per-row frontiers (attention advanced them by K+1)
            cache = tuple(dict(c, index=length) for c in cache)
            active = (~st["done"]).astype(jnp.int32)
            return dict(length=length, n_emit=n_emit, last=new_last, prev=new_prev,
                        done=done, cache=cache, tokens=tokens,
                        accepted=st["accepted"] + jnp.sum(a * active),
                        drafted=st["drafted"] + K * jnp.sum(active),
                        rounds=st["rounds"] + 1)

        return body

    # staged spec decode: verify round r (1-indexed across the whole run)
    # writes and attends positions < p + r*(K+1) for every row (done rows
    # included — their `length` also advances by at most K+1 per round), so
    # a span with static kv_limit=lim can run while rounds < (lim-p)//(K+1)
    # and every read slice still covers all live writes.  Same token
    # stream, less KV streamed per verify pass (tight at oracle acceptance,
    # conservative below it).  MEASURED AND REJECTED as a default on the
    # current runtime: 17.43 vs 18.39 img/s at the d32/b24 spec-oracle
    # point — the per-row vector-index cache writes plus a slice consumer
    # defeat XLA's in-place update (the scalar-index greedy loop keeps it
    # and wins, BENCH_NOTES r3b).  Kept behind MYRIAD_SPEC_STAGED=1 for
    # re-measurement on runtime updates.
    import os

    if (cfg.staged_decode and os.environ.get("MYRIAD_SPEC_STAGED") == "1"
            and p is not None):  # staged spans need a static frontier
        g = cfg.cache_granularity
        limits = list(range(_round_up(p + K + 2, g), max_len + 1, g)) or [max_len]
        limits[-1] = max_len
    else:
        limits = [max_len]

    st = state
    for lim in limits:
        max_rounds = None if lim >= max_len else (lim - p) // (K + 1)
        if max_rounds is not None and max_rounds <= 0:
            continue
        st = jax.lax.while_loop(make_cond(max_rounds), make_body(lim), st)
    out = st["tokens"][:, :max_new]
    if return_stats:
        out = (out, {"accepted": st["accepted"], "drafted": st["drafted"],
                     "rounds": st["rounds"]})
    return (out, prompt_cache) if return_cache else out


def trim_stop_ids(row, cfg: Optional[GenerationConfig] = None):
    """Trim one generated row at eos/'###'/pad, returning the kept ids —
    the id-level half of the reference's ``text.split('###')[0]``
    post-processing.  The single home for the stop protocol's trim rule
    (decode_stop_trimmed, the serving engine and tests all ride it)."""
    cfg = cfg or GenerationConfig()
    import numpy as np

    ids = []
    prev = None
    for t in np.asarray(row).tolist():
        if t in (cfg.eos_token_id, cfg.stop_single, cfg.pad_token_id):
            break
        if prev == cfg.stop_pair[0] and t == cfg.stop_pair[1]:
            ids.pop()
            break
        ids.append(t)
        prev = t
    return ids


def decode_stop_trimmed(token_rows, tokenizer, cfg: Optional[GenerationConfig] = None):
    """Decode generated ids to text, trimming at '###'/eos like the
    reference's ``text.split('###')[0]`` post-processing."""
    cfg = cfg or GenerationConfig()
    import numpy as np

    return [tokenizer.decode(trim_stop_ids(row, cfg))
            for row in np.asarray(token_rows)]
