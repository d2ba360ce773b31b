"""Generation invariance properties backing the greedy-parity requirement."""

import jax
import jax.numpy as jnp
import numpy as np

from myriad_tpu.generation import GenerationConfig, greedy_generate
from myriad_tpu.models.llama import LlamaConfig, LlamaForCausalLM

FP32 = dict(dtype=jnp.float32, param_dtype=jnp.float32)


def _model():
    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg, **FP32)
    params = model.init_params(jax.random.PRNGKey(3))
    return model, params


def test_prefix_consistency_across_budgets():
    """Greedy tokens for max_new_tokens=N must be a prefix of those for
    max_new_tokens=M>N (no hidden dependence on the cache budget)."""
    model, params = _model()
    rng = np.random.default_rng(0)
    embeds = jnp.asarray(rng.normal(size=(2, 7, 64)).astype(np.float32) * 0.1)
    cfg = dict(eos_token_id=-1, stop_single=-1, stop_pair=(-1, -1))
    short = np.asarray(greedy_generate(
        model, params, embeds, config=GenerationConfig(max_new_tokens=6, **cfg),
        cache_dtype=jnp.float32))
    long = np.asarray(greedy_generate(
        model, params, embeds, config=GenerationConfig(max_new_tokens=20, **cfg),
        cache_dtype=jnp.float32))
    np.testing.assert_array_equal(short, long[:, :6])


def test_continue_generate_matches_full_prefill():
    """continue_generate (the incremental-chat primitive) must be
    token-exact vs prefilling the whole prompt at once: positions and the
    causal mask derive from the cache write frontier, so prefilling a
    prompt in two (or three) separate calls changes nothing.  Also pins
    that the returned prompt_cache is decode-free: extending it with a
    third segment reproduces the full-prefill transcript of the longer
    prompt."""
    from myriad_tpu.generation import continue_generate
    from myriad_tpu.models.llama import init_cache

    model, params = _model()
    rng = np.random.default_rng(11)
    p1, p2, p3 = 9, 6, 5
    full = jnp.asarray(
        rng.normal(size=(2, p1 + p2 + p3, 64)).astype(np.float32) * 0.2)
    base = dict(eos_token_id=-1, stop_single=-1, stop_pair=(-1, -1),
                max_new_tokens=8)
    cfg = GenerationConfig(**base)
    for cache_dtype in (jnp.float32, "int8"):
        ref12 = np.asarray(greedy_generate(
            model, params, full[:, : p1 + p2], config=cfg,
            cache_dtype=cache_dtype))
        ref123 = np.asarray(greedy_generate(
            model, params, full, config=cfg, cache_dtype=cache_dtype))

        bucket = p1 + p2 + p3 + cfg.max_new_tokens + 4
        cache = init_cache(model.config, 2, bucket, cache_dtype)
        _, cache = model.apply(params, full[:, :p1], cache=cache,
                               method=LlamaForCausalLM.prefill)
        tok12, prompt_cache = continue_generate(
            model, params, full[:, p1 : p1 + p2], cache, config=cfg)
        np.testing.assert_array_equal(np.asarray(tok12), ref12,
                                      err_msg=f"{cache_dtype} turn 1")
        # prompt_cache must hold ONLY the p1+p2 prompt (no decode scratch
        # that the mask could ever admit): continue with segment 3
        tok123, _ = continue_generate(
            model, params, full[:, p1 + p2 :], prompt_cache, config=cfg)
        np.testing.assert_array_equal(np.asarray(tok123), ref123,
                                      err_msg=f"{cache_dtype} turn 2")


def test_chunked_prefill_transcript_invariance():
    """prefill_chunks (the batch-28+ memory lever) must be token-exact:
    any chunking of the prefix produces the identical greedy transcript,
    for bf16 and int8 KV caches, for ANY prefix length — non-divisible
    lengths run ceil-sized chunks with a trailing remainder chunk (a real
    prompt's token count is arbitrary; a divisor fallback would silently
    restore single-shot prefill and OOM at the serving batch)."""
    from myriad_tpu.generation import _chunk_count, speculative_generate

    model, params = _model()
    rng = np.random.default_rng(7)
    embeds = jnp.asarray(rng.normal(size=(2, 12, 64)).astype(np.float32) * 0.2)
    base = dict(eos_token_id=-1, stop_single=-1, stop_pair=(-1, -1),
                max_new_tokens=10)
    for cache_dtype in (jnp.float32, "int8"):
        ref = np.asarray(greedy_generate(
            model, params, embeds, config=GenerationConfig(**base),
            cache_dtype=cache_dtype))
        for n in (2, 3, 4, 5, 12):
            got = np.asarray(greedy_generate(
                model, params, embeds,
                config=GenerationConfig(prefill_chunks=n, **base),
                cache_dtype=cache_dtype))
            np.testing.assert_array_equal(got, ref, err_msg=f"chunks={n}")
    assert _chunk_count(12, 5) == 4   # ceil(12 / ceil(12/5)=3)
    assert _chunk_count(298, 9) == 9  # 2·149: divisor fallback would give 2
    assert _chunk_count(313, 9) == 9  # prime: divisor fallback would give 1
    # prime prefix length: every requested chunk count stays token-exact
    embeds13 = jnp.asarray(rng.normal(size=(2, 13, 64)).astype(np.float32) * 0.2)
    for cache_dtype in (jnp.float32, "int8"):
        ref13 = np.asarray(greedy_generate(
            model, params, embeds13, config=GenerationConfig(**base),
            cache_dtype=cache_dtype))
        for n in (2, 5, 9, 13):
            got13 = np.asarray(greedy_generate(
                model, params, embeds13,
                config=GenerationConfig(prefill_chunks=n, **base),
                cache_dtype=cache_dtype))
            np.testing.assert_array_equal(got13, ref13,
                                          err_msg=f"p=13 chunks={n}")
    # speculative decode with chunked prefill stays transcript-exact too
    ref = np.asarray(greedy_generate(
        model, params, embeds, config=GenerationConfig(**base),
        cache_dtype=jnp.float32))
    got = np.asarray(speculative_generate(
        model, params, embeds,
        config=GenerationConfig(prefill_chunks=3, **base),
        spec_k=3, cache_dtype=jnp.float32))
    np.testing.assert_array_equal(got, ref)


def test_staged_decode_transcript_invariance():
    """staged_decode (the decode KV-streaming lever) must be token-exact:
    partitioning the decode loop into per-granularity KV-limit stages
    attends over exactly the same unmasked positions, so transcripts match
    the single-loop path for bf16 and int8 caches — including when rows
    stop mid-stage (done must propagate across stage boundaries)."""
    model, params = _model()
    rng = np.random.default_rng(11)
    embeds = jnp.asarray(rng.normal(size=(3, 7, 64)).astype(np.float32) * 0.2)
    base = dict(eos_token_id=-1, stop_single=-1, stop_pair=(-1, -1),
                max_new_tokens=14)
    for cache_dtype in (jnp.float32, "int8"):
        for g in (4, 8, 32):  # 32 -> a single stage (bucket-sized)
            ref = np.asarray(greedy_generate(
                model, params, embeds,
                config=GenerationConfig(cache_granularity=g, **base),
                cache_dtype=cache_dtype))
            got = np.asarray(greedy_generate(
                model, params, embeds,
                config=GenerationConfig(cache_granularity=g,
                                        staged_decode=True, **base),
                cache_dtype=cache_dtype))
            np.testing.assert_array_equal(got, ref,
                                          err_msg=f"{cache_dtype} g={g}")
    # force a mid-generation stop: use a token the reference transcript
    # emits as the stop id, so some rows finish inside an early stage
    ref = np.asarray(greedy_generate(
        model, params, embeds,
        config=GenerationConfig(cache_granularity=4, **base),
        cache_dtype=jnp.float32))
    stop = int(ref[0, 5])
    cfg_stop = dict(base, stop_single=stop)
    a = np.asarray(greedy_generate(
        model, params, embeds,
        config=GenerationConfig(cache_granularity=4, **cfg_stop),
        cache_dtype=jnp.float32))
    s = np.asarray(greedy_generate(
        model, params, embeds,
        config=GenerationConfig(cache_granularity=4, staged_decode=True,
                                **cfg_stop),
        cache_dtype=jnp.float32))
    np.testing.assert_array_equal(s, a)
    # chunked prefill + staged decode compose token-exactly
    ref = np.asarray(greedy_generate(
        model, params, embeds, config=GenerationConfig(**base),
        cache_dtype="int8"))
    got = np.asarray(greedy_generate(
        model, params, embeds,
        config=GenerationConfig(prefill_chunks=3, staged_decode=True, **base),
        cache_dtype="int8"))
    np.testing.assert_array_equal(got, ref)


def test_staged_spec_decode_transcript_invariance(monkeypatch):
    """Staged KV limits extend to speculative verify rounds: round r
    (1-indexed across the run) touches positions < p + r*(K+1) for EVERY
    row (done rows' frontiers also advance by at most K+1), so a span with
    static kv_limit=lim can run (lim-p)//(K+1) rounds and every read slice
    covers all live writes.  Transcripts must equal plain greedy for
    n-gram drafts, oracle drafts (the tight-fit case: the frontier grows
    exactly K+1 per round), mid-stage stops, and int8 caches.

    Measured-and-rejected as a default (17.43 vs 18.39 img/s at the
    d32/b24 spec-oracle point — BENCH_NOTES r3b), so the spec path only
    stages under MYRIAD_SPEC_STAGED=1; this test pins the forced variant's
    exactness for re-measurement on runtime updates."""
    from myriad_tpu.generation import speculative_generate

    monkeypatch.setenv("MYRIAD_SPEC_STAGED", "1")

    model, params = _model()
    rng = np.random.default_rng(13)
    embeds = jnp.asarray(rng.normal(size=(3, 7, 64)).astype(np.float32) * 0.2)
    base = dict(eos_token_id=-1, stop_single=-1, stop_pair=(-1, -1),
                max_new_tokens=14)
    for cache_dtype in (jnp.float32, "int8"):
        ref = np.asarray(greedy_generate(
            model, params, embeds,
            config=GenerationConfig(cache_granularity=4, **base),
            cache_dtype=cache_dtype))
        for K in (2, 3):
            got = np.asarray(speculative_generate(
                model, params, embeds,
                config=GenerationConfig(cache_granularity=4,
                                        staged_decode=True, **base),
                spec_k=K, cache_dtype=cache_dtype))
            np.testing.assert_array_equal(
                got, ref, err_msg=f"{cache_dtype} K={K}")
        # oracle drafts: 100% acceptance, frontier = p + r*(K+1) exactly
        oracle = jnp.asarray(np.concatenate(
            [ref, np.zeros((3, 8), np.int32)], axis=1))
        got = np.asarray(speculative_generate(
            model, params, embeds,
            config=GenerationConfig(cache_granularity=4, staged_decode=True,
                                    **base),
            spec_k=3, oracle_drafts=oracle, cache_dtype=cache_dtype))
        np.testing.assert_array_equal(got, ref, err_msg=f"{cache_dtype} oracle")
    # rows stopping inside an early span must stay stopped across spans
    ref = np.asarray(greedy_generate(
        model, params, embeds,
        config=GenerationConfig(cache_granularity=4, **base),
        cache_dtype=jnp.float32))
    cfg_stop = dict(base, stop_single=int(ref[0, 5]))
    a = np.asarray(greedy_generate(
        model, params, embeds,
        config=GenerationConfig(cache_granularity=4, **cfg_stop),
        cache_dtype=jnp.float32))
    s = np.asarray(speculative_generate(
        model, params, embeds,
        config=GenerationConfig(cache_granularity=4, staged_decode=True,
                                **cfg_stop),
        spec_k=3, cache_dtype=jnp.float32))
    np.testing.assert_array_equal(s, a)


def test_batch_invariance():
    """A row's greedy tokens don't depend on its batch neighbours."""
    model, params = _model()
    rng = np.random.default_rng(1)
    embeds = jnp.asarray(rng.normal(size=(3, 5, 64)).astype(np.float32) * 0.1)
    cfg = GenerationConfig(max_new_tokens=8, eos_token_id=-1, stop_single=-1,
                           stop_pair=(-1, -1))
    full = np.asarray(greedy_generate(model, params, embeds, config=cfg,
                                      cache_dtype=jnp.float32))
    solo = np.asarray(greedy_generate(model, params, embeds[1:2], config=cfg,
                                      cache_dtype=jnp.float32))
    np.testing.assert_array_equal(full[1:2], solo)


def test_jit_eager_identical():
    """The whole generate path produces identical tokens jitted vs eager."""
    model, params = _model()
    rng = np.random.default_rng(2)
    embeds = jnp.asarray(rng.normal(size=(2, 4, 64)).astype(np.float32) * 0.1)
    cfg = GenerationConfig(max_new_tokens=10)

    def gen(params, embeds):
        return greedy_generate(model, params, embeds, config=cfg,
                               cache_dtype=jnp.float32)

    eager = np.asarray(gen(params, embeds))
    jitted = np.asarray(jax.jit(gen)(params, embeds))
    np.testing.assert_array_equal(eager, jitted)


def test_int8_kv_cache_transcript_invariance():
    """Greedy transcripts with the int8 KV cache must match the fp32 cache
    (per-token-per-head symmetric quant keeps greedy argmax stable; VERDICT
    r1 next #5 — transcript-invariance gate for the quantized cache)."""
    model, params = _model()
    rng = np.random.default_rng(4)
    embeds = jnp.asarray(rng.normal(size=(2, 6, 64)).astype(np.float32) * 0.1)
    cfg = GenerationConfig(max_new_tokens=12, eos_token_id=-1, stop_single=-1,
                           stop_pair=(-1, -1))
    ref = np.asarray(greedy_generate(model, params, embeds, config=cfg,
                                     cache_dtype=jnp.float32))
    q = np.asarray(greedy_generate(model, params, embeds, config=cfg,
                                   cache_dtype="int8"))
    np.testing.assert_array_equal(ref, q)


def test_int8_kv_cache_logits_close():
    """Single forward through an int8 cache stays numerically close to the
    fp32 cache (quantization error bounded by the per-row amax/127 step)."""
    from myriad_tpu.models.llama import init_cache

    model, params = _model()
    rng = np.random.default_rng(5)
    embeds = jnp.asarray(rng.normal(size=(1, 8, 64)).astype(np.float32) * 0.1)
    for dtype in (jnp.float32, "int8"):
        cache = init_cache(model.config, 1, 16, dtype)
        logits, _ = model.apply(params, embeds, cache=cache)
        if dtype == jnp.float32:
            ref = np.asarray(logits)
        else:
            got = np.asarray(logits)
    assert np.max(np.abs(got - ref)) < 0.05 * max(np.max(np.abs(ref)), 1.0)


def test_nsa_seeded_determinism(rng):
    from myriad_tpu.datasets.nsa import patch_ex

    dest = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
    src = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
    a1 = patch_ex(dest, src, rng=np.random.default_rng(7), mode="swap",
                  label_mode="binary", width_bounds_pct=((0.1, 0.3), (0.1, 0.3)))
    a2 = patch_ex(dest, src, rng=np.random.default_rng(7), mode="swap",
                  label_mode="binary", width_bounds_pct=((0.1, 0.3), (0.1, 0.3)))
    np.testing.assert_array_equal(a1[0], a2[0])
    np.testing.assert_array_equal(a1[1], a2[1])
    assert a1[2] == a2[2]
