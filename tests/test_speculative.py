"""Speculative decoding: transcript-exactness against greedy_generate.

The spec-decode contract is that every emitted token is the model's own
greedy argmax — n-gram drafting and per-row ragged acceptance must never
change the output (reference pledges greedy decoding, Readme.md:42).
These tests pin token-identity under: zero acceptance (random tiny model),
full acceptance (oracle drafts from a prior greedy run), mixed per-row
acceptance (oracle for one row, garbage for the other), active stop
sequences, and the int8 KV cache.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myriad_tpu.generation import (
    GenerationConfig,
    greedy_generate,
    speculative_generate,
)
from myriad_tpu.models.llama import LlamaConfig, LlamaForCausalLM

FP32 = dict(dtype=jnp.float32, param_dtype=jnp.float32)
NO_STOP = dict(eos_token_id=-1, stop_single=-1, stop_pair=(-1, -1))


@pytest.fixture(scope="module")
def tiny():
    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg, **FP32)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    embeds = jnp.asarray(rng.normal(size=(2, 7, 64)).astype(np.float32) * 0.3)
    return model, params, embeds


@pytest.mark.parametrize("k", [1, 4])
def test_spec_matches_greedy_no_stops(tiny, k):
    model, params, embeds = tiny
    cfg = GenerationConfig(max_new_tokens=17, **NO_STOP)
    ref = greedy_generate(model, params, embeds, config=cfg,
                          cache_dtype=jnp.float32)
    out = speculative_generate(model, params, embeds, config=cfg, spec_k=k,
                               cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_spec_oracle_full_acceptance(tiny):
    """Drafting the true continuation accepts everything and still emits
    the identical transcript."""
    model, params, embeds = tiny
    cfg = GenerationConfig(max_new_tokens=16, **NO_STOP)
    ref = greedy_generate(model, params, embeds, config=cfg,
                          cache_dtype=jnp.float32)
    out = speculative_generate(model, params, embeds, config=cfg, spec_k=4,
                               oracle_drafts=ref, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_spec_mixed_per_row_acceptance(tiny):
    """Row 0 drafts its true continuation (full acceptance), row 1 drafts
    garbage (zero acceptance): per-row cache frontiers diverge, outputs
    must not."""
    model, params, embeds = tiny
    cfg = GenerationConfig(max_new_tokens=14, **NO_STOP)
    ref = greedy_generate(model, params, embeds, config=cfg,
                          cache_dtype=jnp.float32)
    drafts = np.asarray(ref).copy()
    drafts[1] = 1  # constant garbage for row 1
    out = speculative_generate(model, params, embeds, config=cfg, spec_k=3,
                               oracle_drafts=jnp.asarray(drafts),
                               cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_spec_out_of_vocab_drafts_are_harmless(tiny):
    """OOB draft ids (e.g. a corrupted oracle) must be clamped, not fed:
    jnp.take fills OOB gathers with NaN, which would poison the verify
    attention and truncate transcripts."""
    model, params, embeds = tiny
    cfg = GenerationConfig(max_new_tokens=14, **NO_STOP)
    ref = greedy_generate(model, params, embeds, config=cfg,
                          cache_dtype=jnp.float32)
    bad = np.asarray(ref).copy()
    bad[:, ::2] = 31999  # far outside the tiny vocab (128)
    out = speculative_generate(model, params, embeds, config=cfg, spec_k=3,
                               oracle_drafts=jnp.asarray(bad),
                               cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_spec_with_stop_tokens(tiny):
    """Pick a token that actually occurs mid-transcript as the stop id;
    greedy and speculative must truncate identically (stop not emitted,
    pad after)."""
    model, params, embeds = tiny
    probe = greedy_generate(
        model, params, embeds,
        config=GenerationConfig(max_new_tokens=16, **NO_STOP),
        cache_dtype=jnp.float32,
    )
    row = np.asarray(probe)[0]
    stop = int(row[len(row) // 2])  # something emitted midway
    cfg = GenerationConfig(max_new_tokens=16, eos_token_id=-1,
                           stop_single=stop, stop_pair=(-1, -1))
    ref = greedy_generate(model, params, embeds, config=cfg,
                          cache_dtype=jnp.float32)
    out = speculative_generate(model, params, embeds, config=cfg, spec_k=3,
                               cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # the stop actually truncated something (the probe row continues past it)
    assert (np.asarray(ref)[0] == cfg.pad_token_id).any()


def test_spec_with_stop_pair(tiny):
    """Two-token '###' style stop: the pair's first token is emitted, the
    second truncates — identical under speculation."""
    model, params, embeds = tiny
    probe = np.asarray(greedy_generate(
        model, params, embeds,
        config=GenerationConfig(max_new_tokens=16, **NO_STOP),
        cache_dtype=jnp.float32,
    ))
    r = probe[0]
    i = len(r) // 2
    cfg = GenerationConfig(max_new_tokens=16, eos_token_id=-1, stop_single=-1,
                           stop_pair=(int(r[i]), int(r[i + 1])))
    ref = greedy_generate(model, params, embeds, config=cfg,
                          cache_dtype=jnp.float32)
    out = speculative_generate(model, params, embeds, config=cfg, spec_k=4,
                               cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_spec_int8_kv_cache(tiny):
    """Speculative decode over the quantized KV cache matches the int8-KV
    greedy transcript."""
    model, params, embeds = tiny
    cfg = GenerationConfig(max_new_tokens=12, **NO_STOP)
    ref = greedy_generate(model, params, embeds, config=cfg, cache_dtype="int8")
    out = speculative_generate(model, params, embeds, config=cfg, spec_k=3,
                               cache_dtype="int8")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_spec_lookup_corpus_hits(tiny):
    """A lookup corpus seeded with the true continuation behaves like the
    n-gram hit path (acceptance > 0) and stays transcript-exact."""
    model, params, embeds = tiny
    cfg = GenerationConfig(max_new_tokens=12, **NO_STOP)
    ref = greedy_generate(model, params, embeds, config=cfg,
                          cache_dtype=jnp.float32)
    out = speculative_generate(model, params, embeds, config=cfg, spec_k=3,
                               lookup_ids=ref, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_myriad_generate_spec_matches_greedy():
    """llm_spec_k through the production fused generate path: token- and
    map-identical to the plain greedy model."""
    from myriad_tpu.models.layers import Policy
    from myriad_tpu.models.myriad import Myriad, MyriadArch

    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    samples = {
        "image": img,
        "scene": ["bottle", "bottle"],
        "question": "<Img><ImageHere></Img> Is there an anomaly?",
    }

    outs = {}
    for k in (0, 3):
        m = Myriad(arch=MyriadArch.tiny(), use_ve=True, policy=Policy.fp32(),
                   max_txt_len=16, spec_k=k, seed=11)
        ve = m.vision_expert
        ve.class_names = ["bottle"]
        ve.class_index = {"bottle": 0}
        ve.build_text_features()
        outs[k] = m.generate(samples, max_new_tokens=8)
    np.testing.assert_array_equal(
        np.asarray(outs[0]["token_ids"]), np.asarray(outs[3]["token_ids"])
    )


def test_spec_acceptance_stats(tiny):
    """return_stats counters: oracle drafts accept 100%, garbage ~0%, and
    the rate is the measured number the harness emits (VERDICT r2 next #5)."""
    model, params, embeds = tiny
    cfg = GenerationConfig(max_new_tokens=12, **NO_STOP)
    ref = greedy_generate(model, params, embeds, config=cfg,
                          cache_dtype=jnp.float32)
    _, stats = speculative_generate(
        model, params, embeds, config=cfg, spec_k=3, oracle_drafts=ref,
        cache_dtype=jnp.float32, return_stats=True,
    )
    accepted, drafted = int(stats["accepted"]), int(stats["drafted"])
    assert drafted > 0 and accepted == drafted  # 100% acceptance
    garbage = jnp.full_like(ref, 1)
    toks, stats0 = speculative_generate(
        model, params, embeds, config=cfg, spec_k=3, oracle_drafts=garbage,
        cache_dtype=jnp.float32, return_stats=True,
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))
    # constant-1 drafts only accept where the true token IS 1
    true_ones = int((np.asarray(ref) == 1).sum())
    assert int(stats0["accepted"]) <= true_ones * 2
    assert int(stats0["rounds"]) > int(stats["rounds"])  # more weight passes


def test_reference_protocol_routes_to_spec():
    """The reference's shipped kwargs (do_sample=True, top_p=0.01) engage
    speculation when llm_spec_k is set: generate returns spec_stats and the
    tokens equal the explicit-greedy run (Readme.md:42 pledges greedy)."""
    from myriad_tpu.models.layers import Policy
    from myriad_tpu.models.myriad import Myriad, MyriadArch

    rng = np.random.default_rng(2)
    samples = {
        "image": rng.normal(size=(2, 28, 28, 3)).astype(np.float32),
        "scene": ["bottle", "bottle"],
        "question": "<Img><ImageHere></Img> Is there an anomaly?",
    }
    m = Myriad(arch=MyriadArch.tiny(), use_ve=True, policy=Policy.fp32(),
               max_txt_len=16, spec_k=2, seed=11)
    ve = m.vision_expert
    ve.class_names = ["bottle"]
    ve.class_index = {"bottle": 0}
    ve.build_text_features()
    ref_protocol = m.generate(samples, max_new_tokens=8, do_sample=True,
                              top_p=0.01, temperature=1.0)
    assert "spec_stats" in ref_protocol, "spec did not engage under top_p=0.01"
    greedy = m.generate(samples, max_new_tokens=8, do_sample=False)
    np.testing.assert_array_equal(np.asarray(ref_protocol["token_ids"]),
                                  np.asarray(greedy["token_ids"]))
    # the greedy rewrite requires temperature <= 1: at flattening
    # temperatures top-p(0.01) can keep several tokens (genuinely
    # stochastic), so those kwargs must stay on the sampler — no
    # spec_stats in the result
    hot = m.generate(samples, max_new_tokens=8, do_sample=True,
                     top_p=0.01, temperature=3.0)
    assert "spec_stats" not in hot, "temperature>1 must stay on the sampler"


def test_spec_quant_weights(tiny):
    """int8-weight serving model: spec == greedy (the verify pass runs the
    same QuantDense matmuls)."""
    cfg_m = LlamaConfig.tiny(weight_dtype="int8")
    model = LlamaForCausalLM(cfg_m, **FP32)
    params = model.init_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(5)
    embeds = jnp.asarray(rng.normal(size=(2, 5, 64)).astype(np.float32) * 0.3)
    cfg = GenerationConfig(max_new_tokens=10, **NO_STOP)
    ref = greedy_generate(model, params, embeds, config=cfg,
                          cache_dtype=jnp.float32)
    out = speculative_generate(model, params, embeds, config=cfg, spec_k=2,
                               cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
