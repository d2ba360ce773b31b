"""LLaMA parity vs HF transformers (torch CPU) + KV-cache/generation tests.

This is the bit-parity gate for the greedy-transcript requirement
(SURVEY.md §7.3 risk 1): a tiny random HF LlamaForCausalLM is converted
with the production weight converter and must match logits and greedy
tokens.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myriad_tpu.convert import convert_llama_state_dict
from myriad_tpu.generation import GenerationConfig, greedy_generate
from myriad_tpu.models.llama import (
    LlamaConfig,
    LlamaForCausalLM,
    init_cache,
    lm_cross_entropy,
)

FP32 = dict(dtype=jnp.float32, param_dtype=jnp.float32)


@pytest.fixture(scope="module")
def tiny_pair():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM as HFLlama

    hf_cfg = HFConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = HFLlama(hf_cfg).eval()

    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg, **FP32)
    params = convert_llama_state_dict(hf.state_dict(), cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return hf, model, params, cfg


def test_logits_match_hf(tiny_pair):
    import torch

    hf, model, params, cfg = tiny_pair
    rng = np.random.default_rng(0)
    embeds = rng.normal(size=(2, 7, 64)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = hf(inputs_embeds=torch.tensor(embeds)).logits.numpy()
    ours, _ = model.apply(params, jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


def test_cached_decode_matches_full_forward(tiny_pair):
    _, model, params, cfg = tiny_pair
    rng = np.random.default_rng(1)
    embeds = jnp.asarray(rng.normal(size=(2, 10, 64)).astype(np.float32) * 0.1)

    full_logits, _ = model.apply(params, embeds)

    # prefill 6, then decode 4 one at a time through the cache
    cache = init_cache(cfg, 2, 128, jnp.float32)
    logits_p, cache = model.apply(params, embeds[:, :6], cache=cache)
    step_logits = [logits_p[:, i] for i in range(6)]
    for i in range(6, 10):
        lg, cache = model.apply(params, embeds[:, i : i + 1], cache=cache)
        step_logits.append(lg[:, 0])
    stepwise = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(stepwise), np.asarray(full_logits), atol=2e-4, rtol=1e-3
    )


def test_greedy_generation_matches_hf(tiny_pair):
    import torch

    hf, model, params, cfg = tiny_pair
    rng = np.random.default_rng(2)
    embeds = rng.normal(size=(2, 5, 64)).astype(np.float32) * 0.1

    with torch.no_grad():
        hf_tokens = hf.generate(
            inputs_embeds=torch.tensor(embeds),
            max_new_tokens=8,
            do_sample=False,
            num_beams=1,
            pad_token_id=0,
            eos_token_id=None,
        ).numpy()

    gen_cfg = GenerationConfig(
        max_new_tokens=8, eos_token_id=-1, stop_single=-1, stop_pair=(-1, -1),
        pad_token_id=0,
    )
    ours = np.asarray(
        greedy_generate(model, params, jnp.asarray(embeds), config=gen_cfg,
                        cache_dtype=jnp.float32)
    )
    np.testing.assert_array_equal(ours, hf_tokens[:, :8])


def test_stop_sequence_handling(tiny_pair):
    _, model, params, cfg = tiny_pair
    rng = np.random.default_rng(3)
    embeds = jnp.asarray(rng.normal(size=(1, 4, 64)).astype(np.float32) * 0.1)
    # force an early stop by making the first generated token the stop id
    full_logits, _ = model.apply(params, embeds)
    first = int(jnp.argmax(full_logits[0, -1]))
    gen_cfg = GenerationConfig(
        max_new_tokens=6, eos_token_id=-1, stop_single=first, stop_pair=(-1, -1),
        pad_token_id=0,
    )
    out = np.asarray(
        greedy_generate(model, params, embeds, config=gen_cfg, cache_dtype=jnp.float32)
    )
    # stop token suppressed, row padded
    assert (out == 0).all()


def test_lora_params_and_effect(tiny_pair):
    _, _, base_params, _ = tiny_pair
    cfg = LlamaConfig.tiny(use_lora=True)
    model = LlamaForCausalLM(cfg, **FP32)
    embeds = jnp.zeros((1, 3, 64))
    params = model.init(jax.random.PRNGKey(0), embeds)
    flat = jax.tree_util.tree_leaves_with_path(params)
    lora_paths = [p for p, _ in flat if "lora" in str(p)]
    assert len(lora_paths) == 2 * 2 * 2  # 2 layers x q/v x A/B
    # lora_b zero-init -> logits identical to base at init
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 4, 64)).astype(np.float32))
    base_model = LlamaForCausalLM(LlamaConfig.tiny(), **FP32)
    # graft base weights into the lora tree
    import copy

    lp = jax.tree_util.tree_map(lambda v: v, params)
    def graft(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and k in dst and isinstance(dst[k], dict):
                graft(dst[k], v)
            else:
                dst[k] = v
    lp_params = jax.tree_util.tree_map(np.asarray, lp)
    import flax

    lp_mut = flax.core.unfreeze(lp_params) if hasattr(flax.core, "unfreeze") else lp_params
    graft(lp_mut["params"], jax.tree_util.tree_map(np.asarray, base_params)["params"])
    out_lora, _ = model.apply(jax.tree_util.tree_map(jnp.asarray, lp_mut), x)
    out_base, _ = base_model.apply(base_params, x)
    np.testing.assert_allclose(np.asarray(out_lora), np.asarray(out_base), atol=1e-5)


def test_lm_cross_entropy_masking():
    logits = jnp.asarray(np.random.default_rng(5).normal(size=(1, 6, 16)), jnp.float32)
    targets = jnp.asarray([[-100, -100, 3, 5, -100, 7]])
    loss = lm_cross_entropy(logits, targets)
    assert np.isfinite(float(loss))
    # hand-computed: positions whose *labels* are valid are t=2(label idx2->3)?
    lp = jax.nn.log_softmax(logits[:, :-1], -1)
    expect = -(lp[0, 1, 3] + lp[0, 2, 5] + lp[0, 4, 7]) / 3
    assert float(loss) == pytest.approx(float(expect), rel=1e-5)
