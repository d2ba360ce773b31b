"""Int8 weight-only quantization tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myriad_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from myriad_tpu.ops.quant import (
    int8_matmul,
    quantize_per_channel,
    quantize_tree,
)

FP32 = dict(dtype=jnp.float32, param_dtype=jnp.float32)


def test_quantize_roundtrip_error(rng):
    w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    w8, scale = quantize_per_channel(w)
    assert w8.dtype == jnp.int8 and scale.shape == (32,)
    deq = w8.astype(jnp.float32) * scale
    rel = float(jnp.abs(deq - w).max() / jnp.abs(w).max())
    assert rel < 0.02  # int8 grid error


def test_int8_matmul_matches_dequant(rng):
    x = jnp.asarray(rng.normal(size=(5, 96)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(96, 72)), jnp.float32)
    w8, scale = quantize_per_channel(w)
    ref = x @ (w8.astype(jnp.float32) * scale)
    # pallas (interpret) path: weight-only quant, tight match
    out = int8_matmul(x, w8, scale, interpret=True, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)
    # xla fallback is W8A8 (activations dynamically quantized too):
    # absolute error bounded by the activation grid, ~2% of output scale
    out2 = int8_matmul(x, w8, scale, use_pallas=False)
    out_scale = float(np.abs(np.asarray(ref)).max())
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               atol=0.03 * out_scale)


def test_int8_llama_close_to_bf16(rng):
    """Quantized params through the int8 model ~= original fp32 model."""
    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg, **FP32)
    params = model.init_params(jax.random.PRNGKey(0))

    qcfg = dataclasses.replace(cfg, weight_dtype="int8")
    qmodel = LlamaForCausalLM(qcfg, **FP32)
    qparams = {"params": quantize_tree(jax.tree_util.tree_map(np.asarray, params)["params"])}
    # structures match the int8 model's own init
    ref_struct = qmodel.init_params(jax.random.PRNGKey(0))
    assert jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda x: 0, qparams)
    ) == jax.tree_util.tree_structure(jax.tree_util.tree_map(lambda x: 0, ref_struct))

    embeds = jnp.asarray(rng.normal(size=(2, 6, 64)).astype(np.float32) * 0.1)
    full, _ = model.apply(params, embeds)
    quant, _ = qmodel.apply(jax.tree_util.tree_map(jnp.asarray, qparams), embeds)
    # logits close enough that rankings rarely change on a tiny random model
    err = float(jnp.abs(full - quant).max())
    assert err < 0.1, err


def test_int8_generation_runs(rng):
    from myriad_tpu.generation import GenerationConfig, greedy_generate

    cfg = LlamaConfig.tiny(weight_dtype="int8")
    model = LlamaForCausalLM(cfg, **FP32)
    params = model.init_params(jax.random.PRNGKey(1))
    embeds = jnp.asarray(rng.normal(size=(1, 4, 64)).astype(np.float32))
    tokens = greedy_generate(
        model, params, embeds,
        config=GenerationConfig(max_new_tokens=4, eos_token_id=-1,
                                stop_single=-1, stop_pair=(-1, -1)),
        cache_dtype=jnp.float32,
    )
    assert tokens.shape == (1, 4)
