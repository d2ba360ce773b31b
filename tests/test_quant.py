"""Int8/int4 weight-only quantization tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myriad_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from myriad_tpu.ops.quant import (
    dequant_int4,
    int4_matmul,
    int8_matmul,
    quantize_int4_grouped,
    quantize_per_channel,
    quantize_tree,
    unpack_int4,
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


def test_w8a8_gradient_flows_through(rng):
    """The W8A8 activation-quant matmul must pass gradients (custom
    straight-through jvp): round()+int8-cast would otherwise zero every
    gradient crossing a frozen int8 layer, silently breaking LoRA/adaptor
    training upstream of the quantized LLM."""
    x = jnp.asarray(rng.normal(size=(8, 96)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(96, 72)), jnp.float32)
    w8, scale = quantize_per_channel(w)

    def loss(x):
        return int8_matmul(x, w8, scale, use_pallas=False).sum()

    g = jax.grad(loss)(x)
    # straight-through tangent == gradient of the dequantized linear map
    # (computed in bf16 for bandwidth — ~0.4% rounding)
    ref = jax.grad(lambda x: (x @ (w8.astype(jnp.float32) * scale)).sum())(x)
    assert float(jnp.abs(g).max()) > 0
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), rtol=1e-2)


def test_pallas_int8_gradient_flows_through(rng):
    """The Pallas dequant-dot path (decode/tiny-M shapes) needs the same
    straight-through derivative as the W8A8 path: the stage-2 train step
    backprops THROUGH the frozen int8 Q-Former into the expert adaptor,
    and pallas_call has no VJP of its own (r4 full-profile train OOM hunt
    surfaced 'Linearization failed' here)."""
    x = jnp.asarray(rng.normal(size=(8, 96)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(96, 72)), jnp.float32)
    w8, scale = quantize_per_channel(w)

    def loss(x):
        return int8_matmul(x, w8, scale, use_pallas=True).sum()

    g = jax.grad(loss)(x)
    ref = jax.grad(
        lambda x: int8_matmul(x, w8, scale, use_pallas=False).sum())(x)
    assert float(jnp.abs(g).max()) > 0
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_int8_llama_gradients_nonzero(rng):
    """End-to-end: input gradients through a frozen int8 tiny LLaMA are
    nonzero and directionally match the fp32 model's."""
    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg, **FP32)
    params = model.init_params(jax.random.PRNGKey(0))
    qcfg = dataclasses.replace(cfg, weight_dtype="int8")
    qmodel = LlamaForCausalLM(qcfg, **FP32)
    qparams = {"params": quantize_tree(
        jax.tree_util.tree_map(np.asarray, params)["params"])}
    qparams = jax.tree_util.tree_map(jnp.asarray, qparams)

    embeds = jnp.asarray(rng.normal(size=(2, 6, 64)).astype(np.float32) * 0.1)

    def loss(m, p, e):
        logits, _ = m.apply(p, e)
        return (logits.astype(jnp.float32) ** 2).mean()

    g_ref = jax.grad(lambda e: loss(model, params, e))(embeds)
    g_q = jax.grad(lambda e: loss(qmodel, qparams, e))(embeds)
    assert float(jnp.abs(g_q).max()) > 0
    cos = float(
        (g_ref * g_q).sum()
        / (jnp.linalg.norm(g_ref) * jnp.linalg.norm(g_q) + 1e-9)
    )
    assert cos > 0.9, cos


def test_int4_pack_unpack_exact(rng):
    """Packing two nibbles per byte and unpacking is lossless on [-8, 7]."""
    q = jnp.asarray(rng.integers(-8, 8, size=(128, 24)), jnp.int32)
    lo, hi = q[0::2] & 15, q[1::2] & 15
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), np.asarray(q))


def test_int4_quantize_roundtrip_error(rng):
    w = jnp.asarray(rng.normal(size=(256, 40)), jnp.float32)
    w4, scale = quantize_int4_grouped(w)
    assert w4.dtype == jnp.uint8 and w4.shape == (128, 40)
    assert scale.shape == (2, 40)  # 256 / group-128
    deq = dequant_int4(w4, scale)
    # int4 grid: error <= scale/2 = amax/14 per group
    grp = np.abs(np.asarray(w)).reshape(2, 128, 40).max(axis=1)
    bound = (grp / 14.0 + 1e-6)[:, None, :]
    err = np.abs(np.asarray(deq - w)).reshape(2, 128, 40)
    assert (err <= bound).all()


def test_int4_matmul_matches_dequant(rng):
    x = jnp.asarray(rng.normal(size=(5, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 72)), jnp.float32)
    w4, scale = quantize_int4_grouped(w)
    ref = x @ dequant_int4(w4, scale)
    out_scale = float(np.abs(np.asarray(ref)).max())
    # pallas (interpret) path: dequant-in-kernel; the group scale applies
    # BEFORE the dot, so the dequantized weight rounds to bf16 (~0.4% per
    # element) — bound the accumulated error relative to the output scale
    out = int4_matmul(x, w4, scale, interpret=True, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.01 * out_scale)
    # xla fallback requantizes int4 groups -> per-channel int8 then W8A8:
    # error bounded by the int8 regrid + activation grid
    out2 = int4_matmul(x, w4, scale, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               atol=0.04 * out_scale)


def test_int4_matmul_contraction_split_engages(rng):
    """d=11008 (the 7B down_proj input dim) at the m<=256 pallas-gate edge:
    the contraction must split into aligned chunks (nk=2, td=5632 after
    padding — a power-of-two halving can't split 11008) and still match the
    dequant reference.  Guards the VMEM-fitting split (ADVICE r2 #1)."""
    import myriad_tpu.ops.quant as q

    d, f, m = 11008, 128, 256
    x = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32) * 0.05)
    w = jnp.asarray(rng.normal(size=(d, f)).astype(np.float32) * 0.05)
    w4, scale = quantize_int4_grouped(w)
    ref = x @ dequant_int4(w4, scale)
    out_scale = float(np.abs(np.asarray(ref)).max())

    calls = {}
    orig = q._int4_matmul_padded

    def spy(x, w4, scale, interpret, out_dtype_name, tm, tf, nk):
        calls["nk"] = nk
        calls["td"] = x.shape[1] // nk
        return orig(x, w4, scale, interpret, out_dtype_name, tm, tf, nk)

    q._int4_matmul_padded = spy
    try:
        out = int4_matmul(x, w4, scale, interpret=True, use_pallas=True)
    finally:
        q._int4_matmul_padded = orig
    assert calls["nk"] == 2, calls
    assert calls["td"] % 256 == 0, calls  # lane- and group-aligned chunks
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.01 * out_scale)


def test_int4_llama_close_to_bf16(rng):
    """int4-quantized params through the int4 model ~= original fp32 model
    (tiny model, loose tolerance — int4 is a 16-level grid)."""
    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg, **FP32)
    params = model.init_params(jax.random.PRNGKey(0))

    qcfg = dataclasses.replace(cfg, weight_dtype="int4")
    qmodel = LlamaForCausalLM(qcfg, **FP32)
    qparams = {"params": quantize_tree(
        jax.tree_util.tree_map(np.asarray, params)["params"], mode="int4")}
    ref_struct = qmodel.init_params(jax.random.PRNGKey(0))
    assert jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda x: 0, qparams)
    ) == jax.tree_util.tree_structure(jax.tree_util.tree_map(lambda x: 0, ref_struct))

    embeds = jnp.asarray(rng.normal(size=(2, 6, 64)).astype(np.float32) * 0.1)
    full, _ = model.apply(params, embeds)
    quant, _ = qmodel.apply(jax.tree_util.tree_map(jnp.asarray, qparams), embeds)
    err = float(jnp.abs(full - quant).max())
    assert err < 0.5, err


def test_int4_generation_runs(rng):
    from myriad_tpu.generation import GenerationConfig, greedy_generate

    cfg = LlamaConfig.tiny(weight_dtype="int4")
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
