"""Composed Myriad/MiniGPT4 model tests (tiny arch, fp32 CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from myriad_tpu.models.layers import Policy
from myriad_tpu.models.myriad import Myriad, MyriadArch
from myriad_tpu.models.mini_gpt4 import MiniGPT4


def _samples(n=2, img=28, with_aug=True):
    rng = np.random.default_rng(0)
    s = {
        "image": rng.normal(size=(n, img, img, 3)).astype(np.float32),
        "scene": ["bottle"] * n,
        "question": ["<Img><ImageHere></Img>find out if there are defects in this image."] * n,
        "question2": ["<Img><ImageHere></Img>According to IAD expert opinions, find out if there are defects."] * n,
        "question3": ["<Img><ImageHere></Img>According to IAD expert visual descriptions, find out."] * n,
        "text_input": ["No, there exists no anomalies in the image."] * n,
        "img_path": [f"mvtec/bottle/train/good/{i:03d}.png" for i in range(n)],
    }
    if with_aug:
        s["aug_image"] = rng.normal(size=(n, img, img, 3)).astype(np.float32)
        s["aug_text_input"] = ["Yes, there exists anomalies in the image."] * n
    return s


@pytest.fixture(scope="module")
def myriad_tiny():
    model = Myriad(
        arch=MyriadArch.tiny(), use_ve=False, policy=Policy.fp32(), max_txt_len=24,
        end_sym="###",
    )
    return model


def test_trainable_partition(myriad_tiny):
    m = myriad_tiny
    flat_t = sorted(
        "/".join(map(str, [getattr(k, "key", k) for k in p]))
        for p, _ in __import__("jax").tree_util.tree_leaves_with_path(m.trainable)
    )
    assert any("expert_adaptor" in p for p in flat_t)
    assert any("ve_instructor" in p for p in flat_t)
    assert any("ve_tokenizer" in p for p in flat_t)
    assert not any("visual_encoder" in p for p in flat_t)
    assert not any(p.startswith("llama/") for p in flat_t)
    # params property reassembles the full tree
    full = m.params
    assert "visual_encoder" in full and "expert_adaptor" in full


def test_forward_loss_train_add_bos(myriad_tiny):
    """train_add_bos=False drops the bos embedding from the TRAIN forward
    (aligning it with the bos-free serving numerics — the echo-state
    regime, train_to_spec); default True mirrors the reference's
    bos-prepending training path (myriad.py:414-420)."""
    m = Myriad(
        arch=MyriadArch.tiny(), use_ve=False, policy=Policy.fp32(),
        max_txt_len=24, end_sym="###", train_add_bos=False,
    )
    s = _samples()
    loss_nobos = float(m.forward(s, rng=np.random.default_rng(3))["loss"])
    assert np.isfinite(loss_nobos) and loss_nobos > 0
    # same weights (same seed), same stage draw: only the bos differs
    loss_bos = float(myriad_tiny.forward(s, rng=np.random.default_rng(3))["loss"])
    assert loss_nobos != loss_bos


def test_forward_loss_all_stages(myriad_tiny):
    m = myriad_tiny
    s = _samples()
    seen = set()
    for seed in range(6):
        out = m.forward(s, rng=np.random.default_rng(seed))
        loss = float(out["loss"])
        assert np.isfinite(loss) and loss > 0
        seen.add(round(loss, 6))
    assert len(seen) > 1  # different stages give different losses


def test_generate_shapes_and_determinism(myriad_tiny):
    m = myriad_tiny
    s = _samples(with_aug=False)
    out = m.generate(s, max_new_tokens=6)
    tokens = np.asarray(out["token_ids"])
    assert tokens.shape == (2, 6)
    out2 = m.generate(s, max_new_tokens=6)
    np.testing.assert_array_equal(tokens, np.asarray(out2["token_ids"]))
    assert out["ve_anomaly_maps"].shape[0] == 2


def test_generate_cache_granularity_invariance(myriad_tiny):
    """The model-level cache_granularity knob (llm_cache_granularity /
    generate kwarg) only changes the KV bucket rounding and staged-span
    width — transcripts must be identical across settings, staged or not
    (generation-level invariance is pinned in test_generation_invariance;
    this pins the Myriad plumbing)."""
    m = myriad_tiny
    s = _samples(with_aug=False)
    base = np.asarray(m.generate(s, max_new_tokens=6)["token_ids"])
    for g in (4, 16):
        for staged in (False, True):
            out = m.generate(s, max_new_tokens=6, cache_granularity=g,
                             staged_decode=staged)
            np.testing.assert_array_equal(base, np.asarray(out["token_ids"]),
                                          err_msg=f"g={g} staged={staged}")


def test_myriad_with_vision_expert():
    model = Myriad(
        arch=MyriadArch.tiny(), use_ve=True, policy=Policy.fp32(), max_txt_len=16,
    )
    model.vision_expert.class_names = ["bottle"]
    model.vision_expert.class_index = {"bottle": 0}
    model.vision_expert.build_text_features()
    refs = {"bottle": np.random.default_rng(1).normal(
        size=(1, model.arch.imagebind.img_size, model.arch.imagebind.img_size, 3)
    ).astype(np.float32)}
    model.vision_expert.build_reference_bank(refs)
    s = _samples()
    out = model.forward(s, rng=np.random.default_rng(0))
    assert np.isfinite(float(out["loss"]))


def test_fused_generate_matches_two_step():
    """The single-jit fused path (VE maps + prefill + decode) must produce
    the same tokens and maps as dispatching the VE separately."""
    import jax.numpy as jnp

    from myriad_tpu.generation import GenerationConfig, greedy_generate
    from myriad_tpu.models.llama import LlamaForCausalLM
    from myriad_tpu.models.myriad import MyriadModule

    model = Myriad(arch=MyriadArch.tiny(), use_ve=True, policy=Policy.fp32(),
                   max_txt_len=16)
    ve = model.vision_expert
    ve.class_names = ["bottle"]
    ve.class_index = {"bottle": 0}
    ve.build_text_features()
    s = _samples(with_aug=False)

    out = model.generate(s, max_new_tokens=5)  # fused (text cache built)
    assert ("fused_gen", 1) == next(
        k[:2] for k in model._jit_cache if k[0] == "fused_gen"
    )

    # manual two-step: VE dispatch then prefill+decode
    maps, _ = ve(jnp.asarray(np.asarray(s["image"], np.float32)), s["scene"])
    before, after = model.split_prompt(s["question2"][0])
    llama = LlamaForCausalLM(model.arch.llama, model.policy.compute_dtype,
                             model.policy.param_dtype)
    cfg = GenerationConfig(max_new_tokens=5)
    embeds = model.module.apply(
        {"params": model.params}, jnp.asarray(np.asarray(s["image"], np.float32)),
        maps, jnp.asarray(before), jnp.asarray(after), 1,
        add_bos=False,  # generate serves without bos (reference parity)
        method=MyriadModule.prefill_embeds,
    )
    import jax

    ref_tokens = greedy_generate(
        llama, {"params": model.params["llama"]}, embeds, config=cfg,
        rng=jax.random.PRNGKey(0), cache_dtype=model.policy.compute_dtype,
    )
    np.testing.assert_array_equal(np.asarray(out["token_ids"]),
                                  np.asarray(ref_tokens))
    np.testing.assert_allclose(np.asarray(out["ve_anomaly_maps"]),
                               np.asarray(maps), rtol=1e-5, atol=1e-5)


def test_minigpt4_forward():
    model = MiniGPT4(arch=MyriadArch.tiny(), policy=Policy.fp32(), max_txt_len=16)
    s = _samples(with_aug=False)
    out = model.forward(s)
    assert np.isfinite(float(out["loss"]))
    # trainable = llama_proj only by default
    import jax

    paths = [
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, _ in jax.tree_util.tree_leaves_with_path(model.trainable)
    ]
    assert all(p.startswith("llama_proj") for p in paths)


def test_registry_and_from_config():
    from myriad_tpu.common.registry import registry

    cls = registry.get_model_class("myriad")
    assert cls is Myriad
    from myriad_tpu.common.config import ConfigDict

    cfg = ConfigDict(
        {
            "arch_preset": "tiny",
            "use_ve": False,
            "max_txt_len": 16,
            "end_sym": "###",
            "vit_precision": "fp32",
            "llm_cache_granularity": 16,
            "llm_prefill_chunks": 2,
        }
    )
    model = cls.from_config(cfg)
    assert model.cache_granularity == 16
    assert model.prefill_chunks == 2
    assert model.staged_decode is True  # serving default
    out = model.forward(_samples(), rng=np.random.default_rng(0))
    assert np.isfinite(float(out["loss"]))
