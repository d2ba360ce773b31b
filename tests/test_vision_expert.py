"""Vision expert (ImageBind + anomaly maps) tests on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myriad_tpu.models.clip_tokenizer import HashTokenizer
from myriad_tpu.models.imagebind import (
    ImageBindConfig,
    ImageBindText,
    ImageBindVision,
)
from myriad_tpu.models.vision_expert import (
    AnomalyExpertModule,
    VisionExpert,
    prompt_sentences_for,
    upsample_align_corners,
)

FP32 = dict(dtype=jnp.float32, param_dtype=jnp.float32)


@pytest.fixture(scope="module")
def expert():
    cfg = ImageBindConfig.tiny()
    module = AnomalyExpertModule(cfg, map_size=56, **FP32)
    imgs = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
    tok_ids = jnp.zeros((1, cfg.context_length), jnp.int32)
    params = module.init(
        jax.random.PRNGKey(0),
        imgs,
        jnp.zeros((1, 2, cfg.out_embed_dim)),
        method=AnomalyExpertModule.zero_shot,
    )
    # add the text tower params (zero_shot doesn't touch them)
    text_params = module.init(jax.random.PRNGKey(1), tok_ids,
                              method=AnomalyExpertModule.encode_text)
    merged = {"params": {**params["params"], **text_params["params"]}}
    ve = VisionExpert(module, merged, tokenizer=HashTokenizer(cfg.vocab_size),
                      class_names=["bottle", "cable"])
    return cfg, module, ve


def test_upsample_align_corners_matches_manual():
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4))
    up = upsample_align_corners(x, (7, 7))
    # corners preserved exactly (align_corners=True invariant)
    assert float(up[0, 0, 0]) == 0.0
    assert float(up[0, -1, -1]) == 15.0
    assert float(up[0, 0, -1]) == 3.0
    # midpoint between two grid points is their mean
    assert float(up[0, 0, 1]) == pytest.approx((0 + 1) / 2)


def test_prompt_ensemble_counts():
    normal, abnormal = prompt_sentences_for("metal_nut")
    assert len(normal) == 14 and len(abnormal) == 10
    assert "a photo of a metal nut." in normal


def test_vision_tower_shapes(expert):
    cfg, module, ve = expert
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(2, cfg.img_size, cfg.img_size, 3)),
                       jnp.float32)
    vis = ImageBindVision(cfg, **FP32)
    p = vis.init(jax.random.PRNGKey(0), imgs)
    emb, taps = vis.apply(p, imgs)
    n_patches = (cfg.img_size // cfg.patch_size) ** 2
    assert emb.shape == (2, cfg.out_embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5)
    assert len(taps) == len(cfg.out_layers)
    assert taps[0].shape == (2, n_patches + 1, cfg.vision_embed_dim)


def test_text_tower_eos_pooling(expert):
    cfg, module, ve = expert
    tok = HashTokenizer(cfg.vocab_size)
    ids = jnp.asarray([tok.encode("flawless bottle", cfg.context_length)], jnp.int32)
    text = ImageBindText(cfg, **FP32)
    p = text.init(jax.random.PRNGKey(0), ids)
    out = text.apply(p, ids)
    assert out.shape == (1, cfg.out_embed_dim)
    # tokens after the EOS don't change the embedding (causal + EOS pooling)
    ids2 = np.array(ids)
    eos_pos = int(np.argmax(ids2[0]))
    ids2[0, eos_pos + 1 :] = 5
    out2 = text.apply(p, jnp.asarray(ids2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_zero_shot_maps(expert):
    cfg, module, ve = expert
    ve.build_text_features()
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.normal(size=(3, cfg.img_size, cfg.img_size, 3)), jnp.float32)
    maps, masks = ve(imgs, ["bottle", "cable", "bottle"])
    grid = cfg.img_size // cfg.patch_size
    assert maps.shape == (3, 56, 56, 1)
    assert masks.shape == (3, grid, grid, 1)
    m = np.asarray(maps)
    assert (m >= 0).all() and (m <= 1).all()
    # different class prompts -> different maps for the same image
    maps2, _ = ve(imgs, ["cable", "cable", "bottle"])
    assert float(np.abs(np.asarray(maps2)[0] - m[0]).max()) > 1e-7


def test_one_shot_maps(expert):
    cfg, module, ve = expert
    rng = np.random.default_rng(2)
    refs = {
        "bottle": rng.normal(size=(2, cfg.img_size, cfg.img_size, 3)).astype(np.float32),
        "cable": rng.normal(size=(1, cfg.img_size, cfg.img_size, 3)).astype(np.float32),
    }
    ve.build_reference_bank(refs)
    imgs = jnp.asarray(rng.normal(size=(2, cfg.img_size, cfg.img_size, 3)), jnp.float32)
    maps, masks = ve(imgs, ["bottle", "cable"], one_shot=True)
    assert maps.shape == (2, 56, 56, 1)
    # a reference image queried against its own bank -> sim 1 -> anomaly ~0
    self_maps, _ = ve(jnp.asarray(refs["bottle"][:1]), ["bottle"], one_shot=True)
    assert float(np.abs(np.asarray(self_maps)).max()) < 1e-4


def test_hash_tokenizer_stability():
    t = HashTokenizer(1000)
    a = t.encode("a photo of a bottle.", 16)
    b = t.encode("a photo of a bottle.", 16)
    assert a == b and len(a) == 16
    assert a[0] == 998 and t.eot in a
