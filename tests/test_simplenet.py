"""SimpleNet expert tests (small dims)."""

import jax
import jax.numpy as jnp
import numpy as np

from myriad_tpu.models.simplenet import (
    Discriminator,
    SimpleHead,
    SimpleNetEmbedder,
    SimpleNetInterface,
    adaptive_avg_pool_1d,
    discriminator_margin_loss,
    patchify_3x3,
)


def test_adaptive_avg_pool_matches_torch_semantics():
    x = jnp.asarray(np.arange(10, dtype=np.float32))[None]
    out = adaptive_avg_pool_1d(x, 5)
    np.testing.assert_allclose(np.asarray(out)[0], [0.5, 2.5, 4.5, 6.5, 8.5])
    out2 = adaptive_avg_pool_1d(x, 3)  # windows [0:4],[3:7],[6:10]
    np.testing.assert_allclose(np.asarray(out2)[0], [1.5, 4.5, 7.5])


def test_patchify_neighbourhood():
    f = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    p = patchify_3x3(f)
    assert p.shape == (1, 4, 4, 1, 9)
    # center position (1,1): neighbourhood rows 0..2 x cols 0..2
    np.testing.assert_allclose(
        np.asarray(p[0, 1, 1, 0]), [0, 1, 2, 4, 5, 6, 8, 9, 10]
    )


def test_embedder_and_interface(rng):
    emb = SimpleNetEmbedder(pretrain_embed_dimension=64, target_embed_dimension=64)
    imgs = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    params = emb.init(jax.random.PRNGKey(0), imgs)
    feats, (h, w) = emb.apply(params, imgs)
    assert feats.shape == (2, h * w, 64) and (h, w) == (8, 8)

    head = SimpleHead(target_embed_dimension=64, dsc_hidden=32)
    hp = head.init(jax.random.PRNGKey(1), feats[0])
    iface = SimpleNetInterface(
        embedder=emb, embedder_params=params, head=head,
        head_params={"bottle": hp, "screw": hp}, map_size=32,
    )
    scores, maps = iface(imgs, ["bottle", "screw"])
    assert scores.shape == (2,) and maps.shape == (2, 32, 32, 1)
    assert np.isfinite(scores).all()


def test_discriminator_margin_loss(rng):
    head = SimpleHead(target_embed_dimension=16, dsc_hidden=8)
    feats = jnp.asarray(rng.normal(size=(10, 16)), jnp.float32)
    params = head.init(jax.random.PRNGKey(0), feats)
    loss = discriminator_margin_loss(head, params, feats, noise_std=0.1,
                                     margin=0.5, rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)) and float(loss) >= 0
    # gradient flows
    g = jax.grad(
        lambda p: discriminator_margin_loss(head, p, feats, 0.1, 0.5,
                                            jax.random.PRNGKey(1))
    )(params)
    gmax = max(float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g))
    assert gmax > 0


def test_vision_expert_mux(rng, tmp_path):
    from myriad_tpu.models.vision_experts import (
        PrecomputedMaskExpert,
        build_vision_expert,
        renormalize,
    )

    x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)), jnp.float32)
    y = renormalize(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    # precomputed-mask expert serves zeros for missing files
    pe = PrecomputedMaskExpert(str(tmp_path), map_size=32)
    maps, masks = pe(["mvtec/bottle/test/good/000.png"])
    assert maps.shape == (1, 32, 32, 1)
    assert float(jnp.abs(maps).max()) == 0.0

    try:
        build_vision_expert("nonexistent")
    except KeyError as e:
        assert "unknown vision expert" in str(e)
