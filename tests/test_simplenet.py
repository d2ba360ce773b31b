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


def test_simplenet_head_converter_torch_parity(rng):
    """Converted ckpt.pth head must reproduce the torch Projection +
    Discriminator math (reference simplenet.py:43-141)."""
    import torch
    import torch.nn.functional as F

    from myriad_tpu.convert import convert_simplenet_head_state_dict

    d, hidden = 16, 8
    torch.manual_seed(0)
    ckpt = {
        "pre_projection": {
            "layers.0fc.weight": torch.randn(d, d) * 0.2,
            "layers.0fc.bias": torch.randn(d) * 0.2,
        },
        "discriminator": {
            "body.block1.0.weight": torch.randn(hidden, d) * 0.2,
            "body.block1.0.bias": torch.randn(hidden) * 0.2,
            "body.block1.1.weight": 1 + torch.randn(hidden) * 0.1,
            "body.block1.1.bias": torch.randn(hidden) * 0.1,
            "body.block1.1.running_mean": torch.randn(hidden) * 0.1,
            "body.block1.1.running_var": 1 + torch.rand(hidden) * 0.1,
            "tail.weight": torch.randn(1, hidden) * 0.2,
        },
    }
    x = torch.randn(6, d)
    with torch.no_grad():
        h = F.linear(x, ckpt["pre_projection"]["layers.0fc.weight"],
                     ckpt["pre_projection"]["layers.0fc.bias"])
        dsc = ckpt["discriminator"]
        h = F.linear(h, dsc["body.block1.0.weight"], dsc["body.block1.0.bias"])
        h = F.batch_norm(h, dsc["body.block1.1.running_mean"],
                         dsc["body.block1.1.running_var"],
                         dsc["body.block1.1.weight"], dsc["body.block1.1.bias"],
                         training=False, eps=1e-5)
        h = F.leaky_relu(h, 0.2)
        ref = F.linear(h, dsc["tail.weight"]).numpy()

    params = convert_simplenet_head_state_dict(ckpt)["params"]
    head = SimpleHead(target_embed_dimension=d, dsc_hidden=hidden)
    got = head.apply({"params": params}, jnp.asarray(x.numpy()))
    assert np.max(np.abs(np.asarray(got) - ref)) < 1e-5


def test_wideresnet_converter_covers_backbone(rng):
    """Synthetic torchvision-style WRN-50-2 state dict converts with zero
    missing/skipped leaves against the flax backbone tree."""
    from myriad_tpu import checkpoint as ckpt_lib
    from myriad_tpu.convert import convert_wide_resnet50_state_dict
    from myriad_tpu.models.simplenet import WideResNet50

    net = WideResNet50()
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    ref_params = jax.eval_shape(
        lambda r: net.init(r, imgs), jax.random.PRNGKey(0)
    )["params"]

    # synthesize the torchvision dict from the flax shapes (inverse mapping)
    sd = {}

    def emit(prefix, tree):
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                emit(name, v)
            else:
                sd[name] = v

    flat = ckpt_lib.flatten_dict(
        jax.tree_util.tree_map(lambda s: np.zeros(s.shape, np.float32), ref_params)
    )
    for path, arr in flat.items():
        parts = path.split("/")
        if parts[0] == "conv1":
            sd["conv1.weight"] = arr.transpose(3, 2, 0, 1)
        elif parts[0] == "bn1":
            key = {"scale": "weight", "bias": "bias", "mean": "running_mean",
                   "var": "running_var"}[parts[1]]
            sd[f"bn1.{key}"] = arr
        else:
            stage, idx = parts[0].rsplit("_", 1)
            mod = parts[1]
            if mod.startswith("conv"):
                sd[f"{stage}.{idx}.{mod}.weight"] = arr.transpose(3, 2, 0, 1)
            elif mod == "downsample_conv":
                sd[f"{stage}.{idx}.downsample.0.weight"] = arr.transpose(3, 2, 0, 1)
            else:
                bn_name = (f"{stage}.{idx}.downsample.1" if mod == "downsample_bn"
                           else f"{stage}.{idx}.{mod}")
                key = {"scale": "weight", "bias": "bias", "mean": "running_mean",
                       "var": "running_var"}[parts[2]]
                sd[f"{bn_name}.{key}"] = arr

    tree = convert_wide_resnet50_state_dict(sd)["params"]
    merged, loaded, skipped = ckpt_lib.merge_with_paths(
        jax.tree_util.tree_map(lambda s: np.zeros(s.shape, np.float32), ref_params),
        tree,
    )
    assert not skipped, skipped[:5]
    assert len(loaded) == len(flat)


def test_myriad_vis_expert_knob(tmp_path):
    """vis_expert: aprilgan routes prepare_sample through the
    precomputed-mask expert (from_config wiring)."""
    from myriad_tpu.common.config import ConfigDict
    from myriad_tpu.models.myriad import Myriad
    from myriad_tpu.models.vision_experts import PrecomputedMaskExpert

    cfg = ConfigDict({
        "arch_preset": "tiny", "use_ve": False, "vit_precision": "fp32",
        "max_txt_len": 16, "vis_expert": "aprilgan",
        "vis_expert_args": {"ve_root": str(tmp_path)},
    })
    model = Myriad.from_config(cfg)
    assert isinstance(model.expert, PrecomputedMaskExpert)
    s = {
        "image": np.zeros((1, 28, 28, 3), np.float32),
        "scene": ["bottle"],
        "question": ["<Img><ImageHere></Img>q"],
        "img_path": ["mvtec/bottle/test/good/000.png"],
    }
    image, question, texts, maps, one_maps = model.prepare_sample(
        s, stage=1, training=False
    )
    assert np.asarray(maps).shape == (1, model.arch.map_size, model.arch.map_size, 1)
    assert float(np.abs(np.asarray(maps)).max()) == 0.0  # missing file -> zeros


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
