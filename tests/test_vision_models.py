"""EVA-ViT / adaptor nets / Q-Former unit tests (fp32 on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myriad_tpu.models.eva_vit import EvaAttention, EvaViT
from myriad_tpu.models.networks import LoraAdaptorV2, VEInstructorV2, VETokenizer
from myriad_tpu.models.qformer import QFormer, init_query_tokens


FP32 = dict(dtype=jnp.float32, param_dtype=jnp.float32)


def test_eva_vit_shapes_and_determinism():
    vit = EvaViT(img_size=28, patch_size=14, embed_dim=64, depth=2, num_heads=4,
                 mlp_ratio=4.0, **FP32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 28, 28, 3)), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), x)
    out = vit.apply(params, x)
    assert out.shape == (2, 5, 64)  # cls + 4 patches
    out2 = vit.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_eva_attention_matches_numpy():
    attn = EvaAttention(num_heads=2, **FP32)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 3, 8)), jnp.float32)
    params = attn.init(jax.random.PRNGKey(1), x)
    out = np.asarray(attn.apply(params, x))

    p = jax.tree_util.tree_map(np.asarray, params["params"])
    qkv = np.asarray(x[0]) @ p["qkv"]["kernel"]
    q, k, v = np.split(qkv, 3, -1)
    q = q + p["q_bias"]
    v = v + p["v_bias"]
    heads = []
    for h in range(2):
        sl = slice(h * 4, (h + 1) * 4)
        logits = (q[:, sl] @ k[:, sl].T) * (4**-0.5)
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        heads.append(w @ v[:, sl])
    ref = np.concatenate(heads, -1) @ p["proj"]["kernel"] + p["proj"]["bias"]
    np.testing.assert_allclose(out[0], ref, atol=1e-5)


def test_lora_adaptor_residual():
    m = LoraAdaptorV2(dims=16, input_dim=2, **FP32)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 5, 16)), jnp.float32)
    params = m.init(jax.random.PRNGKey(2), x)
    out = m.apply(params, x)
    w1 = params["params"]["conv1"]["kernel"]
    w2 = params["params"]["conv2"]["kernel"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(x + x @ w1 @ w2), atol=1e-5)


def test_lora_adaptor_expanding_out_dim():
    m = LoraAdaptorV2(dims=8, input_dim=2, out_dim=12, **FP32)
    x = jnp.ones((1, 3, 8))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 3, 12)
    w1 = params["params"]["conv1"]["kernel"]
    w2 = params["params"]["conv2"]["kernel"]
    ref = np.array(x @ w1 @ w2)
    ref[..., :8] += 1.0  # residual zero-padded into wider output
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize("version,n_tokens", [(0, 49), (1, 25), (2, 9)])
def test_ve_instructor_tokens(version, n_tokens):
    m = VEInstructorV2(version=version, **FP32)
    maps = jnp.ones((2, 224, 224, 1))
    params = m.init(jax.random.PRNGKey(0), maps)
    out = m.apply(params, maps)
    assert out.shape == (2, n_tokens, 768)


def test_ve_tokenizer_tokens():
    m = VETokenizer(**FP32)
    maps = jnp.ones((2, 224, 224, 1))
    params = m.init(jax.random.PRNGKey(0), maps)
    out = m.apply(params, maps)
    assert out.shape == (2, 18, 4096)
    # first 9 tokens are the learned base prompts (identical across batch)
    np.testing.assert_array_equal(np.asarray(out[0, :9]), np.asarray(out[1, :9]))


def test_qformer_shapes_and_cross_mask():
    qf = QFormer(hidden_size=32, num_layers=4, num_heads=4, intermediate_size=64,
                 **FP32)
    rng = np.random.default_rng(3)
    queries = jnp.asarray(rng.normal(size=(2, 6, 32)), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(2, 10, 48)), jnp.float32)
    params = qf.init(jax.random.PRNGKey(3), queries, enc)
    out = qf.apply(params, queries, enc)
    assert out.shape == (2, 6, 32)

    # masking an encoder token == replacing its content (it can't leak through)
    mask = jnp.ones((2, 10)).at[:, -1].set(0.0)
    enc_altered = enc.at[:, -1].set(123.0)
    out_m1 = qf.apply(params, queries, enc, mask)
    out_m2 = qf.apply(params, queries, enc_altered, mask)
    np.testing.assert_allclose(np.asarray(out_m1), np.asarray(out_m2), atol=2e-4)
    # and unmasked it does change the output
    out_u = qf.apply(params, queries, enc_altered)
    assert float(np.abs(np.asarray(out_u) - np.asarray(out_m1)).max()) > 1e-3


def test_query_tokens_init():
    q = init_query_tokens(jax.random.PRNGKey(0))
    assert q.shape == (1, 32, 768)
    assert 0.01 < float(jnp.std(q)) < 0.03


def test_clip_vit_l_shapes():
    from myriad_tpu.models.clip_vit import ClipViT

    vit = ClipViT(img_size=28, patch_size=14, width=32, layers=2, heads=4, **FP32)
    x = jnp.ones((2, 28, 28, 3))
    params = vit.init(jax.random.PRNGKey(0), x)
    out = vit.apply(params, x)
    assert out.shape == (2, 5, 32)
    # uint8 path works too
    out_u8 = vit.apply(params, jnp.zeros((2, 28, 28, 3), jnp.uint8))
    assert out_u8.shape == (2, 5, 32)


def test_attention_adaptor_and_fea_tokenizer():
    from myriad_tpu.models.networks import AttentionAdaptor, VETokenizerFea

    m = AttentionAdaptor(dims=16, grid=4, **FP32)
    x = jnp.ones((2, 17, 16))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 17, 16)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(x[:, 0]))

    t = VETokenizerFea(llm_dim=64, **FP32)
    maps = jnp.ones((2, 224, 224, 1))
    tp = t.init(jax.random.PRNGKey(0), maps)
    tok = t.apply(tp, maps)
    assert tok.shape == (2, 18, 64)


def test_randaugment_bank():
    import numpy as _np
    from myriad_tpu.processors.randaugment import OP_BANK, RandomAugment

    img = _np.random.default_rng(0).integers(0, 255, (32, 32, 3), dtype=_np.uint8)
    for name, op in OP_BANK.items():
        out = _np.asarray(op(img, 5))
        assert out.shape[:2] == (32, 32), name
    aug = RandomAugment(N=3, M=7)
    out = aug(img)
    assert out.shape == (32, 32, 3)
