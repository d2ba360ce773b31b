"""Converter structure tests: converted trees must match module.init trees."""

import jax
import jax.numpy as jnp
import numpy as np

from myriad_tpu.convert import (
    convert_anomaly_decoder_state_dict,
    convert_eva_vit_state_dict,
    convert_imagebind_state_dict,
    convert_qformer_state_dict,
)
from myriad_tpu.models.eva_vit import EvaViT
from myriad_tpu.models.imagebind import ImageBindConfig
from myriad_tpu.models.qformer import QFormer
from myriad_tpu.models.vision_expert import AnomalyExpertModule

FP32 = dict(dtype=jnp.float32, param_dtype=jnp.float32)


def _tree_structure_equal(a, b, path=""):
    if isinstance(a, dict) != isinstance(b, dict):
        raise AssertionError(f"type mismatch at {path}: {type(a)} vs {type(b)}")
    if isinstance(a, dict):
        if set(a) != set(b):
            raise AssertionError(f"keys at {path}: {sorted(a)} vs {sorted(b)}")
        for k in a:
            _tree_structure_equal(a[k], b[k], f"{path}/{k}")
    else:
        if tuple(np.shape(a)) != tuple(np.shape(b)):
            raise AssertionError(f"shape at {path}: {np.shape(a)} vs {np.shape(b)}")


def test_eva_converter_structure():
    vit = EvaViT(img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=4,
                 mlp_ratio=4.0, **FP32)
    ref = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3)))

    rng = np.random.default_rng(0)
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(32, 3, 14, 14)),
        "patch_embed.proj.bias": rng.normal(size=(32,)),
        "cls_token": rng.normal(size=(1, 1, 32)),
        "pos_embed": rng.normal(size=(1, 5, 32)),
    }
    for i in range(2):
        p = f"blocks.{i}."
        sd |= {
            p + "norm1.weight": np.ones(32), p + "norm1.bias": np.zeros(32),
            p + "norm2.weight": np.ones(32), p + "norm2.bias": np.zeros(32),
            p + "attn.qkv.weight": rng.normal(size=(96, 32)),
            p + "attn.q_bias": np.zeros(32), p + "attn.v_bias": np.zeros(32),
            p + "attn.proj.weight": rng.normal(size=(32, 32)),
            p + "attn.proj.bias": np.zeros(32),
            p + "mlp.fc1.weight": rng.normal(size=(128, 32)),
            p + "mlp.fc1.bias": np.zeros(128),
            p + "mlp.fc2.weight": rng.normal(size=(32, 128)),
            p + "mlp.fc2.bias": np.zeros(32),
        }
    conv = convert_eva_vit_state_dict(sd, depth=2)
    _tree_structure_equal(conv["params"], jax.tree_util.tree_map(np.asarray, ref["params"]))
    # converted params actually run
    out = vit.apply(jax.tree_util.tree_map(jnp.asarray, conv), jnp.ones((1, 28, 28, 3)))
    assert out.shape == (1, 5, 32)


def test_qformer_converter_structure():
    qf = QFormer(hidden_size=16, num_layers=2, num_heads=2, intermediate_size=32, **FP32)
    ref = qf.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 16)), jnp.zeros((1, 6, 24)))
    rng = np.random.default_rng(1)

    def attn_sd(pre, kv_dim):
        return {
            pre + "self.query.weight": rng.normal(size=(16, 16)),
            pre + "self.query.bias": np.zeros(16),
            pre + "self.key.weight": rng.normal(size=(16, kv_dim)),
            pre + "self.key.bias": np.zeros(16),
            pre + "self.value.weight": rng.normal(size=(16, kv_dim)),
            pre + "self.value.bias": np.zeros(16),
            pre + "output.dense.weight": rng.normal(size=(16, 16)),
            pre + "output.dense.bias": np.zeros(16),
            pre + "output.LayerNorm.weight": np.ones(16),
            pre + "output.LayerNorm.bias": np.zeros(16),
        }

    sd = {
        "bert.embeddings.LayerNorm.weight": np.ones(16),
        "bert.embeddings.LayerNorm.bias": np.zeros(16),
    }
    for i in range(2):
        pre = f"bert.encoder.layer.{i}."
        sd |= attn_sd(pre + "attention.", 16)
        if i % 2 == 0:
            sd |= attn_sd(pre + "crossattention.", 24)
        sd |= {
            pre + "intermediate_query.dense.weight": rng.normal(size=(32, 16)),
            pre + "intermediate_query.dense.bias": np.zeros(32),
            pre + "output_query.dense.weight": rng.normal(size=(16, 32)),
            pre + "output_query.dense.bias": np.zeros(16),
            pre + "output_query.LayerNorm.weight": np.ones(16),
            pre + "output_query.LayerNorm.bias": np.zeros(16),
        }
    conv = convert_qformer_state_dict(sd, num_layers=2)
    _tree_structure_equal(conv["params"], jax.tree_util.tree_map(np.asarray, ref["params"]))


def test_imagebind_converter_structure():
    cfg = ImageBindConfig.tiny()
    module = AnomalyExpertModule(cfg, **FP32)
    imgs = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
    ids = jnp.zeros((1, cfg.context_length), jnp.int32)
    vis_params = module.init(jax.random.PRNGKey(0), imgs,
                             method=AnomalyExpertModule.decoded_patch_tokens)
    txt_params = module.init(jax.random.PRNGKey(0), ids,
                             method=AnomalyExpertModule.encode_text)
    ref = {**jax.tree_util.tree_map(np.asarray, vis_params["params"]),
           **jax.tree_util.tree_map(np.asarray, txt_params["params"])}

    rng = np.random.default_rng(2)
    d, td = cfg.vision_embed_dim, cfg.text_embed_dim
    n_tok = (cfg.img_size // cfg.patch_size) ** 2 + 1
    sd = {
        "modality_preprocessors.vision.rgbt_stem.proj.1.weight": rng.normal(size=(d, 3, 2, 14, 14)),
        "modality_preprocessors.vision.cls_token": rng.normal(size=(1, 1, d)),
        "modality_preprocessors.vision.pos_embedding_helper.pos_embed": rng.normal(size=(1, n_tok, d)),
        "modality_trunks.vision.pre_transformer_layer.0.weight": np.ones(d),
        "modality_trunks.vision.pre_transformer_layer.0.bias": np.zeros(d),
        "modality_heads.vision.0.weight": np.ones(d),
        "modality_heads.vision.0.bias": np.zeros(d),
        "modality_heads.vision.2.weight": rng.normal(size=(cfg.out_embed_dim, d)),
        "modality_preprocessors.text.token_embedding.weight": rng.normal(size=(cfg.vocab_size, td)),
        "modality_preprocessors.text.pos_embed": rng.normal(size=(1, cfg.context_length, td)),
        "modality_heads.text.proj.0.weight": np.ones(td),
        "modality_heads.text.proj.0.bias": np.zeros(td),
        "modality_heads.text.proj.1.weight": rng.normal(size=(cfg.out_embed_dim, td)),
        "modality_postprocessors.text.1.log_logit_scale": np.asarray(2.66),
    }

    def blk(pre, dim):
        return {
            pre + "norm_1.weight": np.ones(dim), pre + "norm_1.bias": np.zeros(dim),
            pre + "norm_2.weight": np.ones(dim), pre + "norm_2.bias": np.zeros(dim),
            pre + "attn.in_proj_weight": rng.normal(size=(3 * dim, dim)),
            pre + "attn.in_proj_bias": np.zeros(3 * dim),
            pre + "attn.out_proj.weight": rng.normal(size=(dim, dim)),
            pre + "attn.out_proj.bias": np.zeros(dim),
            pre + "mlp.fc1.weight": rng.normal(size=(4 * dim, dim)),
            pre + "mlp.fc1.bias": np.zeros(4 * dim),
            pre + "mlp.fc2.weight": rng.normal(size=(dim, 4 * dim)),
            pre + "mlp.fc2.bias": np.zeros(dim),
        }

    for i in range(cfg.vision_num_blocks):
        sd |= blk(f"modality_trunks.vision.blocks.{i}.", d)
    for i in range(cfg.text_num_blocks):
        sd |= blk(f"modality_trunks.text.blocks.{i}.", td)

    conv = convert_imagebind_state_dict(sd, cfg)
    dec_sd = {}
    for i in range(len(cfg.out_layers)):
        dec_sd[f"image_decoder.fc.{i}.weight"] = rng.normal(size=(cfg.out_embed_dim, d))
        dec_sd[f"image_decoder.fc.{i}.bias"] = np.zeros(cfg.out_embed_dim)
    dec = convert_anomaly_decoder_state_dict(dec_sd, num_taps=len(cfg.out_layers))

    merged = dict(conv["params"])
    merged["image_decoder"] = dec["params"]
    _tree_structure_equal(merged, ref)
    # converted params run end-to-end
    out = module.apply({"params": merged}, jnp.ones((1, cfg.img_size, cfg.img_size, 3)),
                       method=AnomalyExpertModule.decoded_patch_tokens)
    assert out[0].shape[0] == 1
