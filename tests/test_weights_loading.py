"""Pretrained-weight bootstrap chain (SURVEY.md §5.4, VERDICT r1 missing #1).

Builds a donor tiny Myriad, exports each tower as a "converted" npz file
(exactly the layout tools/convert_weights.py writes), then constructs a
fresh model via ``from_config`` with the ``weights:`` block and asserts:

* every frozen leaf covered by the given towers is loaded (zero missing),
* loaded values match the donor bit-for-bit,
* int8 serving quantizes the bf16 llama npz on load,
* ``clip_bpe_path`` swaps the Hash stand-in for the real CLIP BPE tokenizer.

Mirrors the reference bootstrap: eva_vit.py:429-436 (EVA download),
blip2.py:91-110 (Q-Former + query_tokens + ln_vision strict=False load),
myriad.py:194-219 (Vicuna + llama_proj), adrefexpert_v2.py:106-122
(ImageBind + decoder).
"""

import gzip
import os

import numpy as np
import pytest

from myriad_tpu import checkpoint as ckpt_lib
from myriad_tpu.common.config import ConfigDict
from myriad_tpu.models.layers import Policy
from myriad_tpu.models.myriad import Myriad, MyriadArch


def _export_towers(model: Myriad, out_dir: str) -> dict:
    """Slice a donor model into per-tower npz files (converter output layout)."""
    frozen = model.frozen
    paths = {}

    def save(name, tree):
        p = os.path.join(out_dir, f"{name}.npz")
        ckpt_lib.save_params(p, tree)
        paths[name] = p

    save("vit", frozen["visual_encoder"])
    qtree = dict(frozen["qformer"])
    qtree["query_tokens"] = frozen["query_tokens"]
    qtree["ln_vision"] = frozen["ln_vision"]
    save("qformer", qtree)
    save("llama", frozen["llama"])
    save("llama_proj", {"llama_proj": frozen["llama_proj"]})
    ve = model.vision_expert.params["params"]
    save("imagebind", {"visual": ve["visual"], "text": ve["text"]})
    save("decoder", ve["image_decoder"])
    return paths


@pytest.fixture(scope="module")
def donor(tmp_path_factory):
    model = Myriad(arch=MyriadArch.tiny(), use_ve=True, policy=Policy.fp32(),
                   max_txt_len=16, seed=7)
    out = str(tmp_path_factory.mktemp("towers"))
    paths = _export_towers(model, out)
    return model, paths


def test_from_config_loads_every_frozen_leaf(donor):
    donor_model, paths = donor
    cfg = ConfigDict({
        "arch_preset": "tiny",
        "use_ve": True,
        "vit_precision": "fp32",
        "seed": 0,  # different init than the donor
        "weights": paths,
    })
    model = Myriad.from_config(cfg)
    report = model.load_pretrained_weights(paths)
    assert report["missing"] == []
    assert all(not v for v in report["skipped"].values()), report["skipped"]

    # every frozen leaf equals the donor's
    donor_flat = ckpt_lib.flatten_dict(donor_model.frozen)
    got_flat = ckpt_lib.flatten_dict(model.frozen)
    assert set(donor_flat) == set(got_flat)
    for k in donor_flat:
        np.testing.assert_array_equal(
            np.asarray(donor_flat[k]), np.asarray(got_flat[k]), err_msg=k
        )
    # and the VE towers too
    dve = ckpt_lib.flatten_dict(donor_model.vision_expert.params["params"])
    gve = ckpt_lib.flatten_dict(model.vision_expert.params["params"])
    for k in dve:
        np.testing.assert_array_equal(np.asarray(dve[k]), np.asarray(gve[k]), err_msg=k)


def test_missing_accounting_flags_partial_towers(donor):
    _, paths = donor
    model = Myriad(arch=MyriadArch.tiny(), use_ve=False, policy=Policy.fp32(), seed=0)
    # give only the vit tower, but truncated: drop one block
    tree = ckpt_lib.load_params(paths["vit"])
    tree.pop("blocks_1")
    report = model.load_pretrained_weights({"vit": tree})
    assert any(p.startswith("visual_encoder/blocks_1/") for p in report["missing"])
    # untouched towers are not counted as missing
    assert not any(p.startswith("llama/") for p in report["missing"])


def test_int8_quantize_on_load(donor):
    _, paths = donor
    arch = MyriadArch.tiny()
    import dataclasses

    arch = dataclasses.replace(
        arch, llama=dataclasses.replace(arch.llama, weight_dtype="int8")
    )
    model = Myriad(arch=arch, use_ve=False, policy=Policy.fp32(), seed=0)
    report = model.load_pretrained_weights({"llama": paths["llama"]})
    # the bf16 kernels were quantized into the int8 param layout on load
    llama_missing = [p for p in report["missing"] if p.startswith("llama/")]
    assert llama_missing == [], llama_missing
    flat = ckpt_lib.flatten_dict(model.frozen["llama"])
    w8 = [k for k in flat if k.endswith("w_int8")]
    assert w8 and all(np.asarray(flat[k]).dtype == np.int8 for k in w8)
    # dequantized weight approximates the donor's fp32 kernel
    donor_tree = ckpt_lib.load_params(paths["llama"])
    ref = np.asarray(donor_tree["model"]["layers_0"]["mlp"]["gate_proj"]["kernel"])
    q = model.frozen["llama"]["model"]["layers_0"]["mlp"]["gate_proj"]
    deq = np.asarray(q["w_int8"], np.float32) * np.asarray(q["scale"])[None, :]
    assert np.max(np.abs(deq - ref)) <= np.max(np.abs(ref)) / 127.0 + 1e-6


def test_int4_quantize_on_load(donor):
    """llm_weight_dtype int4: the llama npz quantizes into the Quant4Dense
    group-wise packed layout on load with zero missing leaves."""
    _, paths = donor
    import dataclasses

    from myriad_tpu.ops.quant import dequant_int4

    arch = MyriadArch.tiny()
    arch = dataclasses.replace(
        arch, llama=dataclasses.replace(arch.llama, weight_dtype="int4")
    )
    model = Myriad(arch=arch, use_ve=False, policy=Policy.fp32(), seed=0)
    report = model.load_pretrained_weights({"llama": paths["llama"]})
    llama_missing = [p for p in report["missing"] if p.startswith("llama/")]
    assert llama_missing == [], llama_missing
    flat = ckpt_lib.flatten_dict(model.frozen["llama"])
    w4 = [k for k in flat if k.endswith("w_int4")]
    assert w4 and all(np.asarray(flat[k]).dtype == np.uint8 for k in w4)
    donor_tree = ckpt_lib.load_params(paths["llama"])
    ref = np.asarray(donor_tree["model"]["layers_0"]["mlp"]["gate_proj"]["kernel"])
    q = model.frozen["llama"]["model"]["layers_0"]["mlp"]["gate_proj"]
    deq = np.asarray(dequant_int4(q["w_int4"], q["scale4"]))
    # int4 grid: |err| <= group amax / 14
    assert np.max(np.abs(deq - ref)) <= np.max(np.abs(ref)) / 14.0 + 1e-6


def test_int8_vision_towers_quantize_on_load(donor):
    """vit_weight_dtype/ve_weight_dtype int8: the fp32 tower npz quantizes
    into the QuantDense layout on load, with zero missing leaves and
    activations close to the fp32 tower."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    donor_model, paths = donor
    arch = MyriadArch.tiny()
    arch = dataclasses.replace(
        arch,
        vit_weight_dtype="int8",
        imagebind=dataclasses.replace(arch.imagebind, weight_dtype="int8"),
    )
    model = Myriad(arch=arch, use_ve=True, policy=Policy.fp32(), seed=0)
    report = model.load_pretrained_weights(
        {"vit": paths["vit"], "imagebind": paths["imagebind"],
         "decoder": paths["decoder"]}
    )
    assert report["missing"] == [], report["missing"][:5]
    flat = ckpt_lib.flatten_dict(model.frozen["visual_encoder"])
    assert any(k.endswith("w_int8") for k in flat)

    # encode activations stay close to the donor's fp32 tower
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 28, 28, 3)).astype(np.float32) * 0.5)
    from myriad_tpu.models.eva_vit import EvaViT

    a = arch
    vit_q = EvaViT(img_size=a.img_size, patch_size=a.vit_patch, embed_dim=a.vit_dim,
                   depth=a.vit_depth, num_heads=a.vit_heads, mlp_ratio=a.vit_mlp_ratio,
                   weight_dtype="int8", dtype=jnp.float32, param_dtype=jnp.float32)
    vit_f = EvaViT(img_size=a.img_size, patch_size=a.vit_patch, embed_dim=a.vit_dim,
                   depth=a.vit_depth, num_heads=a.vit_heads, mlp_ratio=a.vit_mlp_ratio,
                   dtype=jnp.float32, param_dtype=jnp.float32)
    got = vit_q.apply({"params": model.frozen["visual_encoder"]}, img)
    ref = vit_f.apply({"params": donor_model.frozen["visual_encoder"]}, img)
    rel = np.max(np.abs(np.asarray(got) - np.asarray(ref))) / (
        np.max(np.abs(np.asarray(ref))) + 1e-9
    )
    assert rel < 0.05, rel  # int8 weight-only quantization error bound


def test_int8_qformer_quantizes_on_load(donor):
    """qformer_weight_dtype int8: the Q-Former npz quantizes into the
    QuantDense layout on load with zero missing leaves."""
    import dataclasses

    _, paths = donor
    arch = dataclasses.replace(MyriadArch.tiny(), qformer_weight_dtype="int8")
    model = Myriad(arch=arch, use_ve=False, policy=Policy.fp32(), seed=0)
    report = model.load_pretrained_weights({"qformer": paths["qformer"]})
    missing = [p for p in report["missing"] if p.startswith("qformer/")]
    assert missing == [], missing[:5]
    flat = ckpt_lib.flatten_dict(model.frozen["qformer"])
    assert any(k.endswith("w_int8") for k in flat)
    assert not any(k.endswith("kernel") for k in flat)


def test_raw_blip2_state_dict_converts_on_load():
    """A flat torch-style BLIP-2 dict ('Qformer.bert.*' keys) converts in
    place (myriad from_config accepts q_former_model local files)."""
    model = Myriad(arch=MyriadArch.tiny(), use_ve=False, policy=Policy.fp32(), seed=0)
    a = model.arch
    rng = np.random.default_rng(3)

    def lin(i, o):
        return rng.normal(size=(o, i)).astype(np.float32)

    sd = {"query_tokens": rng.normal(size=(1, a.num_query_token, a.qformer_hidden)).astype(np.float32),
          "ln_vision.weight": np.ones(a.vit_dim, np.float32),
          "ln_vision.bias": np.zeros(a.vit_dim, np.float32),
          "Qformer.bert.embeddings.LayerNorm.weight": np.ones(a.qformer_hidden, np.float32),
          "Qformer.bert.embeddings.LayerNorm.bias": np.zeros(a.qformer_hidden, np.float32)}
    h, inter, vit = a.qformer_hidden, a.qformer_intermediate, a.vit_dim
    for i in range(a.qformer_layers):
        pre = f"Qformer.bert.encoder.layer.{i}."
        for att, kdim in (("attention.", h),) + ((("crossattention.", vit),) if i % 2 == 0 else ()):
            for name, ind in (("query", h), ("key", kdim), ("value", kdim)):
                sd[pre + att + f"self.{name}.weight"] = lin(ind, h)
                sd[pre + att + f"self.{name}.bias"] = np.zeros(h, np.float32)
            sd[pre + att + "output.dense.weight"] = lin(h, h)
            sd[pre + att + "output.dense.bias"] = np.zeros(h, np.float32)
            sd[pre + att + "output.LayerNorm.weight"] = np.ones(h, np.float32)
            sd[pre + att + "output.LayerNorm.bias"] = np.zeros(h, np.float32)
        sd[pre + "intermediate_query.dense.weight"] = lin(h, inter)
        sd[pre + "intermediate_query.dense.bias"] = np.zeros(inter, np.float32)
        sd[pre + "output_query.dense.weight"] = lin(inter, h)
        sd[pre + "output_query.dense.bias"] = np.zeros(h, np.float32)
        sd[pre + "output_query.LayerNorm.weight"] = np.ones(h, np.float32)
        sd[pre + "output_query.LayerNorm.bias"] = np.zeros(h, np.float32)

    report = model.load_pretrained_weights({"qformer": sd})
    assert report["missing"] == [], report["missing"][:5]
    got = np.asarray(model.frozen["query_tokens"])
    np.testing.assert_allclose(got, sd["query_tokens"])


def test_clip_bpe_tokenizer_wiring(tmp_path):
    """clip_bpe_path switches the VE text tokenizer to the real CLIP BPE."""
    # minimal CLIP-style merges file: header line + a few merges
    bpe = tmp_path / "bpe_vocab.txt.gz"
    with gzip.open(bpe, "wt", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.write("t h\nth e</w>\nb o\nbo t\nbot t\nbott le</w>\nl e</w>\n")
        # pad so merges[1:...] slicing keeps them all
        f.write("\n" * 4)
    cfg = ConfigDict({
        "arch_preset": "tiny",
        "use_ve": True,
        "vit_precision": "fp32",
        "clip_bpe_path": str(bpe),
    })
    model = Myriad.from_config(cfg)
    from myriad_tpu.models.clip_tokenizer import ClipBpeTokenizer

    assert isinstance(model.vision_expert.tokenizer, ClipBpeTokenizer)
    ids = model.vision_expert.tokenizer.encode("the bottle", context_length=8)
    assert len(ids) == 8 and ids[0] == model.vision_expert.tokenizer.sot


def test_minigpt4_weights_loading(donor):
    donor_model, paths = donor
    from myriad_tpu.models.mini_gpt4 import MiniGPT4

    model = MiniGPT4(arch=MyriadArch.tiny(), policy=Policy.fp32(), seed=0)
    report = model.load_pretrained_weights(
        {"vit": paths["vit"], "qformer": paths["qformer"], "llama": paths["llama"],
         "llama_proj": paths["llama_proj"]}
    )
    assert report["missing"] == [], report["missing"][:5]
    # llama_proj went to the trainable subtree (MiniGPT-4 trains it)
    assert "llama_proj" in model.trainable
    np.testing.assert_array_equal(
        np.asarray(model.trainable["llama_proj"]["kernel"]),
        np.asarray(donor_model.frozen["llama_proj"]["kernel"]),
    )
