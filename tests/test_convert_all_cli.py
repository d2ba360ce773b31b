"""One-command weight ingestion: `tools/convert_weights.py all` (VERDICT r2
next #8).

Builds a synthetic checkpoint directory with every reference format at tiny
scale — LAVIS EVA .pth, BLIP-2 flat 'Qformer.bert.*' dict, HF Vicuna dir,
MiniGPT-4 base ckpt ({'model': {llama_proj.*}}), ImageBind .pth, AnomalyGPT
decoder .pt, and a trainables epoch checkpoint — runs the CLI as a
subprocess, and loads the emitted `weights:` stanza into a tiny Myriad:
every frozen leaf of the named towers must be covered (missing == []).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from test_torch_parity import _eva_sd, _ib_sd, _qf_sd, _t, CFG  # noqa: E402


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM as HFLlama

    src = tmp_path_factory.mktemp("ckpts")
    out = tmp_path_factory.mktemp("npz")

    torch.manual_seed(1)
    # EVA (LAVIS single .pth, raw state dict)
    torch.save(_eva_sd(), src / "eva_vit_g.pth")
    # BLIP-2 (flat {'model': {'Qformer.bert.*', 'query_tokens', 'ln_vision.*'}})
    qf = {f"Qformer.{k}": v for k, v in _qf_sd(prefix="bert.").items()}
    qf["query_tokens"] = _t((1, 8, 16))
    qf["ln_vision.weight"] = 1 + _t((32,))
    qf["ln_vision.bias"] = _t((32,))
    torch.save({"model": qf}, src / "blip2_pretrained_flant5xxl.pth")
    # Vicuna HF dir
    hf_cfg = HFConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    hf = HFLlama(hf_cfg)
    vdir = src / "vicuna-7b"
    vdir.mkdir()
    torch.save(hf.state_dict(), vdir / "pytorch_model.bin")
    # MiniGPT-4 base ckpt (llama_proj)
    torch.save({"model": {"llama_proj.weight": _t((64, 16)),
                          "llama_proj.bias": _t((64,))}},
               src / "pretrained_minigpt4_7b.pth")
    # ImageBind + AnomalyGPT decoder
    torch.save(_ib_sd(), src / "imagebind_huge.pth")
    dec = {}
    for i in range(len(CFG.out_layers)):
        dec[f"image_decoder.fc.{i}.weight"] = _t((CFG.out_embed_dim,
                                                  CFG.vision_embed_dim))
        dec[f"image_decoder.fc.{i}.bias"] = _t((CFG.out_embed_dim,))
    torch.save({"model": dec}, src / "pytorch_mvtec_model.pt")
    # trainables epoch ckpt (reference runner ring format)
    nets = {
        "expert_adaptor.conv1.weight": _t((2, 32)),
        "expert_adaptor.conv2.weight": _t((32, 2)),
    }
    torch.save({"model": nets}, src / "checkpoint_3.pth")

    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "convert_weights.py"),
         "all", "--src", str(src), "--out", str(out)],
        capture_output=True, text=True, cwd=ROOT, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return src, out, proc


def test_all_towers_discovered_and_written(converted):
    _, out, proc = converted
    for tower in ("vit", "qformer", "llama", "llama_proj", "imagebind",
                  "decoder", "trainables"):
        assert (out / f"{tower}.npz").is_file(), (tower, proc.stdout)
    manifest = json.loads((out / "manifest.json").read_text())
    for tower, entry in manifest.items():
        assert len(entry["sha256"]) == 64
        assert entry["params"] > 0
    assert "WARNING" not in proc.stdout, proc.stdout


def test_weights_stanza_loads_with_zero_missing(converted):
    """The emitted weights.yaml paths bootstrap a tiny Myriad with every
    named-tower frozen leaf covered (the from_config chain the reference's
    five-tower load performs, myriad.py:100-233)."""
    import yaml

    from myriad_tpu.models.layers import Policy
    from myriad_tpu.models.llama import LlamaConfig
    from myriad_tpu.models.myriad import Myriad, MyriadArch

    _, out, _ = converted
    stanza = yaml.safe_load((out / "weights.yaml").read_text())
    weights = stanza["model"]["weights"]
    assert set(weights) == {"vit", "qformer", "llama", "llama_proj",
                            "imagebind", "decoder"}

    arch = MyriadArch.tiny(
        vit_dim=32, vit_depth=2, vit_heads=4, vit_mlp_ratio=2.0,
        num_query_token=8, qformer_hidden=16, qformer_layers=2,
        qformer_heads=2, qformer_intermediate=32,
        llama=LlamaConfig.tiny(),
    )
    model = Myriad(arch=arch, use_ve=True, policy=Policy.fp32(),
                   max_txt_len=16, seed=0)
    report = model.load_pretrained_weights(weights)
    assert report["missing"] == [], report["missing"][:10]
    assert set(report["loaded"]) == set(weights)
