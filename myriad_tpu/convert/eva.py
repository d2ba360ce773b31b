"""LAVIS EVA-ViT state_dict -> flax EvaViT params (reference eva_vit.py
weight layout, factory :415-436)."""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)
    return arr.astype(np.float32)


def convert_eva_vit_state_dict(state_dict: Dict, depth: int = 39) -> Dict:
    sd = {k: _t(v) for k, v in state_dict.items()}
    p: Dict = {}
    # torch Conv2d OIHW -> flax HWIO
    p["patch_embed"] = {
        "kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
        "bias": sd["patch_embed.proj.bias"],
    }
    p["cls_token"] = sd["cls_token"]
    p["pos_embed"] = sd["pos_embed"]
    for i in range(depth):
        pre = f"blocks.{i}."
        p[f"blocks_{i}"] = {
            "norm1": {"scale": sd[pre + "norm1.weight"], "bias": sd[pre + "norm1.bias"]},
            "norm2": {"scale": sd[pre + "norm2.weight"], "bias": sd[pre + "norm2.bias"]},
            "attn": {
                "qkv": {"kernel": sd[pre + "attn.qkv.weight"].T},
                "q_bias": sd[pre + "attn.q_bias"],
                "v_bias": sd[pre + "attn.v_bias"],
                "proj": {
                    "kernel": sd[pre + "attn.proj.weight"].T,
                    "bias": sd[pre + "attn.proj.bias"],
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": sd[pre + "mlp.fc1.weight"].T,
                    "bias": sd[pre + "mlp.fc1.bias"],
                },
                "fc2": {
                    "kernel": sd[pre + "mlp.fc2.weight"].T,
                    "bias": sd[pre + "mlp.fc2.bias"],
                },
            },
        }
    return {"params": p}
