"""ImageBind-huge torch state_dict -> flax params.

Covers the vision + text towers Myriad uses (the anomaly expert,
adrefexpert_v2.py:106-122).  The video stem Conv3d kernel (D,3,2,14,14) is
summed over the time axis — exact because PadIm2Video repeats the single
frame twice (see imagebind.py module docstring).

Also converts the AnomalyGPT LinearLayer decoder (``image_decoder.fc.{i}``)
from ``pytorch_{mvtec,visa}_model.pt``.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from myriad_tpu.models.imagebind import ImageBindConfig


def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)
    return arr.astype(np.float32)


def _block(sd: Dict, pre: str) -> Dict:
    return {
        "norm_1": {"scale": sd[pre + "norm_1.weight"], "bias": sd[pre + "norm_1.bias"]},
        "norm_2": {"scale": sd[pre + "norm_2.weight"], "bias": sd[pre + "norm_2.bias"]},
        "attn": {
            "in_proj": {
                "kernel": sd[pre + "attn.in_proj_weight"].T,
                "bias": sd[pre + "attn.in_proj_bias"],
            },
            "out_proj": {
                "kernel": sd[pre + "attn.out_proj.weight"].T,
                "bias": sd[pre + "attn.out_proj.bias"],
            },
        },
        "fc1": {"kernel": sd[pre + "mlp.fc1.weight"].T, "bias": sd[pre + "mlp.fc1.bias"]},
        "fc2": {"kernel": sd[pre + "mlp.fc2.weight"].T, "bias": sd[pre + "mlp.fc2.bias"]},
    }


def convert_imagebind_state_dict(state_dict: Dict, config: ImageBindConfig) -> Dict:
    sd = {k: _t(v) for k, v in state_dict.items()}
    p: Dict = {"visual": {}, "text": {}}

    vis = p["visual"]
    stem = sd["modality_preprocessors.vision.rgbt_stem.proj.1.weight"]
    # (D, 3, T, 14, 14) -> sum T -> HWIO (14, 14, 3, D)
    vis["rgbt_stem"] = {"kernel": stem.sum(axis=2).transpose(2, 3, 1, 0)}
    vis["cls_token"] = sd["modality_preprocessors.vision.cls_token"].reshape(1, 1, -1)
    vis["pos_embed"] = sd[
        "modality_preprocessors.vision.pos_embedding_helper.pos_embed"
    ]
    trunk: Dict = {
        "pre_ln": {
            "scale": sd["modality_trunks.vision.pre_transformer_layer.0.weight"],
            "bias": sd["modality_trunks.vision.pre_transformer_layer.0.bias"],
        }
    }
    for i in range(config.vision_num_blocks):
        trunk[f"blocks_{i}"] = _block(sd, f"modality_trunks.vision.blocks.{i}.")
    vis["trunk"] = trunk
    vis["head_ln"] = {
        "scale": sd["modality_heads.vision.0.weight"],
        "bias": sd["modality_heads.vision.0.bias"],
    }
    vis["head_proj"] = {"kernel": sd["modality_heads.vision.2.weight"].T}

    txt = p["text"]
    txt["token_embedding"] = {
        "embedding": sd["modality_preprocessors.text.token_embedding.weight"]
    }
    txt["pos_embed"] = sd["modality_preprocessors.text.pos_embed"]
    ttrunk: Dict = {}
    for i in range(config.text_num_blocks):
        ttrunk[f"blocks_{i}"] = _block(sd, f"modality_trunks.text.blocks.{i}.")
    txt["trunk"] = ttrunk
    txt["head_ln"] = {
        "scale": sd["modality_heads.text.proj.0.weight"],
        "bias": sd["modality_heads.text.proj.0.bias"],
    }
    txt["head_proj"] = {"kernel": sd["modality_heads.text.proj.1.weight"].T}
    scale = sd.get("modality_postprocessors.text.1.log_logit_scale")
    txt["log_logit_scale"] = (
        np.float32(scale.reshape(())) if scale is not None else np.float32(np.log(1 / 0.07))
    )
    return {"params": p}


def convert_anomaly_decoder_state_dict(state_dict: Dict, num_taps: int = 4) -> Dict:
    """AnomalyGPT ckpt 'image_decoder.fc.{i}.{weight,bias}' -> LinearLayerDecoder."""
    sd = {k: _t(v) for k, v in state_dict.items()}
    p: Dict = {}
    for i in range(num_taps):
        pre = None
        for cand in (f"image_decoder.fc.{i}.", f"fc.{i}."):
            if cand + "weight" in sd:
                pre = cand
                break
        if pre is None:
            raise KeyError(f"decoder weights for tap {i} not found")
        p[f"fc_{i}"] = {"kernel": sd[pre + "weight"].T, "bias": sd[pre + "bias"]}
    return {"params": p}
