"""SimpleNet torch checkpoints -> flax params.

The reference ships per-class SimpleNet heads as ``{root}/{class}/ckpt.pth``
with 'discriminator' and 'pre_projection' sub-state-dicts
(minigpt4/models/simplenet/simplenet_intf.py:34-43,127-137) on top of a
timm WideResNet-50-2 backbone.  Converts both to the
myriad_tpu.models.simplenet param layout.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)
    return arr.astype(np.float32)


def convert_simplenet_head_state_dict(ckpt: Dict, dsc_layers: int = 2,
                                      pre_proj: int = 1) -> Dict:
    """ckpt: {'discriminator': sd, 'pre_projection': sd} (ckpt.pth layout)
    -> SimpleHead params."""
    p: Dict = {}
    if "pre_projection" in ckpt and pre_proj > 0:
        proj = {}
        sd = ckpt["pre_projection"]
        for i in range(pre_proj):
            proj[f"fc_{i}"] = {
                "kernel": _t(sd[f"layers.{i}fc.weight"]).T,
                "bias": _t(sd[f"layers.{i}fc.bias"]),
            }
        p["pre_projection"] = proj
    dsc_sd = ckpt["discriminator"]
    dsc: Dict = {}
    for i in range(dsc_layers - 1):
        pre = f"body.block{i + 1}."
        dsc[f"block{i + 1}_fc"] = {
            "kernel": _t(dsc_sd[pre + "0.weight"]).T,
            "bias": _t(dsc_sd[pre + "0.bias"]),
        }
        dsc[f"block{i + 1}_bn"] = {
            "scale": _t(dsc_sd[pre + "1.weight"]),
            "bias": _t(dsc_sd[pre + "1.bias"]),
            "mean": _t(dsc_sd[pre + "1.running_mean"]),
            "var": _t(dsc_sd[pre + "1.running_var"]),
        }
    dsc["tail"] = {"kernel": _t(dsc_sd["tail.weight"]).T}
    p["discriminator"] = dsc
    return {"params": p}


_STAGE_BLOCKS = {"layer1": 3, "layer2": 4, "layer3": 6}


def convert_wide_resnet50_state_dict(sd: Dict) -> Dict:
    """torchvision ``wide_resnet50_2`` state dict -> WideResNet50 params
    (layers 1-3 only — SimpleNet taps layer2/layer3, simplenet.py:230-239)."""
    sd = {k: _t(v) for k, v in sd.items()}

    def conv(key):
        return {"kernel": sd[key].transpose(2, 3, 1, 0)}

    def bn(prefix):
        return {
            "scale": sd[prefix + ".weight"],
            "bias": sd[prefix + ".bias"],
            "mean": sd[prefix + ".running_mean"],
            "var": sd[prefix + ".running_var"],
        }

    p: Dict = {"conv1": conv("conv1.weight"), "bn1": bn("bn1")}
    for stage, blocks in _STAGE_BLOCKS.items():
        for i in range(blocks):
            pre = f"{stage}.{i}."
            b: Dict = {}
            for j in (1, 2, 3):
                b[f"conv{j}"] = conv(pre + f"conv{j}.weight")
                b[f"bn{j}"] = bn(pre + f"bn{j}")
            if pre + "downsample.0.weight" in sd:
                b["downsample_conv"] = conv(pre + "downsample.0.weight")
                b["downsample_bn"] = bn(pre + "downsample.1")
            p[f"{stage}_{i}"] = b
    return {"params": p}
