"""Convert the reference's pretrained torch checkpoints into myriad_tpu
.npz parameter files (the one-time bootstrap chain, SURVEY.md §5.4).

Examples:
    # Vicuna-7B (HF directory with pytorch_model*.bin or a single .pth)
    python tools/convert_weights.py llama --src /path/vicuna-7b --out vicuna7b.npz

    # EVA-ViT-g (LAVIS eva_vit_g.pth)
    python tools/convert_weights.py eva --src eva_vit_g.pth --out eva.npz

    # BLIP-2 Q-Former (blip2_pretrained_flant5xxl.pth)
    python tools/convert_weights.py qformer --src blip2.pth --out qformer.npz

    # ImageBind-huge + AnomalyGPT decoder
    python tools/convert_weights.py imagebind --src imagebind_huge.pth --out ib.npz
    python tools/convert_weights.py decoder --src pytorch_mvtec_model.pt --out dec.npz

    # llama_proj from pretrained_minigpt4_7b.pth
    python tools/convert_weights.py llama_proj --src pretrained_minigpt4_7b.pth --out proj.npz
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from myriad_tpu import checkpoint as ckpt_lib  # noqa: E402


def load_torch(src: str) -> dict:
    import torch

    if os.path.isdir(src):
        sd = {}
        for shard in sorted(
            glob.glob(os.path.join(src, "pytorch_model*.bin"))
            + glob.glob(os.path.join(src, "*.pth"))
            + glob.glob(os.path.join(src, "*.safetensors"))
        ):
            if shard.endswith(".safetensors"):
                from safetensors.torch import load_file

                sd.update(load_file(shard))
            else:
                sd.update(torch.load(shard, map_location="cpu", weights_only=True))
        if not sd:
            raise SystemExit(f"no checkpoint shards found under {src}")
        return sd
    ckpt = torch.load(src, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "model" in ckpt and isinstance(ckpt["model"], dict):
        return ckpt["model"]
    return ckpt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("tower", choices=["llama", "eva", "qformer", "imagebind",
                                          "decoder", "llama_proj", "simplenet",
                                          "wideresnet"])
    parser.add_argument("--src", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--use_lora", action="store_true")
    parser.add_argument("--depth", type=int, default=39, help="eva depth")
    args = parser.parse_args()

    if args.tower == "simplenet":
        # per-class head tree: {src}/{class}/ckpt.pth -> {out}/{class}.npz
        # (reference simplenet_intf.py:34-43 checkpoint layout)
        import torch

        from myriad_tpu.convert import convert_simplenet_head_state_dict

        os.makedirs(args.out, exist_ok=True)
        n_cls = 0
        for cls in sorted(os.listdir(args.src)):
            ckpt_path = os.path.join(args.src, cls, "ckpt.pth")
            if not os.path.isfile(ckpt_path):
                continue
            ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=True)
            tree = convert_simplenet_head_state_dict(ckpt)["params"]
            ckpt_lib.save_params(os.path.join(args.out, f"{cls}.npz"), tree)
            n_cls += 1
        print(f"wrote {n_cls} per-class head npz files to {args.out}")
        return

    sd = load_torch(args.src)

    if args.tower == "llama":
        from myriad_tpu.convert import convert_llama_state_dict
        from myriad_tpu.models.llama import LlamaConfig

        cfg = LlamaConfig.vicuna_7b(use_lora=args.use_lora)
        tree = convert_llama_state_dict(sd, cfg)["params"]
    elif args.tower == "eva":
        from myriad_tpu.convert import convert_eva_vit_state_dict

        tree = convert_eva_vit_state_dict(sd, depth=args.depth)["params"]
    elif args.tower == "qformer":
        from myriad_tpu.convert import convert_qformer_state_dict

        # BLIP-2 checkpoints prefix with 'Qformer.'
        prefix = "Qformer.bert." if any(k.startswith("Qformer.") for k in sd) else "bert."
        tree = convert_qformer_state_dict(sd, prefix=prefix)["params"]
    elif args.tower == "imagebind":
        from myriad_tpu.convert import convert_imagebind_state_dict
        from myriad_tpu.models.imagebind import ImageBindConfig

        tree = convert_imagebind_state_dict(sd, ImageBindConfig.huge())["params"]
    elif args.tower == "decoder":
        from myriad_tpu.convert import convert_anomaly_decoder_state_dict

        tree = convert_anomaly_decoder_state_dict(sd)["params"]
    elif args.tower == "wideresnet":
        from myriad_tpu.convert import convert_wide_resnet50_state_dict

        tree = convert_wide_resnet50_state_dict(sd)["params"]
    elif args.tower == "llama_proj":
        tree = {
            "llama_proj": {
                "kernel": np.asarray(sd["llama_proj.weight"].float().numpy()).T,
                "bias": np.asarray(sd["llama_proj.bias"].float().numpy()),
            }
        }
    else:  # pragma: no cover
        raise SystemExit(args.tower)

    ckpt_lib.save_params(args.out, tree)
    n = sum(int(np.prod(np.shape(x))) for x in
            __import__("jax").tree_util.tree_leaves(tree))
    print(f"wrote {args.out} ({n / 1e6:.1f}M params)")


if __name__ == "__main__":
    main()
