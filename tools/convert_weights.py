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

    # ONE COMMAND: convert every tower found under a checkpoint dir, write
    # a sha256 manifest and the ready-to-paste `weights:` YAML stanza
    python tools/convert_weights.py all --src /path/ckpts --out /path/npz \
        [--llama /path/vicuna-7b] [--decoder pytorch_visa_model.pt] ...
"""

from __future__ import annotations

import argparse
import glob
import os
import re
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


def _infer_depth(sd: dict, pattern: str) -> int:
    import re

    pat = re.compile(pattern)
    idx = [int(m.group(1)) for k in sd if (m := pat.search(str(k)))]
    if not idx:
        raise SystemExit(f"no keys matching {pattern!r} in checkpoint")
    return max(idx) + 1


def _sha256(path: str) -> str:
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


#: reference checkpoint filename conventions, per tower (SURVEY.md §5.4)
ALL_TOWER_GLOBS = {
    "vit": ["eva_vit_g*.pth"],
    "qformer": ["blip2_pretrained*.pth", "blip2*.pth"],
    "llama_proj": ["pretrained_minigpt4*.pth", "prerained_minigpt4*.pth"],
    "imagebind": ["imagebind_huge*.pth", "imagebind*.pth"],
    "decoder": ["pytorch_mvtec_model*.pt", "pytorch_visa_model*.pt",
                "pytorch_*_model.pt"],
}


def convert_all(args):
    """Convert every tower found under --src into <out>/<tower>.npz, plus a
    sha256 manifest and the `weights:` YAML stanza (VERDICT r2 next #8).

    Tower sources resolve in order: explicit per-tower flag, then the
    reference filename conventions under --src.  The Vicuna LLM is a
    directory (HF layout) — auto-detected as a subdir containing
    pytorch_model*.bin/*.safetensors, or given via --llama.  A trainables
    checkpoint (checkpoint_N.pth, the reference's epoch ckpt) converts
    through convert_myriad_trainables_state_dict when present.
    """
    import json

    from myriad_tpu.convert import (
        convert_anomaly_decoder_state_dict,
        convert_eva_vit_state_dict,
        convert_imagebind_state_dict,
        convert_llama_state_dict,
        convert_myriad_trainables_state_dict,
        convert_qformer_state_dict,
    )
    from myriad_tpu.models.imagebind import ImageBindConfig
    from myriad_tpu.models.llama import LlamaConfig

    os.makedirs(args.out, exist_ok=True)
    sources = {}
    for tower, globs in ALL_TOWER_GLOBS.items():
        explicit = getattr(args, tower, None)
        if explicit:
            sources[tower] = explicit
            continue
        for g in globs:
            hits = sorted(glob.glob(os.path.join(args.src, g)))
            if hits:
                sources[tower] = hits[0]
                break
    if args.llama:
        sources["llama"] = args.llama
    else:
        for d in sorted(os.listdir(args.src) if os.path.isdir(args.src) else []):
            full = os.path.join(args.src, d)
            if os.path.isdir(full) and (
                glob.glob(os.path.join(full, "pytorch_model*.bin"))
                or glob.glob(os.path.join(full, "*.safetensors"))
            ):
                sources["llama"] = full
                break
    # latest NUMERIC epoch wins (lexicographic sort would rank
    # checkpoint_9 over checkpoint_10 and checkpoint_best over both);
    # non-numeric names (checkpoint_best.pth) are a fallback only
    def _epoch(path):
        m = re.search(r"checkpoint_(\d+)\.pth$", path)
        return (1, int(m.group(1))) if m else (0, -1)

    trainable_ckpts = sorted(glob.glob(os.path.join(args.src, "checkpoint_*.pth")),
                             key=_epoch)
    if trainable_ckpts:
        sources["trainables"] = trainable_ckpts[-1]

    manifest, stanza = {}, {}
    for tower, src in sources.items():
        sd = load_torch(src)
        if tower == "llama":
            cfg = LlamaConfig.vicuna_7b(
                use_lora=args.use_lora,
                num_layers=_infer_depth(sd, r"model\.layers\.(\d+)\."),
            )
            tree = convert_llama_state_dict(sd, cfg)["params"]
        elif tower == "vit":
            tree = convert_eva_vit_state_dict(
                sd, depth=_infer_depth(sd, r"blocks\.(\d+)\.")
            )["params"]
        elif tower == "qformer":
            prefix = ("Qformer.bert." if any(str(k).startswith("Qformer.")
                                             for k in sd) else "bert.")
            tree = convert_qformer_state_dict(
                sd, num_layers=_infer_depth(sd, r"encoder\.layer\.(\d+)\."),
                prefix=prefix,
            )["params"]
        elif tower == "imagebind":
            depth = _infer_depth(sd, r"modality_trunks\.vision\.blocks\.(\d+)\.")
            cfg = (ImageBindConfig.huge() if depth == 32
                   else ImageBindConfig.tiny())
            tree = convert_imagebind_state_dict(sd, cfg)["params"]
        elif tower == "decoder":
            tree = convert_anomaly_decoder_state_dict(
                sd, num_taps=_infer_depth(sd, r"fc\.(\d+)\.")
            )["params"]
        elif tower == "llama_proj":
            tree = {"llama_proj": {
                "kernel": np.asarray(sd["llama_proj.weight"]).T
                if not hasattr(sd["llama_proj.weight"], "float")
                else np.asarray(sd["llama_proj.weight"].float().numpy()).T,
            }}
            if "llama_proj.bias" in sd:
                b = sd["llama_proj.bias"]
                tree["llama_proj"]["bias"] = np.asarray(
                    b.float().numpy() if hasattr(b, "float") else b)
        elif tower == "trainables":
            tree = convert_myriad_trainables_state_dict(sd)["params"]
        out_path = os.path.join(args.out, f"{tower}.npz")
        ckpt_lib.save_params(out_path, tree)
        n = sum(int(np.prod(np.shape(x))) for x in
                __import__("jax").tree_util.tree_leaves(tree))
        manifest[tower] = {
            "source": os.path.abspath(src),
            "npz": os.path.abspath(out_path),
            "sha256": _sha256(out_path),
            "params": int(n),
            "params_m": round(n / 1e6, 3),
        }
        if tower != "trainables":
            stanza[tower] = os.path.abspath(out_path)
        print(f"[{tower}] {src} -> {out_path} ({n / 1e6:.1f}M params)")

    missing = [t for t in ("vit", "qformer", "llama", "llama_proj",
                           "imagebind", "decoder") if t not in sources]
    if missing:
        print(f"WARNING: no source found for towers: {missing} "
              f"(pass --<tower> <path> explicitly)")
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    yaml_lines = ["model:", "  weights:"]
    yaml_lines += [f"    {k}: {v}" for k, v in sorted(stanza.items())]
    if "trainables" in manifest:
        yaml_lines += [f"  # trainable ckpt (load via model.ckpt):",
                       f"  ckpt: {manifest['trainables']['npz']}"]
    yaml_text = "\n".join(yaml_lines) + "\n"
    with open(os.path.join(args.out, "weights.yaml"), "w") as f:
        f.write(yaml_text)
    print(f"manifest: {os.path.join(args.out, 'manifest.json')}")
    print("paste into your model config:\n" + yaml_text)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("tower", choices=["llama", "eva", "qformer", "imagebind",
                                          "decoder", "llama_proj", "simplenet",
                                          "wideresnet", "all"])
    parser.add_argument("--src", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--use_lora", action="store_true")
    parser.add_argument("--depth", type=int, default=39, help="eva depth")
    for tower in ("vit", "qformer", "llama", "llama_proj", "imagebind",
                  "decoder"):
        parser.add_argument(f"--{tower}", default=None,
                            help=f"explicit {tower} source for `all`")
    args = parser.parse_args()

    if args.tower == "all":
        return convert_all(args)

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
