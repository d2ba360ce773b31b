"""Build DC_{MVTEC,VISA}_{train,test}_normal.jsonl annotation files from an
MVTec-AD / VisA directory tree (reference scripts/datasets/construct_aqa*.py
— the reference scripts import dataset classes that no longer exist,
SURVEY.md §2.8; this is the working equivalent for the live 'ad/1cls/shot'
pipelines).

Expected layout: <root>/<dataset>/<class>/{train,test}/<defect>/NNN.png
"""

from __future__ import annotations

import argparse
import json
import os

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".JPG", ".PNG")


def scan(root: str, dataset: str, split: str):
    rows = []
    ds_dir = os.path.join(root, dataset)
    if not os.path.isdir(ds_dir):
        raise SystemExit(f"{ds_dir} not found")
    for cls in sorted(os.listdir(ds_dir)):
        split_dir = os.path.join(ds_dir, cls, split)
        if not os.path.isdir(split_dir):
            continue
        for defect in sorted(os.listdir(split_dir)):
            d = os.path.join(split_dir, defect)
            if not os.path.isdir(d):
                continue
            for name in sorted(os.listdir(d)):
                if not name.endswith(IMG_EXTS):
                    continue
                rows.append({
                    "img_path": f"{dataset}/{cls}/{split}/{defect}/{name}",
                    "caption": "",
                    "is_anomaly": "0" if defect == "good" else "1",
                })
    return rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", required=True, help="dataset root directory")
    parser.add_argument("--dataset", default="mvtec", choices=["mvtec", "visa", "1cls"])
    parser.add_argument("--split", default="test", choices=["train", "test"])
    parser.add_argument("--normal_only", action="store_true",
                        help="keep only normal images (training annotation)")
    args = parser.parse_args()

    rows = scan(args.root, args.dataset, args.split)
    if args.normal_only:
        rows = [r for r in rows if r["is_anomaly"] == "0"]
    prefix = "MVTEC" if args.dataset == "mvtec" else "VISA"
    out = os.path.join(args.root, f"DC_{prefix}_{args.split}_normal.jsonl")
    with open(out, "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in rows)
    print(f"wrote {len(rows)} rows to {out}")


if __name__ == "__main__":
    main()
