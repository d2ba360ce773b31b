"""Synthetic dataset fixtures: tiny MVTec/VisA-like trees + jsonl."""

import json
import os

import numpy as np
from PIL import Image


def make_ad_dataset(root, dataset="mvtec", classes=("bottle",), n_train=4, n_test=4,
                    img_size=64, seed=0):
    """Create {root}/{dataset}/{cls}/train/good/xxx.png + jsonl annotation
    files matching the reference layout (img_path relative to root,
    'mvtec/<cls>/...')."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    train_rows, test_rows = [], []
    for cls in classes:
        good_dir = os.path.join(root, dataset, cls, "train", "good")
        os.makedirs(good_dir, exist_ok=True)
        for i in range(n_train):
            arr = rng.integers(30, 220, (img_size, img_size, 3), dtype=np.uint8)
            # draw a deterministic structure so NSA patches are visible
            arr[img_size // 4 : img_size // 2, img_size // 4 : img_size // 2] = 240
            Image.fromarray(arr).save(os.path.join(good_dir, f"{i:03d}.png"))
            train_rows.append({
                "img_path": f"{dataset}/{cls}/train/good/{i:03d}.png",
                "caption": "",
                "is_anomaly": "0",
            })
        test_dir = os.path.join(root, dataset, cls, "test", "good")
        bad_dir = os.path.join(root, dataset, cls, "test", "broken")
        os.makedirs(test_dir, exist_ok=True)
        os.makedirs(bad_dir, exist_ok=True)
        for i in range(n_test):
            arr = rng.integers(30, 220, (img_size, img_size, 3), dtype=np.uint8)
            anomalous = i % 2 == 1
            sub = "broken" if anomalous else "good"
            d = bad_dir if anomalous else test_dir
            if anomalous:
                arr[: img_size // 3] = 0
            Image.fromarray(arr).save(os.path.join(d, f"{i:03d}.png"))
            test_rows.append({
                "img_path": f"{dataset}/{cls}/test/{sub}/{i:03d}.png",
                "caption": "",
                "is_anomaly": "1" if anomalous else "0",
            })
    prefix = "MVTEC" if dataset == "mvtec" else "VISA"
    train_ann = os.path.join(root, f"DC_{prefix}_train_normal.jsonl")
    test_ann = os.path.join(root, f"DC_{prefix}_test_normal.jsonl")
    with open(train_ann, "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in train_rows)
    with open(test_ann, "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in test_rows)
    return train_ann, test_ann
