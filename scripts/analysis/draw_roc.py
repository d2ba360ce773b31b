"""ROC curve drawing from anomaly scores (reference scripts/analysis/*)."""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

_repo_root = __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
sys.path.insert(0, _repo_root)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--result_path", type=str, required=True)
    parser.add_argument("--out", type=str, default="./roc.png")
    args = parser.parse_args()
    with open(args.result_path) as f:
        records = [json.loads(l) for l in f if l.strip()]
    gts = np.array([1 if r["is_anomaly"] else 0 for r in records])
    scores = np.array([float(r["anomaly_score"]) for r in records])

    from sklearn.metrics import auc, roc_curve

    fpr, tpr, _ = roc_curve(gts, scores, pos_label=1)
    roc_auc = auc(fpr, tpr)
    print(f"AUROC: {roc_auc:.4f}")
    try:
        from matplotlib import pyplot as plt

        plt.figure(figsize=(10, 10))
        plt.plot(fpr, tpr, lw=2, label=f"ROC curve (area = {roc_auc:.2f})")
        plt.plot([0, 1], [0, 1], lw=2, linestyle="--")
        plt.xlabel("False Positive Rate")
        plt.ylabel("True Positive Rate")
        plt.legend(loc="lower right")
        plt.savefig(args.out)
        print(f"saved {args.out}")
    except ImportError:
        print("matplotlib unavailable; printed AUROC only")


if __name__ == "__main__":
    main()
