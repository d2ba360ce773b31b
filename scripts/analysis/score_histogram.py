"""Anomaly-score histograms split by gt label (reference scripts/analysis/)."""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--result_path", type=str, required=True)
    parser.add_argument("--bins", type=int, default=20)
    args = parser.parse_args()
    with open(args.result_path) as f:
        records = [json.loads(l) for l in f if l.strip()]
    scores = np.array([float(r["anomaly_score"]) for r in records])
    gts = np.array([1 if r["is_anomaly"] else 0 for r in records])
    edges = np.linspace(0, 1, args.bins + 1)
    for label, name in ((0, "normal"), (1, "anomalous")):
        hist, _ = np.histogram(scores[gts == label], bins=edges)
        bar = "".join("#" if h else "." for h in hist)
        print(f"{name:>10}: {bar}  (n={int(np.sum(gts == label))}, "
              f"mean={scores[gts == label].mean() if (gts == label).any() else 0:.3f})")


if __name__ == "__main__":
    main()
