"""Shared score-distribution machinery for the analysis scripts
(reference scripts/analysis/{map_score_dist,low_scores_dist,
oneshotmask_distribution}.py — jsonl in, split histograms + AUROC out).

The reference scripts differ only in which score field they read and how
they filter rows; each thin entry point passes those knobs here.
"""

from __future__ import annotations

import argparse
import json
from typing import Callable, Optional

import numpy as np


def read_records(path: str):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def score_of(record, field: str) -> Optional[float]:
    v = record.get(field, record.get("anomaly_score"))
    return None if v is None else float(v)


def print_histogram(name: str, scores, bins: int = 10):
    scores = np.asarray(scores, np.float64)
    print(f"{name}: n={len(scores)}")
    if not len(scores):
        return
    hist, edges = np.histogram(scores, bins=bins)
    # the reference prints np.histogram's edges then counts (map_score_dist)
    print(edges.tolist())
    print(hist.tolist())


def auroc(gts, preds) -> float:
    """Label AUROC (rank statistic — equals sklearn.roc_auc_score)."""
    gts = np.asarray(gts)
    preds = np.asarray(preds, np.float64)
    pos, neg = preds[gts == 1], preds[gts == 0]
    if not len(pos) or not len(neg):
        return float("nan")
    order = np.argsort(np.concatenate([pos, neg]), kind="mergesort")
    ranks = np.empty(len(order), np.float64)
    ranks[order] = np.arange(1, len(order) + 1)
    # midranks for ties
    all_scores = np.concatenate([pos, neg])
    for v in np.unique(all_scores):
        m = all_scores == v
        ranks[m] = ranks[m].mean()
    return float((ranks[: len(pos)].sum() - len(pos) * (len(pos) + 1) / 2)
                 / (len(pos) * len(neg)))


def run_distribution(
    field: str,
    pos_name: str,
    neg_name: str,
    pos_filter: Optional[Callable] = None,
    neg_filter: Optional[Callable] = None,
    with_auroc: bool = True,
    ylim: Optional[int] = None,
):
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", type=str, required=True, help="results jsonl")
    parser.add_argument("--plot", type=str, default="",
                        help="optional output PNG (matplotlib histogram, the "
                             "reference's ./test.png)")
    parser.add_argument("--bins", type=int, default=10)
    args = parser.parse_args()

    records = read_records(args.path)
    print(args.path)
    gts, preds, pos_scores, neg_scores = [], [], [], []
    for r in records:
        s = score_of(r, field)
        if s is None:
            continue
        if r.get("is_anomaly"):
            gts.append(1)
            if pos_filter is None or pos_filter(r):
                pos_scores.append(s)
        else:
            gts.append(0)
            if neg_filter is None or neg_filter(r):
                neg_scores.append(s)
        preds.append(s)

    print_histogram(pos_name, pos_scores, args.bins)
    print_histogram(neg_name, neg_scores, args.bins)
    if with_auroc:
        print("AUROC:", auroc(gts, preds))
    if args.plot:
        from matplotlib import pyplot as plt

        plt.figure()
        plt.hist([neg_scores, pos_scores], label=[neg_name, pos_name])
        if ylim:
            plt.ylim(0, ylim)
        plt.legend(loc="upper left")
        plt.savefig(args.plot)
        print(f"wrote {args.plot}")
    return pos_scores, neg_scores
