"""Shared grading machinery for the jsonl protocols.

Mirrors the aggregation/metrics skeleton that reference
scripts/eval_protocol/{roi,location}_protocol.py repeat verbatim:
per-image_id multi-row aggregation, unknown accounting, confusion-matrix
metrics excluding unknowns, anomaly-score AUROC + threshold sweep, and the
per-scene accuracy / score-AUROC / normal-max-threshold section.
"""

from __future__ import annotations

import sys

import numpy as np


def score_of(record):
    """Reference accepts either score key (roi_protocol.py:214-216)."""
    for key in ("anomaly_map_scores", "anomaly_score"):
        if key in record:
            return float(record[key])
    return None


def aggregate_images(records, preds):
    """Per-image_id roll-up (roi_protocol.py:183-232): gt anomalous if ANY
    row is; pred 1 if any row says 1, elif any says 0, else unknown (-1)."""
    image_info = {}
    for r, pred in zip(records, preds):
        info = image_info.setdefault(r["image_id"], {"gt": 0, "pred": []})
        info["gt"] += 1 if r["is_anomaly"] else 0
        info["pred"].append(pred)
    gts = np.array([1 if v["gt"] >= 1 else 0 for v in image_info.values()])
    img_preds = np.array([
        1 if 1 in v["pred"] else (0 if 0 in v["pred"] else -1)
        for v in image_info.values()
    ])
    return gts, img_preds


def binary_metrics(gts, preds, out=sys.stdout):
    """Confusion metrics excluding unknowns (roi_protocol.py:236-261)."""
    from sklearn.metrics import (
        accuracy_score, confusion_matrix, precision_score, recall_score,
        roc_auc_score,
    )

    known = preds != -1
    print("unknown images:", int(np.sum(~known)),
          float(np.sum(~known)) / max(len(preds), 1), file=out)
    gts, preds = gts[known], preds[known]
    if not len(preds):
        return {}
    conf = confusion_matrix(gts, preds, labels=[0, 1])
    print(conf, file=out)
    metrics = {
        "over_kill": conf[0, 1] / max(conf[0, 0] + conf[0, 1], 1),
        "miss": conf[1, 0] / max(conf[1, 0] + conf[1, 1], 1),
        "accuracy": accuracy_score(gts, preds),
        "precision": precision_score(gts, preds, zero_division=0),
        "recall": recall_score(gts, preds, zero_division=0),
    }
    if len(set(gts.tolist())) > 1:
        metrics["auroc"] = roc_auc_score(gts, preds)
    for k in ("over_kill", "miss", "accuracy", "precision", "recall", "auroc"):
        if k in metrics:
            print(f"{k}: {metrics[k]}", file=out)
    return metrics


def score_metrics(records, out=sys.stdout):
    """Anomaly-score AUROC + 0.1..0.9 threshold sweep (roi_protocol.py:263-278)."""
    from sklearn.metrics import accuracy_score, roc_auc_score

    scores = [score_of(r) for r in records]
    if any(s is None for s in scores) or not records:
        return {}
    scores = np.array(scores)
    gts = np.array([1 if r["is_anomaly"] else 0 for r in records])
    metrics = {}
    if len(set(gts.tolist())) > 1:
        metrics["score_auroc"] = roc_auc_score(gts, scores)
        print("anomaly-score AUROC:", metrics["score_auroc"], file=out)
    for th in range(1, 10):
        acc = accuracy_score(gts, (scores >= th * 0.1).astype(int))
        print(f"Th={th * 0.1:.1f} Acc:", acc, file=out)
    return metrics


def scene_metrics(records, preds, out=sys.stdout):
    """Per-scene accuracy, score AUROC, and threshold accuracy where the
    threshold is the max score among the scene's NORMAL samples
    (roi_protocol.py:280-299 — the reference's class-conditional sweep)."""
    from sklearn.metrics import accuracy_score, roc_auc_score

    scenes = {}
    for r, pred in zip(records, preds):
        if pred == -1:
            continue
        scene = r.get("scene") or r["image_path"].split("/")[1]
        sr = scenes.setdefault(scene, {"gt": [], "pred": [], "score": []})
        sr["gt"].append(1 if r["is_anomaly"] else 0)
        sr["pred"].append(pred)
        s = score_of(r)
        if s is not None:
            sr["score"].append(s)
    accs, aurocs, th_accs = [], [], []
    for scene, sr in scenes.items():
        gt, pred = np.array(sr["gt"]), np.array(sr["pred"])
        acc = accuracy_score(gt, pred)
        accs.append(acc)
        line = (f"{scene}: correct {int(np.sum(gt == pred))} "
                f"wrong {int(np.sum(gt != pred))} acc {acc:.4f}")
        if len(sr["score"]) == len(gt) and len(set(gt.tolist())) > 1:
            score = np.array(sr["score"])
            auroc = roc_auc_score(gt, score)
            aurocs.append(auroc)
            th = float(score[gt == 0].max()) if (gt == 0).any() else 0.0
            th_acc = accuracy_score(gt, (score > th).astype(int))
            th_accs.append(th_acc)
            line += f" auroc {auroc:.4f} th_acc {th_acc:.4f} (th={th:.4f})"
        print(line, file=out)
    metrics = {}
    if accs:
        metrics["avg_scene_acc"] = float(np.mean(accs))
        print("Avg acc:", metrics["avg_scene_acc"], file=out)
    if aurocs:
        metrics["avg_scene_auroc"] = float(np.mean(aurocs))
        metrics["avg_scene_th_acc"] = float(np.mean(th_accs))
        print("Avg auroc:", metrics["avg_scene_auroc"], file=out)
        print("Avg threshold acc:", metrics["avg_scene_th_acc"], file=out)
    return metrics
