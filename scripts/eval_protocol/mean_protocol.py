"""Image-level Yes/No grading protocol (reference
scripts/eval_protocol/mean_protocol.py:45-262, same phrase banks and
metrics).

Reads a results .jsonl (from evaluation_aqa_dataset.py), parses each
generation into anomalous/normal/unknown with the phrase banks, aggregates
per image, and prints confusion matrix, Acc/Precision/Recall/AUROC,
over-kill (FPR) / miss (FNR), anomaly-map-score AUROC + threshold sweep and
per-scene accuracy.
"""

import argparse
import json
import sys

import numpy as np

ABNORMAL_WORDS = [
    "has defect", "have defect", "have a defect", "has a defect", "has 1 defect",
    "has 2 defect", "is damaged", "has a small defect", "is broken",
    "has some defect", "has some anomalies", "looks damaged",
    "looks a little bit disfigured", "a bit blurry", "bit distorted",
    "bit irregular", "a bit weird", "a flaw", "signs of defects", "shows defects",
    "defect-like", "sort of defect", "a number of defect", "some kind of defect",
    "a bit odd", "show a crack", "show defect", "have some kind", "show some kind",
    "certainly defect", "a little bitter", "a bit unusual", "a bit strange",
    "has a scratch", "have some defect", "a series of small defect",
    "have some issues", "show some defect", "have a crack", "has some problems",
    "has a hole", "have a scratch", "Yes", "There are 2 defect",
]
NORMAL_WORDS = [
    "has no defect", "have no defect", "be undamaged", "looks good", "look good",
    "looks fine", "look fine", "looks perfect", "look perfect", "is perfect",
    "is normal", "looks normal", "look normal", "looks defect free",
    "looks defect-free", "looks okay", "No",
]


def get_model_answer(text: str, mode: int = 0) -> int:
    """1 = anomalous, 0 = normal, -1 = unknown (mean_protocol.py:45-137)."""
    if mode == 0:
        if any(w in text for w in ABNORMAL_WORDS):
            return 1
        if any(w in text for w in NORMAL_WORDS):
            return 0
        return -1
    if mode == 2:
        if "C" in text:
            return 0
        if "is A." in text or "is B." in text:
            return 1
        return -1
    if mode == 3:
        if "D" in text:
            return 0
        if "is A." in text or "is B." in text or "is C." in text:
            return 1
        return -1
    raise NotImplementedError(f"mode {mode}")


def read_jsonl(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def grade(records, mode: int = 0, out=sys.stdout):
    from sklearn.metrics import (
        accuracy_score,
        confusion_matrix,
        precision_score,
        recall_score,
        roc_auc_score,
    )

    def p(*args):
        print(*args, file=out)

    preds = [get_model_answer(r["output"], mode) for r in records]
    preds_np = np.array(preds)
    known = len(records) - np.sum(preds_np == -1)
    p("unknown predictions:", int(np.sum(preds_np == -1)))
    p("predicted anomalous:", int(np.sum(preds_np == 1)),
      np.sum(preds_np == 1) / max(known, 1))
    p("predicted normal:", int(np.sum(preds_np == 0)),
      np.sum(preds_np == 0) / max(known, 1))

    # image-level aggregation (mean_protocol.py:166-210)
    image_info = {}
    scene_results = {}
    for r, pred in zip(records, preds):
        image_id = r["image_id"]
        info = image_info.setdefault(image_id, {"gt": 0, "pred": []})
        info["gt"] += 1 if r["is_anomaly"] else 0
        info["pred"].append(pred)
        scene = r["image_path"].split("/")[1]
        sr = scene_results.setdefault(scene, {"gt": [], "pred": []})
        if pred != -1:
            sr["gt"].append(1 if r["is_anomaly"] else 0)
            sr["pred"].append(pred)

    gts = [1 if v["gt"] >= 1 else 0 for v in image_info.values()]
    img_preds = [
        1 if 1 in v["pred"] else (0 if 0 in v["pred"] else -1)
        for v in image_info.values()
    ]
    preds_np = np.array(img_preds)
    gts_np = np.array(gts)[preds_np != -1]
    preds_np = preds_np[preds_np != -1]

    metrics = {}
    if len(preds_np):
        conf = confusion_matrix(gts_np, preds_np, labels=[0, 1])
        p(conf)
        over_kill = conf[0, 1] / max(conf[0, 0] + conf[0, 1], 1)
        miss = conf[1, 0] / max(conf[1, 0] + conf[1, 1], 1)
        metrics = {
            "accuracy": accuracy_score(gts_np, preds_np),
            "precision": precision_score(gts_np, preds_np, zero_division=0),
            "recall": recall_score(gts_np, preds_np, zero_division=0),
            "over_kill": over_kill,
            "miss": miss,
        }
        if len(set(gts_np.tolist())) > 1:
            metrics["auroc"] = roc_auc_score(gts_np, preds_np)
        p("over-kill:", over_kill)
        p("miss:", miss)
        p("Acc:", metrics["accuracy"])
        p("Precision:", metrics["precision"])
        p("Recall:", metrics["recall"])
        if "auroc" in metrics:
            p("AUROC:", metrics["auroc"])

    # anomaly-map score AUROC + threshold sweep (mean_protocol.py:236-250)
    if records and "anomaly_score" in records[0]:
        scores = np.array([float(r["anomaly_score"]) for r in records])
        gt_all = np.array([1 if r["is_anomaly"] else 0 for r in records])
        if len(set(gt_all.tolist())) > 1:
            metrics["score_auroc"] = roc_auc_score(gt_all, scores)
            p("anomaly-score AUROC:", metrics["score_auroc"])
        for th in range(1, 10):
            th_preds = (scores >= th * 0.1).astype(int)
            p(f"Th={th * 0.1:.1f} Acc:", accuracy_score(gt_all, th_preds))

    # per-scene accuracy (mean_protocol.py:252-262)
    if scene_results:
        accs = []
        from sklearn.metrics import accuracy_score as acc_fn

        for scene, sr in scene_results.items():
            if not sr["gt"]:
                continue
            acc = acc_fn(np.array(sr["gt"]), np.array(sr["pred"]))
            accs.append(acc)
            p(f"{scene}: acc {acc:.4f} "
              f"({int(np.sum(np.array(sr['gt']) == np.array(sr['pred'])))} correct)")
        if accs:
            metrics["avg_scene_acc"] = float(np.mean(accs))
            p("Avg acc:", metrics["avg_scene_acc"])
    return metrics


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--result_path", type=str, required=True)
    parser.add_argument("--protocol", type=str, choices=["v1", "v2"], default="v2")
    parser.add_argument("--mode", type=int, default=0)
    args = parser.parse_args()
    grade(read_jsonl(args.result_path), mode=args.mode)
