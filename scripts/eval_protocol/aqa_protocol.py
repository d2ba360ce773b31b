"""AQA multiple-choice grading protocol (reference
scripts/eval_protocol/aqa_protocol.py:148-278).

Grades <A>-<D> option answers: protocol v1 counts a sample anomalous only
when the chosen option matches the answer; v2 maps "not D" -> anomalous.
Prints QA accuracy (overall / on anomalous / on normal) plus the
image-level confusion metrics shared with mean_protocol.

``--loc`` additionally computes the localization pixel-AUROC
(reference :52-145 ``cal_anomaly_scores``): the VE anomaly mask is kept
only inside the boxes of the PREDICTED defect options and scored against
the gt segmentation masks.  Roots are CLI arguments here (the reference
hardcodes /mnt paths).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

_repo_root = __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
sys.path.insert(0, _repo_root)

from scripts.eval_protocol.mean_protocol import get_model_answer, read_jsonl  # noqa: E402


def grade_aqa(records, protocol: str = "v2", mode: int = 3, out=sys.stdout):
    from sklearn.metrics import (
        accuracy_score,
        confusion_matrix,
        precision_score,
        recall_score,
        roc_auc_score,
    )

    def p(*a):
        print(*a, file=out)

    qa_results, preds, gts = [], [], []
    for r in records:
        ans, out_text = r["answer"], r["output"]
        pred = get_model_answer(out_text, mode=mode)
        gts.append(1 if r["is_anomaly"] else 0)
        if pred == -1:
            qa_results.append(-1)
            preds.append(-1)
            continue
        if protocol == "v1":
            correct = pred == ans
            preds.append((1 if r["is_anomaly"] else 0) if correct
                         else (0 if r["is_anomaly"] else 1))
            qa_results.append(1 if correct else 0)
        else:
            # v2: mode-3 parsing returns 0 for option D (normal), 1 otherwise
            preds.append(pred)
            qa_results.append(1 if pred == (1 if r["is_anomaly"] else 0) else 0)

    qa = np.array(qa_results)
    known = len(records) - int(np.sum(qa == -1))
    p("unknown:", int(np.sum(qa == -1)))
    p("QA correct:", int(np.sum(qa == 1)), np.sum(qa == 1) / max(known, 1))
    p("QA wrong:", int(np.sum(qa == 0)), np.sum(qa == 0) / max(known, 1))
    g = np.array(gts)
    if (g == 1).any():
        ab = qa[g == 1]
        p("QA accuracy on anomalous:", np.sum(ab == 1) / ab.shape[0])
    if (g == 0).any():
        nm = qa[g == 0]
        p("QA accuracy on normal:", np.sum(nm == 1) / nm.shape[0])

    preds_np = np.array(preds)
    gts_np = g[preds_np != -1]
    preds_np = preds_np[preds_np != -1]
    metrics = {}
    if len(preds_np):
        conf = confusion_matrix(gts_np, preds_np, labels=[0, 1])
        p(conf)
        metrics = {
            "over_kill": conf[0, 1] / max(conf[0, 0] + conf[0, 1], 1),
            "miss": conf[1, 0] / max(conf[1, 0] + conf[1, 1], 1),
            "accuracy": accuracy_score(gts_np, preds_np),
            "precision": precision_score(gts_np, preds_np, zero_division=0),
            "recall": recall_score(gts_np, preds_np, zero_division=0),
        }
        if len(set(gts_np.tolist())) > 1:
            metrics["auroc"] = roc_auc_score(gts_np, preds_np)
        for k, v in metrics.items():
            p(f"{k}: {v}")
    return metrics


def get_option_index(text: str, mode: int = 0) -> int:
    """Chosen option INDEX 0..3 (reference aqa_protocol.py:31-50)."""
    if mode == 0:
        for k, v in enumerate(["A", "B", "C", "D"]):
            if v in text:
                return k
        return -1
    if mode == 1:
        for k, v in enumerate(["A", "B", "C", "D"]):
            if v in text.split(":")[-1]:
                return k
        return -1
    raise NotImplementedError(f"mode {mode}")


def collect_defect_boxes(records, mode: int = 0):
    """Per-image defect/normal box roll-up (reference :216-243, protocol v2):
    a non-D choice adds that option's box to 'defects'; choosing D files all
    options under 'normals'.  Records need 'options' (4 candidate boxes)."""
    image_info = {}
    for r in records:
        info = image_info.setdefault(
            r["image_id"], {"id": r["image_id"], "defects": [], "normals": []}
        )
        idx = get_option_index(r["output"], mode=mode)
        options = r.get("options") or []
        if idx == -1 or not options:
            continue
        if idx == 3:
            info["normals"].extend(options)
        elif idx < len(options):
            info["defects"].append(options[idx])
    return list(image_info.values())


def cal_anomaly_scores(image_infos, ve_of, gt_of, out=sys.stdout):
    """Pixel-AUROC of VE masks cropped by predicted defect boxes
    (reference :52-145).  ``ve_of(id)`` / ``gt_of(id)`` return (H, W) float
    arrays (the CLI wires file loaders; tests pass arrays directly)."""
    import math

    from sklearn.metrics import roc_auc_score

    px_preds, px_gts = [], []
    for item in image_infos:
        gt = np.asarray(gt_of(item["id"]), np.float32)
        ve = np.asarray(ve_of(item["id"]), np.float32)
        if not item["defects"]:
            px_preds.append(np.zeros_like(gt).ravel())
        else:
            pred_ve = np.zeros_like(ve)
            for box in item["defects"]:
                x1, y1, x2, y2 = box
                x1, y1 = math.floor(x1), math.floor(y1)
                x2, y2 = math.ceil(x2), math.ceil(y2)
                pred_ve[y1:y2, x1:x2] = ve[y1:y2, x1:x2]
            px_preds.append(pred_ve.ravel())
        px_gts.append(gt.ravel())
    px_preds = np.concatenate(px_preds)
    px_gts = np.concatenate(px_gts)
    if len(set(px_gts.tolist())) < 2:
        print("pixel-AUROC undefined (single-class gt)", file=out)
        return None
    auroc = roc_auc_score(px_gts, px_preds)
    print("Pixel-AUROC:", auroc, file=out)
    return float(auroc)


def _file_loaders(anno_path: str, ve_root: str, data_root: str, size: int = 224):
    """Reference mask-loading semantics (:93-117): VE masks resized NEAREST,
    gt masks from <scene>/ground_truth/... (all-zero for 'good' images)."""
    import os

    import cv2
    from PIL import Image

    annos = {a["image_id"]: a for a in read_jsonl(anno_path)}

    def ve_of(image_id):
        ann = annos[image_id]
        rel = ann.get("ve_path") or ann.get("aprilgan_path")
        if rel.startswith("/mnt"):  # reference-era hardcoded prefix
            rel = os.path.join(*rel.split("/")[6:])
        ve = cv2.imread(os.path.join(ve_root, rel))
        return cv2.resize(ve, (size, size), interpolation=cv2.INTER_NEAREST)[:, :, 0]

    def gt_of(image_id):
        ann = annos[image_id]
        if "good" in ann["img_path"]:
            return np.zeros((size, size), np.float32)
        parts = ann["img_path"].split("/")
        gt_path = os.path.join(data_root, parts[0], "ground_truth", *parts[1:])
        gt_path = gt_path[:-3] + "png"
        gt = np.array(Image.open(gt_path).convert("L").resize(
            (size, size), Image.Resampling.NEAREST)) > 0
        return gt.astype(np.float32)

    return ve_of, gt_of


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--result_path", type=str, required=True)
    parser.add_argument("--protocol", type=str, choices=["v1", "v2"], default="v2")
    parser.add_argument("--mode", type=int, default=3)
    parser.add_argument("--loc", action="store_true",
                        help="box-cropped pixel-AUROC (needs the AQA anno "
                             "jsonl + mask roots)")
    parser.add_argument("--anno_path", type=str, default="")
    parser.add_argument("--ve_root", type=str, default="")
    parser.add_argument("--data_root", type=str, default="")
    parser.add_argument("--box_mode", type=int, default=0,
                        help="option parsing for box collection (ref mode 0/1)")
    args = parser.parse_args()
    records = read_jsonl(args.result_path)
    grade_aqa(records, protocol=args.protocol, mode=args.mode)
    if args.loc:
        infos = collect_defect_boxes(records, mode=args.box_mode)
        ve_of, gt_of = _file_loaders(args.anno_path, args.ve_root, args.data_root)
        cal_anomaly_scores(infos, ve_of, gt_of)
