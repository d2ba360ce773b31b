"""DC (defect classification) protocol: box/Yes-No classification metrics,
pixel segmentation metrics and AUPRO (reference
scripts/eval_protocol/dc_protocol.py:146-309).

* ``eval_ad``: parses predicted boxes from generations (PlainBoxFormatter);
  any box => anomalous.  Confusion matrix, over-kill/miss, Acc, Recall,
  Precision, AUROC, AP, F1-max.
* ``eval_seg``: pixel AUROC / F1-max / AP / AUPRO over VE masks vs gt masks.
* ``cal_pro_score``: cflow-style per-region overlap AUPRO; skimage's
  regionprops/label replaced by scipy.ndimage connected components.
* ``eval_coco``: COCO bbox mAP; uses pycocotools when available, otherwise
  a built-in AP@[.5:.95] evaluator over the same json schema.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Dict, List

import numpy as np
from scipy import ndimage

_repo_root = __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
sys.path.insert(0, _repo_root)

from myriad_tpu.processors.transform import PlainBoxFormatter  # noqa: E402


def read_results(path: str) -> List[Dict]:
    if path.endswith(".json"):
        with open(path) as f:
            return json.load(f)
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def eval_ad(records: List[Dict], use_small_brackets: bool = True, out=sys.stdout) -> Dict:
    """Box-presence classification metrics (dc_protocol.py:206-244)."""
    from sklearn.metrics import (
        accuracy_score,
        average_precision_score,
        confusion_matrix,
        precision_recall_curve,
        precision_score,
        recall_score,
        roc_auc_score,
    )

    pbf = PlainBoxFormatter(use_small_brackets=use_small_brackets)
    pred, gt = [], []
    for r in records:
        _, boxes = pbf.extract(r["output"])
        n_boxes = sum(len(b) for b in boxes)
        pred.append(1 if n_boxes > 0 else 0)
        gt.append(1 if r["is_anomaly"] else 0)

    cfm = confusion_matrix(gt, pred, labels=[0, 1])
    precisions, recalls, _ = precision_recall_curve(gt, pred)
    with np.errstate(divide="ignore", invalid="ignore"):
        f1_scores = (2 * precisions * recalls) / (precisions + recalls)
    f1_max = float(np.max(f1_scores[np.isfinite(f1_scores)]))
    metrics = {
        "over_kill": cfm[0, 1] / max(cfm[0, 0] + cfm[0, 1], 1),
        "miss": cfm[1, 0] / max(cfm[1, 0] + cfm[1, 1], 1),
        "accuracy": accuracy_score(gt, pred),
        "recall": recall_score(gt, pred, zero_division=0),
        "precision": precision_score(gt, pred, zero_division=0),
        "ap_cls": average_precision_score(gt, pred),
        "f1_max_cls": f1_max,
    }
    if len(set(gt)) > 1:
        metrics["auroc"] = roc_auc_score(gt, pred)
    print(cfm, file=out)
    for k, v in metrics.items():
        print(f"{k}: {v}", file=out)
    return metrics


def cal_pro_score(masks: np.ndarray, amaps: np.ndarray, max_step: int = 200,
                  expect_fpr: float = 0.3) -> float:
    """AUPRO (dc_protocol.py:246-276, cflow-style).  Per threshold: mean
    per-gt-region overlap vs pixel FPR; area under the curve for
    fpr < expect_fpr after min-max normalizing the fpr axis."""
    from sklearn.metrics import auc

    binary_amaps = np.zeros_like(amaps, dtype=bool)
    min_th, max_th = amaps.min(), amaps.max()
    delta = (max_th - min_th) / max_step
    if delta <= 0:
        return 0.0
    pros, fprs = [], []
    # precompute per-image labeled regions once (scipy connected components)
    labeled = []
    for mask in masks:
        lab, n = ndimage.label(mask > 0)
        regions = []
        for i in range(1, n + 1):
            coords = np.nonzero(lab == i)
            regions.append((coords, len(coords[0])))
        labeled.append(regions)
    inverse_masks = 1 - (masks > 0)
    inv_sum = inverse_masks.sum()
    for th in np.arange(min_th, max_th, delta):
        binary_amaps[amaps <= th] = 0
        binary_amaps[amaps > th] = 1
        pro = []
        for binary_amap, regions in zip(binary_amaps, labeled):
            for coords, area in regions:
                tp = binary_amap[coords].sum()
                pro.append(tp / area)
        fp = np.logical_and(inverse_masks, binary_amaps).sum()
        fprs.append(fp / max(inv_sum, 1))
        pros.append(np.mean(pro) if pro else 0.0)
    pros, fprs = np.array(pros), np.array(fprs)
    idx = fprs < expect_fpr
    if idx.sum() < 2:
        return 0.0
    f = fprs[idx]
    f = (f - f.min()) / max(f.max() - f.min(), 1e-12)
    return float(auc(f, pros[idx]))


def eval_seg(preds: List[Dict], out=sys.stdout) -> Dict:
    """Pixel metrics over expert maps vs gt masks (dc_protocol.py:278-309).

    preds: [{'gt_mask': (H,W) array, 'anomaly_maps': (H,W) array}, ...]
    """
    from sklearn.metrics import (
        average_precision_score,
        precision_recall_curve,
        roc_auc_score,
    )

    gt_px = np.array([np.squeeze(np.asarray(p["gt_mask"])) for p in preds])
    pr_px = np.array([np.squeeze(np.asarray(p["anomaly_maps"])) for p in preds])
    gt_bin = (gt_px > 0).astype(np.uint8)

    auroc_px = roc_auc_score(gt_bin.ravel(), pr_px.ravel())
    ap_px = average_precision_score(gt_bin.ravel(), pr_px.ravel())
    precisions, recalls, _ = precision_recall_curve(gt_bin.ravel(), pr_px.ravel())
    with np.errstate(divide="ignore", invalid="ignore"):
        f1 = (2 * precisions * recalls) / (precisions + recalls)
    f1_px = float(np.max(f1[np.isfinite(f1)]))
    aupro = cal_pro_score(gt_bin, pr_px)
    ret = {
        "auroc_px": round(auroc_px * 100, 1),
        "f1_px": round(f1_px * 100, 1),
        "ap_px": round(ap_px * 100, 1),
        "aupro": round(aupro * 100, 1),
    }
    print(ret, file=out)
    return ret


def _iou(a, b) -> float:
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / max(area_a + area_b - inter, 1e-12)


def simple_coco_map(gt_by_img: Dict, pred_by_img: Dict, out=sys.stdout) -> float:
    """Built-in AP@[.5:.95] (greedy matching, score-sorted) for when
    pycocotools is unavailable.  Boxes are xyxy."""
    aps = []
    for th in np.arange(0.5, 1.0, 0.05):
        tps, fps, n_gt = [], [], 0
        scored = []
        for img, preds in pred_by_img.items():
            gts = list(gt_by_img.get(img, []))
            n_gt += len(gts)
            used = set()
            for box, score in sorted(preds, key=lambda x: -x[1]):
                best, best_iou = None, th
                for gi, g in enumerate(gts):
                    if gi in used:
                        continue
                    iou = _iou(box, g)
                    if iou >= best_iou:
                        best, best_iou = gi, iou
                if best is not None:
                    used.add(best)
                    scored.append((score, 1))
                else:
                    scored.append((score, 0))
        if n_gt == 0:
            continue
        scored.sort(key=lambda x: -x[0])
        tp = np.cumsum([s[1] for s in scored]) if scored else np.array([0])
        fp = np.cumsum([1 - s[1] for s in scored]) if scored else np.array([0])
        recall = tp / n_gt
        precision = tp / np.maximum(tp + fp, 1)
        # 101-point interpolation
        ap = 0.0
        for r in np.linspace(0, 1, 101):
            prec = precision[recall >= r].max() if (recall >= r).any() else 0.0
            ap += prec / 101
        aps.append(ap)
    m = float(np.mean(aps)) if aps else 0.0
    print(f"mAP@[.5:.95]: {m:.4f}", file=out)
    return m


def eval_coco(coco_path: str, results: List[Dict], out=sys.stdout):
    """COCO bbox mAP (dc_protocol.py:146-204)."""
    try:
        from pycocotools.coco import COCO
        from pycocotools.cocoeval import COCOeval
        import tempfile

        with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
            json.dump(results, f)
            tmp = f.name
        coco_gt = COCO(coco_path)
        coco_dt = coco_gt.loadRes(tmp)
        ev = COCOeval(coco_gt, coco_dt, iouType="bbox")
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
        return ev.stats[0]
    except ImportError:
        with open(coco_path) as f:
            annos = json.load(f)
        gt_by_img: Dict = {}
        for a in annos["annotations"]:
            x, y, w, h = a["bbox"]
            gt_by_img.setdefault(a["image_id"], []).append((x, y, x + w, y + h))
        pred_by_img: Dict = {}
        for r in results:
            x, y, w, h = r["bbox"]
            pred_by_img.setdefault(r["image_id"], []).append(
                ((x, y, x + w, y + h), r.get("score", 0.9))
            )
        return simple_coco_map(gt_by_img, pred_by_img, out)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--result_path", type=str, required=True)
    parser.add_argument("--mode", type=str, default="ad", choices=["ad", "seg"])
    args = parser.parse_args()
    records = read_results(args.result_path)
    if args.mode == "ad":
        eval_ad(records)
    else:
        eval_seg(records)
