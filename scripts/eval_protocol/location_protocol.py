"""Location-task grading (reference
scripts/eval_protocol/location_protocol.py, full parity): strict Yes/No
parsing (or option modes 2/3), per-image aggregation, unknown accounting,
confusion metrics excluding unknowns, and anomaly-score AUROC + threshold
sweep.  Additionally grades the 3x3-grid position phrases the AD dataset
emits (myriad_tpu/datasets/anomaly_detection.py position slots) — an
extension over the reference grader, which stops at Yes/No.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

_repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _repo_root)

from scripts.eval_protocol import _aggregate  # noqa: E402
from scripts.eval_protocol.mean_protocol import read_jsonl  # noqa: E402

POSITIONS = [
    "upper left", "top", "upper right", "left", "center", "right",
    "lower left", "bottom", "lower right",
]


def get_model_answer(text: str, mode: int = 0) -> int:
    """Strict variant: only 'Yes'/'No' decide (location_protocol.py:44-77)."""
    if mode == 0:
        if "Yes" in text:
            return 1
        if "No" in text:
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


def extract_positions(text: str):
    return [p for p in POSITIONS if p in text]


def grade(records, mode: int = 0, out=sys.stdout):
    preds = [get_model_answer(r["output"], mode=mode) for r in records]
    preds_np = np.array(preds)
    known = len(records) - int(np.sum(preds_np == -1))
    print("unknown predictions:", int(np.sum(preds_np == -1)), file=out)
    print("predicted anomalous:", int(np.sum(preds_np == 1)),
          np.sum(preds_np == 1) / max(known, 1), file=out)
    print("predicted normal:", int(np.sum(preds_np == 0)),
          np.sum(preds_np == 0) / max(known, 1), file=out)

    gts, img_preds = _aggregate.aggregate_images(records, preds)
    metrics = _aggregate.binary_metrics(gts, img_preds, out=out)
    metrics.update(_aggregate.score_metrics(records, out=out))

    # position accuracy on anomalous rows carrying gt_position (extension)
    pos_rows = [r for r in records if r.get("gt_position")]
    if pos_rows:
        hit = sum(
            1 for r in pos_rows
            if set(extract_positions(r["output"])) & set(np.atleast_1d(r["gt_position"]))
        )
        metrics["position_acc"] = hit / len(pos_rows)
        print("Position acc:", metrics["position_acc"], file=out)
    return metrics


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--result_path", type=str, required=True)
    parser.add_argument("--protocol", type=str, choices=["v1", "v2"], default="v2")
    parser.add_argument("--mode", type=int, default=0)
    args = parser.parse_args()
    grade(read_jsonl(args.result_path), mode=args.mode)
