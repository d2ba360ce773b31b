"""ROI-task grading (reference scripts/eval_protocol/roi_protocol.py, full
parity): extended phrase banks (mode 0) or multiple-choice option parsing
(modes 2/3), per-image multi-row aggregation, unknown accounting,
confusion metrics excluding unknowns, anomaly-score AUROC + threshold
sweep, and the per-scene accuracy / score-AUROC / normal-max-threshold
section with macro averages.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

_repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _repo_root)

from scripts.eval_protocol import _aggregate  # noqa: E402
from scripts.eval_protocol.mean_protocol import (  # noqa: E402
    ABNORMAL_WORDS,
    NORMAL_WORDS,
    read_jsonl,
)

# the ROI grader extends the shared banks (roi_protocol.py:46-126)
ROI_ABNORMAL_WORDS = ABNORMAL_WORDS + [
    "There is an anomaly", "There are two defect", "There are three",
    "have two anomalies", "There are two anomalies", "has an anomaly",
    "contains an anomaly",
]
ROI_NORMAL_WORDS = [w for w in NORMAL_WORDS if w != "No"] + [
    "No,", "There is no anomaly", "There are no defect", "There is no defect",
    "There are no", "has no anomalies", "has 0 defect", "contains no defect",
    "contains no anomal",
]


def get_model_answer(text: str, mode: int = 0) -> int:
    """1 = anomalous, 0 = normal, -1 = unknown (roi_protocol.py:44-151)."""
    if mode == 0:
        if any(w in text for w in ROI_ABNORMAL_WORDS):
            return 1
        if any(w in text for w in ROI_NORMAL_WORDS):
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
    metrics.update(_aggregate.scene_metrics(records, preds, out=out))
    return metrics


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--result_path", type=str, required=True)
    parser.add_argument("--protocol", type=str, choices=["v1", "v2"], default="v2")
    parser.add_argument("--mode", type=int, default=0)
    args = parser.parse_args()
    grade(read_jsonl(args.result_path), mode=args.mode)
