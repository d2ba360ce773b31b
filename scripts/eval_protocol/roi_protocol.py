"""ROI-option grading (reference scripts/eval_protocol/roi_protocol.py):
multiple-choice over region proposals — option C/D = normal depending on
the ROI count; reuses the option parsing modes of mean_protocol."""

from __future__ import annotations

import argparse
import sys

import numpy as np

_repo_root = __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
sys.path.insert(0, _repo_root)

from scripts.eval_protocol.mean_protocol import get_model_answer, read_jsonl  # noqa: E402


def grade(records, mode: int = 2, out=sys.stdout):
    from sklearn.metrics import accuracy_score, confusion_matrix

    preds = np.array([get_model_answer(r["output"], mode=mode) for r in records])
    gts = np.array([1 if r["is_anomaly"] else 0 for r in records])
    known = preds != -1
    print("unknown:", int(np.sum(~known)), file=out)
    if not known.any():
        return {}
    conf = confusion_matrix(gts[known], preds[known], labels=[0, 1])
    print(conf, file=out)
    metrics = {
        "accuracy": accuracy_score(gts[known], preds[known]),
        "over_kill": conf[0, 1] / max(conf[0, 0] + conf[0, 1], 1),
        "miss": conf[1, 0] / max(conf[1, 0] + conf[1, 1], 1),
    }
    for k, v in metrics.items():
        print(f"{k}: {v}", file=out)
    return metrics


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--result_path", type=str, required=True)
    parser.add_argument("--mode", type=int, default=2)
    args = parser.parse_args()
    grade(read_jsonl(args.result_path), mode=args.mode)
