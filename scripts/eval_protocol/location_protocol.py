"""Location-aware grading (reference
scripts/eval_protocol/location_protocol.py): strict Yes/No parsing plus
accuracy of the predicted 3x3-grid position phrase for anomalous images."""

from __future__ import annotations

import argparse
import sys

import numpy as np

_repo_root = __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
sys.path.insert(0, _repo_root)

from scripts.eval_protocol.mean_protocol import read_jsonl  # noqa: E402

POSITIONS = [
    "upper left", "top", "upper right", "left", "center", "right",
    "lower left", "bottom", "lower right",
]


def get_model_answer(text: str) -> int:
    """Strict variant: only 'Yes'/'No' decide (location_protocol.py:46-60)."""
    if "Yes" in text:
        return 1
    if "No" in text:
        return 0
    return -1


def extract_positions(text: str):
    return [p for p in POSITIONS if p in text]


def grade(records, out=sys.stdout):
    from sklearn.metrics import accuracy_score, confusion_matrix

    preds = np.array([get_model_answer(r["output"]) for r in records])
    gts = np.array([1 if r["is_anomaly"] else 0 for r in records])
    known = preds != -1
    print("unknown:", int(np.sum(~known)), file=out)
    metrics = {}
    if known.any():
        conf = confusion_matrix(gts[known], preds[known], labels=[0, 1])
        print(conf, file=out)
        metrics["accuracy"] = accuracy_score(gts[known], preds[known])
        print("Acc:", metrics["accuracy"], file=out)

    # position accuracy on anomalous rows carrying gt_position
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
    args = parser.parse_args()
    grade(read_jsonl(args.result_path))
