"""AQA multiple-choice grading protocol (reference
scripts/eval_protocol/aqa_protocol.py:148-278).

Grades <A>-<D> option answers: protocol v1 counts a sample anomalous only
when the chosen option matches the answer; v2 maps "not D" -> anomalous.
Prints QA accuracy (overall / on anomalous / on normal) plus the
image-level confusion metrics shared with mean_protocol.
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


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--result_path", type=str, required=True)
    parser.add_argument("--protocol", type=str, choices=["v1", "v2"], default="v2")
    parser.add_argument("--mode", type=int, default=3)
    args = parser.parse_args()
    grade_aqa(read_jsonl(args.result_path), protocol=args.protocol, mode=args.mode)
