"""Summarize many result .jsonl files into one table (reference
scripts/eval_protocol/summary_results.py): per-file accuracy / over-kill /
miss via the shared phrase-bank grading."""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

_repo_root = __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
sys.path.insert(0, _repo_root)

from scripts.eval_protocol.mean_protocol import get_model_answer, read_jsonl  # noqa: E402


def summarize_file(path: str) -> dict:
    records = read_jsonl(path)
    preds = np.array([get_model_answer(r["output"]) for r in records])
    gts = np.array([1 if r["is_anomaly"] else 0 for r in records])
    known = preds != -1
    if not known.any():
        return {"file": os.path.basename(path), "n": len(records),
                "unknown": int(np.sum(~known)), "acc": float("nan")}
    p, g = preds[known], gts[known]
    over_kill = np.sum((p == 1) & (g == 0)) / max(np.sum(g == 0), 1)
    miss = np.sum((p == 0) & (g == 1)) / max(np.sum(g == 1), 1)
    return {
        "file": os.path.basename(path),
        "n": len(records),
        "unknown": int(np.sum(~known)),
        "acc": float(np.mean(p == g)),
        "over_kill": float(over_kill),
        "miss": float(miss),
    }


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--results_dir", type=str, required=True)
    parser.add_argument("--pattern", type=str, default="results_*.jsonl")
    args = parser.parse_args()
    rows = [
        summarize_file(p)
        for p in sorted(glob.glob(os.path.join(args.results_dir, args.pattern)))
    ]
    if not rows:
        print("no result files found")
    for row in rows:
        print(
            f"{row['file']}: n={row['n']} acc={row.get('acc', float('nan')):.4f} "
            f"over_kill={row.get('over_kill', float('nan')):.4f} "
            f"miss={row.get('miss', float('nan')):.4f} unknown={row.get('unknown', 0)}"
        )
