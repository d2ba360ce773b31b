"""One-shot mask score distribution + AUROC (reference
scripts/analysis/oneshotmask_distribution.py): histogram of
``anomaly_score`` (the max of the one-shot VE mask) split by gt label,
plus the label AUROC of that score."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _dist import run_distribution  # noqa: E402

if __name__ == "__main__":
    run_distribution(
        field="anomaly_score",
        pos_name="anomaly", neg_name="normal",
        with_auroc=True, ylim=1000,
    )
