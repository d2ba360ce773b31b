"""Anomaly-MAP score distributions split by gt label
(reference scripts/analysis/map_score_dist.py: histograms of
``anomaly_map_scores`` for abnormal vs normal rows, printed edges+counts,
optional histogram PNG)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _dist import run_distribution  # noqa: E402

if __name__ == "__main__":
    run_distribution(
        field="anomaly_map_scores",
        pos_name="abnormal", neg_name="normal",
        with_auroc=False, ylim=500,
    )
