"""Score distributions of the MISGRADED rows (reference
scripts/analysis/low_scores_dist.py): anomalous rows the LM called
'perfect' (misses) vs normal rows it called 'defects' (over-kills) — where
the VE map score sat when the language head got it wrong."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _dist import run_distribution  # noqa: E402

if __name__ == "__main__":
    run_distribution(
        field="anomaly_map_scores",
        pos_name="missing", neg_name="overkill",
        pos_filter=lambda r: "perfect" in r.get("output", "")
        or "No" in r.get("output", ""),
        neg_filter=lambda r: "defects" in r.get("output", "")
        or "Yes" in r.get("output", ""),
        with_auroc=False, ylim=90,
    )
