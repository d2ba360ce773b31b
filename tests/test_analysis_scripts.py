"""Analysis-script tail + GradCAM overlay (VERDICT r2 next #9).

Drives the three reference-named distribution scripts
(scripts/analysis/{map_score_dist,low_scores_dist,
oneshotmask_distribution}.py) as subprocesses over a synthetic results
jsonl and checks histograms/AUROC/PNG output; pins the shared AUROC
helper against sklearn; and checks ``visual_utils.attention_overlay``
(reference common/gradcam.py getAttMap semantics).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(ROOT, "scripts", "analysis")


@pytest.fixture(scope="module")
def results_jsonl(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("analysis")
    rng = np.random.default_rng(0)
    path = tmp / "results.jsonl"
    with open(path, "w") as f:
        for i in range(40):
            anom = i % 2 == 1
            score = float(np.clip(rng.normal(0.7 if anom else 0.3, 0.15), 0, 1))
            f.write(json.dumps({
                "image_id": i,
                "is_anomaly": anom,
                "output": ("Yes, there exists anomalies in the image."
                           if (anom != (i % 10 == 3)) else
                           "No, there exists no anomalies in the image."),
                "anomaly_score": str(round(score, 4)),
                "anomaly_map_scores": round(score, 4),
            }) + "\n")
    return tmp, path


@pytest.mark.parametrize("script,needs_auroc", [
    ("map_score_dist.py", False),
    ("low_scores_dist.py", False),
    ("oneshotmask_distribution.py", True),
])
def test_distribution_scripts_run(results_jsonl, script, needs_auroc):
    tmp, path = results_jsonl
    png = tmp / f"{script}.png"
    proc = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, script),
         "--path", str(path), "--plot", str(png)],
        capture_output=True, text=True, timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert png.is_file() and png.stat().st_size > 0
    # histogram edges + counts printed (the reference's np.histogram dump)
    assert "[" in proc.stdout
    if needs_auroc:
        line = [l for l in proc.stdout.splitlines() if l.startswith("AUROC")]
        auroc = float(line[0].split(":")[1])
        assert 0.5 < auroc <= 1.0  # separated synthetic distributions


def test_auroc_matches_sklearn():
    sys.path.insert(0, SCRIPTS)
    from _dist import auroc

    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(1)
    gts = rng.integers(0, 2, 200)
    preds = rng.random(200) + gts * 0.3
    # include ties
    preds = np.round(preds, 1)
    assert auroc(gts, preds) == pytest.approx(roc_auc_score(gts, preds), abs=1e-9)


def test_attention_overlay_gradcam_semantics():
    from myriad_tpu.visual_utils import attention_overlay

    rng = np.random.default_rng(2)
    img = rng.random((32, 32, 3)).astype(np.float32)
    att = np.zeros((8, 8), np.float32)
    att[2, 3] = 5.0  # one hot spot
    blurred = attention_overlay(img, att, blur=True, overlap=True)
    assert blurred.shape == img.shape
    assert blurred.min() >= 0 and blurred.max() <= 1.0 + 1e-6
    out = attention_overlay(img, att, blur=False, overlap=True)
    # far corners keep ~the original image (attention weight ~0 there
    # without the blur's re-normalization lift)
    np.testing.assert_allclose(out[-1, -1], img[-1, -1], atol=0.15)
    # the hot region was recolored (differs from the underlying image)
    cy, cx = 2 * 4 + 2, 3 * 4 + 2
    assert np.abs(out[cy, cx] - img[cy, cx]).max() > 0.1
    heat_only = attention_overlay(img, att, blur=False, overlap=False)
    assert heat_only.shape == img.shape
