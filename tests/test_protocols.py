"""Eval protocol grading tests on synthetic records."""

import io
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

from scripts.eval_protocol.dc_protocol import cal_pro_score, eval_ad, eval_seg
from scripts.eval_protocol.mean_protocol import get_model_answer, grade
from scripts.eval_protocol.aqa_protocol import grade_aqa
from scripts.eval_protocol.location_protocol import grade as grade_loc
from scripts.eval_protocol.roi_protocol import grade as grade_roi
from scripts.eval_protocol.summary_results import summarize_file


def _records():
    rows = []
    for i in range(20):
        anomalous = i % 2 == 0
        correct = i % 5 != 0  # a few mistakes
        pred_anom = anomalous if correct else not anomalous
        text = ("Yes, there exists anomalies in the image."
                if pred_anom else "No, there exists no anomalies in the image.")
        rows.append({
            "image_id": i,
            "image_path": f"mvtec/{'bottle' if i < 10 else 'screw'}/test/x/{i}.png",
            "is_anomaly": anomalous,
            "output": text,
            "anomaly_score": str(0.8 if anomalous else 0.2),
        })
    return rows


def test_phrase_bank_parsing():
    assert get_model_answer("Yes, there exists anomalies") == 1
    assert get_model_answer("No, there exists no anomalies") == 0
    assert get_model_answer("the object has a defect on top") == 1
    assert get_model_answer("it looks fine to me") == 0
    assert get_model_answer("qqqq") == -1
    assert get_model_answer("the answer is A.", mode=2) == 1
    assert get_model_answer("D", mode=3) == 0


def test_mean_protocol_grading():
    out = io.StringIO()
    metrics = grade(_records(), out=out)
    assert 0.7 < metrics["accuracy"] < 0.9
    assert metrics["score_auroc"] == 1.0  # scores perfectly separate
    assert "avg_scene_acc" in metrics
    assert 0 <= metrics["over_kill"] <= 1 and 0 <= metrics["miss"] <= 1


def test_dc_eval_ad_with_boxes():
    rows = []
    for i in range(10):
        anomalous = i % 2 == 0
        out = "(0.1,0.1,0.5,0.5)" if anomalous else "all normal"
        rows.append({"is_anomaly": anomalous, "output": out})
    m = eval_ad(rows, out=io.StringIO())
    assert m["accuracy"] == 1.0 and m["f1_max_cls"] == 1.0


def test_eval_seg_and_aupro(rng):
    preds = []
    for _ in range(4):
        gt = np.zeros((32, 32))
        gt[8:16, 8:16] = 1
        amap = gt * 0.9 + rng.random((32, 32)) * 0.1
        preds.append({"gt_mask": gt, "anomaly_maps": amap})
    m = eval_seg(preds, out=io.StringIO())
    assert m["auroc_px"] > 95
    assert m["aupro"] > 80

    # degenerate: constant map
    assert cal_pro_score(np.stack([p["gt_mask"] for p in preds]),
                         np.zeros((4, 32, 32))) == 0.0


def test_aqa_protocol():
    rows = []
    for i in range(12):
        anomalous = i % 2 == 0
        # model picks A for anomalous, D for normal, always correct
        rows.append({
            "answer": 1 if anomalous else 0,
            "output": "The answer is A." if anomalous else "D",
            "is_anomaly": anomalous,
        })
    m = grade_aqa(rows, protocol="v2", mode=3, out=io.StringIO())
    assert m["accuracy"] == 1.0


def test_location_and_roi_and_summary(tmp_path):
    rows = _records()
    m = grade_loc(rows, out=io.StringIO())
    assert "accuracy" in m
    m2 = grade_roi(
        [{"image_id": 0, "is_anomaly": True, "output": "is A.",
          "image_path": "mvtec/bottle/test/x/0.png"},
         {"image_id": 1, "is_anomaly": False, "output": "C",
          "image_path": "mvtec/bottle/test/x/1.png"}],
        mode=2, out=io.StringIO())
    assert m2["accuracy"] == 1.0


def test_roi_full_grading_sections():
    """Per-image aggregation, score sweep, per-scene normal-max threshold
    (reference roi_protocol.py:183-299)."""
    rows = []
    # image 0: two rows, one Yes one unknown -> aggregates to anomalous
    rows.append({"image_id": 0, "is_anomaly": True, "anomaly_score": "0.9",
                 "output": "There is an anomaly in the image.",
                 "image_path": "mvtec/bottle/test/x/0.png"})
    rows.append({"image_id": 0, "is_anomaly": True, "anomaly_score": "0.9",
                 "output": "hmm unclear",
                 "image_path": "mvtec/bottle/test/x/0.png"})
    for i in range(1, 9):
        anomalous = i % 2 == 0
        rows.append({
            "image_id": i, "is_anomaly": anomalous,
            "anomaly_score": str(0.7 + 0.02 * i if anomalous else 0.2 + 0.02 * i),
            "output": "contains an anomaly" if anomalous else "There is no defect",
            "image_path": f"mvtec/{'bottle' if i < 5 else 'screw'}/test/x/{i}.png",
        })
    m = grade_roi(rows, mode=0, out=io.StringIO())
    assert m["accuracy"] == 1.0 and m["miss"] == 0.0 and m["over_kill"] == 0.0
    assert m["score_auroc"] == 1.0
    # per-scene: normal-max threshold separates perfectly in this fixture
    assert m["avg_scene_th_acc"] == 1.0
    assert "avg_scene_auroc" in m and m["avg_scene_auroc"] == 1.0


def test_roi_extended_phrase_bank():
    from scripts.eval_protocol.roi_protocol import get_model_answer as roi_ans

    assert roi_ans("There are two anomalies present") == 1
    assert roi_ans("the image contains no anomalies at all") == 0
    assert roi_ans("completely unrelated text") == -1
    # option modes
    assert roi_ans("the answer is A.", mode=2) == 1
    assert roi_ans("C", mode=2) == 0
    assert roi_ans("D", mode=3) == 0


def test_location_score_section_and_aggregation():
    rows = [
        {"image_id": 0, "is_anomaly": True, "output": "Yes",
         "anomaly_score": "0.8", "image_path": "mvtec/bottle/test/x/0.png"},
        {"image_id": 1, "is_anomaly": False, "output": "No",
         "anomaly_score": "0.1", "image_path": "mvtec/bottle/test/x/1.png"},
        {"image_id": 1, "is_anomaly": False, "output": "cannot tell",
         "anomaly_score": "0.1", "image_path": "mvtec/bottle/test/x/1.png"},
    ]
    m = grade_loc(rows, out=io.StringIO())
    assert m["accuracy"] == 1.0
    assert m["score_auroc"] == 1.0


def test_summary_results(tmp_path):
    import json

    rows = _records()
    p = tmp_path / "results_x.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    s = summarize_file(str(p))
    assert s["n"] == 20 and 0.7 < s["acc"] < 0.9


def test_clear_exps(tmp_path):
    from scripts.utils.clear_exps import clear_experiment

    for i in range(12):
        (tmp_path / f"checkpoint_{i}").mkdir()
    removed = clear_experiment(str(tmp_path), keep_every=5)
    import os

    left = sorted(os.listdir(tmp_path))
    assert "checkpoint_0" in left and "checkpoint_5" in left
    assert "checkpoint_10" in left and "checkpoint_11" in left  # last kept
    assert "checkpoint_3" not in left
    assert len(removed) == 8
