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


def test_aqa_localization_pixel_auroc():
    """Box-cropped pixel-AUROC (reference aqa_protocol.py:52-145): the VE
    mask survives only inside the predicted defect boxes."""
    import numpy as np

    from scripts.eval_protocol.aqa_protocol import (
        cal_anomaly_scores,
        collect_defect_boxes,
        get_option_index,
    )

    assert get_option_index("the answer is B") == 1
    assert get_option_index("x: D", mode=1) == 3
    assert get_option_index("nothing here", mode=0) == -1

    records = [
        # image 0: defect predicted at option A (box [0,0,8,8])
        {"image_id": 0, "output": "the answer is A",
         "options": [[0, 0, 8, 8], [8, 8, 16, 16], [0, 8, 8, 16], [0, 0, 0, 0]]},
        # image 1: predicted normal (D) -> all options filed as normals
        {"image_id": 1, "output": "the answer is D",
         "options": [[0, 0, 8, 8], [8, 8, 16, 16], [0, 8, 8, 16], [0, 0, 0, 0]]},
    ]
    infos = collect_defect_boxes(records, mode=0)
    assert infos[0]["defects"] == [[0, 0, 8, 8]]
    assert infos[1]["defects"] == [] and len(infos[1]["normals"]) == 4

    ve = np.ones((16, 16), np.float32)  # VE fires everywhere
    gt0 = np.zeros((16, 16), np.float32)
    gt0[:8, :8] = 1.0  # true defect exactly where the predicted box is
    gt1 = np.zeros((16, 16), np.float32)
    import io

    auroc = cal_anomaly_scores(
        infos,
        ve_of=lambda i: ve,
        gt_of=lambda i: gt0 if i == 0 else gt1,
        out=io.StringIO(),
    )
    # cropped VE == gt on image 0 and all-zero on the normal image -> perfect
    assert auroc == 1.0

    # with a WRONG box the cropped mask misses the defect -> AUROC collapses
    infos[0]["defects"] = [[8, 8, 16, 16]]
    auroc2 = cal_anomaly_scores(
        infos, ve_of=lambda i: ve, gt_of=lambda i: gt0 if i == 0 else gt1,
        out=io.StringIO(),
    )
    assert auroc2 < 0.5


def test_retrieval_sim_matrix():
    """compute_sim_matrix (blip2.py:128-241 equivalent): stage-1 max-over-
    query scores + top-k re-rank layout."""
    import numpy as np

    from myriad_tpu.models.retrieval import compute_sim_matrix

    rng = np.random.default_rng(0)
    img = rng.normal(size=(4, 3, 8)).astype(np.float32)  # (N_img, Q, D)
    txt = rng.normal(size=(5, 8)).astype(np.float32)

    def itm(i, topk):
        return np.zeros(np.shape(topk) or (1,), np.float32) + 0.5

    i2t, t2i = compute_sim_matrix(img, txt, itm_score_fn=itm, k_test=3)
    assert i2t.shape == (4, 5) and t2i.shape == (5, 4)
    # exactly k entries per row are scored, the rest stay at the -100 floor
    assert ((i2t > -100).sum(axis=1) == 3).all()
    assert ((t2i > -100).sum(axis=1) == 3).all()
    # stage-1 score = max over query tokens (+ rerank 0.5)
    ref = np.einsum("iqd,td->iqt", img, txt).max(axis=1)
    i, t = 0, int(np.argmax(ref[0]))
    np.testing.assert_allclose(i2t[i, t], ref[i, t] + 0.5, rtol=1e-5)


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
