"""End-to-end drive of the shipping eval CLI (evaluation_aqa_dataset.py).

Runs the real harness as a subprocess on a tiny synthetic MVTec tree and
the tiny arch preset (CPU), then checks the reference-schema jsonl rows,
the ragged-final-batch padding, the --bench JSON line, and that the
mean_protocol grader consumes the output.  This is the artifact a user of
the reference actually runs (reference evaluation_aqa_dataset.py CLI).
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def harness_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("harness")
    data_root = str(tmp / "data")
    from fixtures import make_ad_dataset

    make_ad_dataset(data_root, dataset="mvtec", classes=("bottle",),
                    n_train=2, n_test=10, img_size=28, seed=0)
    cfg = tmp / "eval_tiny.yaml"
    cfg.write_text(
        "model:\n"
        "  arch: myriad\n"
        "  arch_preset: tiny\n"
        "  image_size: 28\n"
        "  use_ve: True\n"
        "  max_txt_len: 16\n"
        "  end_sym: \"###\"\n"
        "  vit_precision: fp32\n"
        "datasets:\n"
        "  anomaly_detection:\n"
        "    img_size: 28\n"
        "    crop_size: 28\n"
        f"    build_info: {{storage: {data_root}}}\n"
        "run:\n"
        "  task: image_text_pretrain\n"
        "  device: cpu\n"
    )
    out = tmp / "results.jsonl"
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "evaluation_aqa_dataset.py"),
         "--cfg-path", str(cfg), "--task_type", "1cls", "--split", "mvtec",
         "--bs", "4", "--save_path", str(out), "--bench", "--greedy",
         "--max_new_tokens", "6"],
        capture_output=True, text=True, cwd=ROOT, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc, out


def test_harness_writes_reference_schema_rows(harness_run):
    _, out = harness_run
    rows = [json.loads(l) for l in open(out)]
    # 10 test images, batch 4 -> 3 batches, ragged final batch of 2 padded
    # for compile-bucket reuse but NOT written to the jsonl
    assert len(rows) == 10
    for r in rows:
        assert set(r) >= {"image_id", "image_path", "is_anomaly", "output",
                          "error", "anomaly_score"}
        assert r["error"] in ("0", "1")
        float(r["anomaly_score"])
    # both classes present (fixture alternates good/broken)
    assert {r["is_anomaly"] for r in rows} == {True, False}


def test_harness_bench_json_line(harness_run):
    proc, _ = harness_run
    bench_lines = [l for l in proc.stdout.splitlines()
                   if l.startswith("{") and "images/sec" in l]
    assert bench_lines, proc.stdout[-2000:]
    rec = json.loads(bench_lines[-1])
    assert rec["value"] > 0 and rec["batch_size"] == 4


def test_mean_protocol_grades_harness_output(harness_run, tmp_path):
    _, out = harness_run
    proc = subprocess.run(
        [sys.executable,
         os.path.join(ROOT, "scripts", "eval_protocol", "mean_protocol.py"),
         "--result_path", str(out)],
        capture_output=True, text=True, cwd=ROOT, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "accuracy" in proc.stdout.lower() or "acc" in proc.stdout.lower()
