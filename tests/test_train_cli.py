"""End-to-end drive of the training CLI (train.py).

Runs the real entry point as a subprocess (reference train.py CLI shape:
--cfg-path + --options) on a tiny synthetic AD tree, then checks the
training log's loss lines and the checkpoint ring on disk.
"""

import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def train_run(tmp_path_factory):
    from fixtures import make_ad_dataset

    root = tmp_path_factory.mktemp("ad_data")
    make_ad_dataset(str(root), dataset="mvtec", classes=("bottle",), n_train=4,
                    img_size=28)
    out = tmp_path_factory.mktemp("output")
    cfg = tmp_path_factory.mktemp("cfg") / "train.yaml"
    cfg.write_text(textwrap.dedent(f"""
        model:
          arch: myriad
          model_type: pretrain_vicuna
          arch_preset: tiny
          image_size: 28
          use_ve: False
          use_lora: True
          max_txt_len: 24
          end_sym: "###"
          vit_precision: "fp32"
        datasets:
          anomaly_detection:
            img_size: 28
            crop_size: 28
            build_info:
              storage: {root}
              ann_paths:
                - DC_MVTEC_train_normal.jsonl
            vis_processor:
              train: {{name: "loc_image_train", identity: True, image_size: 28}}
            text_processor:
              train: {{name: "blip_caption"}}
        run:
          task: image_text_pretrain
          device: cpu
          lr_sched: "linear_warmup_cosine_lr"
          init_lr: 1e-3
          min_lr: 0
          warmup_lr: 1e-6
          weight_decay: 0.05
          max_epoch: 2
          iters_per_epoch: 2
          batch_size_train: 2
          num_workers: 0
          warmup_steps: 0
          seed: 42
          output_dir: {out}
          max_checkpoints: 2
    """))
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "train.py"), "--cfg-path", str(cfg)],
        capture_output=True, text=True, cwd=ROOT, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return out


def test_train_cli_writes_loss_log(train_run):
    logs = [p for p in os.listdir(train_run) if p == "log.txt"]
    if not logs:  # output may nest under a run subdir
        for d in os.listdir(train_run):
            sub = os.path.join(train_run, d)
            if os.path.isdir(sub) and "log.txt" in os.listdir(sub):
                train_run = sub
                break
    log = os.path.join(str(train_run), "log.txt")
    assert os.path.exists(log), os.listdir(str(train_run))
    rows = [json.loads(l) for l in open(log) if l.strip()]
    losses = [float(r["train_loss"]) for r in rows if "train_loss" in r]
    assert losses and all(np.isfinite(l) for l in losses)


def test_train_cli_checkpoint_ring(train_run):
    found = []
    for dirpath, dirs, _ in os.walk(str(train_run)):
        found += [d for d in dirs if d.startswith("checkpoint_")]
    # max_epoch=2, max_checkpoints=2 -> the orbax ring holds both epochs
    assert sorted(found) == ["checkpoint_0", "checkpoint_1"], found
