"""End-to-end training loop tests: tiny Myriad + synthetic AD data."""

import os
import textwrap

import numpy as np
import pytest

from tests.fixtures import make_ad_dataset


@pytest.fixture(scope="module")
def train_cfg_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("ad_data")
    make_ad_dataset(str(root), dataset="mvtec", classes=("bottle",), n_train=4,
                    img_size=64)
    out = tmp_path_factory.mktemp("output")
    cfg = tmp_path_factory.mktemp("cfg") / "train.yaml"
    cfg.write_text(textwrap.dedent(f"""
        model:
          arch: myriad
          model_type: pretrain_vicuna
          arch_preset: tiny
          use_ve: False
          freeze_vit: True
          freeze_qformer: True
          use_lora: True
          max_txt_len: 24
          end_sym: "###"
          vit_precision: "fp32"
          image_size: 28
        datasets:
          anomaly_detection:
            build_info:
              storage: {root}
              ann_paths:
                - DC_MVTEC_train_normal.jsonl
            vis_processor:
              train:
                name: "loc_image_train"
                identity: True
                image_size: 224
            text_processor:
              train:
                name: "blip_caption"
        run:
          task: image_text_pretrain
          lr_sched: "linear_warmup_cosine_lr"
          init_lr: 1e-3
          min_lr: 0
          warmup_lr: 1e-6
          weight_decay: 0.05
          max_epoch: 2
          iters_per_epoch: 2
          batch_size_train: 4
          num_workers: 0
          warmup_steps: 0
          seed: 42
          output_dir: {out}
          max_checkpoints: 2
    """))
    return str(cfg)


def _build_all(cfg_path):
    import myriad_tpu.datasets  # noqa: F401
    import myriad_tpu.models  # noqa: F401
    import myriad_tpu.runners  # noqa: F401
    import myriad_tpu.tasks as tasks
    from myriad_tpu.common.config import Config
    from myriad_tpu.common.registry import registry

    cfg = Config(cfg_path=cfg_path)
    # tiny arch uses 28x28 images; dataset emits 224 - patch dataset image
    task = tasks.setup_task(cfg)
    datasets = task.build_datasets(cfg)
    model = task.build_model(cfg)
    runner_cls = registry.get_runner_class("runner_base")
    return cfg, task, datasets, model, runner_cls


class _Shrink:
    """Wrap the AD dataset to resize images to the tiny arch size."""

    DatasetName = "AnomalyDetection"

    def __init__(self, ds, size=28):
        self.ds = ds
        self.size = size

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        s = self.ds[i]
        for k in ("image", "aug_image"):
            if k in s:
                img = s[k]
                s[k] = img[:: img.shape[0] // self.size, :: img.shape[1] // self.size][
                    : self.size, : self.size
                ]
        return s

    def collater(self, samples):
        return self.ds.collater(samples)


def test_runner_trains_and_checkpoints(train_cfg_path):
    import jax

    cfg, task, datasets, model, runner_cls = _build_all(train_cfg_path)
    datasets["anomaly_detection"]["train"] = _Shrink(
        datasets["anomaly_detection"]["train"]
    )
    runner = runner_cls(cfg=cfg, task=task, model=model, datasets=datasets,
                        job_id="test")

    before = jax.tree_util.tree_map(np.asarray, model.trainable)
    runner.train()

    after = jax.tree_util.tree_map(np.asarray, model.trainable)
    moved = any(
        float(np.abs(a - b).max()) > 0
        for a, b in zip(jax.tree_util.tree_leaves(after), jax.tree_util.tree_leaves(before))
    )
    assert moved, "trainable params did not change"
    # lora params moved too
    lora_moved = []

    def walk(b, a, path=""):
        if isinstance(b, dict):
            for k in b:
                walk(b[k], a[k], path + "/" + k)
        elif "lora" in path:
            lora_moved.append(float(np.abs(a - b).max()) > 0)

    walk(before, after)
    assert lora_moved and any(lora_moved)

    # checkpoints on disk, ring-limited
    ckpts = [d for d in os.listdir(runner.output_dir) if d.startswith("checkpoint_")]
    assert len(ckpts) == 2
    # log file contains config + 2 epoch stats lines
    with open(os.path.join(runner.output_dir, "log.txt")) as f:
        lines = f.readlines()
    assert len(lines) == 3

    # resume from epoch-1 checkpoint
    cfg2, task2, datasets2, model2, _ = _build_all(train_cfg_path)
    datasets2["anomaly_detection"]["train"] = _Shrink(
        datasets2["anomaly_detection"]["train"]
    )
    cfg2.run_cfg.resume_ckpt_path = os.path.join(runner.output_dir, "checkpoint_1")
    runner2 = runner_cls(cfg=cfg2, task=task2, model=model2, datasets=datasets2,
                         job_id="resume")
    assert runner2.start_epoch == 2
    resumed = jax.tree_util.tree_map(np.asarray, model2.trainable)
    for a, b in zip(jax.tree_util.tree_leaves(resumed), jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)
