"""Stage-1 style pretraining: webdataset tar shards -> mixed-ratio loaders
-> MiniGPT4 training through the runner (BASELINE config 5 shape)."""

import io
import json
import os
import tarfile
import textwrap

import numpy as np
import pytest
from PIL import Image


def _make_shard(path, n, caption, img_size=28, seed=0):
    rng = np.random.default_rng(seed)
    with tarfile.open(path, "w") as tar:
        for i in range(n):
            img = Image.fromarray(
                rng.integers(0, 255, (img_size, img_size, 3), dtype=np.uint8)
            )
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{i:05d}.jpg")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
            meta = json.dumps({"caption": f"{caption} {i}"}).encode()
            info = tarfile.TarInfo(f"{i:05d}.json")
            info.size = len(meta)
            tar.addfile(info, io.BytesIO(meta))


def test_tar_dataset_stream(tmp_path):
    from myriad_tpu.datasets.caption_datasets import TarShardIterableDataset
    from myriad_tpu.processors.blip_processors import (
        Blip2ImageTrainProcessor,
        BlipCaptionProcessor,
    )

    shard = tmp_path / "00000.tar"
    _make_shard(str(shard), 5, "a photo of gadget")
    ds = TarShardIterableDataset(
        Blip2ImageTrainProcessor(image_size=28), BlipCaptionProcessor(),
        str(tmp_path / "*.tar"), seed=0, shuffle_buffer=4,
    )
    it = iter(ds)
    seen = [next(it) for _ in range(8)]  # stream wraps past shard end
    assert all(s["image"].shape == (28, 28, 3) for s in seen)
    assert all("gadget" in s["text_input"] for s in seen)


def test_stage1_runner_mixed_ratio(tmp_path):
    import myriad_tpu.datasets  # noqa: F401
    import myriad_tpu.models  # noqa: F401
    import myriad_tpu.runners  # noqa: F401
    import myriad_tpu.tasks as tasks
    from myriad_tpu.common.config import Config
    from myriad_tpu.common.registry import registry

    laion_dir = tmp_path / "laion"
    cc_dir = tmp_path / "cc"
    laion_dir.mkdir()
    cc_dir.mkdir()
    _make_shard(str(laion_dir / "00000.tar"), 6, "laion cap", seed=1)
    _make_shard(str(cc_dir / "00000.tar"), 6, "cc cap", seed=2)

    cfg_file = tmp_path / "stage1.yaml"
    cfg_file.write_text(textwrap.dedent(f"""
        model:
          arch: mini_gpt4
          model_type: pretrain_vicuna
          arch_preset: tiny
          image_size: 28
          max_txt_len: 12
          end_sym: "###"
          vit_precision: "fp32"
        datasets:
          laion:
            build_info: {{storage: "{laion_dir}/*.tar"}}
            vis_processor:
              train: {{name: blip2_image_train, image_size: 28}}
            text_processor:
              train: {{name: blip_caption}}
            sample_ratio: 115
          cc_sbu:
            build_info: {{storage: "{cc_dir}/*.tar"}}
            vis_processor:
              train: {{name: blip2_image_train, image_size: 28}}
            text_processor:
              train: {{name: blip_caption}}
            sample_ratio: 14
        run:
          task: image_text_pretrain
          init_lr: 1e-3
          min_lr: 0
          max_epoch: 1
          iters_per_epoch: 3
          batch_size_train: 2
          num_workers: 0
          seed: 0
          output_dir: {tmp_path}/out
          prefetch: False
    """))
    cfg = Config(cfg_path=str(cfg_file))
    task = tasks.setup_task(cfg)
    datasets = task.build_datasets(cfg)
    assert getattr(datasets["laion"]["train"], "sample_ratio", None) == 115
    model = task.build_model(cfg)
    runner = registry.get_runner_class("runner_base")(
        cfg=cfg, task=task, model=model, datasets=datasets, job_id="s1")
    runner.train()
    assert runner._train_ratios == [115.0, 14.0] or runner._train_ratios == [14.0, 115.0]
    with open(os.path.join(runner.output_dir, "log.txt")) as f:
        lines = f.readlines()
    assert any("train_loss" in l for l in lines)
