"""Subprocess worker for the MODEL-LEVEL multi-host runner test.

Drives the real ``RunnerBase`` + tiny ``Myriad`` under ``jax.distributed``
(VERDICT r2 next #4 — the reference's contract is DDP around the real
model, reference runner_base.py:85-102).  Each process holds 2 CPU
devices; the global mesh is (data=2*nproc, model=1).  A deterministic
in-memory dataset makes the 2-process loss trajectory comparable to the
1-process run: per-iteration global batches cover the same row SETS
(DistributedSampler strided shards), and the mean loss is
permutation-invariant.

Prints:
    STATS <epoch> <loss>      per-epoch averaged loss (from runner stats)
    TRAIN_SUM <float>         sum(|trainable|) after training
    CKPTS <n>                 checkpoint_* dirs in THIS process's output dir
    RESUME_OK <start_epoch>   resume from rank-0's checkpoint succeeded

Usage: python multihost_runner_worker.py <pid> <nproc> <port> <workdir> <local_bs>
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
workdir, local_bs = sys.argv[4], int(sys.argv[5])
if nproc > 1:
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc,
        process_id=pid,
    )

import numpy as np  # noqa: E402

import myriad_tpu.models  # noqa: F401,E402 - registration
import myriad_tpu.runners  # noqa: F401,E402 - registration
import myriad_tpu.tasks as tasks  # noqa: E402
from myriad_tpu.common.config import ConfigDict  # noqa: E402
from myriad_tpu.common.registry import registry  # noqa: E402
from myriad_tpu.models.layers import Policy  # noqa: E402
from myriad_tpu.models.myriad import Myriad, MyriadArch  # noqa: E402

N = 16
QUESTION = "<Img><ImageHere></Img>Is there an anomaly in this image?"
TEXTS = ["No, there exists no anomalies in the image.",
         "Yes, there exists anomalies in the image."]


class DeterministicDataset:
    """Index-keyed samples: identical on every process and run."""

    def __len__(self):
        return N

    def __getitem__(self, i):
        rng = np.random.default_rng(1000 + i)
        return {
            "image": rng.normal(size=(28, 28, 3)).astype(np.float32) * 0.5,
            "scene": "bottle",
            "question": QUESTION,
            "question2": QUESTION,
            "question3": QUESTION,
            "text_input": TEXTS[i % 2],
            "image_id": i,
        }

    def collater(self, samples):
        out = {}
        for k in samples[0]:
            vals = [s[k] for s in samples]
            out[k] = (np.stack(vals) if isinstance(vals[0], np.ndarray)
                      else vals)
        return out


class _Cfg:
    """Minimal Config shim: RunnerBase reads .run_cfg and .to_dict()."""

    def __init__(self, run):
        self.run_cfg = ConfigDict(run)
        self.config = ConfigDict({"run": run})

    def to_dict(self):
        return dict(self.config)


def build_runner(out_subdir, resume=None):
    model = Myriad(arch=MyriadArch.tiny(), use_ve=False, use_lora=True,
                   policy=Policy.fp32(), max_txt_len=16, end_sym="###", seed=0)
    run = dict(
        seed=42, max_epoch=2, iters_per_epoch=2, batch_size_train=local_bs,
        num_workers=0, init_lr=1e-3, min_lr=0.0, warmup_steps=0,
        weight_decay=0.05, output_dir=os.path.join(workdir, out_subdir),
        max_checkpoints=-1, use_mesh=True, model_shards=1, prefetch=False,
        log_freq=50, shuffle_train=False,  # deterministic row sets for the
        # 1-proc vs 2-proc loss-trajectory comparison
    )
    if resume:
        run["resume_ckpt_path"] = resume
    cfg = _Cfg(run)
    task = tasks.setup_task(ConfigDict({"run_cfg": {"task": "image_text_pretrain"}}))
    datasets = {"synthetic": {"train": DeterministicDataset()}}
    runner_cls = registry.get_runner_class("runner_base")
    # SHARED output dir across processes: orbax checkpoint saves are
    # collective with one coordinated write (checkpoint.py save note)
    return runner_cls(cfg=cfg, task=task, model=model, datasets=datasets,
                      job_id="shared"), model


runner, model = build_runner("train")
runner.train()

with open(os.path.join(runner.output_dir, "log.txt")) as f:
    import json

    for line in f:
        rec = json.loads(line)
        if "train_loss" in rec:
            print(f"STATS {rec.get('train_loss')}", flush=True)

total = float(sum(np.abs(np.asarray(l)).sum()
                  for l in jax.tree_util.tree_leaves(model.trainable)))
print(f"TRAIN_SUM {total:.6f}", flush=True)
ckpts = [d for d in os.listdir(runner.output_dir)
         if d.startswith("checkpoint_")]
print(f"CKPTS {len(ckpts)}", flush=True)

# resume from the shared ring on EVERY process
resume_path = os.path.join(workdir, "train", "shared", "checkpoint_1")
runner2, model2 = build_runner("resume", resume=resume_path)
assert runner2.start_epoch == 2, runner2.start_epoch
for a, b in zip(jax.tree_util.tree_leaves(model2.trainable),
                jax.tree_util.tree_leaves(model.trainable)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
print(f"RESUME_OK {runner2.start_epoch}", flush=True)
