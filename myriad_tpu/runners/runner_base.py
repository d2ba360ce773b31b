"""Training-loop driver (reference minigpt4/runners/runner_base.py:42-686).

TPU-native translation of the runner's responsibilities:

* DDP wrap + AMP GradScaler -> one jitted train step per (stage, shapes):
  ``value_and_grad`` over the trainable subtree, optax update (grad-accum is
  optax.MultiSteps), bf16 compute with fp32 islands — no scaler needed.
* per-step LR writes -> the schedule lives inside optax; the host only
  reads the current value for logging.
* DistributedSampler + per-GPU loaders -> per-host sharded sampler feeding
  a device-prefetching loader; batch halved for the AnomalyDetection
  dataset exactly like the reference (:546-549, the aug-concat doubles it
  back).
* .pth ring checkpoints -> CheckpointManager (trainable-only params +
  optimizer state + epoch), best-ckpt reload, resume.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from myriad_tpu.common import dist
from myriad_tpu.common.optim import build_schedule, make_optimizer
from myriad_tpu.common.registry import registry
from myriad_tpu.checkpoint import CheckpointManager
from myriad_tpu.datasets.loaders import (
    DataLoader,
    DistributedSampler,
    IterLoader,
)


@registry.register_runner("runner_base")
class RunnerBase:
    def __init__(self, cfg, task, model, datasets: Dict, job_id: str = "run"):
        self.config = cfg
        self.run_cfg = cfg.run_cfg
        self.task = task
        self.model = model
        self.datasets = datasets
        self.job_id = job_id
        # base_seed is PROCESS-SYNCHRONIZED: under single-controller SPMD
        # every process must trace the same program over the global batch,
        # so anything that feeds jit-static choices (prompt stage/task
        # stage) or the shared sampler permutation derives from it.  The
        # rank offset (the reference's seed+rank, train.py:63-72) applies
        # only to per-rank host work (data-aug workers).
        self.base_seed = int(self.run_cfg.get("seed", 42))
        self.seed = self.base_seed + dist.get_rank()

        self.max_epoch = int(self.run_cfg.get("max_epoch", 1))
        self.iters_per_epoch = int(self.run_cfg.get("iters_per_epoch", 100))
        self.accum_grad_iters = int(self.run_cfg.get("accum_grad_iters", 1))
        self.log_freq = int(self.run_cfg.get("log_freq", 50))
        self.batch_size_train = int(self.run_cfg.get("batch_size_train", 4))
        self.num_workers = int(self.run_cfg.get("num_workers", 4))
        self.output_dir = os.path.join(
            str(self.run_cfg.get("output_dir", "./output")), job_id
        )
        if dist.is_main_process():
            os.makedirs(self.output_dir, exist_ok=True)

        self._schedule = None
        self._tx = None
        self._opt_state = None
        self._dataloaders: Optional[Dict] = None
        self._train_ratios: list = []
        self._step_cache: Dict = {}
        self.global_step = 0
        self.start_epoch = 0

        # GSPMD mesh: batch over 'data', tensor-parallel over 'model'
        # (the reference is DP-only; model sharding is the TPU addition the
        # 7B towers need on v5e, SURVEY.md §2.9)
        self.mesh = None
        n_model = int(self.run_cfg.get("model_shards", 1))
        use_mesh = bool(self.run_cfg.get("use_mesh", n_model > 1))
        if use_mesh:
            from myriad_tpu.parallel import mesh as mesh_lib

            self.mesh = mesh_lib.make_mesh(n_model=n_model)
            self._place_model()
        self.ckpt_manager = CheckpointManager(
            self.output_dir, int(self.run_cfg.get("max_checkpoints", -1))
        )

        resume = self.run_cfg.get("resume_ckpt_path")
        if resume:
            self._resume(resume)

    def _place_model(self) -> None:
        """Shard model params over the mesh with the partition rules."""
        from myriad_tpu.parallel import partition

        rules = partition.myriad_rules()
        self.model.trainable = jax.device_put(
            self.model.trainable,
            partition.tree_shardings(self.model.trainable, self.mesh, rules),
        )
        self.model.frozen = jax.device_put(
            self.model.frozen,
            partition.tree_shardings(self.model.frozen, self.mesh, rules),
        )

    def _shard_batch(self, arrays: Dict) -> Dict:
        if self.mesh is None:
            return arrays
        from myriad_tpu.parallel import mesh as mesh_lib

        out = {}
        for k, v in arrays.items():
            if hasattr(v, "ndim") and v.ndim >= 1 and k not in ("before", "after"):
                # batch-dim leaves: process-local rows assemble into the
                # global array on multi-host jobs (mesh.put_sharded)
                out[k] = mesh_lib.put_sharded(v, mesh_lib.data_sharding(self.mesh, v.ndim))
            else:
                out[k] = mesh_lib.put_sharded(v, mesh_lib.replicated(self.mesh))
        return out

    # -- optimizer --------------------------------------------------------
    @property
    def schedule(self):
        if self._schedule is None:
            self._schedule = build_schedule(
                self.run_cfg.get("lr_sched", "linear_warmup_cosine_lr"),
                init_lr=float(self.run_cfg.get("init_lr", 1e-4)),
                min_lr=float(self.run_cfg.get("min_lr", 0.0)),
                max_epoch=self.max_epoch,
                iters_per_epoch=self.iters_per_epoch,
                warmup_steps=int(self.run_cfg.get("warmup_steps", 0)),
                warmup_start_lr=float(self.run_cfg.get("warmup_lr", -1)),
                decay_rate=float(self.run_cfg.get("lr_decay_rate", 1.0)),
            )
        return self._schedule

    @property
    def tx(self):
        if self._tx is None:
            self._tx = make_optimizer(
                self.schedule,
                weight_decay=float(self.run_cfg.get("weight_decay", 0.05)),
                beta2=float(self.run_cfg.get("beta2", 0.999)),
                max_grad_norm=self.run_cfg.get("max_grad_norm"),
                accum_grad_iters=self.accum_grad_iters,
                mu_dtype=self.run_cfg.get("optimizer_mu_dtype"),
            )
        return self._tx

    @property
    def opt_state(self):
        if self._opt_state is None:
            self._opt_state = self.tx.init(self.model.trainable)
        return self._opt_state

    # -- dataloaders -----------------------------------------------------------
    @property
    def dataloaders(self) -> Dict:
        if self._dataloaders is None:
            loaders: Dict[str, Any] = {}
            self._train_ratios = []
            # shuffle_train=False gives a deterministic sequential order
            # (debug/repro runs; the multihost equivalence test relies on it)
            shuffle_train = bool(self.run_cfg.get("shuffle_train", True))
            for name, splits in self.datasets.items():
                for split, dataset in splits.items():
                    bs = self.batch_size_train
                    # aug-image concat doubles AD batches (runner_base.py:546-549)
                    if getattr(dataset, "DatasetName", "") == "AnomalyDetection":
                        bs = max(bs // 2, 1)
                    if split == "train":
                        self._train_ratios.append(
                            float(getattr(dataset, "sample_ratio", 1.0) or 1.0)
                        )
                    if not hasattr(dataset, "__len__"):
                        from myriad_tpu.datasets.loaders import IterableBatcher

                        loaders.setdefault(split, []).append(
                            IterableBatcher(dataset, bs)
                        )
                        continue
                    sampler = None
                    if dist.get_world_size() > 1:
                        # seed WITHOUT the rank offset: every rank must draw
                        # the SAME permutation and take its strided slice —
                        # rank-dependent seeds would shard overlapping rows
                        sampler = DistributedSampler(
                            dataset, dist.get_world_size(), dist.get_rank(),
                            shuffle=(split == "train" and shuffle_train),
                            seed=self.base_seed,
                        )
                    dl = DataLoader(
                        dataset, batch_size=bs,
                        shuffle=(split == "train" and shuffle_train),
                        drop_last=(split == "train"), num_workers=self.num_workers,
                        sampler=sampler, seed=self.seed,
                    )
                    if split == "train" and bool(self.run_cfg.get("prefetch", True)):
                        from myriad_tpu.datasets.loaders import PrefetchLoader

                        # identity device_put: pipeline host work (NSA, jpeg,
                        # collate) one batch ahead of the train step; device
                        # placement happens in prepare_train_arrays where
                        # shardings are known
                        dl = PrefetchLoader(dl, device_put=lambda x: x)
                    loaders.setdefault(split, []).append(
                        IterLoader(dl) if split == "train" else dl
                    )
            self._dataloaders = {
                split: (ls[0] if len(ls) == 1 else ls) for split, ls in loaders.items()
            }
        return self._dataloaders

    @property
    def train_loader(self):
        loader = self.dataloaders["train"]
        if isinstance(loader, list):
            from myriad_tpu.datasets.loaders import MultiIterLoader

            # sample_ratio mixing across datasets (stage-1: laion 115 / cc_sbu 14)
            return MultiIterLoader(loader, ratios=self._train_ratios, seed=self.seed)
        return loader

    # -- the jitted step ---------------------------------------------------
    def _get_step(self, static, arrays):
        shapes = tuple((k, v.shape) for k, v in sorted(arrays.items()))
        key = (static, shapes)
        if key not in self._step_cache:
            model = self.model
            tx = self.tx

            @jax.jit
            def step(trainable, opt_state, frozen, arrays):
                def loss_fn(tr):
                    return model.pure_loss(tr, frozen, arrays, static)

                loss, grads = jax.value_and_grad(loss_fn)(trainable)
                updates, new_opt = tx.update(grads, opt_state, trainable)
                new_trainable = optax.apply_updates(trainable, updates)
                return new_trainable, new_opt, loss

            self._step_cache[key] = step
        return self._step_cache[key]

    def train_iteration(self, samples, rng: np.random.Generator):
        arrays, static = self.model.prepare_train_arrays(samples, rng)
        arrays = self._shard_batch(arrays)
        step = self._get_step(static, arrays)
        new_trainable, new_opt, loss = step(
            self.model.trainable, self.opt_state, self.model.frozen, arrays
        )
        self.model.trainable = new_trainable
        self._opt_state = new_opt
        lr = float(self.schedule(self.global_step // max(self.accum_grad_iters, 1)))
        self.global_step += 1
        return loss, lr

    # legacy hook used by BaseTask.train_step
    def step_fn(self, batch, rng):
        return self.train_iteration(batch, rng)

    # -- checkpoint / resume --------------------------------------------------
    def _save_checkpoint(self, epoch, is_best: bool = False) -> None:
        # COLLECTIVE: every process calls save (orbax barriers inside; a
        # rank-0-only call deadlocks, tests/test_multihost_runner.py).  The
        # reference's rank-0 .pth write (runner_base.py:592-595) maps to
        # orbax's primary-host write on the shared output_dir.  Trainables
        # and optimizer state are replicated under myriad_rules(), so the
        # host copy below is valid on every process.
        state = {
            "model": jax.tree_util.tree_map(np.asarray, self.model.trainable),
            "optimizer": jax.tree_util.tree_map(np.asarray, self.opt_state),
            "epoch": np.asarray(epoch),
            "global_step": np.asarray(self.global_step),
        }
        tag = "best" if is_best else epoch
        path = self.ckpt_manager.save(tag, state)
        if dist.is_main_process():
            logging.info("Saved checkpoint at epoch %d to %s", epoch, path)

    def _resume(self, path: str) -> None:
        from myriad_tpu import checkpoint as ckpt_lib

        if os.path.isdir(path):
            import orbax.checkpoint as ocp

            state = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        else:
            state = {"model": ckpt_lib.load_params(path)}
        merged, n, _ = ckpt_lib.merge_trees(self.model.trainable, state["model"])
        self.model.trainable = jax.tree_util.tree_map(jnp.asarray, merged)
        if "optimizer" in state:
            target = jax.tree_util.tree_map(np.asarray, self.tx.init(self.model.trainable))
            try:
                self._opt_state = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(target),
                    [jnp.asarray(x) for x in jax.tree_util.tree_leaves(state["optimizer"])],
                )
            except Exception:
                logging.warning("optimizer state restore failed; reinitializing")
        if "epoch" in state:
            self.start_epoch = int(state["epoch"]) + 1
        if "global_step" in state:
            self.global_step = int(state["global_step"])
        logging.info("Resumed from %s (epoch %d, %d leaves)", path, self.start_epoch, n)

    def log_stats(self, stats: Dict, split_name: str = "train") -> None:
        if not dist.is_main_process():
            return
        with open(os.path.join(self.output_dir, "log.txt"), "a") as f:
            f.write(json.dumps({f"{split_name}_{k}": v for k, v in stats.items()}) + "\n")

    def log_config(self) -> None:
        if not dist.is_main_process():
            return
        with open(os.path.join(self.output_dir, "log.txt"), "a") as f:
            f.write(json.dumps(self.config.to_dict(), default=str) + "\n")

    # -- validation (runner_base.py:434-494) ------------------------------------
    @property
    def valid_splits(self):
        return list(self.run_cfg.get("valid_splits", []))

    def eval_epoch(self, split_name: str, epoch) -> Optional[Dict]:
        loader = self.dataloaders.get(split_name)
        if loader is None:
            logging.warning("no dataloader for split %s", split_name)
            return None
        results = self.task.evaluation(self.model, loader)
        if results is None:
            return None
        return self.task.after_evaluation(
            val_result=results, split_name=split_name, epoch=epoch
        )

    # -- main loop (runner_base.py:374-432) ------------------------------------
    def train(self) -> None:
        start = time.time()
        self.log_config()
        best_agg, best_epoch = -1.0, 0
        loader = self.train_loader
        evaluate_only = bool(self.run_cfg.get("evaluate", False))
        for epoch in range(self.start_epoch, self.max_epoch):
            if not evaluate_only:
                stats = self.task.train_epoch(
                    epoch, self, loader, self.iters_per_epoch, self.log_freq
                )
                self.log_stats(stats, "train")

            for split in self.valid_splits:
                logging.info("Evaluating on %s", split)
                metrics = self.eval_epoch(split, epoch)
                if metrics is not None:
                    # the best-ckpt decision must be taken on EVERY process
                    # (checkpoint saves are collective) — metrics are
                    # process-consistent because evaluation barriers and the
                    # logger's cross-host sync run before this point
                    agg = float(metrics.get("agg_metrics", -1.0))
                    if split == self.valid_splits[0] and agg > best_agg:
                        best_agg, best_epoch = agg, epoch
                        self._save_checkpoint(epoch, is_best=True)
                    self.log_stats(metrics, split)

            if not evaluate_only:
                self._save_checkpoint(epoch)
            dist.barrier(f"epoch_{epoch}")
            if evaluate_only:
                break
        total = time.time() - start
        logging.info("Training time %s", time.strftime("%H:%M:%S", time.gmtime(total)))
