"""Base task (reference minigpt4/tasks/base_task.py:20-343).

Builds model/datasets from the registry and drives the iteration-budgeted
inner training loop.  The torch autocast/scaler/backward trio collapses
into a single jitted ``train_step`` (value_and_grad + optax update) owned
by the runner; gradient accumulation is optax.MultiSteps inside the
optimizer, so the loop body is one device call per iteration.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Optional

import numpy as np

from myriad_tpu.common import dist
from myriad_tpu.common.logger import MetricLogger, SmoothedValue
from myriad_tpu.common.registry import registry


class BaseTask:
    def __init__(self, **kwargs):
        self.inst_id_key = "instance_id"

    @classmethod
    def setup_task(cls, **kwargs):
        return cls()

    def build_model(self, cfg):
        model_cfg = cfg.model_cfg
        model_cls = registry.get_model_class(model_cfg.arch)
        return model_cls.from_config(model_cfg)

    def build_datasets(self, cfg) -> Dict:
        """name -> split -> dataset (base_task.py:36-66)."""
        datasets = {}
        for name, ds_cfg in cfg.datasets_cfg.items():
            builder = registry.get_builder_class(name)(ds_cfg)
            datasets[name] = builder.build_datasets()
        assert datasets, "at least one dataset is required"
        return datasets

    def train_step(self, runner, batch, stage_rng):
        """One optimizer step; returns loss (host float)."""
        return runner.step_fn(batch, stage_rng)

    def train_epoch(
        self,
        epoch: int,
        runner,
        data_loader,
        iters_per_epoch: int,
        log_freq: int = 50,
    ) -> Dict[str, str]:
        """Iteration-budgeted inner loop (base_task.py:156-303)."""
        from myriad_tpu.common.profiling import StepTimer, device_memory_stats

        metric_logger = MetricLogger(delimiter="  ")
        metric_logger.add_meter("lr", SmoothedValue(window_size=1, fmt="{value:.6f}"))
        metric_logger.add_meter("loss", SmoothedValue(window_size=1, fmt="{value:.4f}"))
        header = f"Train: data epoch: [{epoch}]"
        logging.info("Start training epoch %d, %d iters per inner epoch.",
                     epoch, iters_per_epoch)
        # process-synchronized rng: the prompt-stage/task-stage draws feed
        # jit-STATIC switches (myriad.py:378-381); under multi-process SPMD
        # every rank must trace the same program over the global batch, so
        # the stream must not carry the rank offset (runner.base_seed)
        rng = np.random.default_rng(
            getattr(runner, "base_seed", runner.seed) + epoch
        )
        timer = StepTimer()
        for i in metric_logger.log_every(range(iters_per_epoch), log_freq, header):
            with timer.phase("data"):
                samples = next(data_loader)
            with timer.phase("step"):
                loss, lr = runner.train_iteration(samples, rng)
            metric_logger.update(loss=float(loss), lr=float(lr))
        metric_logger.synchronize_between_processes()
        timer.log(f"epoch {epoch} phase timings")
        mem = device_memory_stats()
        if mem:
            logging.info("device memory: %.0f MiB peak",
                         mem.get("peak_bytes_in_use_mib", 0))
        logging.info("Averaged stats: %s", metric_logger.global_avg())
        return {
            k: f"{meter.global_avg:.3f}" for k, meter in metric_logger.meters.items()
        }

    def evaluation(self, model, data_loader, cuda_enabled: bool = True):
        """Generic eval loop (base_task.py:84-101)."""
        metric_logger = MetricLogger(delimiter="  ")
        results = []
        for samples in metric_logger.log_every(data_loader, 10, "Evaluation"):
            results.extend(self.valid_step(model=model, samples=samples))
        dist.barrier("eval")
        return results

    def valid_step(self, model, samples):
        raise NotImplementedError

    def after_evaluation(self, val_result, split_name, epoch, **kwargs):
        return None

    @staticmethod
    def save_result(result, result_dir, filename, remove_duplicate="") -> str:
        """Per-rank json + rank-0 merge (base_task.py:305-343)."""
        os.makedirs(result_dir, exist_ok=True)
        rank_file = os.path.join(result_dir, f"{filename}_rank{dist.get_rank()}.json")
        with open(rank_file, "w") as f:
            json.dump(result, f)
        dist.barrier("save_result")
        final_file = os.path.join(result_dir, f"{filename}.json")
        if dist.is_main_process():
            merged = []
            for rank in range(dist.get_world_size()):
                with open(os.path.join(result_dir, f"{filename}_rank{rank}.json")) as f:
                    merged += json.load(f)
            if remove_duplicate:
                seen, unique = set(), []
                for item in merged:
                    key = item[remove_duplicate]
                    if key not in seen:
                        seen.add(key)
                        unique.append(item)
                merged = unique
            with open(final_file, "w") as f:
                json.dump(merged, f)
            logging.info("result file saved to %s", final_file)
        dist.barrier("save_result_merge")
        return final_file
