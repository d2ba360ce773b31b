"""Tasks (reference minigpt4/tasks/)."""

from myriad_tpu.common.registry import registry
from myriad_tpu.tasks.base_task import BaseTask
from myriad_tpu.tasks.image_text_pretrain import ImageTextPretrainTask


def setup_task(cfg):
    """reference tasks/__init__.py:14-20."""
    task_name = cfg.run_cfg.task
    task = registry.get_task_class(task_name).setup_task(cfg=cfg)
    return task


__all__ = ["BaseTask", "ImageTextPretrainTask", "setup_task"]
