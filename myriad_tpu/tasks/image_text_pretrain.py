"""Image-text pretrain task (reference tasks/image_text_pretrain.py:12-19)."""

from myriad_tpu.common.registry import registry
from myriad_tpu.tasks.base_task import BaseTask


@registry.register_task("image_text_pretrain")
class ImageTextPretrainTask(BaseTask):
    def evaluation(self, model, data_loader, cuda_enabled=True):
        pass
