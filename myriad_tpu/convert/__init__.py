"""PyTorch -> JAX weight conversion.

The reference bootstraps five pretrained towers from torch checkpoints
(SURVEY.md §5.4): EVA-ViT (LAVIS), Q-Former (BLIP-2), llama_proj
(pretrained_minigpt4_7b.pth), ImageBind + AnomalyGPT decoder, and Vicuna-7B
(HF).  These converters map each torch ``state_dict`` onto the matching
flax parameter pytree (dense kernels transposed, conv OIHW -> HWIO).
"""

from myriad_tpu.convert.llama import convert_llama_state_dict
from myriad_tpu.convert.eva import convert_eva_vit_state_dict
from myriad_tpu.convert.qformer import convert_qformer_state_dict
from myriad_tpu.convert.imagebind import (
    convert_anomaly_decoder_state_dict,
    convert_imagebind_state_dict,
)
from myriad_tpu.convert.simplenet import (
    convert_simplenet_head_state_dict,
    convert_wide_resnet50_state_dict,
)
from myriad_tpu.convert.networks import convert_myriad_trainables_state_dict

__all__ = [
    "convert_llama_state_dict",
    "convert_eva_vit_state_dict",
    "convert_qformer_state_dict",
    "convert_imagebind_state_dict",
    "convert_anomaly_decoder_state_dict",
    "convert_simplenet_head_state_dict",
    "convert_wide_resnet50_state_dict",
    "convert_myriad_trainables_state_dict",
]
