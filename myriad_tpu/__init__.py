"""myriad_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the Myriad IAD stack.

Myriad ("Large Multimodal Model Applying Vision Experts for Industrial
Anomaly Detection", arXiv 2310.19070) is an industrial anomaly-detection
vision-language model.  This package re-implements the full capability
surface of the reference PyTorch repository as an idiomatic JAX framework:

* compute path: flax modules + XLA + Pallas kernels (MXU-friendly, bf16)
* scale-out: ``jax.sharding.Mesh`` + GSPMD shardings over ICI/DCN
* host path: numpy/cv2 data pipeline (NSA synthetic anomalies stay on CPU)

Layer map mirrors the reference (see SURVEY.md §1):
registry/config core -> processors -> datasets -> models -> tasks ->
runner -> entry points (train.py / evaluation_aqa_dataset.py).
"""

import os

from myriad_tpu.common.registry import registry

__version__ = "0.1.0"

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

registry.register_path("library_root", os.path.join(_root, "myriad_tpu"))
registry.register_path("repo_root", _root)
registry.register_path(
    "cache_root", os.environ.get("MYRIAD_CACHE_ROOT", os.path.expanduser("~/.cache/myriad_tpu"))
)
