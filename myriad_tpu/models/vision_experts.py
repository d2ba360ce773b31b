"""Vision-expert multiplexer (reference minigpt4/models/vision_experts.py:12-68).

Wraps the interchangeable frozen AD experts by name:

* ``patchcore`` / ``adrefexpert`` — ImageBind+decoder zero/one-shot expert
  (the Myriad default, models/vision_expert.py)
* ``adgpt`` — zero-shot-only ancestor (reference adexpert.py:103-200)
* ``simplenet`` / ``simplenetV`` — per-class discriminator expert
  (models/simplenet.py)
* ``aprilgan`` — the reference imports a module that does not exist
  (SURVEY.md §2.8); what survives is consuming its precomputed masks from
  ``ve_root``, provided here as ``PrecomputedMaskExpert``.

Each expert gets its input re-normalized from the pipeline's CLIP stats to
its own preprocessing (vision_experts.py per-expert transforms).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from myriad_tpu.processors import functional as F


def renormalize(
    images: jnp.ndarray,
    from_mean=F.CLIP_MEAN, from_std=F.CLIP_STD,
    to_mean=F.CLIP_MEAN, to_std=F.CLIP_STD,
) -> jnp.ndarray:
    """Convert normalized images between normalization conventions."""
    raw = images * jnp.asarray(from_std) + jnp.asarray(from_mean)
    return (raw - jnp.asarray(to_mean)) / jnp.asarray(to_std)


class ZeroShotExpert:
    """'adgpt': zero-shot maps only (adexpert.py:103-200)."""

    def __init__(self, inner):
        self.inner = inner  # a VisionExpert

    def __call__(self, images, cls_names, querypath=None, testphase=False):
        return self.inner(images, cls_names, one_shot=False)


class PrecomputedMaskExpert:
    """Serve anomaly maps from precomputed mask files under ``ve_root``
    (the reference's aprilgan_processresults consumption,
    configs/datasets/anomaly_detection/base.yaml:11)."""

    def __init__(self, ve_root: str, map_size: int = 224):
        self.ve_root = ve_root
        self.map_size = map_size

    def __call__(self, img_paths: Sequence[str], cls_names=None):
        import cv2

        maps = []
        for p in img_paths:
            rel = os.path.splitext(p)[0] + ".png"
            full = os.path.join(self.ve_root, rel)
            if os.path.isfile(full):
                m = cv2.imread(full, cv2.IMREAD_GRAYSCALE)
                m = cv2.resize(m, (self.map_size, self.map_size)).astype(np.float32) / 255.0
            else:
                m = np.zeros((self.map_size, self.map_size), np.float32)
            maps.append(m[..., None])
        maps = np.stack(maps)
        masks = maps[:, :: self.map_size // 16, :: self.map_size // 16]
        return jnp.asarray(maps), jnp.asarray(masks)


class SimpleNetExpertAdapter:
    """Adapts SimpleNetInterface to the (maps, masks) expert contract,
    re-normalizing CLIP-stat inputs to ImageNet stats (simplenet_intf
    transforms, 288px center-crop handled by resize here)."""

    def __init__(self, interface, map_size: int = 224):
        from myriad_tpu.models.simplenet import IMAGENET_MEAN, IMAGENET_STD

        self.interface = interface
        self.map_size = map_size
        self._to_mean, self._to_std = IMAGENET_MEAN, IMAGENET_STD

    def __call__(self, images, cls_names, querypath=None, testphase=False):
        import jax

        x = renormalize(images, to_mean=self._to_mean, to_std=self._to_std)
        scores, maps = self.interface(x, list(cls_names))
        maps = jnp.asarray(maps)
        masks = maps[:, :: max(self.map_size // 16, 1), :: max(self.map_size // 16, 1)]
        return maps, masks


def build_vision_expert(name: str, **kwargs):
    name = name.lower()
    if name in ("patchcore", "adrefexpert"):
        return kwargs["adrefexpert"]
    if name == "adgpt":
        return ZeroShotExpert(kwargs["adrefexpert"])
    if name in ("simplenet", "simplenetv"):
        return SimpleNetExpertAdapter(kwargs["simplenet_interface"])
    if name == "aprilgan":
        return PrecomputedMaskExpert(kwargs["ve_root"])
    raise KeyError(f"unknown vision expert '{name}'")
