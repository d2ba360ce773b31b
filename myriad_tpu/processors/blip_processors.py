"""BLIP-2 style processors (reference minigpt4/processors/blip_processors.py).

All image processors emit float32 HWC arrays (channels-last, TPU-native
layout) normalized with CLIP statistics; the reference emits CHW torch
tensors with identical values.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np

from myriad_tpu.common.registry import registry
from myriad_tpu.processors import functional as F
from myriad_tpu.processors.base_processor import BaseProcessor


class BlipImageBaseProcessor(BaseProcessor):
    """Holds the CLIP normalize/denormalize (blip_processors.py:21-29)."""

    def __init__(self, mean=None, std=None):
        self.mean = np.asarray(mean, np.float32) if mean is not None else F.CLIP_MEAN
        self.std = np.asarray(std, np.float32) if std is not None else F.CLIP_STD

    def normalize(self, arr: np.ndarray) -> np.ndarray:
        return F.normalize(arr, self.mean, self.std)

    def denormalize(self, arr: np.ndarray) -> np.ndarray:
        return F.denormalize(arr, self.mean, self.std)


@registry.register_processor("blip_caption")
class BlipCaptionProcessor(BaseProcessor):
    """Lowercase, strip punctuation, truncate (blip_processors.py:32-72)."""

    def __init__(self, prompt: str = "", max_words: int = 50):
        self.prompt = prompt
        self.max_words = max_words

    def __call__(self, caption: str) -> str:
        return self.prompt + self.pre_caption(caption)

    def pre_caption(self, caption: str) -> str:
        caption = re.sub(r"([.!\"()*#:;~])", " ", caption.lower())
        caption = re.sub(r"\s{2,}", " ", caption)
        caption = caption.rstrip("\n").strip(" ")
        words = caption.split(" ")
        if len(words) > self.max_words:
            caption = " ".join(words[: self.max_words])
        return caption

    @classmethod
    def from_config(cls, cfg=None):
        cfg = cls._cfg(cfg)
        return cls(prompt=cfg.get("prompt", ""), max_words=cfg.get("max_words", 50))


@registry.register_processor("blip2_image_train")
class Blip2ImageTrainProcessor(BlipImageBaseProcessor):
    """Resize(size,size,bicubic) -> [0,1] -> normalize (blip_processors.py:75-117)."""

    def __init__(self, image_size: int = 224, mean=None, std=None, **_unused):
        super().__init__(mean, std)
        self.image_size = image_size

    def __call__(self, item) -> np.ndarray:
        img = F.resize_bicubic(item, (self.image_size, self.image_size))
        return self.normalize(F.to_float_hwc(img))

    @classmethod
    def from_config(cls, cfg=None):
        cfg = cls._cfg(cfg)
        return cls(
            image_size=cfg.get("image_size", 224),
            mean=cfg.get("mean", None),
            std=cfg.get("std", None),
        )


@registry.register_processor("blip2_image_eval")
class Blip2ImageEvalProcessor(Blip2ImageTrainProcessor):
    """Identical pipeline at eval (blip_processors.py:194-222)."""


@registry.register_processor("loc_image_train")
class LocImageTrainProcessor(BlipImageBaseProcessor):
    """Dict-based processor for {'img', 'gt_seg_map'} samples.

    Mirrors blip_processors.py:120-191.  The live Myriad configs use
    ``identity=True`` (train) / identity at eval, i.e. only
    ToTensor+Normalize matters for parity; the geometric modes are provided
    with numpy equivalents of the mmdet transforms.
    """

    def __init__(
        self,
        image_size: int = 224,
        mean=None,
        std=None,
        strong_aug: bool = False,
        identity: bool = False,
        seed: Optional[int] = None,
        **_unused,
    ):
        super().__init__(mean, std)
        self.image_size = image_size
        self.strong_aug = strong_aug
        self.identity = identity
        self.rng = np.random.default_rng(seed)

    def _geometric(self, img: np.ndarray, seg: Optional[np.ndarray]):
        size = self.image_size
        if self.identity:
            return img, seg
        from PIL import Image

        stacked = img if seg is None else np.concatenate(
            [img, seg[..., None].astype(img.dtype)], -1
        )
        if self.strong_aug:
            # RandomCrop(relative 0.5x0.5) + Resize(size,size)
            h, w = stacked.shape[:2]
            ch, cw = max(1, int(h * 0.5)), max(1, int(w * 0.5))
            stacked = F.random_crop(stacked, (ch, cw), self.rng)
        else:
            # ResizeShortestEdge(size) + RandomCrop(size,size)
            pil = F.resize_shortest_edge(stacked[..., :3], size)
            img_r = np.asarray(pil)
            if seg is not None:
                seg_r = np.asarray(F.to_pil(stacked[..., 3]).resize(pil.size, Image.NEAREST))
                stacked = np.concatenate([img_r, seg_r[..., None]], -1)
            else:
                stacked = img_r
            stacked = F.random_crop(stacked, (size, size), self.rng)

        img_out = stacked[..., :3]
        seg_out = stacked[..., 3] if seg is not None else None
        if self.strong_aug:
            img_out = np.asarray(F.to_pil(img_out).resize((size, size), Image.BILINEAR))
            if seg_out is not None:
                seg_out = np.asarray(F.to_pil(seg_out).resize((size, size), Image.NEAREST))
        return img_out, seg_out

    def __call__(self, data_sample: dict) -> dict:
        ret = dict(data_sample)
        img = np.asarray(ret["img"])
        seg = ret.get("gt_seg_map")
        seg = None if seg is None else np.asarray(seg)
        img, seg = self._geometric(img, seg)
        ret["img"] = self.normalize(np.asarray(img, np.float32) / 255.0)
        if seg is not None:
            ret["gt_seg_map"] = seg
        return ret

    @classmethod
    def from_config(cls, cfg=None):
        cfg = cls._cfg(cfg)
        return cls(
            image_size=cfg.get("image_size", 224),
            mean=cfg.get("mean", None),
            std=cfg.get("std", None),
            strong_aug=cfg.get("strong_aug", False),
            identity=cfg.get("identity", False),
        )


@registry.register_processor("raw_image")
class RawImageProcessor(BlipImageBaseProcessor):
    """Geometric-only host processing (resize+crop, uint8 out); CLIP
    normalization runs on device inside the jitted encoder
    (myriad_tpu/ops/preprocess.py) — ships 4x fewer bytes to the chip."""

    def __init__(self, image_size: int = 224, crop_size: Optional[int] = None, **_unused):
        super().__init__()
        self.image_size = image_size
        self.crop_size = crop_size or image_size

    def __call__(self, item) -> np.ndarray:
        if isinstance(item, dict):  # Loc-style dict samples
            out = dict(item)
            img = F.to_pil(np.asarray(item["img"]))
            out["img"] = np.asarray(
                F.center_crop(F.resize_bicubic(img, self.image_size), self.crop_size),
                np.uint8,
            )
            return out
        img = F.resize_bicubic(item, (self.image_size, self.image_size))
        return np.asarray(img, np.uint8)

    @classmethod
    def from_config(cls, cfg=None):
        cfg = cls._cfg(cfg)
        return cls(image_size=cfg.get("image_size", 224),
                   crop_size=cfg.get("crop_size"))


def build_processor(cfg) -> BaseProcessor:
    """Instantiate a registered processor from its config node."""
    if cfg is None or cfg.get("name") is None:
        return BaseProcessor()
    return registry.get_processor_class(cfg["name"]).from_config(cfg)
