"""Host-side image transform primitives (numpy/PIL).

Replaces the torchvision/mmdet transform stack the reference processors use
(reference minigpt4/processors/blip_processors.py, processors/transform.py).
Framework-wide image layout is **HWC float32 in [0,1] -> normalized**, i.e.
channels-last, the natural TPU/XLA layout (the reference emits CHW torch
tensors).

CLIP normalization constants match BlipImageBaseProcessor
(blip_processors.py:21-29).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np
from PIL import Image

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)

# ImageBind uses its own (OpenAI-CLIP) constants too — same values.
IMAGEBIND_MEAN = CLIP_MEAN
IMAGEBIND_STD = CLIP_STD


def to_pil(img) -> Image.Image:
    if isinstance(img, Image.Image):
        return img
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    return Image.fromarray(arr)


def resize_bicubic(img, size: Union[int, Tuple[int, int]]) -> Image.Image:
    """torchvision ``Resize(size, BICUBIC)`` semantics.

    int size: scale the *short* edge to ``size`` keeping aspect ratio;
    (h, w): exact resize.
    """
    pil = to_pil(img)
    if isinstance(size, int):
        w, h = pil.size
        short, long = (w, h) if w <= h else (h, w)
        if short == size:
            return pil
        new_short = size
        new_long = int(round(size * long / short))
        nw, nh = (new_short, new_long) if w <= h else (new_long, new_short)
        return pil.resize((nw, nh), Image.BICUBIC)
    h, w = size
    return pil.resize((w, h), Image.BICUBIC)


def center_crop(img, size: Union[int, Tuple[int, int]]) -> Image.Image:
    """torchvision ``CenterCrop`` semantics (pads if smaller)."""
    pil = to_pil(img)
    if isinstance(size, int):
        th, tw = size, size
    else:
        th, tw = size
    w, h = pil.size
    if w < tw or h < th:
        padded = Image.new(pil.mode, (max(w, tw), max(h, th)))
        padded.paste(pil, ((max(w, tw) - w) // 2, (max(h, th) - h) // 2))
        pil = padded
        w, h = pil.size
    left = int(round((w - tw) / 2.0))
    top = int(round((h - th) / 2.0))
    return pil.crop((left, top, left + tw, top + th))


def to_float_hwc(img) -> np.ndarray:
    """uint8 HWC (or PIL) -> float32 HWC in [0,1] (torchvision ToTensor
    without the CHW permute)."""
    arr = np.asarray(to_pil(img).convert("RGB"), dtype=np.float32) / 255.0
    return arr


def normalize(
    arr: np.ndarray,
    mean: np.ndarray = CLIP_MEAN,
    std: np.ndarray = CLIP_STD,
) -> np.ndarray:
    return (arr - mean) / std


def denormalize(
    arr: np.ndarray,
    mean: np.ndarray = CLIP_MEAN,
    std: np.ndarray = CLIP_STD,
) -> np.ndarray:
    return arr * std + mean


def resize_shortest_edge(img, size: int, max_size: Optional[int] = None) -> Image.Image:
    """mmdet ``ResizeShortestEdge`` minimal equivalent (SURVEY.md §7.3 risk 6)."""
    pil = to_pil(img)
    w, h = pil.size
    scale = size / min(w, h)
    if max_size is not None:
        scale = min(scale, max_size / max(w, h))
    return pil.resize((int(round(w * scale)), int(round(h * scale))), Image.BILINEAR)


def random_crop(
    img: np.ndarray,
    crop: Tuple[int, int],
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Random (th, tw) crop of an HWC array."""
    rng = rng or np.random.default_rng()
    th, tw = crop
    h, w = img.shape[:2]
    if h < th or w < tw:
        pad_h, pad_w = max(0, th - h), max(0, tw - w)
        img = np.pad(img, ((0, pad_h), (0, pad_w)) + ((0, 0),) * (img.ndim - 2))
        h, w = img.shape[:2]
    top = int(rng.integers(0, h - th + 1))
    left = int(rng.integers(0, w - tw + 1))
    return img[top : top + th, left : left + tw]


def expand2square(img, background: Tuple[int, int, int] = (0, 0, 0)) -> Image.Image:
    """Pad to square (reference processors/transform.py Expand2square)."""
    pil = to_pil(img)
    w, h = pil.size
    if w == h:
        return pil
    side = max(w, h)
    out = Image.new("RGB", (side, side), background)
    out.paste(pil, ((side - w) // 2, (side - h) // 2))
    return out
