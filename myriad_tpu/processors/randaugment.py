"""RandomAugment op bank (reference minigpt4/processors/randaugment.py —
the classic BLIP augmentations; registered but unused by the live Myriad
configs).  PIL/numpy implementation of the same op set."""

from __future__ import annotations

import random
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image, ImageEnhance, ImageOps


def _to_pil(img) -> Image.Image:
    if isinstance(img, Image.Image):
        return img
    return Image.fromarray(np.asarray(img, np.uint8))


def identity(img, _level):
    return img


def autocontrast(img, _level):
    return ImageOps.autocontrast(_to_pil(img))


def equalize(img, _level):
    return ImageOps.equalize(_to_pil(img))


def invert(img, _level):
    return ImageOps.invert(_to_pil(img))


def rotate(img, level):
    degrees = (level / 10) * 30
    if random.random() < 0.5:
        degrees = -degrees
    return _to_pil(img).rotate(degrees, resample=Image.BILINEAR)


def solarize(img, level):
    threshold = int(256 - (level / 10) * 256)
    return ImageOps.solarize(_to_pil(img), threshold)


def posterize(img, level):
    bits = max(1, int(8 - (level / 10) * 4))
    return ImageOps.posterize(_to_pil(img), bits)


def _enhance(factory):
    def op(img, level):
        v = 0.1 + (level / 10) * 1.8
        return factory(_to_pil(img)).enhance(v)

    return op


color = _enhance(ImageEnhance.Color)
contrast = _enhance(ImageEnhance.Contrast)
brightness = _enhance(ImageEnhance.Brightness)
sharpness = _enhance(ImageEnhance.Sharpness)


def _affine(img, matrix):
    pil = _to_pil(img)
    return pil.transform(pil.size, Image.AFFINE, matrix, resample=Image.BILINEAR)


def shear_x(img, level):
    v = (level / 10) * 0.3
    if random.random() < 0.5:
        v = -v
    return _affine(img, (1, v, 0, 0, 1, 0))


def shear_y(img, level):
    v = (level / 10) * 0.3
    if random.random() < 0.5:
        v = -v
    return _affine(img, (1, 0, 0, v, 1, 0))


def translate_x(img, level):
    pil = _to_pil(img)
    v = (level / 10) * 0.45 * pil.size[0]
    if random.random() < 0.5:
        v = -v
    return _affine(pil, (1, 0, v, 0, 1, 0))


def translate_y(img, level):
    pil = _to_pil(img)
    v = (level / 10) * 0.45 * pil.size[1]
    if random.random() < 0.5:
        v = -v
    return _affine(pil, (1, 0, 0, 0, 1, v))


def cutout(img, level):
    arr = np.array(_to_pil(img))
    h, w = arr.shape[:2]
    size = int((level / 10) * 0.4 * min(h, w))
    if size < 1:
        return Image.fromarray(arr)
    y = random.randint(0, h - 1)
    x = random.randint(0, w - 1)
    y1, y2 = max(0, y - size // 2), min(h, y + size // 2)
    x1, x2 = max(0, x - size // 2), min(w, x + size // 2)
    arr[y1:y2, x1:x2] = 128
    return Image.fromarray(arr)


OP_BANK = {
    "Identity": identity,
    "AutoContrast": autocontrast,
    "Equalize": equalize,
    "Rotate": rotate,
    "Solarize": solarize,
    "Color": color,
    "Posterize": posterize,
    "Contrast": contrast,
    "Brightness": brightness,
    "Sharpness": sharpness,
    "ShearX": shear_x,
    "ShearY": shear_y,
    "TranslateX": translate_x,
    "TranslateY": translate_y,
    "Cutout": cutout,
}


class RandomAugment:
    """Apply N random ops at magnitude M (reference randaugment.py API)."""

    def __init__(self, N: int = 2, M: int = 9, isPIL: bool = False,
                 augs: Optional[Sequence[str]] = None):
        self.N = N
        self.M = M
        self.isPIL = isPIL
        self.augs = list(augs) if augs else list(OP_BANK)

    def get_random_ops(self) -> List[str]:
        return random.sample(self.augs, min(self.N, len(self.augs)))

    def __call__(self, img):
        out = _to_pil(img)
        for name in self.get_random_ops():
            out = _to_pil(OP_BANK[name](out, self.M))
        return out if self.isPIL else np.asarray(out)
