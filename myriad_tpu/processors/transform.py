"""Box/square transforms and text box formatting
(reference minigpt4/processors/transform.py:10-160)."""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple, Union

from PIL import Image

Box = List[Union[float, int]]
Boxes = List[Box]


def de_norm_box_xyxy(box, *, w, h):
    x1, y1, x2, y2 = box
    return x1 * w, y1 * h, x2 * w, y2 * h


def box_xywh_to_xyxy(box, *, w=None, h=None):
    x, y, bw, bh = box
    x2 = x + bw if w is None else min(x + bw, w)
    y2 = y + bh if h is None else min(y + bh, h)
    return x, y, x2, y2


def norm_box_xyxy(box, *, w, h):
    x1, y1, x2, y2 = box
    clamp = lambda v: max(0.0, min(v, 1.0))
    return (
        round(clamp(x1 / w), 3),
        round(clamp(y1 / h), 3),
        round(clamp(x2 / w), 3),
        round(clamp(y2 / h), 3),
    )


def norm_point_xyxy(point, *, w, h):
    x, y = point
    return max(0.0, min(x / w, 1.0)), max(0.0, min(y / h, 1.0))


def expand2square(pil_img: Image.Image, background_color=(255, 255, 255)) -> Image.Image:
    width, height = pil_img.size
    if width == height:
        return pil_img
    side = max(width, height)
    result = Image.new(pil_img.mode, (side, side), background_color)
    if width > height:
        result.paste(pil_img, (0, (width - height) // 2))
    else:
        result.paste(pil_img, ((height - width) // 2, 0))
    return result


def box_xyxy_expand2square(box, *, w, h):
    if w == h:
        return box
    x1, y1, x2, y2 = box
    if w > h:
        off = (w - h) // 2
        return x1, y1 + off, x2, y2 + off
    off = (h - w) // 2
    return x1 + off, y1, x2 + off, y2


def point_xy_expand2square(point, *, w, h):
    box = box_xyxy_expand2square((point[0], point[1], point[0], point[1]), w=w, h=h)
    return box[0], box[1]


class Expand2square:
    """Pad to square + remap boxes/points (transform.py:94-110)."""

    def __init__(self, background_color=(255, 255, 255)):
        self.background_color = background_color

    def __call__(
        self, image: Image.Image, labels: Optional[Dict[str, Any]] = None
    ) -> Tuple[Image.Image, Optional[Dict[str, Any]]]:
        width, height = image.size
        processed = expand2square(image, self.background_color)
        if labels is None:
            return processed, labels
        if "boxes" in labels:
            labels["boxes"] = [
                box_xyxy_expand2square(b, w=width, h=height) for b in labels["boxes"]
            ]
        if "points" in labels:
            labels["points"] = [
                point_xy_expand2square(p, w=width, h=height) for p in labels["points"]
            ]
        return processed, labels


class PlainBoxFormatter:
    """'[x,y,x,y;x,y,x,y]'-style normalized box extract/format
    (transform.py:113-160)."""

    precision = 3

    def __init__(self, use_small_brackets: bool = False):
        small = re.compile(
            r"\(\d(?:\.\d*)?(?:,[ ]?\d(?:\.\d*)?){3}(?:;\d(?:\.\d*)?(?:,[ ]?\d(?:\.\d*)?){3})*\)"
        )
        middle = re.compile(
            r"\[\d(?:\.\d*)?(?:,[ ]?\d(?:\.\d*)?){3}(?:;\d(?:\.\d*)?(?:,[ ]?\d(?:\.\d*)?){3})*\]"
        )
        self.pat = small if use_small_brackets else middle

    def format_box(self, boxes: Boxes) -> str:
        box_strs = [
            ",".join(f"{elem:.{self.precision}f}" for elem in box) for box in boxes
        ]
        return "[" + ";".join(box_strs) + "]"

    def extract(self, string: str) -> Tuple[str, List[Boxes]]:
        """Returns (string with <boxes> placeholders, [boxes per match])."""
        ret: List[Boxes] = []
        for bboxes_str in self.pat.findall(string):
            bboxes: Boxes = []
            for bbox_str in bboxes_str[1:-1].split(";"):
                bboxes.append([float(e) for e in bbox_str.split(",")])
            ret.append(bboxes)
        cleaned = self.pat.sub("<boxes>", string)
        return cleaned, ret
