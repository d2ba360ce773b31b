"""Anomaly-detection datasets (reference
minigpt4/datasets/datasets/anomaly_detection.py:104-362 and twocls_ad.py).

Normal-only training images are corrupted on the fly with NSA synthesis
(``myriad_tpu.datasets.nsa.patch_ex``); the sample carries both the clean
and the augmented image with "No/Yes, there exists ..." targets.  All image
outputs are HWC float32 normalized arrays (channels-last).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np
from PIL import Image

from myriad_tpu.datasets.base_dataset import BaseDataset
from myriad_tpu.datasets.nsa import patch_ex
from myriad_tpu.processors import functional as F

# question prompts (anomaly_detection.py:35-39); note the reference feeds
# variant [1] for all three question slots (:345-347)
QUESTION_PROMPTS = [
    "This image may be simulated by photo editing. According on IAD expert opinions, find out if there are defects in this image.",
    "This image may be simulated by photo editing. According to IAD expert opinions and corresponding visual descriptions, find out if there are defects in this image.",
    "This image may be simulated by photo editing. According to IAD expert visual descriptions, find out if there are defects in this image.",
]

NORMAL_DESCRIBE = "No, there exists no anomalies in the image."
ABNORMAL_DESCRIBE = "Yes, there exists anomalies in the image."
ABNORMAL_DESCRIBE_V1 = (
    "Yes, there exists anomalies in the image. These anomalies are simulated by photo editing."
)

# per-class NSA parameter tables (anomaly_detection.py:48-61)
MVTEC_WIDTH_BOUNDS_PCT = {
    "bottle": ((0.03, 0.4), (0.03, 0.4)), "cable": ((0.05, 0.4), (0.05, 0.4)),
    "capsule": ((0.03, 0.15), (0.03, 0.4)), "hazelnut": ((0.03, 0.35), (0.03, 0.35)),
    "metal_nut": ((0.03, 0.4), (0.03, 0.4)), "pill": ((0.03, 0.2), (0.03, 0.4)),
    "screw": ((0.03, 0.12), (0.03, 0.12)), "toothbrush": ((0.03, 0.4), (0.03, 0.2)),
    "transistor": ((0.03, 0.4), (0.03, 0.4)), "zipper": ((0.03, 0.4), (0.03, 0.2)),
    "carpet": ((0.03, 0.4), (0.03, 0.4)), "grid": ((0.03, 0.4), (0.03, 0.4)),
    "leather": ((0.03, 0.4), (0.03, 0.4)), "tile": ((0.03, 0.4), (0.03, 0.4)),
    "wood": ((0.03, 0.4), (0.03, 0.4)),
}
MVTEC_INTENSITY_LOGISTIC_PARAMS = {
    "bottle": (1 / 12, 24), "cable": (1 / 12, 24), "capsule": (1 / 2, 4),
    "hazelnut": (1 / 12, 24), "metal_nut": (1 / 3, 7), "pill": (1 / 3, 7),
    "screw": (1, 3), "toothbrush": (1 / 6, 15), "transistor": (1 / 6, 15),
    "zipper": (1 / 6, 15), "carpet": (1 / 3, 7), "grid": (1 / 3, 7),
    "leather": (1 / 3, 7), "tile": (1 / 3, 7), "wood": (1 / 6, 15),
}
MVTEC_BACKGROUND = {
    "bottle": (200, 60), "screw": (200, 60), "capsule": (200, 60),
    "zipper": (200, 60), "hazelnut": (20, 20), "pill": (20, 20),
    "toothbrush": (20, 20), "metal_nut": (20, 20),
}


def position_phrases(boxes: Sequence[Sequence[float]], img_size: int = 224) -> List[str]:
    """3x3-grid phrases from box corner coords (anomaly_detection.py:270-295
    — reads boxes[i][0]/[1], keeping the reference's axis convention)."""
    out = []
    for box in boxes:
        cx, cy = box[0] / img_size, box[1] / img_size
        if cx <= 1 / 3:
            out.append("upper left" if cy <= 1 / 3 else ("top" if cy <= 2 / 3 else "upper right"))
        elif cx <= 2 / 3:
            out.append("left" if cy <= 1 / 3 else ("center" if cy <= 2 / 3 else "right"))
        else:
            out.append("lower left" if cy <= 1 / 3 else ("bottom" if cy <= 2 / 3 else "lower right"))
    return out


def describe_from_positions(positions: List[str]) -> str:
    """Multi-anomaly description (anomaly_detection.py:298-316 semantics)."""
    if len(positions) == 1:
        return (
            "Yes, there exists anomalies in the image, at the "
            + positions[0] + " of the image."
        )
    desc = "Yes, there exists anomalies in the image, they are at the "
    desc += positions[0]
    for i in range(1, len(positions)):
        if positions[i] != positions[i - 1]:
            if i != len(positions) - 1:
                desc += ", " + positions[i]
            else:
                desc += " and " + positions[i] + " of the image."
        elif i == len(positions) - 1:
            desc += " of the image."
    return desc


class AnomalyDetectionDataset(BaseDataset):
    """The Myriad training/eval set (anomaly_detection.py:104-362)."""

    DatasetName = "AnomalyDetection"

    def __init__(
        self,
        vis_processor,
        text_processor,
        vis_root: str,
        ve_root: str = "",
        ann_paths: Sequence[str] = (),
        img_size: int = 224,
        crop_size: int = 224,
        version: int = 0,
        with_mask: bool = False,
        with_ref: bool = False,
        with_pos: bool = False,
        is_preload: bool = False,
        stage: str = "train",
        nsa_max_width: float = 0.4,
        seed: Optional[int] = None,
    ):
        self.version = version
        self.with_mask = with_mask
        self.with_ref = with_ref
        self.with_pos = with_pos
        self.ve_root = ve_root
        self.stage = stage
        self.img_size = img_size
        self.crop_size = crop_size
        self.rng = np.random.default_rng(seed)
        is_visa = bool(ann_paths) and "VISA" in os.path.basename(ann_paths[0]).upper()
        self.is_visa = is_visa
        # (anomaly_detection.py:117-142)
        if is_visa:
            self.self_sup_args: Dict = {
                "width_bounds_pct": ((0.03, nsa_max_width), (0.03, nsa_max_width)),
                "intensity_logistic_params": (1 / 12, 24),
                "num_patches": 2,
                "min_object_pct": 0,
                "min_overlap_pct": 0.25,
                "gamma_params": (2, 0.05, 0.03),
                "resize": True,
                "shift": True,
                "same": False,
                "mode": cv2.NORMAL_CLONE,
                "label_mode": "logistic-intensity",
                "skip_background": None,
                "resize_bounds": (0.5, 2),
            }
        else:
            self.self_sup_args = {
                "num_patches": 2,
                "min_object_pct": 0,
                "min_overlap_pct": 0.25,
                "gamma_params": (2, 0.05, 0.03),
                "resize": True,
                "shift": True,
                "same": False,
                "mode": cv2.NORMAL_CLONE,
                "label_mode": "logistic-intensity",
            }
        super().__init__(vis_processor, text_processor, vis_root, ann_paths, is_preload)

    # -- image access ---------------------------------------------------------
    def prepare_img(self, index: int) -> Image.Image:
        rel = self.annotation[index]["img_path"]
        if self.is_preload and rel in self._cache:
            return self._cache[rel].copy()
        return Image.open(os.path.join(self.vis_root, rel)).convert("RGB")

    def prepare_ve(self, index: int) -> Optional[np.ndarray]:
        """Precomputed vision-expert mask from ve_root (anomaly_detection.py
        :194-200 — the aprilgan_processresults consumption path)."""
        ann = self.annotation[index]
        ve_rel = ann.get("ve_path") or os.path.splitext(ann["img_path"])[0] + ".png"
        path = os.path.join(self.ve_root, ve_rel)
        if not os.path.isfile(path):
            return None
        m = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        m = cv2.resize(m, (self.crop_size, self.crop_size))
        return m.astype(np.float32) / 255.0

    def _resize_crop(self, img: Image.Image) -> Image.Image:
        return F.center_crop(F.resize_bicubic(img, self.img_size), self.crop_size)

    def get_class_name(self, index: int):
        ds = "visa" if self.is_visa else "mvtec"
        return ds, self.annotation[index]["img_path"].split("/")[1]

    def __len__(self) -> int:
        return len(self.annotation)

    def __getitem__(self, index: int) -> Dict:
        ann = self.annotation[index]
        image = self._resize_crop(self.prepare_img(index))

        aug_sample = None
        describe = ABNORMAL_DESCRIBE
        if self.stage == "train":
            src_index = int(self.rng.integers(len(self)))
            while src_index == index and len(self) > 1:
                src_index = int(self.rng.integers(len(self)))
            src_image = self._resize_crop(self.prepare_img(src_index))

            ds, class_name = self.get_class_name(index)
            if ds == "mvtec":
                per_class = {
                    "width_bounds_pct": MVTEC_WIDTH_BOUNDS_PCT.get(class_name),
                    "intensity_logistic_params": MVTEC_INTENSITY_LOGISTIC_PARAMS.get(class_name),
                    "skip_background": MVTEC_BACKGROUND.get(class_name),
                }
            else:
                per_class = {}
            args = {**self.self_sup_args, **per_class}
            aug_image, mask, boxes = patch_ex(
                np.asarray(image), np.asarray(src_image), rng=self.rng, **args
            )
            while np.sum(mask) == 0:
                aug_image, mask, boxes = patch_ex(
                    np.asarray(image), np.asarray(src_image), rng=self.rng, **args
                )
            if boxes and self.version >= 2:
                describe = describe_from_positions(
                    position_phrases(boxes, self.crop_size)
                )
            aug_sample = self.vis_processor({"img": aug_image, "gt_seg_map": mask[..., 0]})

        data_sample = self.vis_processor({"img": np.asarray(image)})

        # version overrides (anomaly_detection.py:332-337)
        if self.version == 0:
            normal_describe, abnormal_describe = NORMAL_DESCRIBE, ABNORMAL_DESCRIBE
        elif self.version == 1:
            normal_describe, abnormal_describe = NORMAL_DESCRIBE, ABNORMAL_DESCRIBE_V1
        else:
            normal_describe, abnormal_describe = NORMAL_DESCRIBE, describe

        q = "<Img><ImageHere></Img>" + QUESTION_PROMPTS[1]
        ret = {
            "image": np.asarray(data_sample["img"], np.float32),
            "scene": ann["img_path"].split("/")[1],
            "question": q,
            "question2": q,
            "question3": q,
            "text_input": normal_describe,
            "image_id": index,
            "is_anomaly": ann.get("is_anomaly") == "1" or ann.get("is_anomaly") is True,
            "img_path": os.path.join(self.vis_root, ann["img_path"]),
        }
        if self.with_mask and self.ve_root:
            ve = self.prepare_ve(index)
            if ve is not None:
                ret["masks"] = ve[..., None]

        if self.stage == "train" and aug_sample is not None:
            ret["aug_image"] = np.asarray(aug_sample["img"], np.float32)
            ret["aug_text_input"] = (
                normal_describe
                if float(np.sum(aug_sample["gt_seg_map"])) == 0.0
                else abnormal_describe
            )
        return ret


# description variants (twocls_ad.py:54-201)
TWOCLS_INSTRUCTIONS = [
    "This image has not been edited. According to IAD expert opinions, find out if there are defects in this image.",
    "This image has not been edited. According to IAD expert opinions and corresponding visual descriptions, find out if there are defects in this image.",
    "This image has not been edited. According to IAD expert visual descriptions, find out if there are defects in this image.",
]


class TwoClassAnomalyDetectionDataset(BaseDataset):
    """Supervised 2-class variant over real anomalous test images
    (reference twocls_ad.py:54-201)."""

    DatasetName = "TwoClassAnomalyDetection"

    def __init__(
        self,
        vis_processor,
        text_processor,
        vis_root: str,
        ve_root: str = "",
        ann_paths: Sequence[str] = (),
        img_size: int = 224,
        crop_size: int = 224,
        version: int = 0,
        is_preload: bool = False,
        stage: str = "train",
        seed: Optional[int] = None,
    ):
        self.ve_root = ve_root
        self.stage = stage
        self.img_size = img_size
        self.crop_size = crop_size
        self.version = version
        self.rng = np.random.default_rng(seed)
        super().__init__(vis_processor, text_processor, vis_root, ann_paths, is_preload)

    def prepare_img(self, index: int) -> Image.Image:
        rel = self.annotation[index]["img_path"]
        if self.is_preload and rel in self._cache:
            return self._cache[rel].copy()
        return Image.open(os.path.join(self.vis_root, rel)).convert("RGB")

    def __getitem__(self, index: int) -> Dict:
        ann = self.annotation[index]
        image = F.center_crop(
            F.resize_bicubic(self.prepare_img(index), self.img_size), self.crop_size
        )
        data_sample = self.vis_processor({"img": np.asarray(image)})
        is_anomaly = ann.get("is_anomaly") == "1" or ann.get("is_anomaly") is True
        text = ABNORMAL_DESCRIBE if is_anomaly else NORMAL_DESCRIBE
        q = "<Img><ImageHere></Img>" + TWOCLS_INSTRUCTIONS[1]
        return {
            "image": np.asarray(data_sample["img"], np.float32),
            "scene": ann["img_path"].split("/")[1],
            "question": q,
            "question2": q,
            "question3": q,
            "text_input": text,
            "image_id": index,
            "is_anomaly": is_anomaly,
            "img_path": os.path.join(self.vis_root, ann["img_path"]),
        }
