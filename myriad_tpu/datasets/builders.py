"""Dataset builders (reference minigpt4/datasets/builders/).

Builders turn a dataset config node into split->dataset dicts; processors
are built from the config's vis_processor/text_processor sections
(base_dataset_builder.py:25-229 minus the torch download plumbing — data
staging is the user's responsibility, rank-0 gating handled by
``dist.main_process``).
"""

from __future__ import annotations

import logging
import os
from typing import Dict

from myriad_tpu.common.config import ConfigDict
from myriad_tpu.common.registry import registry
from myriad_tpu.datasets.anomaly_detection import (
    AnomalyDetectionDataset,
    TwoClassAnomalyDetectionDataset,
)
from myriad_tpu.datasets.caption_datasets import (
    CCSBUAlignDataset,
    PandaInstructionDataset,
    TarShardIterableDataset,
)
from myriad_tpu.processors.blip_processors import build_processor


class BaseDatasetBuilder:
    train_dataset_cls = None
    eval_dataset_cls = None
    DATASET_CONFIG_DICT: Dict[str, str] = {}

    def __init__(self, cfg=None):
        self.config = cfg if cfg is not None else ConfigDict()
        self.vis_processors: Dict = {}
        self.text_processors: Dict = {}

    @classmethod
    def default_config_path(cls, type: str = "default"):
        rel = cls.DATASET_CONFIG_DICT.get(type)
        if rel is None:
            return None
        return os.path.join(registry.get_path("library_root"), rel)

    def build_processors(self) -> None:
        vis_cfg = self.config.get("vis_processor", ConfigDict())
        txt_cfg = self.config.get("text_processor", ConfigDict())
        for split in ("train", "eval"):
            self.vis_processors[split] = build_processor(vis_cfg.get(split))
            self.text_processors[split] = build_processor(txt_cfg.get(split))

    def build_datasets(self) -> Dict:
        logging.info("Building datasets for %s", type(self).__name__)
        datasets = self.build()
        # stage-1 mixed-ratio sampling weight (reference
        # minigpt4_stage1_pretrain.yaml sample_ratio; consumed by the
        # runner's MultiIterLoader)
        ratio = self.config.get("sample_ratio")
        if ratio is not None:
            for ds in datasets.values():
                try:
                    ds.sample_ratio = float(ratio)
                except AttributeError:
                    pass
        return datasets

    def build(self) -> Dict:  # pragma: no cover - overridden
        raise NotImplementedError


@registry.register_builder("anomaly_detection")
class AnomalyDetectionBuilder(BaseDatasetBuilder):
    """reference anomaly_detection_builder.py:11-54."""

    train_dataset_cls = AnomalyDetectionDataset
    DATASET_CONFIG_DICT = {"default": "configs/datasets/anomaly_detection/base.yaml"}

    def build(self) -> Dict:
        self.build_processors()
        info = self.config.get("build_info", ConfigDict())
        aug = self.config.get("augment", ConfigDict())
        dataset = self.train_dataset_cls(
            vis_processor=self.vis_processors["train"],
            text_processor=self.text_processors["train"],
            vis_root=info.get("storage", ""),
            ve_root=info.get("ve_storage", ""),
            ann_paths=info.get("ann_paths", []),
            img_size=self.config.get("img_size", 224),
            crop_size=self.config.get("crop_size", 224),
            version=self.config.get("version", 0),
            with_mask=self.config.get("with_mask", False),
            with_ref=self.config.get("with_ref", False),
            with_pos=self.config.get("with_pos", False),
            is_preload=self.config.get("is_preload", False),
            stage="train",
            nsa_max_width=aug.get("nsa_max_width", 0.4),
            seed=self.config.get("seed", None),
        )
        return {"train": dataset}


@registry.register_builder("two_class_anomaly_detection")
class TwoClassAnomalyDetectionBuilder(BaseDatasetBuilder):
    """reference anomaly_detection_builder.py:57-94."""

    train_dataset_cls = TwoClassAnomalyDetectionDataset
    DATASET_CONFIG_DICT = {"default": "configs/datasets/anomaly_detection/2cls.yaml"}

    def build(self) -> Dict:
        self.build_processors()
        info = self.config.get("build_info", ConfigDict())
        dataset = self.train_dataset_cls(
            vis_processor=self.vis_processors["train"],
            text_processor=self.text_processors["train"],
            vis_root=info.get("storage", ""),
            ve_root=info.get("ve_storage", ""),
            ann_paths=info.get("ann_paths", []),
            img_size=self.config.get("img_size", 224),
            crop_size=self.config.get("crop_size", 224),
            version=self.config.get("version", 0),
            is_preload=self.config.get("is_preload", False),
            stage="train",
        )
        return {"train": dataset}


class _WebBuilder(BaseDatasetBuilder):
    def build(self) -> Dict:
        self.build_processors()
        info = self.config.get("build_info", ConfigDict())
        return {
            "train": TarShardIterableDataset(
                vis_processor=self.vis_processors["train"],
                text_processor=self.text_processors["train"],
                location=info.get("storage", ""),
            )
        }


@registry.register_builder("cc_sbu")
class CCSBUBuilder(_WebBuilder):
    DATASET_CONFIG_DICT = {"default": "configs/datasets/cc_sbu/defaults.yaml"}


@registry.register_builder("laion")
class LaionBuilder(_WebBuilder):
    DATASET_CONFIG_DICT = {"default": "configs/datasets/laion/defaults.yaml"}


@registry.register_builder("cc_sbu_align")
class CCSBUAlignBuilder(BaseDatasetBuilder):
    train_dataset_cls = CCSBUAlignDataset
    DATASET_CONFIG_DICT = {"default": "configs/datasets/cc_sbu/align.yaml"}

    def build(self) -> Dict:
        self.build_processors()
        info = self.config.get("build_info", ConfigDict())
        storage = info.get("storage", "")
        return {
            "train": self.train_dataset_cls(
                vis_processor=self.vis_processors["train"],
                text_processor=self.text_processors["train"],
                vis_root=storage,
                ann_paths=[os.path.join(storage, "filter_cap.json")],
            )
        }


@registry.register_builder("panda")
class PandaBuilder(BaseDatasetBuilder):
    train_dataset_cls = PandaInstructionDataset
    DATASET_CONFIG_DICT = {"default": "configs/datasets/panda/base.yaml"}

    def build(self) -> Dict:
        self.build_processors()
        info = self.config.get("build_info", ConfigDict())
        return {
            "train": self.train_dataset_cls(
                vis_processor=self.vis_processors["train"],
                text_processor=self.text_processors["train"],
                vis_root=info.get("storage", ""),
                ann_paths=info.get("ann_paths", []),
            )
        }
