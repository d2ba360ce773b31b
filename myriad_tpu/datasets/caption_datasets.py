"""Caption-style datasets for MiniGPT-4 stage-1/2 pretraining.

Rebuilds the reference webdataset pipelines (cc_sbu_dataset.py:16-34,
laion_dataset.py:12-30) without the webdataset dependency: a resampling
tar-shard reader yielding {image, text_input}, plus the stage-2 align
caption dataset (caption_datasets.py:28-60) and the PandaGPT instruction
set (panda_instructions.py:20-75).
"""

from __future__ import annotations

import glob
import io
import json
import os
import tarfile
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np
from PIL import Image

from myriad_tpu.datasets.base_dataset import BaseDataset


class TarShardIterableDataset:
    """Infinite resampled reader over webdataset-style .tar shards.

    Each tar member group {key}.jpg + {key}.json (or .txt) yields
    {"image": processed image, "text_input": processed caption}.
    """

    def __init__(self, vis_processor, text_processor, location: str, seed: int = 0,
                 shuffle_buffer: int = 1000):
        self.vis_processor = vis_processor
        self.text_processor = text_processor
        self.shards = sorted(glob.glob(location)) if any(
            c in location for c in "*?[") else [location]
        if os.path.isdir(location):
            self.shards = sorted(glob.glob(os.path.join(location, "*.tar")))
        if not self.shards:
            raise FileNotFoundError(f"no tar shards match {location}")
        self.rng = np.random.default_rng(seed)
        self.shuffle_buffer = shuffle_buffer

    def _iter_shard(self, path: str) -> Iterator[Dict]:
        with tarfile.open(path) as tar:
            group: Dict[str, bytes] = {}
            key = None
            for member in tar:
                if not member.isfile():
                    continue
                base, ext = os.path.splitext(member.name)
                if key is not None and base != key and group:
                    sample = self._assemble(group)
                    if sample is not None:
                        yield sample
                    group = {}
                key = base
                group[ext.lstrip(".").lower()] = tar.extractfile(member).read()
            if group:
                sample = self._assemble(group)
                if sample is not None:
                    yield sample

    def _assemble(self, group: Dict[str, bytes]) -> Optional[Dict]:
        img_bytes = group.get("jpg") or group.get("jpeg") or group.get("png")
        if img_bytes is None:
            return None
        caption = None
        if "json" in group:
            caption = json.loads(group["json"]).get("caption")
        elif "txt" in group:
            caption = group["txt"].decode("utf-8")
        if caption is None:
            return None
        image = Image.open(io.BytesIO(img_bytes)).convert("RGB")
        return {
            "image": np.asarray(self.vis_processor(image), np.float32),
            "text_input": self.text_processor(caption),
        }

    def __iter__(self) -> Iterator[Dict]:
        buf: List[Dict] = []
        while True:  # resampled shards: infinite stream
            shard = self.shards[int(self.rng.integers(len(self.shards)))]
            for sample in self._iter_shard(shard):
                buf.append(sample)
                if len(buf) >= self.shuffle_buffer:
                    idx = int(self.rng.integers(len(buf)))
                    buf[idx], buf[-1] = buf[-1], buf[idx]
                    yield buf.pop()
            while buf:
                yield buf.pop()


class CaptionDataset(BaseDataset):
    """Standard LAVIS caption dataset: json annotations with image +
    caption fields (caption_datasets.py:28-60)."""

    def load_annotations(self) -> None:
        for path in self.ann_paths:
            full = path if os.path.isabs(path) else os.path.join(self.vis_root, path)
            with open(full) as f:
                data = json.load(f)
            self.annotation.extend(data["annotations"] if "annotations" in data else data)

    def __getitem__(self, index: int) -> Dict:
        ann = self.annotation[index]
        rel = ann.get("image", f"{ann['image_id']}.jpg")
        img = Image.open(os.path.join(self.vis_root, "image", rel)).convert("RGB")
        return {
            "image": np.asarray(self.vis_processor(img), np.float32),
            "text_input": self.text_processor(ann["caption"]),
            "image_id": ann.get("image_id", index),
        }


class CCSBUAlignDataset(CaptionDataset):
    """MiniGPT-4 stage-2 alignment data (cc_sbu_align layout)."""


class PandaInstructionDataset(BaseDataset):
    """PandaGPT visual-instruction json; first QA turn only
    (panda_instructions.py:20-75)."""

    def load_annotations(self) -> None:
        for path in self.ann_paths:
            full = path if os.path.isabs(path) else os.path.join(self.vis_root, path)
            with open(full) as f:
                self.annotation.extend(json.load(f))

    def __getitem__(self, index: int) -> Dict:
        ann = self.annotation[index]
        img = Image.open(
            os.path.join(self.vis_root, ann.get("image_name", ann.get("image")))
        ).convert("RGB")
        conv = ann["conversation"]
        question = conv[0]["value"] if isinstance(conv[0], dict) else conv[0]
        answer = conv[1]["value"] if isinstance(conv[1], dict) else conv[1]
        return {
            "image": np.asarray(self.vis_processor(img), np.float32),
            "question": "<Img><ImageHere></Img>" + question,
            "text_input": answer,
            "image_id": index,
        }
