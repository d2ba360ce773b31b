"""Base dataset: jsonl annotations + optional RAM preload + collation
(reference minigpt4/datasets/datasets/base_dataset.py:30-120)."""

from __future__ import annotations

import json
import logging
import os
from multiprocessing.dummy import Pool
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np
from PIL import Image


def read_jsonl(path: str) -> List[Dict]:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def default_collate(samples: Sequence[Dict]) -> Dict:
    """Stack arrays, keep strings/objects as lists."""
    out: Dict[str, Any] = {}
    keys = set(samples[0])
    for s in samples[1:]:
        keys &= set(s)
    for k in keys:
        vals = [s[k] for s in samples]
        v0 = vals[0]
        if isinstance(v0, np.ndarray):
            out[k] = np.stack(vals)
        elif isinstance(v0, (int, float, bool, np.integer, np.floating, np.bool_)):
            out[k] = np.asarray(vals)
        else:
            out[k] = list(vals)
    return out


class BaseDataset:
    def __init__(
        self,
        vis_processor=None,
        text_processor=None,
        vis_root: str = "",
        ann_paths: Sequence[str] = (),
        is_preload: bool = False,
        preload_workers: int = 16,
    ):
        self.vis_processor = vis_processor
        self.text_processor = text_processor
        self.vis_root = vis_root
        self.ann_paths = list(ann_paths)
        self.is_preload = is_preload
        self.annotation: List[Dict] = []
        self.load_annotations()
        self._cache: Dict[str, Any] = {}
        if is_preload:
            self.preload(preload_workers)

    def load_annotations(self) -> None:
        for path in self.ann_paths:
            full = path if os.path.isabs(path) else os.path.join(self.vis_root, path)
            self.annotation.extend(read_jsonl(full))
        logging.info("%s: %d samples", type(self).__name__, len(self.annotation))

    def __len__(self) -> int:
        return len(self.annotation)

    # -- preload (base_dataset.py:78-90: thread-pool RAM cache) --------------
    def preload_item(self, ann: Dict) -> None:
        rel = ann.get("img_path") or ann.get("image")
        self._cache[rel] = Image.open(os.path.join(self.vis_root, rel)).convert("RGB")

    def preload(self, workers: int = 16) -> None:
        with Pool(workers) as pool:
            pool.map(self.preload_item, self.annotation)
        logging.info("%s: preloaded %d items", type(self).__name__, len(self._cache))

    def collater(self, samples: Sequence[Dict]) -> Dict:
        return default_collate(samples)


class ConcatDataset:
    """Concat with shared-key collation (base_dataset.py:101-120)."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self._lengths = [len(d) for d in self.datasets]

    def __len__(self) -> int:
        return sum(self._lengths)

    def __getitem__(self, idx: int):
        for d, n in zip(self.datasets, self._lengths):
            if idx < n:
                return d[idx]
            idx -= n
        raise IndexError(idx)

    def collater(self, samples):
        shared = set(samples[0])
        for s in samples[1:]:
            shared &= set(s)
        return default_collate([{k: s[k] for k in shared} for s in samples])
