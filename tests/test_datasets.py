"""Dataset layer tests: NSA synthesis, AD dataset, loaders, builders."""

import os

import cv2
import numpy as np
import pytest

from myriad_tpu.datasets.anomaly_detection import (
    AnomalyDetectionDataset,
    TwoClassAnomalyDetectionDataset,
    describe_from_positions,
    position_phrases,
)
from myriad_tpu.datasets.base_dataset import default_collate
from myriad_tpu.datasets.loaders import (
    DataLoader,
    DistributedSampler,
    IterLoader,
    MultiIterLoader,
)
from myriad_tpu.datasets.nsa import patch_ex
from myriad_tpu.processors.blip_processors import LocImageTrainProcessor
from tests.fixtures import make_ad_dataset


@pytest.fixture(scope="module")
def ad_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("TrainADDataset")
    make_ad_dataset(str(root), dataset="mvtec", classes=("bottle", "screw"),
                    n_train=4, img_size=224)
    return str(root)


# -- NSA -----------------------------------------------------------------
def test_patch_ex_basic_properties(rng):
    dest = rng.integers(0, 255, (224, 224, 3), dtype=np.uint8)
    src = rng.integers(0, 255, (224, 224, 3), dtype=np.uint8)
    g = np.random.default_rng(0)
    aug, label, boxes = patch_ex(
        dest, src, rng=g, num_patches=2, min_object_pct=0, min_overlap_pct=0.25,
        gamma_params=(2, 0.05, 0.03), resize=True, shift=True,
        mode=cv2.NORMAL_CLONE, label_mode="logistic-intensity",
    )
    assert aug.shape == dest.shape and aug.dtype == np.uint8
    assert label.shape == (224, 224, 1)
    assert 0.0 <= label.max() <= 1.0
    assert len(boxes) >= 1
    # something actually changed inside the boxes region
    assert np.abs(aug.astype(int) - dest.astype(int)).sum() > 0
    # label only where changed
    untouched = (np.abs(aug.astype(int) - dest.astype(int)).sum(-1) == 0)
    assert float(label[untouched].max() if untouched.any() else 0) <= 0.51


def test_patch_ex_modes(rng):
    dest = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
    src = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
    for mode in ["swap", "uniform", "mix", cv2.MIXED_CLONE]:
        g = np.random.default_rng(1)
        aug, label, boxes = patch_ex(
            dest, src, rng=g, mode=mode,
            label_mode="continuous" if mode == "uniform" else "binary",
            width_bounds_pct=((0.1, 0.3), (0.1, 0.3)),
        )
        assert aug.shape == dest.shape


def test_patch_ex_skip_background(rng):
    # white object on black background; patches must land on the object
    dest = np.zeros((224, 224, 3), np.uint8)
    dest[60:160, 60:160] = 230
    src = np.zeros((224, 224, 3), np.uint8)
    src[40:180, 40:180] = 200
    g = np.random.default_rng(2)
    aug, label, boxes = patch_ex(
        dest, src, rng=g, skip_background=(0, 20), min_object_pct=0.25,
        min_overlap_pct=0.25, width_bounds_pct=((0.05, 0.2), (0.05, 0.2)),
        mode="swap", label_mode="binary",
    )
    changed = np.abs(aug.astype(int) - dest.astype(int)).sum(-1) > 0
    if changed.any():
        ys, xs = np.where(changed)
        # changes overlap the object region (allow blend borders)
        assert ys.min() > 30 and xs.min() > 30


def test_patch_ex_cutpaste(rng):
    dest = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
    aug, label, boxes = patch_ex(
        dest, rng=np.random.default_rng(3), cutpaste_patch_generation=True,
        mode="swap", label_mode="binary", same=True,
    )
    assert aug.shape == dest.shape


def test_position_phrases():
    assert position_phrases([[10, 10, 50, 50]]) == ["upper left"]
    assert position_phrases([[200, 200, 220, 220]]) == ["lower right"]
    d = describe_from_positions(["upper left"])
    assert d.startswith("Yes, there exists anomalies in the image, at the upper left")


# -- AD dataset -------------------------------------------------------------
def test_anomaly_detection_dataset_train(ad_root):
    ds = AnomalyDetectionDataset(
        LocImageTrainProcessor(identity=True), None, ad_root,
        ann_paths=["DC_MVTEC_train_normal.jsonl"], stage="train", seed=0,
    )
    assert len(ds) == 8
    s = ds[0]
    assert s["image"].shape == (224, 224, 3)
    assert s["aug_image"].shape == (224, 224, 3)
    assert s["scene"] in ("bottle", "screw")
    assert s["text_input"].startswith("No, there exists")
    assert s["aug_text_input"].startswith(("Yes,", "No,"))
    assert "<ImageHere>" in s["question2"]
    assert s["is_anomaly"] is False


def test_anomaly_detection_dataset_test_and_preload(ad_root):
    ds = AnomalyDetectionDataset(
        LocImageTrainProcessor(identity=True), None, ad_root,
        ann_paths=["DC_MVTEC_test_normal.jsonl"], stage="test", is_preload=True,
    )
    s = ds[1]
    assert "aug_image" not in s
    assert s["is_anomaly"] is True
    assert len(ds._cache) == len(ds)


def test_twocls_dataset(ad_root):
    ds = TwoClassAnomalyDetectionDataset(
        LocImageTrainProcessor(identity=True), None, ad_root,
        ann_paths=["DC_MVTEC_test_normal.jsonl"],
    )
    s = ds[1]
    assert s["text_input"].startswith("Yes,")
    assert "has not been edited" in s["question"]


# -- loaders ------------------------------------------------------------------
def test_dataloader_and_iterloader(ad_root):
    ds = AnomalyDetectionDataset(
        LocImageTrainProcessor(identity=True), None, ad_root,
        ann_paths=["DC_MVTEC_train_normal.jsonl"], stage="test", seed=0,
    )
    dl = DataLoader(ds, batch_size=3, shuffle=True, num_workers=2)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[0]["image"].shape == (3, 224, 224, 3)
    assert isinstance(batches[0]["scene"], list)

    it = IterLoader(DataLoader(ds, batch_size=4, shuffle=True, drop_last=True))
    seen = [next(it) for _ in range(5)]  # wraps epochs
    assert it.epoch >= 2
    assert all(b["image"].shape[0] == 4 for b in seen)


def test_distributed_sampler_partitions():
    class Dummy:
        def __len__(self):
            return 10

    idx_all = []
    for rank in range(4):
        s = DistributedSampler(Dummy(), num_replicas=4, rank=rank, shuffle=False)
        idx_all.append(list(iter(s)))
    assert all(len(i) == 3 for i in idx_all)  # padded to ceil(10/4)
    flat = sum(idx_all, [])
    assert set(flat) == set(range(10))


def test_multi_iter_loader_ratio():
    a = iter(lambda: "a", None)
    b = iter(lambda: "b", None)
    ml = MultiIterLoader([a, b], ratios=[9, 1], seed=0)
    out = [next(ml) for _ in range(200)]
    assert out.count("a") > 150


def test_builder_through_config(ad_root):
    import myriad_tpu.datasets  # register builders
    from myriad_tpu.common.config import ConfigDict
    from myriad_tpu.common.registry import registry

    builder_cls = registry.get_builder_class("anomaly_detection")
    cfg = ConfigDict({
        "build_info": {"storage": ad_root,
                       "ann_paths": ["DC_MVTEC_train_normal.jsonl"]},
        "vis_processor": {"train": {"name": "loc_image_train", "identity": True}},
        "text_processor": {"train": {"name": "blip_caption"}},
        "is_preload": False,
    })
    datasets = builder_cls(cfg).build_datasets()
    assert "train" in datasets and len(datasets["train"]) == 8
    s = datasets["train"][0]
    assert s["image"].shape == (224, 224, 3)
