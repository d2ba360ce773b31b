"""Processor parity tests against torchvision semantics (SURVEY.md §4)."""

import numpy as np
import pytest
from PIL import Image

from myriad_tpu.processors import (
    Blip2ImageEvalProcessor,
    Blip2ImageTrainProcessor,
    BlipCaptionProcessor,
    LocImageTrainProcessor,
)
from myriad_tpu.processors import functional as F


def _rand_img(rng, h=300, w=260):
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB")


def test_blip2_train_matches_pil_reference(rng):
    # torchvision's Resize/ToTensor/Normalize on PIL inputs delegate to PIL
    # bicubic resize + /255 + (x-mean)/std; assert against that math directly.
    img = _rand_img(rng)
    ref = np.asarray(img.resize((224, 224), Image.BICUBIC), np.float32) / 255.0
    ref = (ref - F.CLIP_MEAN) / F.CLIP_STD
    ours = Blip2ImageTrainProcessor(image_size=224)(img)
    assert ours.shape == (224, 224, 3)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_eval_equals_train_pipeline(rng):
    img = _rand_img(rng)
    np.testing.assert_array_equal(
        Blip2ImageTrainProcessor()(img), Blip2ImageEvalProcessor()(img)
    )


def test_center_crop_arithmetic(rng):
    # torchvision CenterCrop formula: left = round((w-tw)/2), top = round((h-th)/2)
    img = _rand_img(rng, 250, 300)
    arr = np.asarray(img)
    ours = np.asarray(F.center_crop(img, 224))
    top, left = round((250 - 224) / 2.0), round((300 - 224) / 2.0)
    np.testing.assert_array_equal(ours, arr[top : top + 224, left : left + 224])
    # pad path: crop larger than image
    small = _rand_img(rng, 100, 100)
    padded = np.asarray(F.center_crop(small, 224))
    assert padded.shape == (224, 224, 3)


def test_resize_short_edge_semantics(rng):
    # int size scales the short edge, keeping aspect ratio (torchvision Resize(int))
    img = _rand_img(rng, 448, 320)
    out = F.resize_bicubic(img, 224)
    assert out.size == (224, 314)  # (w, h): short edge 320->224, 448*224/320=313.6->314
    ref = img.resize((224, 314), Image.BICUBIC)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_loc_identity_processor(rng):
    arr = rng.integers(0, 255, (224, 224, 3), dtype=np.uint8)
    seg = (rng.random((224, 224)) > 0.5).astype(np.uint8)
    proc = LocImageTrainProcessor(identity=True)
    out = proc({"img": arr, "gt_seg_map": seg})
    assert out["img"].shape == (224, 224, 3)
    np.testing.assert_allclose(
        out["img"], F.normalize(arr.astype(np.float32) / 255.0), atol=1e-6
    )
    np.testing.assert_array_equal(out["gt_seg_map"], seg)


def test_loc_geometric_modes(rng):
    arr = rng.integers(0, 255, (320, 280, 3), dtype=np.uint8)
    seg = (rng.random((320, 280)) > 0.9).astype(np.uint8)
    out = LocImageTrainProcessor(identity=False, seed=0)({"img": arr, "gt_seg_map": seg})
    assert out["img"].shape == (224, 224, 3)
    assert out["gt_seg_map"].shape == (224, 224)
    out2 = LocImageTrainProcessor(strong_aug=True, seed=0)({"img": arr, "gt_seg_map": seg})
    assert out2["img"].shape == (224, 224, 3)


def test_caption_processor():
    p = BlipCaptionProcessor(max_words=5)
    assert p("Hello, World! This is A Very Long Caption Indeed") == (
        "hello, world this is a"
    )


def test_denormalize_roundtrip(rng):
    arr = rng.random((8, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(F.denormalize(F.normalize(arr)), arr, atol=1e-6)


def test_expand2square(rng):
    img = _rand_img(rng, 100, 60)
    sq = F.expand2square(img)
    assert sq.size == (100, 100)
