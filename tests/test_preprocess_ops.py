"""On-device preprocessing tests."""

import jax.numpy as jnp
import numpy as np
from PIL import Image

from myriad_tpu.ops.preprocess import (
    device_preprocess,
    resize_bicubic_device,
    u8_normalize,
    u8_normalize_pallas,
)
from myriad_tpu.processors import functional as F


def test_u8_normalize_paths_agree(rng):
    img = rng.integers(0, 255, (2, 20, 20, 3), dtype=np.uint8)
    ref = F.normalize(img.astype(np.float32) / 255.0)
    xla = np.asarray(u8_normalize(jnp.asarray(img)))
    np.testing.assert_allclose(xla, ref, atol=1e-6)
    pal = np.asarray(u8_normalize_pallas(jnp.asarray(img), interpret=True))
    np.testing.assert_allclose(pal, ref, atol=1e-5)


def test_device_resize_close_to_pil(rng):
    arr = rng.integers(0, 255, (64, 48, 3), dtype=np.uint8)
    pil = np.asarray(
        Image.fromarray(arr).resize((24, 32), Image.BICUBIC), np.float32
    ) / 255.0
    dev = np.asarray(
        resize_bicubic_device(jnp.asarray(arr, jnp.float32)[None] / 255.0, (32, 24))
    )[0]
    # PIL quantizes to 8 bits internally; expect close, not identical
    assert np.abs(dev - pil).mean() < 0.01
    assert np.abs(dev - pil).max() < 0.1


def test_device_preprocess_end_to_end(rng):
    img = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    out = np.asarray(device_preprocess(jnp.asarray(img), out_size=32))
    assert out.shape == (2, 32, 32, 3)
    # identity size: matches plain normalize exactly
    out2 = np.asarray(device_preprocess(jnp.asarray(img), out_size=64))
    ref = F.normalize(img.astype(np.float32) / 255.0)
    np.testing.assert_allclose(out2, ref, atol=1e-5)


def test_upsample_resize_matrix_properties():
    from myriad_tpu.ops.preprocess import resize_matrix_bicubic

    w = resize_matrix_bicubic(16, 32)
    assert w.shape == (32, 16)
    np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-6)  # partition of unity


def test_myriad_uint8_input_matches_normalized(rng):
    """encode path with uint8 input == host-normalized float input."""
    import jax
    import jax.numpy as jnp
    from myriad_tpu.models.layers import Policy
    from myriad_tpu.models.myriad import Myriad, MyriadArch, MyriadModule

    model = Myriad(arch=MyriadArch.tiny(), use_ve=False, policy=Policy.fp32(),
                   max_txt_len=8, end_sym="###")
    u8 = rng.integers(0, 255, (2, 28, 28, 3), dtype=np.uint8)
    normalized = F.normalize(u8.astype(np.float32) / 255.0).astype(np.float32)
    maps = jnp.zeros((2, 224, 224, 1))
    a = model.module.apply({"params": model.params}, jnp.asarray(u8), maps, 1,
                           method=MyriadModule.encode_img)
    b = model.module.apply({"params": model.params}, jnp.asarray(normalized), maps, 1,
                           method=MyriadModule.encode_img)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
