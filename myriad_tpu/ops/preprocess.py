"""On-device image preprocessing (BASELINE north-star: "the Blip2-style
image path fuses into Pallas kernels feeding the EVA-ViT encoder").

Host pipelines ship uint8 HWC images (4x less host->device traffic than
fp32); the device then runs

    u8 -> [0,1] -> CLIP-normalize          (Pallas kernel / XLA fusion)
    bicubic resize + center crop           (two matmuls on the MXU)

inside the same jit as the encoder, so XLA fuses the normalized pixels
straight into the patch-embed convolution.

The bicubic resize is expressed as separable row/column resampling
matrices (Catmull-Rom kernel a=-0.5 with antialias scaling on
downsampling — PIL-compatible up to PIL's internal 8-bit fixed point).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from myriad_tpu.processors.functional import CLIP_MEAN, CLIP_STD


def _cubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    x = np.abs(x)
    return np.where(
        x <= 1,
        (a + 2) * x**3 - (a + 3) * x**2 + 1,
        np.where(x < 2, a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a, 0.0),
    )


@functools.lru_cache(maxsize=16)
def resize_matrix_bicubic(n_in: int, n_out: int) -> np.ndarray:
    """W (n_out, n_in): 1-D bicubic resample with half-pixel centers and
    antialias filter scaling for downsampling (PIL semantics)."""
    scale = n_in / n_out
    support_scale = max(scale, 1.0)
    centers = (np.arange(n_out) + 0.5) * scale - 0.5
    idx = np.arange(n_in)
    dist = (centers[:, None] - idx[None, :]) / support_scale
    w = _cubic(dist)
    # zero outside the (scaled) support
    w[np.abs(dist) >= 2] = 0.0
    s = w.sum(axis=1, keepdims=True)
    return (w / np.maximum(s, 1e-8)).astype(np.float32)


def resize_bicubic_device(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """x (..., H, W, C) -> (..., H', W', C) via two MXU matmuls."""
    h, w = x.shape[-3:-1]
    wh = jnp.asarray(resize_matrix_bicubic(h, out_hw[0]))
    ww = jnp.asarray(resize_matrix_bicubic(w, out_hw[1]))
    y = jnp.einsum("oh,...hwc->...owc", wh, x.astype(jnp.float32))
    return jnp.einsum("pw,...owc->...opc", ww, y)


# ---------------------------------------------------------------------------
# u8 -> normalized, Pallas
# ---------------------------------------------------------------------------
def _normalize_kernel(u8_ref, mean_ref, std_ref, o_ref):
    # blocks: u8 (R, 128) flattened row-major (B,H,W,C) with C==3;
    # channel of element (r, c) = (r*128 + c) % 3
    r0 = pl.program_id(0) * u8_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, u8_ref.shape, 0) + r0
    cols = jax.lax.broadcasted_iota(jnp.int32, u8_ref.shape, 1)
    ch = (rows * 128 + cols) % 3
    mean = mean_ref[0]  # (3,) padded to (128,) -> gather by ch
    std = std_ref[0]
    m = jnp.take(mean, ch)
    s = jnp.take(std, ch)
    x = u8_ref[:].astype(jnp.float32) / 255.0
    o_ref[:] = ((x - m) / s).astype(o_ref.dtype)


def u8_normalize_pallas(
    images_u8: jnp.ndarray,
    mean=CLIP_MEAN,
    std=CLIP_STD,
    out_dtype=jnp.float32,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """uint8 (..., 3) -> normalized float, one fused Pallas pass."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    shape = images_u8.shape
    flat = images_u8.reshape(-1)
    n = flat.shape[0]
    rows = -(-n // 128)
    rows_pad = -(-rows // 8) * 8
    pad = rows_pad * 128 - n
    flat = jnp.pad(flat, (0, pad)).reshape(rows_pad, 128)
    mean_p = jnp.zeros((1, 128), jnp.float32).at[0, :3].set(jnp.asarray(mean))
    std_p = jnp.ones((1, 128), jnp.float32).at[0, :3].set(jnp.asarray(std))

    block_rows = min(rows_pad, 512)
    # grid must tile evenly; fall back to one block when ragged
    if rows_pad % block_rows != 0:
        block_rows = rows_pad
    out = pl.pallas_call(
        _normalize_kernel,
        grid=(rows_pad // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, 128), out_dtype),
        interpret=interpret,
    )(flat, mean_p, std_p)
    return out.reshape(-1)[:n].reshape(shape)


def u8_normalize(images_u8: jnp.ndarray, mean=CLIP_MEAN, std=CLIP_STD,
                 out_dtype=jnp.float32) -> jnp.ndarray:
    """XLA path (fuses into the consumer, e.g. the patch-embed conv)."""
    x = images_u8.astype(jnp.float32) / 255.0
    return ((x - jnp.asarray(mean)) / jnp.asarray(std)).astype(out_dtype)


def device_preprocess(
    images_u8: jnp.ndarray,
    out_size: Optional[int] = None,
    mean=CLIP_MEAN,
    std=CLIP_STD,
    out_dtype=jnp.float32,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Full on-device Blip2 eval preprocessing: uint8 (B,H,W,3) ->
    normalized (B,S,S,3) (resize happens in float before normalize, like
    torchvision Resize->ToTensor->Normalize)."""
    x = images_u8.astype(jnp.float32) / 255.0
    if out_size is not None and images_u8.shape[1:3] != (out_size, out_size):
        x = resize_bicubic_device(x, (out_size, out_size))
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    if use_pallas and out_size is None:
        return u8_normalize_pallas(images_u8, mean, std, out_dtype)
    return x.astype(out_dtype)
