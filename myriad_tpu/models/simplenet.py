"""SimpleNet vision expert (reference minigpt4/models/simplenet/, 1.4k LoC):
PatchCore-style feature-adaptation anomaly detector.

Pipeline (simplenet.py:144-547): WideResNet-50-2 features (layer2+layer3)
-> 3x3 neighbourhood patchify -> per-patch mean-pool to a common dim ->
layer aggregation to ``target_embed_dimension`` -> per-class head
(Projection + Discriminator); anomaly score = -discriminator(feature).
Image score = max patch score; segmentation = patch grid upsampled to
224 + gaussian smoothing (RescaleSegmentor).

Training (simplenet.py:422-470): hinge/margin discriminator loss against
gaussian-noised features (``train_discriminator_step``).

BatchNorm runs in inference mode (running stats as parameters) — the
reference only ever evaluates the frozen backbone and per-class heads.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from myriad_tpu.models.layers import Dtype

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class BatchNormInference(nn.Module):
    """Affine BN with stored running statistics (eval mode)."""

    param_dtype: Dtype = jnp.float32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        mean = self.param("mean", nn.initializers.zeros, (c,), self.param_dtype)
        var = self.param("var", nn.initializers.ones, (c,), self.param_dtype)
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.eps)
        out = (x.astype(jnp.float32) - mean) * inv * scale + bias
        return out.astype(x.dtype)


class Bottleneck(nn.Module):
    width: int
    out_channels: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2, use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        bn = lambda name: BatchNormInference(self.param_dtype, name=name)
        identity = x
        h = nn.relu(bn("bn1")(conv(self.width, 1, 1, "conv1")(x)))
        h = nn.relu(bn("bn2")(conv(self.width, 3, self.stride, "conv2")(h)))
        h = bn("bn3")(conv(self.out_channels, 1, 1, "conv3")(h))
        if x.shape[-1] != self.out_channels or self.stride != 1:
            identity = bn("downsample_bn")(
                conv(self.out_channels, 1, self.stride, "downsample_conv")(x)
            )
        return nn.relu(h + identity)


class WideResNet50(nn.Module):
    """WideResNet-50-2 trunk returning layer2/layer3 feature maps
    (the reference taps these via timm's feature hooks)."""

    width_factor: int = 2
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images (B,H,W,3) -> (layer2 (B,H/8,W/8,512), layer3 (B,H/16,W/16,1024))."""
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype, name="conv1")(images)
        x = nn.relu(BatchNormInference(self.param_dtype, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

        def stage(x, blocks, width, out_c, stride, name):
            for i in range(blocks):
                x = Bottleneck(width, out_c, stride if i == 0 else 1,
                               self.dtype, self.param_dtype, name=f"{name}_{i}")(x)
            return x

        w = 64 * self.width_factor
        x = stage(x, 3, w, 256, 1, "layer1")
        l2 = stage(x, 4, w * 2, 512, 2, "layer2")
        l3 = stage(l2, 6, w * 4, 1024, 2, "layer3")
        return l2, l3


def patchify_3x3(feat: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H,W,C,9): 3x3 neighbourhood per position
    (PatchMaker.patchify, simplenet.py:577-607, stride 1, same padding)."""
    b, h, w, c = feat.shape
    padded = jnp.pad(feat, [(0, 0), (1, 1), (1, 1), (0, 0)])
    shifts = []
    for dy in range(3):
        for dx in range(3):
            shifts.append(padded[:, dy : dy + h, dx : dx + w, :])
    return jnp.stack(shifts, axis=-1)  # (B,H,W,C,9)


def adaptive_avg_pool_1d(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """torch F.adaptive_avg_pool1d over the last dim."""
    n = x.shape[-1]
    starts = (np.arange(out) * n) // out
    ends = -(-((np.arange(out) + 1) * n) // out)
    # segment means via cumulative sum
    cs = jnp.cumsum(x, axis=-1)
    cs = jnp.concatenate([jnp.zeros_like(cs[..., :1]), cs], axis=-1)
    seg = cs[..., ends] - cs[..., starts]
    return seg / jnp.asarray(ends - starts, x.dtype)


class SimpleNetEmbedder(nn.Module):
    """Backbone + patch aggregation producing (B, H2*W2, target_dim)."""

    pretrain_embed_dimension: int = 1536
    target_embed_dimension: int = 1536
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple[int, int]]:
        l2, l3 = WideResNet50(dtype=self.dtype, param_dtype=self.param_dtype,
                              name="backbone")(images)
        h2, w2 = l2.shape[1:3]
        feats = []
        for f in (l2, l3):
            p = patchify_3x3(f)  # (B,h,w,C,9)
            b, h, w, c, k = p.shape
            if (h, w) != (h2, w2):
                p = jax.image.resize(p, (b, h2, w2, c, k), method="bilinear")
            flat = p.reshape(b, h2 * w2, c * k)
            feats.append(adaptive_avg_pool_1d(flat, self.pretrain_embed_dimension))
        stacked = jnp.stack(feats, axis=2)  # (B,P,L,D)
        b, pn = stacked.shape[:2]
        agg = adaptive_avg_pool_1d(
            stacked.reshape(b, pn, -1), self.target_embed_dimension
        )
        return agg, (h2, w2)


class Projection(nn.Module):
    """simplenet.py:76-105 (n_layers Linear stack, LeakyReLU between)."""

    out_planes: int
    n_layers: int = 1
    layer_type: int = 0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.n_layers):
            x = nn.Dense(self.out_planes, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"fc_{i}")(x)
            if i < self.n_layers - 1 and self.layer_type > 1:
                x = nn.leaky_relu(x, 0.2)
        return x


class Discriminator(nn.Module):
    """simplenet.py:43-74 ((n_layers-1) x [Linear+BN+LeakyReLU] + tail)."""

    n_layers: int = 2
    hidden: Optional[int] = 1024
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_planes = x.shape[-1]
        hidden = self.hidden
        for i in range(self.n_layers - 1):
            width = int((hidden or in_planes) // 1.5) if self.hidden is None else self.hidden
            x = nn.Dense(width, dtype=self.dtype, param_dtype=self.param_dtype,
                         name=f"block{i + 1}_fc")(x)
            x = BatchNormInference(self.param_dtype, name=f"block{i + 1}_bn")(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.Dense(1, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="tail")(x)


class SimpleHead(nn.Module):
    """Projection + Discriminator per class (simplenet.py:117-141)."""

    target_embed_dimension: int = 1536
    pre_proj: int = 1
    proj_layer_type: int = 0
    dsc_layers: int = 2
    dsc_hidden: int = 1024
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.pre_proj > 0:
            x = Projection(self.target_embed_dimension, self.pre_proj,
                           self.proj_layer_type, self.dtype, self.param_dtype,
                           name="pre_projection")(x)
        return Discriminator(self.dsc_layers, self.dsc_hidden, self.dtype,
                             self.param_dtype, name="discriminator")(x)


@dataclasses.dataclass
class SimpleNetInterface:
    """Per-class inference wrapper (reference simplenet_intf.py:23-188):
    forward(images, classnames) -> (image score + 1, anomaly map + 1)."""

    embedder: SimpleNetEmbedder
    embedder_params: Dict
    head: SimpleHead
    head_params: Dict[str, Dict]  # class name -> params
    map_size: int = 224
    smoothing_sigma: float = 4.0

    def __post_init__(self):
        self._embed_jit = jax.jit(
            lambda p, img: self.embedder.apply(p, img)
        )
        self._head_jit = jax.jit(
            lambda p, f: self.head.apply(p, f)
        )

    def __call__(self, images: jnp.ndarray, cls_names: Sequence[str]):
        feats, (h, w) = self._embed_jit(self.embedder_params, images)
        scores = []
        for i, cls in enumerate(cls_names):
            s = -self._head_jit(self.head_params[cls], feats[i])[..., 0]
            scores.append(s)
        patch_scores = jnp.stack(scores).reshape(len(cls_names), h, w)
        image_scores = jnp.max(patch_scores.reshape(len(cls_names), -1), axis=-1)
        maps = jax.image.resize(
            patch_scores, (len(cls_names), self.map_size, self.map_size), "bilinear"
        )
        maps = np.asarray(maps)
        from scipy import ndimage

        maps = np.stack([ndimage.gaussian_filter(m, self.smoothing_sigma) for m in maps])
        # reference returns scores+1 / masks+1 (simplenet_intf forward)
        return np.asarray(image_scores) + 1.0, maps[..., None] + 1.0


def load_simplenet_interface(
    ckpt_root: str,
    backbone_path: Optional[str] = None,
    map_size: int = 224,
    target_embed_dimension: int = 1536,
) -> "SimpleNetInterface":
    """Build a SimpleNetInterface from converted npz checkpoints.

    ``ckpt_root`` holds one ``{class}.npz`` per class (output of
    ``tools/convert_weights.py simplenet``) — the per-class Projection +
    Discriminator heads the reference stores as ``{root}/{class}/ckpt.pth``
    (simplenet_intf.py:34-43).  ``backbone_path`` is the converted
    torchvision WideResNet-50-2 trunk; when omitted the backbone starts at
    its flax init (tests / feature-free smoke runs).
    """
    import glob
    import os

    import jax

    from myriad_tpu import checkpoint as ckpt_lib

    embedder = SimpleNetEmbedder(target_embed_dimension=target_embed_dimension)
    img = jnp.zeros((1, 288, 288, 3), jnp.float32)
    embedder_params = jax.jit(lambda r: embedder.init(r, img))(jax.random.PRNGKey(0))
    if backbone_path:
        tree = {"backbone": ckpt_lib.load_params(backbone_path)}
        merged, loaded, skipped = ckpt_lib.merge_with_paths(
            embedder_params["params"], tree
        )
        embedder_params = {"params": merged}
        if skipped:
            import logging

            logging.warning("simplenet backbone: %d leaves skipped", len(skipped))

    head = SimpleHead(target_embed_dimension=target_embed_dimension)
    feats = jnp.zeros((1, target_embed_dimension), jnp.float32)
    init_head = jax.jit(lambda r: head.init(r, feats))(jax.random.PRNGKey(1))
    head_params: Dict[str, Dict] = {}
    for path in sorted(glob.glob(os.path.join(ckpt_root, "*.npz"))):
        cls = os.path.splitext(os.path.basename(path))[0]
        tree = ckpt_lib.load_params(path)
        merged, _, _ = ckpt_lib.merge_with_paths(init_head["params"], tree)
        head_params[cls] = {"params": merged}
    if not head_params:
        raise FileNotFoundError(f"no per-class head npz files under {ckpt_root}")
    return SimpleNetInterface(embedder, embedder_params, head, head_params,
                              map_size=map_size)


def discriminator_margin_loss(
    head: SimpleHead, params, feats: jnp.ndarray, noise_std: float,
    margin: float, rng: jax.Array,
) -> jnp.ndarray:
    """Hinge loss on true vs gaussian-noised features
    (simplenet.py train loop: th=dsc_margin)."""
    noise = noise_std * jax.random.normal(rng, feats.shape, feats.dtype)
    true_scores = head.apply(params, feats)[..., 0]
    fake_scores = head.apply(params, feats + noise)[..., 0]
    return (
        jnp.maximum(0.0, margin - true_scores).mean()
        + jnp.maximum(0.0, margin + fake_scores).mean()
    )
