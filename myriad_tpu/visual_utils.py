"""Box/mask overlay renderers (reference
minigpt4/visual_utils/visualize_tools.py:9-101)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def annotate(
    image: np.ndarray,
    boxes: Sequence[Sequence[float]],
    labels: Optional[Sequence[str]] = None,
    color: Tuple[int, int, int] = (0, 255, 0),
) -> np.ndarray:
    """Draw xyxy boxes (+labels) on a uint8 HWC image."""
    import cv2

    frame = np.ascontiguousarray(np.asarray(image, np.uint8))
    labels = labels or [""] * len(boxes)
    for box, label in zip(boxes, labels):
        x1, y1, x2, y2 = (int(round(v)) for v in box)
        cv2.rectangle(frame, (x1, y1), (x2, y2), color, 2)
        if label:
            cv2.putText(frame, str(label), (x1, max(y1 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return frame


def overlay_mask(
    image: np.ndarray,
    mask: np.ndarray,
    alpha: float = 0.5,
    color: Tuple[int, int, int] = (0, 0, 255),
) -> np.ndarray:
    """Blend a [0,1] anomaly map over a uint8 HWC image."""
    import cv2

    frame = np.asarray(image, np.float32)
    m = np.asarray(np.squeeze(mask), np.float32)
    if m.shape[:2] != frame.shape[:2]:
        m = cv2.resize(m, (frame.shape[1], frame.shape[0]))
    heat = np.zeros_like(frame)
    heat[..., 0], heat[..., 1], heat[..., 2] = color
    blended = frame * (1 - alpha * m[..., None]) + heat * (alpha * m[..., None])
    return np.clip(blended, 0, 255).astype(np.uint8)


def attention_overlay(
    image: np.ndarray,
    att_map: np.ndarray,
    blur: bool = True,
    overlap: bool = True,
) -> np.ndarray:
    """GradCAM-style attention overlay (reference
    minigpt4/common/gradcam.py:7-25 ``getAttMap``): normalize the map,
    resize to the image, optionally gaussian-blur, jet-colormap, and
    alpha-blend with exponent 0.7.

    image: float HWC in [0, 1]; att_map: (h, w) any positive scale.
    Returns float HWC in [0, 1].  Uses cv2 (cubic resize + JET colormap) +
    scipy in place of the reference's skimage/matplotlib stack.
    """
    import cv2
    from scipy.ndimage import gaussian_filter

    img = np.asarray(image, np.float32)
    att = np.asarray(np.squeeze(att_map), np.float32)
    att = att - att.min()
    if att.max() > 0:
        att = att / att.max()
    att = cv2.resize(att, (img.shape[1], img.shape[0]),
                     interpolation=cv2.INTER_CUBIC)
    if blur:
        att = gaussian_filter(att, 0.02 * max(img.shape[:2]))
        att = att - att.min()
        if att.max() > 0:
            att = att / att.max()
    att = np.clip(att, 0.0, 1.0)
    heat = cv2.applyColorMap((att * 255).astype(np.uint8), cv2.COLORMAP_JET)
    heat = heat[..., ::-1].astype(np.float32) / 255.0  # BGR -> RGB, [0,1]
    if not overlap:
        return heat
    w = (att ** 0.7)[..., None]
    return (1 - w) * img + w * heat


def save_map_grid(path: str, images: np.ndarray, maps: np.ndarray) -> None:
    """Save a side-by-side grid of images and anomaly maps."""
    import cv2

    rows = []
    for img, m in zip(images, maps):
        img8 = np.clip(np.asarray(img) * 255 if img.max() <= 1.5 else img, 0, 255)
        rows.append(np.concatenate([img8.astype(np.uint8),
                                    overlay_mask(img8, m)], axis=1))
    cv2.imwrite(path, np.concatenate(rows, axis=0)[..., ::-1])
