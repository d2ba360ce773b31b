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


def save_map_grid(path: str, images: np.ndarray, maps: np.ndarray) -> None:
    """Save a side-by-side grid of images and anomaly maps."""
    import cv2

    rows = []
    for img, m in zip(images, maps):
        img8 = np.clip(np.asarray(img) * 255 if img.max() <= 1.5 else img, 0, 255)
        rows.append(np.concatenate([img8.astype(np.uint8),
                                    overlay_mask(img8, m)], axis=1))
    cv2.imwrite(path, np.concatenate(rows, axis=0)[..., ::-1])
