"""nuScenes visualization: camera strip + colorized BEV panels.

Capability parity with reference
nuscenes/cross_view_transformer/visualizations/common.py:77 (BaseViz)
and nuscenes_viz.py:5: stitch the camera images into a strip and append
GT / predicted BEV maps, for wandb-style logging or `view_data`-style
inspection (nuscenes/scripts/view_data.py:25).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

BEV_COLOR = np.array([60, 60, 220], np.uint8)     # vehicles (BGR)
BG_COLOR = np.array([255, 255, 255], np.uint8)


def colorize_bev(bev: np.ndarray, threshold: float = 0.5) -> np.ndarray:
    """(H, W) probability/binary map -> (H, W, 3) uint8."""
    mask = bev > threshold
    img = np.tile(BG_COLOR, (*bev.shape, 1))
    img[mask] = BEV_COLOR
    return img


def camera_strip(images: np.ndarray, height: int = 160) -> np.ndarray:
    """(n, H, W, 3) float [0,1] -> one horizontal uint8 strip."""
    import cv2

    tiles = []
    for img in images:
        u8 = np.clip(img * 255, 0, 255).astype(np.uint8)
        scale = height / u8.shape[0]
        tiles.append(cv2.resize(
            u8, (int(u8.shape[1] * scale), height)))
    return np.concatenate(tiles, axis=1)


def sample_panel(batch: Dict, pred_bev: Optional[np.ndarray] = None,
                 index: int = 0) -> np.ndarray:
    """Camera strip on top; GT BEV (and prediction if given) below."""
    import cv2

    strip = camera_strip(np.asarray(batch["image"])[index])
    panels = []
    if "bev" in batch:
        gt = np.asarray(batch["bev"])[index]
        vehicle = gt.max(-1) if gt.ndim == 3 else gt
        panels.append(colorize_bev(vehicle))
    if pred_bev is not None:
        prob = 1 / (1 + np.exp(-np.asarray(pred_bev)[index, ..., 0]))
        panels.append(colorize_bev(prob))
    if panels:
        bev_row = np.concatenate(panels, axis=1)
        scale = strip.shape[1] / bev_row.shape[1]
        bev_row = cv2.resize(
            bev_row, (strip.shape[1], int(bev_row.shape[0] * scale)))
        return np.concatenate([strip, bev_row], axis=0)
    return strip
