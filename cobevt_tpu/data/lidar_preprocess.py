"""LiDAR host-side preprocessing: pcd IO, BEV occupancy grids,
augmentations.

Capability parity with:
  * `BevPreprocessor` — reference opv2v/opencood/data_utils/
    pre_processor/bev_preprocessor.py:10 (per-point Python loop
    vectorized into scatter ops here);
  * pcd utils — reference opv2v/opencood/utils/pcd_utils.py (open3d
    loading replaced by a self-contained .pcd parser; range/ego masks,
    shuffle, downsample);
  * `DataAugmentor` / augment_utils — reference opv2v/opencood/
    data_utils/augmentor/ (world flips, global rotation/scaling applied
    jointly to points and boxes).
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# pcd IO
# ---------------------------------------------------------------------------

def load_pcd(path: str) -> np.ndarray:
    """Parse a .pcd file (ascii or binary) into (N, 4) [x y z intensity]."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", errors="ignore").strip()
            if not line or line.startswith("#"):
                continue
            key, _, val = line.partition(" ")
            header[key.upper()] = val
            if key.upper() == "DATA":
                break
        fields = header.get("FIELDS", "x y z intensity").split()
        sizes = [int(s) for s in header.get(
            "SIZE", "4 4 4 4").split()]
        types = header.get("TYPE", "F F F F").split()
        count = int(header.get("POINTS",
                               header.get("WIDTH", "0")))
        fmt = {"F4": "f4", "F8": "f8", "U1": "u1", "U2": "u2",
               "U4": "u4", "I1": "i1", "I2": "i2", "I4": "i4"}
        dtype = np.dtype([(name, fmt[f"{t}{s}"]) for name, t, s in
                          zip(fields, types, sizes)])
        if header["DATA"].startswith("ascii"):
            raw = np.loadtxt(f, dtype=np.float64, max_rows=count)
            data = {name: raw[:, i] for i, name in enumerate(fields)}
        else:
            arr = np.frombuffer(f.read(dtype.itemsize * count),
                                dtype=dtype, count=count)
            data = {name: arr[name].astype(np.float64)
                    for name in fields}
    cols = [data.get(k, np.zeros(count)) for k in
            ("x", "y", "z", "intensity")]
    return np.stack(cols, axis=-1).astype(np.float32)


def mask_points_by_range(points: np.ndarray, limit_range) -> np.ndarray:
    lr = np.asarray(limit_range)
    keep = np.all((points[:, :3] >= lr[:3]) & (points[:, :3] <= lr[3:]),
                  axis=1)
    return points[keep]


def mask_ego_points(points: np.ndarray,
                    ego_range=(-1.95, -1.1, 2.95, 1.1)) -> np.ndarray:
    """Remove the ego vehicle's own returns (reference pcd_utils.py)."""
    x1, y1, x2, y2 = ego_range
    inside = ((points[:, 0] >= x1) & (points[:, 0] <= x2) &
              (points[:, 1] >= y1) & (points[:, 1] <= y2))
    return points[~inside]


def shuffle_points(points: np.ndarray,
                   rng: Optional[np.random.RandomState] = None):
    rng = rng or np.random
    idx = rng.permutation(points.shape[0])
    return points[idx]


def downsample_points(points: np.ndarray, num: int,
                      rng: Optional[np.random.RandomState] = None):
    """Random sample to exactly `num` points (pad by resampling)."""
    rng = rng or np.random
    n = points.shape[0]
    if n >= num:
        idx = rng.choice(n, num, replace=False)
    else:
        idx = np.concatenate([np.arange(n),
                              rng.choice(n, num - n, replace=True)])
    return points[idx]


# ---------------------------------------------------------------------------
# BEV occupancy grid
# ---------------------------------------------------------------------------

def points_to_bev(points: np.ndarray, geometry: Dict) -> np.ndarray:
    """(N, 4) points -> (H, W, D+1) occupancy + mean-intensity grid.

    geometry: dict with L1/W1/H1, res, input_shape (as produced by
    cobevt_tpu.configs.hypes.load_bev_params).  Channel layout matches
    the reference (last channel = mean intensity)."""
    shape = tuple(geometry["input_shape"])
    bev = np.zeros(shape, np.float32)
    counts = np.zeros(shape[:2], np.int64)
    origin = np.array([geometry["L1"], geometry["W1"], geometry["H1"]])
    idx = ((points[:, :3] - origin) / geometry["res"]).astype(np.int64)
    keep = np.all((idx >= 0) & (idx < np.array(shape) - np.array(
        [0, 0, 1])), axis=1)
    idx = idx[keep]
    pts = points[keep]
    bev[idx[:, 0], idx[:, 1], idx[:, 2]] = 1
    np.add.at(bev, (idx[:, 0], idx[:, 1],
                    np.full(len(idx), shape[2] - 1)), pts[:, 3])
    np.add.at(counts, (idx[:, 0], idx[:, 1]), 1)
    nz = counts > 0
    bev[nz, -1] /= counts[nz]
    return bev


# ---------------------------------------------------------------------------
# augmentations (points + boxes jointly)
# ---------------------------------------------------------------------------

def random_flip_along_x(boxes, points, rng):
    if rng.rand() < 0.5:
        boxes = boxes.copy()
        points = points.copy()
        boxes[:, 1] = -boxes[:, 1]
        boxes[:, 6] = -boxes[:, 6]
        points[:, 1] = -points[:, 1]
    return boxes, points


def random_flip_along_y(boxes, points, rng):
    if rng.rand() < 0.5:
        boxes = boxes.copy()
        points = points.copy()
        boxes[:, 0] = -boxes[:, 0]
        boxes[:, 6] = -(boxes[:, 6] + np.pi)
        points[:, 0] = -points[:, 0]
    return boxes, points


def global_rotation(boxes, points, rot_range, rng):
    angle = rng.uniform(rot_range[0], rot_range[1])
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, -s], [s, c]])
    points = points.copy()
    boxes = boxes.copy()
    points[:, :2] = points[:, :2] @ R.T
    boxes[:, :2] = boxes[:, :2] @ R.T
    boxes[:, 6] += angle
    return boxes, points


def global_scaling(boxes, points, scale_range, rng):
    s = rng.uniform(scale_range[0], scale_range[1])
    points = points.copy()
    boxes = boxes.copy()
    points[:, :3] *= s
    boxes[:, :6] *= s
    return boxes, points


class DataAugmentor:
    """Configurable augmentation chain (reference data_augmentor.py:11)."""

    def __init__(self, config=None, seed: int = 0):
        self.config = config or [
            {"name": "random_world_flip", "along_axis_list": ["x"]},
            {"name": "random_world_rotation",
             "world_rot_angle": [-0.78539816, 0.78539816]},
            {"name": "random_world_scaling",
             "world_scale_range": [0.95, 1.05]},
        ]
        self.rng = np.random.RandomState(seed)

    def __call__(self, boxes, points):
        for cfg in self.config:
            if cfg["name"] == "random_world_flip":
                for axis in cfg["along_axis_list"]:
                    fn = (random_flip_along_x if axis == "x"
                          else random_flip_along_y)
                    boxes, points = fn(boxes, points, self.rng)
            elif cfg["name"] == "random_world_rotation":
                boxes, points = global_rotation(
                    boxes, points, cfg["world_rot_angle"], self.rng)
            elif cfg["name"] == "random_world_scaling":
                boxes, points = global_scaling(
                    boxes, points, cfg["world_scale_range"], self.rng)
        return boxes, points
