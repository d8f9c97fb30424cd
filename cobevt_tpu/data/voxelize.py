"""Host-side point-cloud voxelization (pillar generation).

Replaces the reference's spconv/cumm voxel generator dependency
(opv2v/opencood/data_utils/pre_processor, `SpVoxelPreprocessor`) with a
pure-numpy pillarizer that emits the static padded layout the jitted
pillar encoder consumes: (max_voxels, max_points, 4) features,
(max_voxels,) counts, (max_voxels, 4) [0, z, y, x] coords, valid mask.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def voxelize_points(points: np.ndarray,
                    voxel_size: Tuple[float, float, float],
                    point_cloud_range,
                    max_voxels: int = 8000,
                    max_points_per_voxel: int = 32):
    """points: (N, 4) [x y z intensity]."""
    pr = np.asarray(point_cloud_range, np.float64)
    vs = np.asarray(voxel_size, np.float64)
    grid = np.round((pr[3:] - pr[:3]) / vs).astype(np.int64)  # nx, ny, nz

    keep = np.all((points[:, :3] >= pr[:3]) &
                  (points[:, :3] < pr[3:] - 1e-9), axis=1)
    pts = points[keep]
    cell = ((pts[:, :3] - pr[:3]) / vs).astype(np.int64)
    cell = np.minimum(cell, grid - 1)
    flat = (cell[:, 2] * grid[1] * grid[0] + cell[:, 1] * grid[0] +
            cell[:, 0])

    order = np.argsort(flat, kind="stable")
    flat_sorted = flat[order]
    pts_sorted = pts[order]
    uniq, starts, counts = np.unique(flat_sorted, return_index=True,
                                     return_counts=True)

    n_vox = min(len(uniq), max_voxels)
    features = np.zeros((max_voxels, max_points_per_voxel,
                         points.shape[1]), np.float32)
    num_points = np.zeros((max_voxels,), np.int32)
    coords = np.zeros((max_voxels, 4), np.int32)
    mask = np.zeros((max_voxels,), bool)

    for vi in range(n_vox):
        s, c = starts[vi], min(counts[vi], max_points_per_voxel)
        features[vi, :c] = pts_sorted[s:s + c]
        num_points[vi] = c
        f = uniq[vi]
        z = f // (grid[1] * grid[0])
        y = (f % (grid[1] * grid[0])) // grid[0]
        x = f % grid[0]
        coords[vi] = (0, z, y, x)
        mask[vi] = True
    return {"voxel_features": features, "voxel_num_points": num_points,
            "voxel_coords": coords, "voxel_mask": mask,
            "grid_size": tuple(int(g) for g in grid)}
