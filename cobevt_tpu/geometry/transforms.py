"""Pose and grid math shared by both dataset tracks.

Behavioral parity targets (semantics only, re-derived here):
  * CARLA pose -> SE(3):   reference opv2v/opencood/utils/transformation_utils.py:8
  * relative pose x1->x2:  reference .../transformation_utils.py:52
  * BEV view matrix:       reference nuscenes/cross_view_transformer/data/common.py:18
                           and opv2v/opencood/models/sub_modules/fax_modules.py:24
  * normalized pixel grid: reference .../fax_modules.py:13 (generate_grid)
  * discretized 2D warp:   reference opv2v/opencood/models/sub_modules/
                           torch_transformation_utils.py:108,254,282

All functions work on both numpy and jax arrays (they only use the
`jnp`/`np`-common API) unless stated otherwise.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def x_to_world(pose) -> np.ndarray:
    """SE(3) matrix taking the `pose` frame to the CARLA world frame.

    ``pose`` is the 6-dof CARLA convention ``[x, y, z, roll, yaw, pitch]``
    in meters/degrees.  Host-side (numpy) — used by the OPV2V dataset
    frontend, never inside jit.
    """
    x, y, z, roll, yaw, pitch = (float(v) for v in pose[:6])
    cy, sy = np.cos(np.radians(yaw)), np.sin(np.radians(yaw))
    cr, sr = np.cos(np.radians(roll)), np.sin(np.radians(roll))
    cp, sp = np.cos(np.radians(pitch)), np.sin(np.radians(pitch))

    m = np.identity(4)
    m[:3, 3] = (x, y, z)
    m[0, 0] = cp * cy
    m[0, 1] = cy * sp * sr - sy * cr
    m[0, 2] = -cy * sp * cr - sy * sr
    m[1, 0] = sy * cp
    m[1, 1] = sy * sp * sr + cy * cr
    m[1, 2] = -sy * sp * cr + cy * sr
    m[2, 0] = sp
    m[2, 1] = -cp * sr
    m[2, 2] = cp * cr
    return m


def x1_to_x2(x1, x2) -> np.ndarray:
    """SE(3) transform from frame ``x1`` to frame ``x2`` (both CARLA poses)."""
    return np.linalg.inv(x_to_world(x2)) @ x_to_world(x1)


def get_view_matrix(h: int = 200, w: int = 200, h_meters: float = 100.0,
                    w_meters: float = 100.0, offset: float = 0.0) -> np.ndarray:
    """3x3 matrix mapping ego-frame meters (x fwd, y left) to BEV pixels."""
    sh = h / h_meters
    sw = w / w_meters
    return np.float32([
        [0.0, -sw, w / 2.0],
        [-sh, 0.0, h * offset + h / 2.0],
        [0.0, 0.0, 1.0],
    ])


def generate_grid(height: int, width: int) -> np.ndarray:
    """Homogeneous normalized pixel grid, shape (3, height, width).

    Channel 0 is x in [0, 1] (varies along width), channel 1 is y in
    [0, 1] (varies along height), channel 2 is 1.
    """
    xs = np.linspace(0.0, 1.0, width, dtype=np.float32)
    ys = np.linspace(0.0, 1.0, height, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys)                      # (h, w) each
    ones = np.ones_like(gx)
    return np.stack([gx, gy, ones], axis=0)


def discretize_transformation(matrix, discrete_ratio: float,
                              downsample_rate: float):
    """(…, 4, 4) SE(3) -> (…, 2, 3) pixel-space 2D affine.

    Keeps rows {0,1} and columns {0,1,3}; divides the translation column
    by ``discrete_ratio * downsample_rate`` (meters -> feature pixels).
    """
    matrix = jnp.asarray(matrix)
    sub = matrix[..., :2, :][..., :, [0, 1, 3]]
    scale = 1.0 / (discrete_ratio * downsample_rate)
    return sub.at[..., :, -1].multiply(scale).astype(jnp.float32)


def rotation_matrix_about_center(M, dsize):
    """Recentre the linear part of a (…, 2, 3) affine about the image center.

    Returns shift(c) @ [[R, 0], [0, 1]] @ shift(-c) restricted to (…, 2, 3),
    where R = M[..., :2, :2] and c = (W/2, H/2).
    """
    M = jnp.asarray(M)
    H, W = dsize
    cx, cy = W / 2.0, H / 2.0
    R = M[..., :2, :2]
    # Affine about center: out = R @ (p - c) + c  => linear R, trans c - R @ c.
    c = jnp.asarray([cx, cy], dtype=M.dtype)
    t = c - jnp.einsum("...ij,j->...i", R, c)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def affine_from_discretized(M, dsize):
    """Full 2x3 warp matrix: center-rotation plus the raw translation.

    Mirrors `get_transformation_matrix`
    (reference torch_transformation_utils.py:282): the rotation acts about
    the image center and the discretized translation is added on top.
    """
    T = rotation_matrix_about_center(M, dsize)
    return T.at[..., :, 2].add(jnp.asarray(M)[..., :, 2])
