"""Differentiable affine warping of feature maps (channels-last).

Re-derivation of the reference warp chain
(opv2v/opencood/models/sub_modules/torch_transformation_utils.py:216-355):
the reference normalizes a pixel-space affine into [-1,1] coordinates,
inverts it, builds a torch `affine_grid`, and bilinearly samples with
``align_corners=True``.  Composing those steps algebraically, the sampling
location for destination pixel p is simply ``M^{-1} @ p`` in *pixel*
coordinates, so we skip the normalize/denormalize round-trip entirely and
sample at inverse-mapped pixel coordinates.  This is exactly equivalent
(verified by golden tests against the torch reference in
tests/test_warp_parity.py) and much friendlier to XLA: one 2x2 solve plus
one fused gather.

Layout is NHWC (TPU-native); masks and features share the same code path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cobevt_tpu.geometry.transforms import (
    affine_from_discretized,
    discretize_transformation,
)


def _invert_affine_2x3(M):
    """Invert (…, 2, 3) affines: p_src = R^{-1} (p_dst - t)."""
    a, b = M[..., 0, 0], M[..., 0, 1]
    c, d = M[..., 1, 0], M[..., 1, 1]
    det = a * d - b * c
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    ia = d * inv_det
    ib = -b * inv_det
    ic = -c * inv_det
    id_ = a * inv_det
    tx, ty = M[..., 0, 2], M[..., 1, 2]
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    row0 = jnp.stack([ia, ib, itx], axis=-1)
    row1 = jnp.stack([ic, id_, ity], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def affine_grid_pixel(M, dsize, batch_shape=()):
    """Source-pixel sampling coordinates for each destination pixel.

    Args:
      M: (…, 2, 3) destination<-source pixel-space affine(s).
      dsize: (H_out, W_out) of the destination.
    Returns:
      (…, H_out, W_out, 2) array of (x, y) source pixel coordinates.
    """
    del batch_shape  # shape comes from M
    H, W = dsize
    Minv = _invert_affine_2x3(jnp.asarray(M, jnp.float32))
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)                         # (H, W)
    ones = jnp.ones_like(gx)
    p = jnp.stack([gx, gy, ones], axis=-1)                # (H, W, 3)
    coords = jnp.einsum("...ij,hwj->...hwi", Minv, p)     # (…, H, W, 2)
    return coords


def grid_sample(src, coords, mode: str = "bilinear",
                padding_mode: str = "zeros"):
    """Sample ``src`` (B, H, W, C) at pixel ``coords`` (B, Ho, Wo, 2).

    ``coords[..., 0]`` is x (width index), ``coords[..., 1]`` is y.
    Out-of-bounds samples contribute zero (``padding_mode='zeros'``),
    matching torch `grid_sample(align_corners=True, padding_mode='zeros')`
    on pixel-space coordinates.
    """
    B, H, W, C = src.shape
    Ho, Wo = coords.shape[1:3]
    x = coords[..., 0]
    y = coords[..., 1]

    def gather(ix, iy):
        idx = (iy * W + ix).reshape(B, Ho * Wo)
        flat = src.reshape(B, H * W, C)
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return out.reshape(B, Ho, Wo, C)

    if mode == "nearest":
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ix = jnp.clip(ix, 0, W - 1)
        iy = jnp.clip(iy, 0, H - 1)
        out = gather(ix, iy)
        return out * valid[..., None].astype(src.dtype)

    if mode != "bilinear":
        raise ValueError(f"unsupported mode: {mode}")

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = (x - x0f).astype(src.dtype)
    wy = (y - y0f).astype(src.dtype)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    out = jnp.zeros((B, Ho, Wo, C), src.dtype)
    for dx, dy, w in (
        (0, 0, (1 - wx) * (1 - wy)),
        (1, 0, wx * (1 - wy)),
        (0, 1, (1 - wx) * wy),
        (1, 1, wx * wy),
    ):
        ix = x0 + dx
        iy = y0 + dy
        valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        v = gather(ixc, iyc)
        out = out + v * (w * valid.astype(src.dtype))[..., None]
    return out


def warp_affine(src, M, dsize, mode: str = "bilinear"):
    """Warp (B, H, W, C) by pixel-space affines M (B, 2, 3) to ``dsize``."""
    coords = affine_grid_pixel(M, dsize)
    return grid_sample(src, coords, mode=mode)


def sttf_warp(x, transformation_matrix, discrete_ratio: float,
              downsample_rate: float):
    """Spatial-transform BEV features of every agent into the ego frame.

    Parity target: `STTF.forward` (reference opv2v/opencood/models/
    corpbevt.py:22-64): discretize the (B, L, 4, 4) agent->ego SE(3) to a
    2x3 pixel affine, then warp with a transpose+flip sandwich that maps
    the (x-forward, y-left) BEV convention onto image row/col order.

    Args:
      x: (B, L, H, W, C) per-agent BEV features (channels-last).
      transformation_matrix: (B, L, 4, 4).
    Returns:
      (B, L, H, W, C) features warped into the ego frame.
    """
    B, L, H, W, C = x.shape
    M = discretize_transformation(transformation_matrix, discrete_ratio,
                                  downsample_rate)      # (B, L, 2, 3)
    # transpose h<->w then flip the (now trailing) original-h axis
    y = jnp.flip(jnp.swapaxes(x, 2, 3), axis=3)          # (B, L, W, H, C)
    T = affine_from_discretized(M, (W, H))               # dsize=(W, H)
    y = warp_affine(y.reshape(B * L, W, H, C), T.reshape(B * L, 2, 3),
                    (W, H))
    y = y.reshape(B, L, W, H, C)
    return jnp.swapaxes(jnp.flip(y, axis=3), 2, 3)


def rotated_roi_mask(shape, transformation_matrix, discrete_ratio: float,
                     downsample_rate: float):
    """Per-agent validity mask after ego-frame warping.

    Warps an all-ones map by the same affine used for features
    (nearest-neighbor), so pixels that fall outside an agent's original
    field of view are zero.  Parity target: `get_rotated_roi`
    (reference torch_transformation_utils.py:77-105) as composed by
    `get_roi_and_cav_mask` (:11).  Returns (B, L, H, W) float32.

    Note: the reference builds the ROI mask *without* the STTF
    transpose/flip sandwich; since the mask warp of an all-ones map only
    depends on where the warped boundary lands, we mirror the reference
    exactly: plain warp of ones with `affine_from_discretized` at (H, W).
    """
    B, L, H, W = shape
    M = discretize_transformation(transformation_matrix, discrete_ratio,
                                  downsample_rate)
    T = affine_from_discretized(M, (H, W))
    ones = jnp.ones((B * L, H, W, 1), jnp.float32)
    mask = warp_affine(ones, T.reshape(B * L, 2, 3), (H, W), mode="nearest")
    return mask.reshape(B, L, H, W)


def roi_and_agent_mask(shape, agent_mask, transformation_matrix,
                       discrete_ratio: float, downsample_rate: float):
    """Combined (B, L, H, W) mask: warped ROI validity x agent validity.

    ``agent_mask`` is (B, L) with 1 for real agents, 0 for padding.
    Equivalent content to the reference's (B, H, W, 1, L) `com_mask`
    (torch_transformation_utils.py:11-49), in our canonical layout.
    """
    roi = rotated_roi_mask(shape, transformation_matrix, discrete_ratio,
                           downsample_rate)
    return roi * agent_mask[:, :, None, None].astype(roi.dtype)
