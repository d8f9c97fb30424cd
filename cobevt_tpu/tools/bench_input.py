"""Host input-pipeline throughput benchmark (INPUT_r0N.json).

Every training-economics claim assumes the host can feed the chip; this
tool measures that directly.  It builds a synthetic on-disk fixture at
realistic scale — an OPV2V scenario tree (5 CAVs x 4 cameras, 800x600
PNGs like the real capture, per-timestamp YAML, 256^2 BEV label PNGs)
and a generated nuScenes label dir (6-cam 1600x900 JPEGs, bit-packed
label PNGs, aux NPZ) — then times the production loaders end-to-end
(decode -> resize -> normalize/contract -> collate) in samples/s and
compares against the device step rates from TRAIN_r0N.json.

Pipelines measured per track:
  * f32      — the reference-parity contract (host ImageNet-normalizes,
               ships f32);
  * u8       — the uint8 contract (host ships resized uint8, the model
               normalizes on device: nn/layers.py:images_from_uint8);
  * u8+cache — uint8 + data/cache.py CachedDataset (decode once, then
               raw sequential reads).

Reference counterpart being measured against:
opv2v/opencood/data_utils/datasets/basedataset.py:279-281 (YAML+4 PNG
reads per agent per sample) behind 8 torch worker processes
(opv2v/opencood/tools/train_camera.py:59-83).  This box has ONE core,
so process masking is unavailable — the pipelines above attack the
per-sample cost instead.

  python -m cobevt_tpu.tools.bench_input --root /tmp/input_fixture \
      [--opv2v_frames 40] [--nusc_frames 48] [--grain]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def synth_camera(rng, h, w):
    """Road-scene-like frame: smooth gradients + hard structures, so
    PNG/JPEG entropy (and thus decode cost) is realistic — pure noise
    barely compresses, flat color over-compresses."""
    yy = np.broadcast_to(
        np.linspace(0, 1, h, dtype=np.float32)[:, None], (h, w))
    xx = np.broadcast_to(
        np.linspace(0, 1, w, dtype=np.float32)[None, :], (h, w))
    base = np.stack([120 + 80 * yy,
                     100 + 60 * (1 - yy) + 20 * xx,
                     90 + 90 * xx], -1)
    img = base + rng.normal(0, 6, (h, w, 3))
    for _ in range(12):                       # boxes: cars/buildings
        y0, x0 = rng.randint(0, h - 40), rng.randint(0, w - 60)
        hh, ww = rng.randint(20, 160), rng.randint(30, 240)
        img[y0:y0 + hh, x0:x0 + ww] = rng.randint(0, 255, 3)
    return np.clip(img, 0, 255).astype(np.uint8)


def build_opv2v_fixture(root, n_frames, n_cavs=5, cam_hw=(600, 800)):
    import cv2
    import yaml

    rng = np.random.RandomState(0)
    made = 0
    for c in range(n_cavs):
        cav_dir = os.path.join(root, "scenario_0", str(100 + c))
        os.makedirs(cav_dir, exist_ok=True)
        for t in range(n_frames):
            ts = f"{t:06d}"
            ypath = os.path.join(cav_dir, f"{ts}.yaml")
            if os.path.exists(ypath):
                continue
            pose = [2.0 * c + 0.3 * t, 1.5 * c, 0.0, 0.0, 10.0 * c, 0.0]
            params = {"lidar_pose": pose, "true_ego_pos": pose}
            for m in range(4):
                params[f"camera{m}"] = {
                    "cords": [pose[0], pose[1] + 0.5 * m, 1.8, 0.0,
                              pose[4] + 90.0 * m, 0.0],
                    "intrinsic": [[460.0, 0, cam_hw[1] / 2],
                                  [0, 460.0, cam_hw[0] / 2], [0, 0, 1]],
                    "extrinsic": np.eye(4).tolist(),
                }
            with open(ypath, "w") as f:
                yaml.safe_dump(params, f)
            for m in range(4):
                cv2.imwrite(os.path.join(cav_dir, f"{ts}_camera{m}.png"),
                            synth_camera(rng, *cam_hw))
            for ext in ("bev_dynamic.png", "bev_static.png",
                        "bev_lane.png", "bev_visibility.png",
                        "bev_visibility_corp.png"):
                lab = (rng.rand(256, 256) > 0.85).astype(np.uint8) * 255
                cv2.imwrite(os.path.join(cav_dir, f"{ts}_{ext}"),
                            np.stack([lab] * 3, -1))
            made += 1
    return made


def build_nuscenes_fixture(root, n_frames, n_cam=6, cam_hw=(900, 1600)):
    from PIL import Image

    from cobevt_tpu.data.labels import encode_binary_maps

    scene = "scene-0001"
    labels_dir = os.path.join(root, "labels", scene)
    data_dir = os.path.join(root, "data")
    os.makedirs(labels_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)
    index = os.path.join(root, "labels", f"{scene}.json")
    if os.path.exists(index):
        return 0

    rng = np.random.RandomState(1)
    samples = []
    for i in range(n_frames):
        img_paths = []
        for c in range(n_cam):
            p = f"img_{i}_{c}.jpg"
            Image.fromarray(synth_camera(rng, *cam_hw)).save(
                os.path.join(data_dir, p), quality=90)
            img_paths.append(p)
        bev = (rng.rand(200, 200, 12) > 0.9).astype(np.uint8) * 255
        Image.fromarray(encode_binary_maps(bev)).save(
            os.path.join(labels_dir, f"bev_{i}.png"))
        Image.fromarray(rng.randint(0, 5, (200, 200), np.uint8)).save(
            os.path.join(labels_dir, f"visibility_{i}.png"))
        np.savez_compressed(os.path.join(labels_dir, f"aux_{i}.npz"),
                            aux=rng.rand(200, 200, 2).astype(np.float32))
        samples.append({
            "scene": scene, "token": str(i), "images": img_paths,
            "intrinsics": [[[1260.0, 0, 800], [0, 1260.0, 450],
                            [0, 0, 1]]] * n_cam,
            "extrinsics": [np.eye(4).tolist()] * n_cam,
            "view": np.eye(3).tolist(),
            "bev": f"bev_{i}.png", "visibility": f"visibility_{i}.png",
            "aux": f"aux_{i}.npz", "pose": np.eye(4).tolist(),
        })
    with open(index, "w") as f:
        json.dump(samples, f)
    return n_frames


def time_loader(loader, max_seconds=60.0, min_batches=4):
    """Samples/s over one pass (bounded): wall time includes decode,
    transform, and collate; thread prefetch overlap counts (that is the
    production configuration)."""
    n_samples = 0
    n_batches = 0
    t0 = time.perf_counter()
    for batch in loader:
        first = next(iter(batch.values()))
        n_samples += len(first)
        n_batches += 1
        if (time.perf_counter() - t0 > max_seconds
                and n_batches >= min_batches):
            break
    dt = time.perf_counter() - t0
    return n_samples / dt, n_samples


def bench_track(name, make_dataset, batch_size, device_rate, cache_root,
                use_grain, results):
    from cobevt_tpu.data.cache import CachedDataset
    from cobevt_tpu.data.loader import DataLoader

    def report(pipeline, sps, n):
        row = {
            "track": name, "pipeline": pipeline,
            "samples_per_sec": round(sps, 2), "samples_timed": n,
            "batch": batch_size, "device_rate": device_rate,
            "feeds_chip": bool(sps >= device_rate),
            "host_over_device": round(sps / device_rate, 2),
        }
        results.append(row)
        print(json.dumps(row))

    for pipeline, kwargs in (("f32", {"normalize": True}),
                             ("u8", {"normalize": False})):
        ds = make_dataset(**kwargs)
        loader = DataLoader(ds, batch_size, shuffle=False, drop_last=False)
        sps, n = time_loader(loader)
        report(pipeline, sps, n)

    # uint8 + on-disk cache: warm pass (= first epoch, already measured
    # above as "u8"), then steady-state epochs from raw arrays
    ds = CachedDataset(make_dataset(normalize=False),
                       os.path.join(cache_root, name))
    ds.warm()
    loader = DataLoader(ds, batch_size, shuffle=False, drop_last=False,
                        collate=ds.collate)
    sps, n = time_loader(loader)
    report("u8+cache", sps, n)

    if use_grain:
        # cold-path worker-scaling curve (VERDICT r4 #4): the reference
        # masks its decode cost with 8 torch worker processes
        # (train_camera.py:59-83); grain mp workers are the equivalent
        # here.  On a 1-core host the curve is flat-to-negative — that
        # IS the result: the bound is cores, not the loader.
        from cobevt_tpu.data.grain_loader import make_grain_loader

        for workers in (1, 2, 4):
            if workers > 2 * (os.cpu_count() or 1):
                break
            it = make_grain_loader(make_dataset(normalize=False),
                                   batch_size, shuffle=False,
                                   num_epochs=1, num_workers=workers,
                                   drop_remainder=False)
            sps, n = time_loader(it)
            report(f"u8+grain_mp{workers}", sps, n)


def main():
    p = argparse.ArgumentParser("cobevt_tpu input-pipeline benchmark")
    p.add_argument("--root", default="/tmp/cobevt_input_fixture")
    p.add_argument("--opv2v_frames", type=int, default=40)
    p.add_argument("--nusc_frames", type=int, default=48)
    p.add_argument("--corpbevt_device_rate", type=float, default=11.9,
                   help="device samples/s to compare against "
                        "(TRAIN_r0N.json corpbevt batch-1)")
    p.add_argument("--sinbevt_device_rate", type=float, default=57.3,
                   help="device samples/s (TRAIN_r0N.json sinbevt b8)")
    p.add_argument("--grain", action="store_true",
                   help="also bench grain mp workers (pointless on a "
                        "1-core host; kept for wider machines)")
    opt = p.parse_args()

    t0 = time.perf_counter()
    made_o = build_opv2v_fixture(os.path.join(opt.root, "opv2v"),
                                 opt.opv2v_frames)
    made_n = build_nuscenes_fixture(os.path.join(opt.root, "nuscenes"),
                                    opt.nusc_frames)
    print(json.dumps({"fixture": opt.root, "opv2v_frames_built": made_o,
                      "nusc_frames_built": made_n,
                      "build_secs": round(time.perf_counter() - t0, 1),
                      "host_cores": os.cpu_count()}))

    from cobevt_tpu.data.nuscenes_gen import (
        ImageConfig,
        NuScenesGeneratedDataset,
    )
    from cobevt_tpu.data.opv2v import (
        OPV2VCameraDataset,
        OPV2VScenarioDatabase,
    )

    results = []
    db = OPV2VScenarioDatabase(os.path.join(opt.root, "opv2v"), max_cav=5)

    def make_opv2v(normalize=True):
        return OPV2VCameraDataset(db, image_hw=(512, 512),
                                  normalize=normalize)

    def make_nusc(normalize=True):
        return NuScenesGeneratedDataset(
            "scene-0001", os.path.join(opt.root, "nuscenes", "data"),
            os.path.join(opt.root, "nuscenes", "labels"), ImageConfig(),
            raw_uint8=not normalize)

    cache_root = os.path.join(opt.root, "cache")
    bench_track("corpbevt_opv2v", make_opv2v, 1,
                opt.corpbevt_device_rate, cache_root, opt.grain, results)
    bench_track("sinbevt_nuscenes", make_nusc, 8,
                opt.sinbevt_device_rate, cache_root, opt.grain, results)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
