"""Data frontend tests on synthetic fixtures (no 60GB datasets needed)."""

import json
import os

import numpy as np
import pytest

from cobevt_tpu.data.labels import decode_binary_maps, encode_binary_maps
from cobevt_tpu.data.loader import DataLoader
from cobevt_tpu.data.nuscenes_gen import (
    ImageConfig,
    NuScenesGeneratedDataset,
)
from cobevt_tpu.data.opv2v import (
    OPV2VCameraDataset,
    OPV2VScenarioDatabase,
    WildConfig,
    generate_bev_label,
    merge_static_labels,
)

cv2 = pytest.importorskip("cv2")
from PIL import Image

IMG = 64
BEV = 32


def write_opv2v_fixture(root, n_scenarios=2, n_cavs=3, n_stamps=3):
    rng = np.random.RandomState(0)
    for s in range(n_scenarios):
        for c in range(n_cavs):
            cav_dir = os.path.join(root, f"scenario_{s}", str(100 + c))
            os.makedirs(cav_dir, exist_ok=True)
            for t in range(n_stamps):
                ts = f"{t:06d}"
                pose = [10.0 * c + t, 5.0 * s, 0.0, 0.0, 15.0 * c, 0.0]
                params = {
                    "lidar_pose": pose,
                    "true_ego_pos": pose,
                }
                for m in range(4):
                    params[f"camera{m}"] = {
                        "cords": [pose[0], pose[1] + 0.5 * m, 1.8,
                                  0.0, pose[4] + 90.0 * m, 0.0],
                        "intrinsic": [[60.0, 0, IMG / 2],
                                      [0, 60.0, IMG / 2],
                                      [0, 0, 1]],
                        "extrinsic": np.eye(4).tolist(),
                    }
                import yaml
                with open(os.path.join(cav_dir, f"{ts}.yaml"), "w") as f:
                    yaml.safe_dump(params, f)
                for m in range(4):
                    img = rng.randint(0, 255, (IMG, IMG, 3), np.uint8)
                    cv2.imwrite(os.path.join(
                        cav_dir, f"{ts}_camera{m}.png"), img)
                for ext in ("bev_dynamic.png", "bev_static.png",
                            "bev_lane.png", "bev_visibility.png",
                            "bev_visibility_corp.png"):
                    lab = (rng.rand(BEV, BEV) > 0.7).astype(np.uint8) * 255
                    cv2.imwrite(os.path.join(cav_dir, f"{ts}_{ext}"),
                                np.stack([lab] * 3, -1))


def test_opv2v_dataset_end_to_end(tmp_path):
    root = str(tmp_path / "train")
    write_opv2v_fixture(root)
    db = OPV2VScenarioDatabase(root, max_cav=4)
    assert len(db) == 6          # 2 scenarios x 3 timestamps

    ds = OPV2VCameraDataset(db, image_hw=(IMG, IMG), bev_hw=(BEV, BEV))
    sample = ds[0]
    assert sample["inputs"].shape == (4, 4, IMG, IMG, 3)
    assert sample["intrinsic"].shape == (4, 4, 3, 3)
    assert sample["transformation_matrix"].shape == (4, 4, 4)
    assert sample["pairwise_t_matrix"].shape == (4, 4, 4, 4)
    assert sample["agent_mask"].sum() == 3          # 3 CAVs present
    assert sample["gt_dynamic"].shape == (1, BEV, BEV)
    assert set(np.unique(sample["gt_static"])) <= {0, 1, 2}

    # ego transformation must be identity
    np.testing.assert_allclose(sample["transformation_matrix"][0],
                               np.eye(4), atol=1e-5)
    # pairwise consistency: T[i->j] == inv(T_j->ego) @ T_i->ego
    T = sample["transformation_matrix"]
    P = sample["pairwise_t_matrix"]
    np.testing.assert_allclose(
        P[1, 2], np.linalg.inv(T[2]) @ T[1], atol=1e-4)

    loader = DataLoader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["inputs"].shape == (2, 4, 4, IMG, IMG, 3)


def test_opv2v_wild_settings(tmp_path):
    root = str(tmp_path / "train")
    write_opv2v_fixture(root, n_stamps=4)
    db = OPV2VScenarioDatabase(root, max_cav=4)
    wild = WildConfig(async_flag=True, async_mode="sim",
                      async_overhead=100, loc_err_flag=True,
                      xyz_noise_std=0.5, ryp_noise_std=0.2)
    ds = OPV2VCameraDataset(db, image_hw=(IMG, IMG), bev_hw=(BEV, BEV),
                            wild=wild)
    clean = OPV2VCameraDataset(db, image_hw=(IMG, IMG), bev_hw=(BEV, BEV))
    s_wild = ds[3]      # timestamp index 3 -> delay of 1 frame possible
    s_clean = clean[3]
    # ego row unaffected by noise
    np.testing.assert_allclose(s_wild["transformation_matrix"][0],
                               np.eye(4), atol=1e-5)
    # neighbor transforms perturbed
    assert not np.allclose(s_wild["transformation_matrix"][1],
                           s_clean["transformation_matrix"][1])


def test_label_codec_roundtrip():
    rng = np.random.RandomState(1)
    x = (rng.rand(16, 16, 12) > 0.5).astype(np.uint8) * 255
    enc = encode_binary_maps(x)
    dec = decode_binary_maps(enc, 12)
    np.testing.assert_array_equal(dec, (x > 0).astype(np.int32))


def test_label_merge():
    road = np.zeros((4, 4), np.float32)
    lane = np.zeros((4, 4), np.float32)
    road[1, 1] = 1
    lane[2, 2] = 1
    lane[1, 1] = 1      # lane wins over road
    m = merge_static_labels(road, lane)
    assert m[1, 1] == 2 and m[2, 2] == 2 and m[0, 0] == 0


def test_nuscenes_generated_reader(tmp_path):
    scene = "scene-0001"
    labels_dir = tmp_path / "labels"
    dataset_dir = tmp_path / "data"
    (labels_dir / scene).mkdir(parents=True)
    dataset_dir.mkdir()

    rng = np.random.RandomState(2)
    n_cam = 2
    H0, W0 = 90, 160
    samples = []
    for i in range(3):
        img_paths = []
        for c in range(n_cam):
            p = f"img_{i}_{c}.jpg"
            Image.fromarray(rng.randint(0, 255, (H0, W0, 3),
                                        np.uint8)).save(dataset_dir / p)
            img_paths.append(p)
        bev = (rng.rand(32, 32, 12) > 0.8).astype(np.uint8) * 255
        Image.fromarray(encode_binary_maps(bev)).save(
            labels_dir / scene / f"bev_{i}.png")
        Image.fromarray(rng.randint(0, 5, (32, 32),
                                    np.uint8)).save(
            labels_dir / scene / f"visibility_{i}.png")
        aux = rng.rand(32, 32, 2).astype(np.float32)
        np.savez_compressed(labels_dir / scene / f"aux_{i}.npz", aux=aux)
        samples.append({
            "scene": scene,
            "token": str(i),
            "images": img_paths,
            "intrinsics": [[[100.0, 0, 80], [0, 100.0, 45],
                            [0, 0, 1]]] * n_cam,
            "extrinsics": [np.eye(4).tolist()] * n_cam,
            "view": np.eye(3).tolist(),
            "bev": f"bev_{i}.png",
            "visibility": f"visibility_{i}.png",
            "aux": f"aux_{i}.npz",
            "pose": np.eye(4).tolist(),
        })
    with open(labels_dir / f"{scene}.json", "w") as f:
        json.dump(samples, f)

    cfg = ImageConfig(h=32, w=64, top_crop=8)
    ds = NuScenesGeneratedDataset(scene, str(dataset_dir),
                                  str(labels_dir), cfg)
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].shape == (n_cam, 32, 64, 3)
    assert s["bev"].shape == (32, 32, 12)
    assert s["center"].shape == (32, 32, 1)
    assert s["visibility"].shape == (32, 32)
    # intrinsic rescale: fx scaled by w_resize / W0
    np.testing.assert_allclose(s["intrinsics"][0, 0, 0],
                               100.0 * 64 / W0, rtol=1e-5)
    # principal point shifted by crop
    np.testing.assert_allclose(
        s["intrinsics"][0, 1, 2], 45.0 * (32 + 8) / H0 - 8, rtol=1e-5)


def test_loader_early_break_no_leak(tmp_path):
    import threading

    root = str(tmp_path / "train")
    write_opv2v_fixture(root, n_scenarios=1, n_cavs=2, n_stamps=3)
    db = OPV2VScenarioDatabase(root, max_cav=2)
    ds = OPV2VCameraDataset(db, image_hw=(IMG, IMG), bev_hw=(BEV, BEV))
    loader = DataLoader(ds, batch_size=1, shuffle=False,
                        drop_last=False, prefetch=1)
    before = threading.active_count()
    for _ in range(3):
        for batch in loader:
            break                      # abandon mid-epoch
    import time
    time.sleep(0.5)
    assert threading.active_count() <= before + 1


def test_uint8_contract_matches_f32(tmp_path):
    """normalize=False (uint8 host contract + on-device normalize) must
    produce numerics identical to the host-normalized f32 contract."""
    import jax
    import jax.numpy as jnp

    from cobevt_tpu.nn.layers import images_from_uint8

    root = str(tmp_path / "opv2v")
    os.makedirs(root)
    write_opv2v_fixture(root, n_scenarios=1, n_cavs=2, n_stamps=2)
    db = OPV2VScenarioDatabase(root, max_cav=2)
    ds_f32 = OPV2VCameraDataset(db, image_hw=(IMG, IMG),
                                bev_hw=(BEV, BEV))
    ds_u8 = OPV2VCameraDataset(db, image_hw=(IMG, IMG), bev_hw=(BEV, BEV),
                               normalize=False)
    s_f32, s_u8 = ds_f32[0], ds_u8[0]
    assert s_u8["inputs"].dtype == np.uint8
    dev = np.asarray(images_from_uint8(jnp.asarray(s_u8["inputs"])))
    np.testing.assert_allclose(dev, s_f32["inputs"], atol=1e-6)
    # everything non-image identical
    for k in s_f32:
        if k != "inputs":
            np.testing.assert_array_equal(s_f32[k], s_u8[k])


def test_cached_dataset_roundtrip(tmp_path):
    from cobevt_tpu.data.cache import CachedDataset

    root = str(tmp_path / "opv2v")
    os.makedirs(root)
    write_opv2v_fixture(root, n_scenarios=1, n_cavs=2, n_stamps=3)
    db = OPV2VScenarioDatabase(root, max_cav=2)
    ds = OPV2VCameraDataset(db, image_hw=(IMG, IMG), bev_hw=(BEV, BEV),
                            normalize=False)
    cached = CachedDataset(ds, str(tmp_path / "cache"))
    assert len(cached) == len(ds)
    direct = ds[1]
    assert cached.warm() == len(ds)
    assert cached.warm() == 0          # second pass: everything cached
    from_cache = cached[1]
    assert set(from_cache) == set(direct)
    for k in direct:
        np.testing.assert_array_equal(from_cache[k], direct[k])
        assert from_cache[k].dtype == direct[k].dtype
    # collate passthrough works on cached samples
    batch = cached.collate([cached[0], cached[1]])
    assert batch["inputs"].shape[0] == 2


def test_nuscenes_raw_uint8_contract(tmp_path):
    from cobevt_tpu.data.nuscenes_gen import (
        ImageConfig,
        load_image_with_intrinsics,
    )

    rng = np.random.RandomState(0)
    p = str(tmp_path / "img.jpg")
    Image.fromarray(rng.randint(0, 255, (90, 160, 3), np.uint8)).save(p)
    K = [[100.0, 0, 80], [0, 100.0, 45], [0, 0, 1]]
    cfg = ImageConfig(h=32, w=64, top_crop=8)
    f32, K1 = load_image_with_intrinsics(p, K, cfg)
    u8, K2 = load_image_with_intrinsics(p, K, cfg, as_uint8=True)
    assert u8.dtype == np.uint8 and f32.dtype == np.float32
    np.testing.assert_allclose(u8.astype(np.float32) / 255.0, f32,
                               atol=1e-6)
    np.testing.assert_array_equal(K1, K2)
