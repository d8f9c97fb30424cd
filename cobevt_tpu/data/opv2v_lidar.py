"""OPV2V cooperative LiDAR dataset (intermediate fusion, detection task).

The camera-only reference mirror registers no LiDAR dataset
(opv2v/opencood/data_utils/datasets/__init__.py:5-9); the paper's
OPV2V-LiDAR experiments build on the OpenCOOD pieces the mirror ships
(pillar encoders, voxel postprocessor, augmentor).  This dataset
composes our parity-tested equivalents end-to-end: walk the same
scenario tree, load each in-range CAV's .pcd, mask range/ego points,
(optionally) augment, voxelize to the static padded pillar layout, and
emit anchor classification/regression targets in the ego frame.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from cobevt_tpu.data.lidar_preprocess import (
    DataAugmentor,
    load_pcd,
    mask_ego_points,
    mask_points_by_range,
)
from cobevt_tpu.data.objects import generate_object_center
from cobevt_tpu.data.opv2v import (
    COM_RANGE,
    OPV2VScenarioDatabase,
    load_scenario_yaml,
)
from cobevt_tpu.data.voxelize import voxelize_points
from cobevt_tpu.geometry.transforms import x1_to_x2
from cobevt_tpu.postprocess.voxel_postprocessor import VoxelPostprocessor


class OPV2VLidarDataset:
    def __init__(self, db: OPV2VScenarioDatabase,
                 postprocessor: VoxelPostprocessor,
                 voxel_size=(0.4, 0.4, 4.0),
                 lidar_range=(-70.4, -40, -3, 70.4, 40, 1),
                 max_voxels: int = 8000,
                 max_points_per_voxel: int = 32,
                 max_objects: int = 100,
                 augment: bool = False,
                 train: bool = True,
                 seed: int = 0):
        self.db = db
        self.post = postprocessor
        self.voxel_size = voxel_size
        self.lidar_range = lidar_range
        self.max_voxels = max_voxels
        self.max_ppv = max_points_per_voxel
        self.max_objects = max_objects
        self.train = train
        self.augmentor = DataAugmentor(seed=seed) if augment else None
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.db)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        scenario, t_index = self.db.locate(idx)
        cav_ids = list(scenario.keys())
        ego_entries = scenario[cav_ids[0]]["entries"]
        ts = list(ego_entries.keys())[t_index]
        ego_params = load_scenario_yaml(ego_entries[ts]["yaml"])
        ego_pose = ego_params["lidar_pose"]

        L = self.db.max_cav
        N, P = self.max_voxels, self.max_ppv
        voxel_features = np.zeros((L, N, P, 4), np.float32)
        voxel_nums = np.zeros((L, N), np.int32)
        voxel_coords = np.zeros((L, N, 4), np.int32)
        voxel_mask = np.zeros((L, N), bool)
        tmat = np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
        agent_mask = np.zeros((L,), np.float32)

        cav_params_list = []
        slot = 0
        for cav_id in cav_ids:
            cav = scenario[cav_id]
            entries = cav["entries"]
            if ts not in entries or slot >= L:
                continue
            params = load_scenario_yaml(entries[ts]["yaml"])
            pose = params["lidar_pose"]
            if math.hypot(pose[0] - ego_pose[0],
                          pose[1] - ego_pose[1]) > COM_RANGE:
                continue

            points = self._load_points(entries[ts]["lidar"])
            points = mask_ego_points(
                mask_points_by_range(points, self.lidar_range))
            if self.augmentor is not None and self.train:
                _, points = self.augmentor(np.zeros((0, 7)), points)
                points = mask_points_by_range(points, self.lidar_range)
            vox = voxelize_points(points, self.voxel_size,
                                  self.lidar_range, N, P)
            voxel_features[slot] = vox["voxel_features"]
            voxel_nums[slot] = vox["voxel_num_points"]
            voxel_coords[slot] = vox["voxel_coords"]
            voxel_mask[slot] = vox["voxel_mask"]
            tmat[slot] = x1_to_x2(pose, ego_pose).astype(np.float32)
            agent_mask[slot] = 1.0
            cav_params_list.append(params)
            slot += 1

        from cobevt_tpu.data.objects import GT_RANGE

        # train filters by the detection range; eval keeps the wider GT
        # range (reference base_postprocessor.py:131-133)
        gt_range = self.lidar_range if self.train else GT_RANGE
        boxes, mask, _ = generate_object_center(
            cav_params_list, ego_pose, self.max_objects,
            order=self.post.order, lidar_range=gt_range)
        label = self.post.generate_label(boxes, mask)

        return {
            "voxel_features": voxel_features,
            "voxel_num_points": voxel_nums,
            "voxel_coords": voxel_coords,
            "voxel_mask": voxel_mask.astype(np.float32),
            "transformation_matrix": tmat,
            "agent_mask": agent_mask,
            "object_bbx_center": boxes.astype(np.float32),
            "object_bbx_mask": mask.astype(np.float32),
            "pos_equal_one": label["pos_equal_one"].astype(np.float32),
            "neg_equal_one": label["neg_equal_one"].astype(np.float32),
            "targets": label["targets"].astype(np.float32),
        }

    def _load_points(self, path: str) -> np.ndarray:
        try:
            return load_pcd(path)
        except (FileNotFoundError, OSError, ValueError):
            return np.zeros((1, 4), np.float32)

    @staticmethod
    def collate(samples: List[Dict[str, np.ndarray]]):
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}
