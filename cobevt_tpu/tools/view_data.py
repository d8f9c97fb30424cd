"""Inspect generated nuScenes labels as stitched panels.

Capability parity with reference nuscenes/scripts/view_data.py:25: walk
the generated dataset and dump camera-strip + BEV panels for visual
verification.

  python -m cobevt_tpu.tools.view_data --dataset_dir ... \
      --labels_dir ... --out viz/ [--max_samples 20]
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser("cobevt_tpu view_data")
    p.add_argument("--dataset_dir", required=True)
    p.add_argument("--labels_dir", required=True)
    p.add_argument("--out", default="viz")
    p.add_argument("--max_samples", type=int, default=20)
    opt = p.parse_args()

    import numpy as np

    from cobevt_tpu.data.nuscenes_gen import concat_scene_datasets
    from cobevt_tpu.utils.nuscenes_viz import sample_panel
    from cobevt_tpu.utils.visualization import save_image

    scenes = sorted(f[:-5] for f in os.listdir(opt.labels_dir)
                    if f.endswith(".json"))
    dataset = concat_scene_datasets(scenes, opt.dataset_dir,
                                    opt.labels_dir)
    os.makedirs(opt.out, exist_ok=True)
    for i in range(min(len(dataset), opt.max_samples)):
        sample = dataset[i]
        batch = {k: np.stack([v]) for k, v in sample.items()}
        panel = sample_panel(batch)
        save_image(os.path.join(opt.out, f"sample_{i:05d}.png"),
                   panel[..., ::-1])
    print(f"wrote {min(len(dataset), opt.max_samples)} panels to "
          f"{opt.out}")


if __name__ == "__main__":
    main()
