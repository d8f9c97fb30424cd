"""Inference dispatch helpers: intermediate vs late camera fusion.

Capability parity with reference opv2v/opencood/tools/infrence_utils.py
(:12 `inference_late_fusion`, :46 `inference_intermediate_fusion`, :107
visualization panels): intermediate fusion runs the cooperative model
once per frame; late fusion runs the single-agent model per CAV, warps
each agent's BEV prediction into the ego frame with its cav->ego
transform, and max-merges the probability maps.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from cobevt_tpu.geometry.warp import sttf_warp


def inference_intermediate_fusion(eval_step, state, batch):
    """One cooperative forward; returns the output dict."""
    out, _ = eval_step(state, batch)
    return out


def inference_late_fusion(eval_step, state, per_cav_samples: Dict,
                          sttf_resolution: float,
                          sttf_downsample_rate: float):
    """Run the single-agent model per CAV and fuse predictions in ego
    space.

    per_cav_samples: {cav_id: sample} from
    OPV2VLateFusionDataset.test_samples.  Returns the fused output dict
    (probabilities max-merged over agents) plus the ego GT.
    """
    fused = {}
    ego = list(per_cav_samples.values())[0]
    for cav_id, sample in per_cav_samples.items():
        batch = {k: np.stack([v]) for k, v in sample.items()}
        out, _ = eval_step(state, batch)
        tmat = jnp.asarray(batch["transformation_matrix"])  # (1,1,4,4)
        for key in ("dynamic_seg", "static_seg"):
            prob = jax.nn.softmax(out[key], axis=-1)  # (B=1, L=1, H, W, C)
            warped = sttf_warp(prob, tmat, sttf_resolution,
                               sttf_downsample_rate)
            fused[key] = (warped if key not in fused
                          else jnp.maximum(fused[key], warped))
    result = {k: v for k, v in fused.items()}
    result["gt_dynamic"] = ego["gt_dynamic"][None]
    result["gt_static"] = ego["gt_static"][None]
    return result
