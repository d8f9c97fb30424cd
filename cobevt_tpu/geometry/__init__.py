"""Geometry core: pose math, view matrices, differentiable affine warps.

Everything in this subpackage is a pure function on `jnp` arrays (or numpy
for host-side dataset code) with static shapes, so it composes freely with
`jax.jit` / `vmap` / `grad`.
"""

from cobevt_tpu.geometry.transforms import (
    x_to_world,
    x1_to_x2,
    get_view_matrix,
    generate_grid,
    discretize_transformation,
    rotation_matrix_about_center,
    affine_from_discretized,
)
from cobevt_tpu.geometry.warp import (
    warp_affine,
    affine_grid_pixel,
    grid_sample,
    sttf_warp,
    rotated_roi_mask,
    roi_and_agent_mask,
)
