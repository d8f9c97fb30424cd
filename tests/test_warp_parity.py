"""Golden parity: our warp/geometry vs the torch reference implementation.

The reference modules are imported from the read-only mount and executed on
CPU; our jnp implementations must match within float tolerance.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from tests.conftest import add_reference_to_path
from cobevt_tpu.geometry import (
    affine_from_discretized,
    discretize_transformation,
    rotated_roi_mask,
    sttf_warp,
    warp_affine,
    x1_to_x2,
    x_to_world,
)

torch = pytest.importorskip("torch")

HAVE_REF = add_reference_to_path()
if HAVE_REF:
    try:
        from opencood.models.sub_modules import torch_transformation_utils as ref_t
        from opencood.utils import transformation_utils as ref_pose
    except Exception:  # missing optional deps in the image
        HAVE_REF = False

needs_ref = pytest.mark.skipif(not HAVE_REF, reason="reference unavailable")


def rand_affines(n, seed=0, max_angle=180.0, max_shift=12.0):
    rng = np.random.RandomState(seed)
    thetas = rng.uniform(-max_angle, max_angle, n) * np.pi / 180
    shifts = rng.uniform(-max_shift, max_shift, (n, 2))
    M = np.zeros((n, 2, 3), np.float32)
    M[:, 0, 0] = np.cos(thetas)
    M[:, 0, 1] = -np.sin(thetas)
    M[:, 1, 0] = np.sin(thetas)
    M[:, 1, 1] = np.cos(thetas)
    M[:, :, 2] = shifts
    return M


@needs_ref
@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_warp_affine_matches_reference(mode):
    rng = np.random.RandomState(1)
    B, C, H, W = 4, 3, 40, 56
    src = rng.randn(B, C, H, W).astype(np.float32)
    M = rand_affines(B, seed=2)

    T = ref_t.get_transformation_matrix(torch.from_numpy(M.copy()), (H, W))
    ref = ref_t.warp_affine(torch.from_numpy(src), T, (H, W), mode=mode)
    ref = ref.numpy()

    T_j = affine_from_discretized(
        # affine_from_discretized == get_transformation_matrix on (…,2,3)
        M.reshape(B, 2, 3), (H, W))
    np.testing.assert_allclose(np.asarray(T_j), T.numpy(), atol=1e-5)

    ours = warp_affine(jnp.asarray(src.transpose(0, 2, 3, 1)), T_j, (H, W),
                       mode=mode)
    ours = np.asarray(ours).transpose(0, 3, 1, 2)

    if mode == "nearest":
        # rounding ties can differ by one pixel on exact .5 boundaries;
        # compare fraction of mismatched pixels instead of exact values
        mismatch = np.mean(~np.isclose(ours, ref, atol=1e-4))
        assert mismatch < 5e-3
    else:
        np.testing.assert_allclose(ours, ref, atol=2e-4)


@needs_ref
def test_warp_nonsquare_dsize():
    rng = np.random.RandomState(3)
    B, C, H, W = 2, 5, 32, 48
    src = rng.randn(B, C, H, W).astype(np.float32)
    M = rand_affines(B, seed=4)
    dsize = (24, 40)

    T = ref_t.get_transformation_matrix(torch.from_numpy(M.copy()), dsize)
    ref = ref_t.warp_affine(torch.from_numpy(src), T, dsize).numpy()
    T_j = affine_from_discretized(M, dsize)
    ours = warp_affine(jnp.asarray(src.transpose(0, 2, 3, 1)), T_j, dsize)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=2e-4)


@needs_ref
def test_discretize_transformation_matches():
    rng = np.random.RandomState(5)
    mats = np.tile(np.eye(4, dtype=np.float32), (2, 5, 1, 1))
    mats[..., :3, :3] = rng.randn(2, 5, 3, 3)
    mats[..., :3, 3] = rng.randn(2, 5, 3) * 10

    ref = ref_t.get_discretized_transformation_matrix(
        torch.from_numpy(mats.copy()), 0.390625, 8).numpy()
    ours = discretize_transformation(mats, 0.390625, 8)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


@needs_ref
def test_sttf_warp_matches_reference_sttf():
    import importlib
    from tests.ref_shims import install_torchvision_shim
    install_torchvision_shim()
    corpbevt = importlib.import_module("opencood.models.corpbevt")
    rng = np.random.RandomState(7)
    B, L, C, H, W = 2, 3, 8, 32, 32
    x = rng.randn(B, L, C, H, W).astype(np.float32)
    mats = np.tile(np.eye(4, dtype=np.float32), (B, L, 1, 1))
    M = rand_affines(B * L, seed=8, max_angle=30, max_shift=4).reshape(
        B, L, 2, 3)
    mats[..., :2, :2] = M[..., :2, :2]
    mats[..., :2, 3] = M[..., :, 2] * (0.390625 * 8)

    sttf = corpbevt.STTF({"resolution": 0.390625, "downsample_rate": 8})
    ref = sttf(torch.from_numpy(x.copy()),
               torch.from_numpy(mats.copy()))      # (B, L, H, W, C)
    ours = sttf_warp(jnp.asarray(x.transpose(0, 1, 3, 4, 2)), mats,
                     0.390625, 8)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4)


@needs_ref
def test_roi_mask_matches_reference():
    B, L, H, W = 2, 4, 32, 32
    mats = np.tile(np.eye(4, dtype=np.float32), (B, L, 1, 1))
    M = rand_affines(B * L, seed=9, max_angle=45, max_shift=6).reshape(
        B, L, 2, 3)
    mats[..., :2, :2] = M[..., :2, :2]
    mats[..., :2, 3] = M[..., :, 2] * (0.390625 * 8)
    cav_mask = np.array([[1, 1, 1, 0], [1, 1, 0, 0]], np.float32)

    ref = ref_t.get_roi_and_cav_mask(
        (B, L, H, W, 8), torch.from_numpy(cav_mask),
        torch.from_numpy(mats.copy()), 0.390625, 8)   # (B, H, W, 1, L)
    ref = ref.numpy()[:, :, :, 0, :].transpose(0, 3, 1, 2)   # (B, L, H, W)

    from cobevt_tpu.geometry import roi_and_agent_mask
    ours = roi_and_agent_mask((B, L, H, W), cav_mask, mats, 0.390625, 8)
    mismatch = np.mean(np.asarray(ours) != ref)
    assert mismatch < 5e-3  # nearest-rounding ties only


def test_pose_roundtrip():
    pose = [12.0, -3.0, 1.5, 4.0, 33.0, -2.0]
    m = x_to_world(pose)
    # rotation block orthonormal, det +1
    R = m[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)
    # x1_to_x2 of identical poses is identity
    np.testing.assert_allclose(x1_to_x2(pose, pose), np.eye(4), atol=1e-9)


@needs_ref
def test_pose_matches_reference():
    pose1 = [1.0, 2.0, 0.3, 5.0, 140.0, -3.0]
    pose2 = [-4.0, 7.0, 0.1, 0.0, 20.0, 1.0]
    np.testing.assert_allclose(x_to_world(pose1), ref_pose.x_to_world(pose1),
                               atol=1e-12)
    np.testing.assert_allclose(x1_to_x2(pose1, pose2),
                               ref_pose.x1_to_x2(pose1, pose2), atol=1e-9)
