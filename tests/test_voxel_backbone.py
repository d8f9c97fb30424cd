"""Dense voxel backbone + scatter + SECOND-style pipeline smoke."""

import numpy as np
import jax
import jax.numpy as jnp

from cobevt_tpu.models.lidar.misc import height_compression, mean_vfe
from cobevt_tpu.models.lidar.voxel_backbone import (
    DenseVoxelBackbone8x,
    scatter_voxels_dense,
)


def test_scatter_dense():
    rng = np.random.RandomState(0)
    N, C = 20, 4
    feats = rng.randn(N, C).astype(np.float32)
    coords = np.zeros((N, 4), np.int32)
    coords[:, 0] = rng.randint(0, 2, N)
    coords[:, 1] = rng.randint(0, 4, N)
    coords[:, 2] = rng.randint(0, 8, N)
    coords[:, 3] = rng.randint(0, 8, N)
    mask = rng.rand(N) > 0.3
    grid = np.asarray(scatter_voxels_dense(
        jnp.asarray(feats), jnp.asarray(coords), 2, (4, 8, 8),
        jnp.asarray(mask)))
    ref = np.zeros((2, 4, 8, 8, C), np.float32)
    for i in range(N):
        if mask[i]:
            ref[coords[i, 0], coords[i, 1], coords[i, 2],
                coords[i, 3]] += feats[i]
    np.testing.assert_allclose(grid, ref, atol=1e-6)


def test_second_style_pipeline():
    rng = np.random.RandomState(1)
    N, P = 64, 8
    voxels = rng.randn(N, P, 4).astype(np.float32)
    nums = rng.randint(1, P + 1, N)
    coords = np.zeros((N, 4), np.int32)
    coords[:, 0] = 0
    coords[:, 1] = rng.randint(0, 8, N)    # z
    coords[:, 2] = rng.randint(0, 32, N)   # y
    coords[:, 3] = rng.randint(0, 32, N)   # x

    feats = mean_vfe(jnp.asarray(voxels), jnp.asarray(nums))
    grid = scatter_voxels_dense(feats, jnp.asarray(coords), 1,
                                (8, 32, 32))
    model = DenseVoxelBackbone8x(4)
    variables = model.init(jax.random.PRNGKey(0), grid, False)
    out = model.apply(variables, grid, False)
    enc = out["encoded_voxel"]
    assert enc.shape[0] == 1 and enc.shape[-1] == 128
    assert enc.shape[2] == 4 and enc.shape[3] == 4    # /8 spatial
    bev = height_compression(enc)
    assert bev.shape == (1, 4, 4, enc.shape[1] * 128)
    assert np.isfinite(np.asarray(bev)).all()


def test_att_bev_backbone():
    """Per-scale attention-fused BEV backbone over padded agents."""
    from cobevt_tpu.models.lidar.bev_backbone import AttBEVBackbone

    rng = np.random.RandomState(2)
    B, L = 1, 3
    x = jnp.asarray(rng.randn(B, L, 16, 16, 8).astype(np.float32))
    mask = jnp.asarray(np.array([[1.0, 1.0, 0.0]], np.float32))
    model = AttBEVBackbone(
        layer_nums=(1, 1), layer_strides=(2, 2), num_filters=(16, 32),
        upsample_strides=(1, 2), num_upsample_filter=(16, 16),
        compression=1)
    variables = model.init(jax.random.PRNGKey(0), x, mask, False)
    out = model.apply(variables, x, mask, False)
    assert out.shape == (B, 8, 8, 32)
    assert np.isfinite(np.asarray(out)).all()
    # padded agent must not influence the fused output
    x2 = x.at[:, 2].set(123.0)
    out2 = model.apply(variables, x2, mask, False)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out),
                               atol=1e-5)
