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
