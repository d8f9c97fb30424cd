"""Photometric / geometric image augmentations."""

import numpy as np

from cobevt_tpu.data.augmentations import GeometricAug, StrongAug


def test_strong_aug_bounds_and_determinism():
    rng = np.random.RandomState(0)
    img = rng.rand(32, 48, 3).astype(np.float32)
    a1 = StrongAug(p=1.0, seed=7)(img)
    a2 = StrongAug(p=1.0, seed=7)(img)
    np.testing.assert_array_equal(a1, a2)
    assert a1.min() >= 0 and a1.max() <= 1
    assert not np.allclose(a1, img)


def test_geometric_aug_intrinsic_consistency():
    rng = np.random.RandomState(1)
    img = rng.rand(40, 60, 3).astype(np.float32)
    K = np.array([[50.0, 0, 30], [0, 50.0, 20], [0, 0, 1]], np.float32)
    aug = GeometricAug(p=1.0, seed=3)
    out, K2 = aug(img, K)
    assert out.shape == img.shape
    assert not np.allclose(K2, K)
    # focal scale and principal shift move together
    s = K2[0, 0] / K[0, 0]
    np.testing.assert_allclose(K2[1, 1] / K[1, 1], s, rtol=1e-6)
