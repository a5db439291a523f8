"""Rectified / general-disparity view synthesis parity vs reference."""

import numpy as np

import jax.numpy as jnp

from multi_view_stereonet_tpu.ops.stereo_warp import (
    rectified_image_predictor, disparity_image_predictor,
)
from tests.test_geometry import random_K, random_pose


def test_rectified_image_predictor_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(0)
    B, C, H, W = 2, 3, 24, 32
    K = np.stack([random_K(H, W) for _ in range(B)])
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    T[0, 0, 3] = 0.5
    T[1, 0, 3] = -0.3
    disp = rng.uniform(0, 6, size=(B, 1, H, W)).astype(np.float32)
    right = rng.uniform(-1, 1, size=(B, C, H, W)).astype(np.float32)

    mod = reference_modules.ip.RectifiedImagePredictor()
    ref, mask_ref = mod(torch.from_numpy(K), torch.from_numpy(T),
                        torch.from_numpy(disp.copy()), torch.from_numpy(right))

    pred, invalid = rectified_image_predictor(
        jnp.asarray(K), jnp.asarray(T), jnp.asarray(disp[:, 0]),
        jnp.asarray(np.moveaxis(right, 1, -1)))

    np.testing.assert_allclose(np.moveaxis(np.asarray(pred), -1, 1),
                               ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(invalid), mask_ref.numpy()[:, 0])


def test_disparity_image_predictor_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(1)
    B, C, H, W = 2, 3, 24, 32
    K = np.stack([random_K(H, W) for _ in range(B)])
    T = np.stack([random_pose(rng, scale=1.0) for _ in range(B)])
    disp = rng.uniform(0.5, 6, size=(B, 1, H, W)).astype(np.float32)
    right = rng.uniform(-1, 1, size=(B, C, H, W)).astype(np.float32)

    mod = reference_modules.ip.ImagePredictor()
    ref, mask_ref = mod(torch.from_numpy(K), torch.from_numpy(T),
                        torch.from_numpy(disp.copy()), torch.from_numpy(right))

    pred, invalid = disparity_image_predictor(
        jnp.asarray(K), jnp.asarray(T), jnp.asarray(disp[:, 0]),
        jnp.asarray(np.moveaxis(right, 1, -1)))

    np.testing.assert_allclose(np.moveaxis(np.asarray(pred), -1, 1),
                               ref.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(invalid), mask_ref.numpy()[:, 0])
