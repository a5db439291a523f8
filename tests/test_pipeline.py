"""Unpack-batch parity vs the reference pipeline utilities."""

import numpy as np

import jax.numpy as jnp

from multi_view_stereonet_tpu.train.pipeline import (
    unpack_batch, multi_view_unpack_batch,
)

from tests.test_geometry import random_K, random_pose


def test_multi_view_unpack_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(0)
    B, V, H, W = 2, 3, 64, 80
    left = rng.uniform(-1, 1, size=(B, 3, H, W)).astype(np.float32)
    rights = rng.uniform(-1, 1, size=(V, B, 3, H, W)).astype(np.float32)
    K = np.stack([random_K(H, W) for _ in range(B)])
    T = np.stack([[random_pose(rng, scale=1.3) for _ in range(B)] for _ in range(V)])
    depth = rng.uniform(0, 30, size=(B, 1, H, W)).astype(np.float32)
    depth[depth < 5] = 0.0
    rdepths = rng.uniform(1, 30, size=(V, B, 1, H, W)).astype(np.float32)

    batch_t = {
        "left_image": torch.from_numpy(left),
        "right_image": [torch.from_numpy(rights[v].copy()) for v in range(V)],
        "K": torch.from_numpy(K).unsqueeze(1),
        "T_right_in_left": [torch.from_numpy(T[v].copy()).unsqueeze(1) for v in range(V)],
        "left_filename": ["a"] * B,
        "right_filename": ["b"] * B,
        "left_depthmap_true": torch.from_numpy(depth.copy()),
        "right_depthmap_true": [torch.from_numpy(rdepths[v].copy()) for v in range(V)],
    }
    ref = reference_modules.mvs_utils.multi_view_unpack_batch(batch_t, "cpu", 5)

    batch_j = {
        "left_image": jnp.asarray(np.moveaxis(left, 1, -1)),
        "right_images": jnp.asarray(np.moveaxis(rights, 2, -1)).transpose(1, 0, 2, 3, 4),
        "K": jnp.asarray(K),
        "T_right_in_left": jnp.asarray(np.transpose(T, (1, 0, 2, 3))),
        "left_depthmap_true": jnp.asarray(depth[:, 0]),
        "right_depthmap_true": jnp.asarray(np.transpose(rdepths[:, :, 0], (1, 0, 2, 3))),
    }
    out = multi_view_unpack_batch(batch_j, 5)

    np.testing.assert_allclose(np.asarray(out["baseline"]),
                               ref["baseline"].numpy(), rtol=1e-5)
    for v in range(V):
        np.testing.assert_allclose(
            np.asarray(out["T_right_in_left"])[:, v],
            ref["T_right_in_left"][v].numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out["T_left_in_right"])[:, v],
            ref["T_left_in_right"][v].numpy(), rtol=1e-4, atol=1e-4)
    for lvl in range(5):
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(out["left_image_pyr"][lvl]), -1, 1),
            ref["left_image_pyr"][lvl].numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out["K_pyr"][lvl]), ref["K_pyr"][lvl].numpy(),
            rtol=1e-5, atol=1e-5)
        for v in range(V):
            np.testing.assert_allclose(
                np.moveaxis(np.asarray(out["right_image_pyr"][lvl])[:, v], -1, 1),
                ref["right_image_pyr"][v][lvl].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["left_idepthmap_true"]),
                               ref["left_idepthmap_true"].numpy()[:, 0],
                               rtol=1e-4, atol=1e-6)
    for v in range(V):
        np.testing.assert_allclose(np.asarray(out["right_idepthmap_true"])[:, v],
                                   ref["right_idepthmap_true"][v].numpy()[:, 0],
                                   rtol=1e-4, atol=1e-6)


def test_two_view_unpack_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(1)
    B, H, W = 2, 32, 40
    left = rng.uniform(-1, 1, size=(B, 3, H, W)).astype(np.float32)
    right = rng.uniform(-1, 1, size=(B, 3, H, W)).astype(np.float32)
    K = np.stack([random_K(H, W) for _ in range(B)])
    T = np.stack([random_pose(rng, scale=2.0) for _ in range(B)])
    ldepth = rng.uniform(1, 30, size=(B, 1, H, W)).astype(np.float32)
    rdepth = rng.uniform(1, 30, size=(B, 1, H, W)).astype(np.float32)

    batch_t = {
        "left_image": torch.from_numpy(left),
        "right_image": torch.from_numpy(right),
        "K": torch.from_numpy(K).unsqueeze(1),
        "T_right_in_left": torch.from_numpy(T.copy()).unsqueeze(1),
        "left_filename": ["a"] * B,
        "right_filename": ["b"] * B,
        "left_depthmap_true": torch.from_numpy(ldepth.copy()),
        "right_depthmap_true": torch.from_numpy(rdepth.copy()),
    }
    ref = reference_modules.mvs_utils.unpack_batch(batch_t, "cpu", 5)

    out = unpack_batch({
        "left_image": jnp.asarray(np.moveaxis(left, 1, -1)),
        "right_image": jnp.asarray(np.moveaxis(right, 1, -1)),
        "K": jnp.asarray(K),
        "T_right_in_left": jnp.asarray(T),
        "left_depthmap_true": jnp.asarray(ldepth[:, 0]),
        "right_depthmap_true": jnp.asarray(rdepth[:, 0]),
    }, 5)

    np.testing.assert_allclose(np.asarray(out["baseline"]), ref["baseline"].numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["T_right_in_left"]),
                               ref["T_right_in_left"].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["left_idepthmap_true"]),
                               ref["left_idepthmap_true"].numpy()[:, 0], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["right_idepthmap_true"]),
                               ref["right_idepthmap_true"].numpy()[:, 0], rtol=1e-4)
