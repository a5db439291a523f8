"""Warp/resize op parity tests vs torch (CPU oracle)."""

import numpy as np
import pytest

import jax.numpy as jnp

from multi_view_stereonet_tpu import ops
from multi_view_stereonet_tpu import geometry as geo

from tests.test_geometry import random_K, random_pose


def to_nhwc(x):
    return np.moveaxis(x, 1, -1)


def test_grid_sample_vs_torch():
    import torch

    rng = np.random.default_rng(0)
    B, C, H, W = 2, 3, 17, 23
    img = rng.normal(size=(B, C, H, W)).astype(np.float32)
    # Grid spanning in-bounds and out-of-bounds regions.
    grid = rng.uniform(-1.4, 1.4, size=(B, 9, 11, 2)).astype(np.float32)

    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(img), torch.from_numpy(grid),
        mode="bilinear", padding_mode="border", align_corners=False).numpy()

    out, invalid = ops.grid_sample(jnp.asarray(to_nhwc(img)), jnp.asarray(grid))
    out = np.moveaxis(np.asarray(out), -1, 1)

    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    inv_ref = (np.abs(grid[..., 0]) > 1.0) | (np.abs(grid[..., 1]) > 1.0)
    np.testing.assert_array_equal(np.asarray(invalid), inv_ref)


def test_homography_warp_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(1)
    B, C, H, W = 2, 3, 30, 40
    img = rng.normal(size=(B, C, H, W)).astype(np.float32)
    K = np.stack([random_K(H, W) for _ in range(B)])
    T = np.stack([random_pose(rng) for _ in range(B)])
    Hm = np.asarray(geo.get_fronto_parallel_homography(
        jnp.asarray(K[:, :3, :3]), jnp.asarray(K[:, :3, :3]),
        jnp.asarray(np.linalg.inv(T).astype(np.float32)),
        jnp.asarray(rng.uniform(0.1, 1.5, size=B).astype(np.float32))))

    mod = reference_modules.ip.HomographyImagePredictor()
    ref, mask_ref = mod(torch.from_numpy(Hm), torch.from_numpy(img))

    out, invalid = ops.homography_warp(jnp.asarray(to_nhwc(img)), jnp.asarray(Hm))
    out = np.moveaxis(np.asarray(out), -1, 1)

    np.testing.assert_allclose(out, ref.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(invalid), mask_ref.numpy()[:, 0])


def test_plane_sweep_warp_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(2)
    B, C, H, W = 2, 3, 30, 40
    D = 6
    img = rng.normal(size=(B, C, H, W)).astype(np.float32)
    K = np.stack([random_K(H, W) for _ in range(B)])
    T = np.stack([random_pose(rng) for _ in range(B)])
    samples = np.sort(rng.uniform(0.0, 1.5, size=(B, D)).astype(np.float32), axis=1)

    H_fam = np.asarray(geo.create_plane_sweep_homographies(
        jnp.asarray(T), jnp.asarray(K), jnp.asarray(samples)))

    warper = reference_modules.mvs.PlaneSweepWarper()
    vol_ref, mask_ref = warper(torch.from_numpy(img), torch.from_numpy(H_fam))
    # reference volume: (B, C, D, H, W); mask: (B, 1, D, H, W)

    vol, invalid = ops.plane_sweep_warp(jnp.asarray(to_nhwc(img)), jnp.asarray(H_fam))
    vol_t = np.moveaxis(np.asarray(vol), -1, 1)  # (B, C, D, H, W)

    np.testing.assert_allclose(vol_t, vol_ref.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(invalid), mask_ref.numpy()[:, 0])


@pytest.mark.parametrize("in_size,out_size", [
    ((480, 640), (30, 40)),   # exact 16x downsample
    ((30, 40), (60, 80)),     # 2x upsample
    ((30, 40), (480, 640)),   # 16x upsample
    ((17, 23), (9, 12)),      # non-integer ratios
])
def test_resize_bilinear_vs_torch(in_size, out_size):
    import torch

    rng = np.random.default_rng(3)
    B, C = 2, 3
    x = rng.normal(size=(B, C, *in_size)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=out_size, mode="bilinear",
        align_corners=False).numpy()
    out = np.moveaxis(np.asarray(ops.resize_bilinear(jnp.asarray(to_nhwc(x)), out_size)), -1, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_size,out_size", [
    ((480, 640), (240, 320)),
    ((17, 23), (9, 12)),      # ceil-halving of odd sizes
    ((9, 12), (5, 6)),
])
def test_resize_area_vs_torch(in_size, out_size):
    import torch

    rng = np.random.default_rng(4)
    B, C = 2, 3
    x = rng.normal(size=(B, C, *in_size)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=out_size, mode="area").numpy()
    out = np.moveaxis(np.asarray(ops.resize_area(jnp.asarray(to_nhwc(x)), out_size)), -1, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_image_pyramid_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 3, 480, 640)).astype(np.float32)
    ref_pyr = reference_modules.uimage.build_image_pyramid(torch.from_numpy(x), 5)
    pyr = ops.build_image_pyramid(jnp.asarray(to_nhwc(x)), 5)
    assert len(pyr) == 5
    for lvl in range(5):
        out = np.moveaxis(np.asarray(pyr[lvl]), -1, 1)
        np.testing.assert_allclose(out, ref_pyr[lvl].numpy(), rtol=1e-4, atol=1e-5)


def test_avg_pool_same_vs_torch():
    import torch

    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 3, 17, 23)).astype(np.float32)
    ref = torch.nn.functional.avg_pool2d(torch.from_numpy(x), 3, stride=1, padding=1).numpy()
    out = np.moveaxis(np.asarray(ops.avg_pool_same(jnp.asarray(to_nhwc(x)), 3)), -1, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_upsample_mask_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(7)
    mask = rng.uniform(size=(2, 1, 30, 40)) > 0.5
    mod = reference_modules.mvs.MaskUpsampler()
    ref = mod(torch.from_numpy(mask), [60, 80]).numpy()
    out = np.asarray(ops.upsample_mask(jnp.asarray(mask[:, 0]), (60, 80)))
    np.testing.assert_array_equal(out, ref[:, 0])
