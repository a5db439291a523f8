"""Loss parity tests vs the reference torch implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from multi_view_stereonet_tpu import losses as L
from multi_view_stereonet_tpu.losses.compute import LossConfig, compute_losses

from tests.test_geometry import random_K, random_pose


def nchw(x):
    return np.moveaxis(np.asarray(x), -1, 1)


def test_pseudo_huber_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(0)
    t = rng.normal(size=(2, 1, 8, 9)).astype(np.float32)
    p = rng.normal(size=(2, 1, 8, 9)).astype(np.float32)
    ref = reference_modules.ulosses.pseudo_huber_loss(
        torch.from_numpy(t), torch.from_numpy(p)).item()
    out = float(L.pseudo_huber_loss(jnp.asarray(t), jnp.asarray(p)))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_supervised_idepthmap_loss_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(1)
    B, H, W = 2, 32, 40
    truth = rng.uniform(0, 2, size=(B, 1, H, W)).astype(np.float32)
    truth[truth < 0.3] = 0.0  # some invalid
    mask = truth > 0
    pred = rng.uniform(0, 2, size=(B, 1, H // 4, W // 4)).astype(np.float32)

    ref = reference_modules.mvs_losses.supervised_idepthmap_loss(
        torch.from_numpy(pred), torch.from_numpy(truth),
        torch.from_numpy(mask), 100.0).item()

    out = float(L.supervised_idepthmap_loss(
        jnp.asarray(pred[:, 0]), jnp.asarray(truth[:, 0]),
        jnp.asarray(mask[:, 0]), 100.0))
    np.testing.assert_allclose(out, ref, rtol=1e-4)


def test_ssim_and_reconstruction_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(2)
    B, C, H, W = 2, 3, 24, 30
    x = rng.uniform(-1, 1, size=(B, C, H, W)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(B, C, H, W)).astype(np.float32)
    invalid = rng.uniform(size=(B, 1, H, W)) > 0.8

    ref_ssim = reference_modules.ulosses.SSIM(
        torch.from_numpy(x), torch.from_numpy(y)).numpy()
    out_ssim = nchw(L.ssim(jnp.asarray(np.moveaxis(x, 1, -1)),
                           jnp.asarray(np.moveaxis(y, 1, -1))))
    np.testing.assert_allclose(out_ssim, ref_ssim, rtol=1e-4, atol=1e-5)

    ref = reference_modules.ulosses.reconstruction_loss(
        torch.from_numpy(x), torch.from_numpy(y), torch.from_numpy(invalid)).item()
    out = float(L.reconstruction_photometric_loss(
        jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(np.moveaxis(y, 1, -1)),
        jnp.asarray(invalid[:, 0])))
    np.testing.assert_allclose(out, ref, rtol=1e-4)


def test_smoothness_loss_vs_reference(reference_modules):
    import torch

    # The reference GaussianBlur constructor passes padding_mode="border",
    # which modern torch rejects (torch 1.5 treated unknown modes as zero
    # padding). Reproduce the torch-1.5 semantics with an equivalent blur.
    rng = np.random.default_rng(3)
    B, H, W = 2, 16, 20
    image = rng.uniform(-1, 1, size=(B, 3, H, W)).astype(np.float32)
    output = rng.uniform(0, 2, size=(B, 1, H, W)).astype(np.float32)
    alpha = 0.5

    uimage = reference_modules.uimage

    def blur_fn(device, kernel_size=5, sigma=1.0, channels=1):
        conv = torch.nn.Conv2d(channels, channels, kernel_size, groups=channels,
                               bias=False, padding=kernel_size // 2)
        x_cord = torch.arange(kernel_size)
        x_grid = x_cord.repeat(kernel_size).view(kernel_size, kernel_size)
        y_grid = x_grid.t()
        xy_grid = torch.stack([x_grid, y_grid], dim=-1)
        mean = (kernel_size - 1) / 2.0
        var = sigma**2
        g = torch.exp(-torch.sum((xy_grid - mean)**2.0, dim=-1) / (2 * var))
        g = g / g.sum()
        conv.weight.data = g.view(1, 1, kernel_size, kernel_size).repeat(channels, 1, 1, 1)
        conv.weight.requires_grad = False
        return conv

    orig = uimage.GaussianBlur
    uimage.GaussianBlur = blur_fn
    try:
        ref = reference_modules.ulosses.smoothness_loss(
            torch.from_numpy(image), torch.from_numpy(output), alpha).item()
    finally:
        uimage.GaussianBlur = orig

    out = float(L.smoothness_loss(
        jnp.asarray(np.moveaxis(image, 1, -1)),
        jnp.asarray(np.moveaxis(output, 1, -1)), alpha))
    np.testing.assert_allclose(out, ref, rtol=1e-4)


def test_occlusion_mask_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(4)
    B, H, W = 2, 24, 30
    K = np.stack([random_K(H, W) for _ in range(B)])
    T = np.stack([random_pose(rng, scale=1.0) for _ in range(B)])
    left_id = rng.uniform(0.2, 2.0, size=(B, 1, H, W)).astype(np.float32)
    right_id = rng.uniform(0.2, 2.0, size=(B, 1, H, W)).astype(np.float32)

    ref = reference_modules.mvs_losses.get_occlusion_mask(
        torch.from_numpy(K), torch.from_numpy(T),
        torch.from_numpy(left_id), None, torch.from_numpy(right_id), None).numpy()

    out = np.asarray(L.get_occlusion_mask(
        jnp.asarray(K), jnp.asarray(T),
        jnp.asarray(left_id[:, 0]), None, jnp.asarray(right_id[:, 0]), None))

    # Threshold comparisons can flip borderline pixels; require < 0.5% diff.
    assert np.mean(out != ref[:, 0]) < 0.005


def test_reconstruction_loss_mvs_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(5)
    B, H, W = 2, 24, 30
    K = np.stack([random_K(H, W) for _ in range(B)])
    T = np.stack([random_pose(rng, scale=1.0) for _ in range(B)])
    left = rng.uniform(-1, 1, size=(B, 3, H, W)).astype(np.float32)
    right = rng.uniform(-1, 1, size=(B, 3, H, W)).astype(np.float32)
    idepth = rng.uniform(0.2, 2.0, size=(B, 1, H // 2, W // 2)).astype(np.float32)
    occ = rng.uniform(size=(B, 1, H // 2, W // 2)) > 0.8

    ref, ref_pred = reference_modules.mvs_losses.reconstruction_loss(
        torch.from_numpy(T), torch.from_numpy(K),
        torch.from_numpy(left), torch.from_numpy(right),
        torch.from_numpy(idepth), torch.from_numpy(occ))

    out, pred = L.reconstruction_loss(
        jnp.asarray(T), jnp.asarray(K),
        jnp.asarray(np.moveaxis(left, 1, -1)), jnp.asarray(np.moveaxis(right, 1, -1)),
        jnp.asarray(idepth[:, 0]), jnp.asarray(occ[:, 0]))

    np.testing.assert_allclose(nchw(pred), ref_pred.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(out), ref.item(), rtol=1e-3)


def test_lr_consistency_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(6)
    B = 2
    K_pyr_np, left_pyr, right_pyr, locc_pyr, rocc_pyr = [], [], [], [], []
    T = np.stack([random_pose(rng, scale=1.0) for _ in range(B)])
    Tinv = np.linalg.inv(T).astype(np.float32)
    for lvl, (H, W) in enumerate([(32, 40), (16, 20)]):
        K_pyr_np.append(np.stack([random_K(H, W) for _ in range(B)]))
        left_pyr.append(rng.uniform(0.2, 2.0, size=(B, 1, H, W)).astype(np.float32))
        right_pyr.append(rng.uniform(0.2, 2.0, size=(B, 1, H, W)).astype(np.float32))
        locc_pyr.append(rng.uniform(size=(B, 1, H, W)) > 0.8)
        rocc_pyr.append(rng.uniform(size=(B, 1, H, W)) > 0.8)

    ref = reference_modules.mvs_losses.left_right_idepthmap_consistency_losses(
        torch.from_numpy(T), torch.from_numpy(Tinv),
        [torch.from_numpy(k) for k in K_pyr_np],
        [torch.from_numpy(x) for x in left_pyr],
        [torch.from_numpy(x) for x in locc_pyr],
        [torch.from_numpy(x) for x in right_pyr],
        [torch.from_numpy(x) for x in rocc_pyr]).item()

    out = float(L.left_right_idepthmap_consistency_losses(
        jnp.asarray(T), jnp.asarray(Tinv),
        [jnp.asarray(k) for k in K_pyr_np],
        [jnp.asarray(x[:, 0]) for x in left_pyr],
        [jnp.asarray(x[:, 0]) for x in locc_pyr],
        [jnp.asarray(x[:, 0]) for x in right_pyr],
        [jnp.asarray(x[:, 0]) for x in rocc_pyr]))

    np.testing.assert_allclose(out, ref, rtol=2e-3)


def test_corner_and_gradient_losses_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(7)
    feats = rng.normal(size=(2, 8, 16, 20)).astype(np.float32)
    image = rng.uniform(-1, 1, size=(2, 3, 16, 20)).astype(np.float32)

    ref_c = reference_modules.ulosses.corner_loss(torch.from_numpy(feats), 3).item()
    out_c = float(L.corner_loss(jnp.asarray(np.moveaxis(feats, 1, -1)), 3))
    np.testing.assert_allclose(out_c, ref_c, rtol=1e-4)

    ref_g = reference_modules.ulosses.gradient_matching_loss(
        torch.from_numpy(image), torch.from_numpy(feats)).item()
    out_g = float(L.gradient_matching_loss(
        jnp.asarray(np.moveaxis(image, 1, -1)),
        jnp.asarray(np.moveaxis(feats, 1, -1))))
    np.testing.assert_allclose(out_g, ref_g, rtol=1e-4)


def test_masked_mean_empty_mask_contributes_zero():
    """Codebase-wide empty-mask policy: 0, not 0/0 = NaN (a batch with no
    valid GT or a fully-occluded photometric mask must not poison the
    step)."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8)))
    empty = jnp.zeros((2, 8, 8), bool)
    assert float(L.supervised.masked_mean(x, empty)) == 0.0

    # supervised loss with an all-invalid GT stays finite (and zero).
    truth = jnp.zeros((1, 8, 8))
    pred = jnp.asarray(np.random.default_rng(1).uniform(0.1, 1, (1, 8, 8)))
    val = float(L.supervised_idepthmap_loss(
        pred, truth, jnp.zeros((1, 8, 8), bool)))
    assert np.isfinite(val) and val == 0.0

    # photometric reconstruction with a fully-invalid mask stays finite.
    img = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (1, 8, 8, 3)))
    rec = float(L.reconstruction_photometric_loss(
        img, img * 0.5, jnp.ones((1, 8, 8), bool)))
    assert np.isfinite(rec) and rec == 0.0
