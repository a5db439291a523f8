"""Adversarial differential fuzz of the geometry layer vs the torch oracle.

The standard parity tests (test_geometry.py) draw mild random poses; this
module targets the regimes where the reference's formulas are numerically
on edge -- near-degenerate epilines (pure-z translation), tiny and zero
baselines, behind-camera projections, active clamps in the idepth sampler,
and exact out-of-bounds boundaries of the warp mask convention
(reference: stereo/image_predictor.py:120-209, 463-523;
multi_view_stereonet/multi_view_stereonet.py:131-165).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from multi_view_stereonet_tpu import geometry as geo
from multi_view_stereonet_tpu import ops

from test_geometry import random_K, random_pose


def _pose(R=None, t=(0.0, 0.0, 0.0)):
    T = np.eye(4, dtype=np.float32)
    if R is not None:
        T[:3, :3] = R
    T[:3, 3] = t
    return T[None]


def _rot(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return (np.eye(3) + np.sin(angle) * K
            + (1 - np.cos(angle)) * (K @ K)).astype(np.float32)


def test_disparity_to_idepth_pure_z_translation(reference_modules):
    """Pure-z baseline: the epipole sits at the principal point, so
    epilines are radial and degenerate exactly there. Values must match
    the oracle wherever the oracle itself is finite, and the degenerate
    zero-mask must agree."""
    import torch

    rows, cols = 31, 41  # odd => one pixel exactly at the principal point
    K = random_K(rows, cols)
    K[0, 2] = (cols - 1) / 2.0
    K[1, 2] = (rows - 1) / 2.0
    K = K[None]
    rng = np.random.default_rng(11)
    disp = rng.uniform(0.0, 11.0, size=(1, rows, cols)).astype(np.float32)
    for tz in (1.0, -1.0):
        T = _pose(t=(0.0, 0.0, tz))
        ref = reference_modules.ip.disparity_to_idepth(
            torch.from_numpy(K), torch.from_numpy(T),
            torch.from_numpy(disp[:, None])).numpy()[:, 0]
        got = np.asarray(geo.disparity_to_idepth(
            jnp.asarray(K), jnp.asarray(T), jnp.asarray(disp)))
        finite = np.isfinite(ref)
        assert finite.mean() > 0.98  # only the epipole pixel degenerates
        np.testing.assert_allclose(got[finite], ref[finite],
                                   rtol=2e-3, atol=2e-3)
        # Where the oracle is non-finite (0 * inf/nan at the masked
        # epipole) this build returns 0 by design (jnp.where).
        assert np.all(got[~finite] == 0.0)


def test_disparity_to_idepth_zero_baseline_stays_finite(reference_modules):
    """Zero baseline (pure rotation): every epiline is degenerate. The
    reference zeroes bad pixels with `(~mask) * idepth`, which propagates
    the 0/0 NaN instead of killing it -- and float rounding leaves some
    epi_norms just above the 1e-6 mask threshold, so the NaN survives the
    mask on BOTH paths unless the division itself is guarded. This build
    guards it (ATA > 0 joins the mask) and returns 0 everywhere.
    Documented divergence -- the model never reaches this (unit-baseline
    normalization guarantees |t| = 1), and 0 is the value the reference's
    mask *intends*."""
    import torch

    rows, cols = 16, 20
    K = random_K(rows, cols)[None]
    T = _pose(R=_rot((0.3, 1.0, 0.2), 0.4))
    disp = np.full((1, rows, cols), 3.0, np.float32)

    ref = reference_modules.ip.disparity_to_idepth(
        torch.from_numpy(K), torch.from_numpy(T),
        torch.from_numpy(disp[:, None])).numpy()
    got = np.asarray(geo.disparity_to_idepth(
        jnp.asarray(K), jnp.asarray(T), jnp.asarray(disp)))

    assert not np.isfinite(ref).any()  # oracle NaNs everywhere ...
    assert np.all(got == 0.0)          # ... this build returns the masked 0


def test_disparity_to_idepth_tiny_baseline_parity(reference_modules):
    """|t| = 1e-4 with a rotation-heavy pose: the LSQ is badly scaled but
    not masked. At this conditioning (idepth ~ disparity/|t| ~ 1e5) the
    two mathematically-identical f32 operation orders legitimately spread
    by ~2% relative -- the assertion bounds that conditioning noise, it
    cannot demand exactness."""
    import torch

    rng = np.random.default_rng(12)
    rows, cols = 30, 40
    K = np.stack([random_K(rows, cols) for _ in range(2)])
    T = np.stack([
        _pose(R=_rot((0, 1, 0), 0.5), t=(1e-4, 0, 0))[0],
        _pose(R=_rot((1, 0, 1), -0.7), t=(-7e-5, 5e-5, 3e-5))[0],
    ])
    disp = rng.uniform(0.0, 11.0, size=(2, rows, cols)).astype(np.float32)

    ref = reference_modules.ip.disparity_to_idepth(
        torch.from_numpy(K), torch.from_numpy(T),
        torch.from_numpy(disp[:, None])).numpy()[:, 0]
    got = np.asarray(geo.disparity_to_idepth(
        jnp.asarray(K), jnp.asarray(T), jnp.asarray(disp)))
    finite = np.isfinite(ref)
    np.testing.assert_allclose(got[finite], ref[finite], rtol=5e-2, atol=1e-2)


def test_fronto_parallel_homography_extremes(reference_modules):
    """idepth = 0 (plane at infinity => pure KRK^-1) and idepth = 10
    (plane closer than any training config), rotations up to 90 deg."""
    import torch

    rows, cols = 30, 40
    K3 = random_K(rows, cols)[None, :3, :3]
    for angle in (0.0, 0.9, np.pi / 2):
        for idepth in (0.0, 0.05, 10.0):
            T_l_in_r = _pose(R=_rot((0.1, 1.0, 0.0), angle), t=(0.8, -0.2, 0.1))
            ref = reference_modules.ip.get_fronto_parallel_homography(
                torch.from_numpy(K3), torch.from_numpy(K3),
                torch.from_numpy(T_l_in_r),
                torch.tensor([idepth], dtype=torch.float32)).numpy()
            got = np.asarray(geo.get_fronto_parallel_homography(
                jnp.asarray(K3), jnp.asarray(K3), jnp.asarray(T_l_in_r),
                jnp.asarray(np.float32([idepth]))))
            np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_project_idepthmap_behind_camera(reference_modules):
    """Translate the right camera far forward (+z) so near pixels project
    behind it: the invalid mask and surviving values must match the
    oracle exactly (mask bit-equal, values where finite)."""
    import torch

    rng = np.random.default_rng(13)
    rows, cols = 16, 20
    K = random_K(rows, cols)[None]
    # Right camera 3 in front of the left: depths < 3 go behind it.
    T_r_in_l = _pose(R=_rot((0, 1, 0), 0.1), t=(0.2, 0.0, 3.0))
    idepth = rng.uniform(0.05, 2.0, size=(1, rows, cols)).astype(np.float32)

    mod = reference_modules.ip.IDepthmapProjector()
    pix_ref, id_ref, mask_ref = mod(
        torch.from_numpy(K), torch.from_numpy(T_r_in_l),
        torch.from_numpy(idepth[:, None]))
    pix_ref, id_ref, mask_ref = (pix_ref.numpy(), id_ref.numpy()[:, 0],
                                 mask_ref.numpy()[:, 0])

    pix, idp, mask = geo.project_idepthmap(
        jnp.asarray(K), jnp.asarray(T_r_in_l), jnp.asarray(idepth))
    pix, idp, mask = np.asarray(pix), np.asarray(idp), np.asarray(mask)

    assert mask_ref.any() and not mask_ref.all()  # the case bites
    np.testing.assert_array_equal(mask, mask_ref)
    valid = ~mask_ref & np.isfinite(id_ref)
    np.testing.assert_allclose(idp[valid], id_ref[valid], rtol=1e-4, atol=1e-4)
    vpix = np.broadcast_to(valid[..., None], pix_ref.shape)
    np.testing.assert_allclose(pix[vpix], pix_ref[vpix], rtol=1e-3, atol=1e-3)


def test_create_idepth_samples_clamp_regimes(reference_modules):
    """Drive the sampler's clamp regimes (reference
    multi_view_stereonet.py:148-155): the 2.0 mean-idepth ceiling (short
    baseline => huge idepth for 11 px of disparity), forward and backward
    motion. A fuzz-measured structural fact is pinned alongside the
    parity: the 1/tz "stay in front of the right camera" cap is
    UNREACHABLE from the sampler's own disparity-derived mean -- for
    forward motion a disparity d at radius r from the epipole gives
    idepth*tz = d/(r+d) < 1, so mean_idepth*tz < 1 for every pose/K
    (confirmed by grid search over tx in [5e-4, 0.5], tz in [0.51, 2.5],
    two image sizes); the clamp is defensive dead code in both
    frameworks."""
    import torch

    rows, cols = 30, 40
    K = random_K(rows, cols)
    cases = {
        "mean_clamp_2.0": _pose(t=(0.02, 0.0, 0.0)),   # tiny baseline
        "forward": _pose(R=_rot((0, 1, 0), 0.05), t=(0.02, 0.0, 0.9)),
        "pure_forward": _pose(t=(0.0, 0.0, 1.0)),
        "negative_tz": _pose(t=(0.8, 0.1, -0.6)),      # right camera behind
    }
    for name, T in cases.items():
        ref = reference_modules.mvs.create_idepth_samples(
            torch.from_numpy(T), torch.from_numpy(K[None]),
            rows, cols, 12).numpy()
        got = np.asarray(geo.create_idepth_samples(
            jnp.asarray(T), jnp.asarray(K[None]), rows, cols, 12))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5,
                                   err_msg=name)
        if T[0, 2, 3] > 0:  # the unreachable-cap fact, per pose
            assert got[0, -1] * T[0, 2, 3] < 1.0, name
    # Sanity that the 2.0 ceiling actually engaged.
    tiny = np.asarray(geo.create_idepth_samples(
        jnp.asarray(cases["mean_clamp_2.0"]), jnp.asarray(K[None]),
        rows, cols, 12))
    np.testing.assert_allclose(tiny[0, -1], 2.0, rtol=1e-6)


def test_homography_warp_boundary_mask(reference_modules):
    """The invalid mask is |x'| > 1 STRICT on the normalized coords
    (image_predictor.py:513-516): a pixel mapped exactly onto the outer
    corner (x' = 1.0) is still valid. cols = 32 keeps the normalization
    exact in f32, so the strictness is actually exercised."""
    import torch

    rng = np.random.default_rng(14)
    rows, cols = 16, 32
    img = rng.uniform(-1, 1, size=(1, rows, cols, 3)).astype(np.float32)
    img_t = torch.from_numpy(img.transpose(0, 3, 1, 2))
    mod = reference_modules.ip.HomographyImagePredictor()

    for dx, expect_any_invalid in [(0.5, False), (0.5 + 1.0 / 16, True),
                                   (-0.5, False), (-17.0, True)]:
        H = np.eye(3, dtype=np.float32)[None].copy()
        H[0, 0, 2] = dx
        warped_ref, mask_ref = mod(torch.from_numpy(H), img_t)
        warped_ref = warped_ref.numpy().transpose(0, 2, 3, 1)
        mask_ref = mask_ref.numpy()[:, 0]

        warped, invalid = ops.homography_warp(jnp.asarray(img), jnp.asarray(H))
        warped, invalid = np.asarray(warped), np.asarray(invalid)

        assert mask_ref.any() == expect_any_invalid, dx
        np.testing.assert_array_equal(invalid, mask_ref, err_msg=str(dx))
        np.testing.assert_allclose(warped, warped_ref, rtol=1e-5, atol=1e-5,
                                   err_msg=str(dx))


def test_random_pose_sweep_parity(reference_modules):
    """Seeded wide sweep: 24 random (pose, K) draws across baselines
    1e-2..3 and rotations up to 0.9 rad through disparity_to_idepth and
    the homography family -- the bread-and-butter path at much wider
    coverage than the fixed-seed unit tests. (Baselines below ~1e-2 hit
    catastrophic f32 cancellation near the epipole where neither
    framework's answer is meaningful; that regime is covered by the
    dedicated tiny/zero-baseline tests above.)"""
    import torch

    rng = np.random.default_rng(15)
    rows, cols = 24, 32
    for trial in range(24):
        K = random_K(rows, cols)[None]
        scale = 10.0 ** rng.uniform(-2, 0.5)
        T = random_pose(rng, scale=scale)[None]
        if np.linalg.norm(T[0, :3, 3]) < 1e-6:
            continue
        disp = rng.uniform(0.0, 11.0, size=(1, rows, cols)).astype(np.float32)

        ref = reference_modules.ip.disparity_to_idepth(
            torch.from_numpy(K), torch.from_numpy(T),
            torch.from_numpy(disp[:, None])).numpy()[:, 0]
        got = np.asarray(geo.disparity_to_idepth(
            jnp.asarray(K), jnp.asarray(T), jnp.asarray(disp)))
        finite = np.isfinite(ref)
        # rtol bounds f32 conditioning noise: near the epipole the LSQ
        # cancels catastrophically and idepth ~ 1e4 values legitimately
        # spread ~2% between the two operation orders.
        np.testing.assert_allclose(got[finite], ref[finite],
                                   rtol=2.5e-2, atol=5e-3,
                                   err_msg=f"trial {trial} scale {scale:.2e}")

        samples = np.sort(rng.uniform(0, 2, size=(1, 12)), axis=1).astype(
            np.float32)
        H_ref = reference_modules.mvs.create_plane_sweep_homographies(
            torch.from_numpy(T), torch.from_numpy(K),
            torch.from_numpy(samples), [rows, cols]).numpy()
        H = np.asarray(geo.create_plane_sweep_homographies(
            jnp.asarray(T), jnp.asarray(K), jnp.asarray(samples)))
        np.testing.assert_allclose(H, H_ref, rtol=2e-4, atol=2e-4,
                                   err_msg=f"trial {trial}")
