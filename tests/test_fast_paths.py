"""Exactness tests for the TPU fast paths (S2D refiners, Pallas warp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_view_stereonet_tpu.models import init_mvsnet
from multi_view_stereonet_tpu.models.refiners import idepthmap_refiner
from multi_view_stereonet_tpu.models.s2d import (
    idepthmap_refiner_s2d, space_to_depth, depth_to_space,
)


@pytest.fixture(scope="module")
def params():
    return init_mvsnet(jax.random.PRNGKey(0))


def test_s2d_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))),
                                  np.asarray(x))


def test_depth_to_space_conv_exact():
    """The dirac-kernel conv form of d2s is bit-exact vs the reshape form
    (incl. extra leading dims, as used on cost volumes)."""
    from multi_view_stereonet_tpu.models.s2d import depth_to_space_conv

    rng = np.random.default_rng(1)
    for shape in [(2, 8, 12, 5), (1, 6, 10, 1), (3, 2, 4, 6, 2)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        s = space_to_depth(x)
        np.testing.assert_array_equal(np.asarray(depth_to_space_conv(s)),
                                      np.asarray(x))


@pytest.mark.parametrize("cin", [4, 36])
def test_conv2d_s2d_packing_exact(cin):
    """The 4x4/stride-2 folded conv == s2d pack + 3x3 s2d conv."""
    from multi_view_stereonet_tpu.models.s2d import (
        conv2d_s2d, conv2d_s2d_packing)
    from multi_view_stereonet_tpu.models.layers import init_conv2d

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, cin)).astype(np.float32))
    p = init_conv2d(jax.random.PRNGKey(3), 3, 3, cin, 32, bias=True)
    ref = conv2d_s2d(p, space_to_depth(x))
    out = conv2d_s2d_packing(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-6)


@pytest.mark.parametrize("size", [(64, 80), (30, 40)])
def test_s2d_refiner_exact(params, size):
    rng = np.random.default_rng(1)
    H, W = size
    g = jnp.asarray(rng.uniform(-1, 1, (2, H, W, 35)).astype(np.float32))
    idp = jnp.asarray(rng.uniform(0, 2, (2, H, W)).astype(np.float32))
    a = idepthmap_refiner(params["refiner3"], g, idp)
    b = idepthmap_refiner_s2d(params["refiner3"], g, idp)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_s2d_refiner_bf16_close(params):
    rng = np.random.default_rng(2)
    g = jnp.asarray(rng.uniform(-1, 1, (1, 32, 48, 3)).astype(np.float32))
    idp = jnp.asarray(rng.uniform(0, 2, (1, 32, 48)).astype(np.float32))
    a = idepthmap_refiner_s2d(params["refiner0"], g, idp)
    b = idepthmap_refiner_s2d(params["refiner0"], g, idp,
                              compute_dtype=jnp.bfloat16)
    rel = np.abs(np.asarray(a) - np.asarray(b)) / (np.abs(np.asarray(a)) + 1e-3)
    assert rel.mean() < 0.02


@pytest.mark.parametrize("cin,size", [(3, (64, 96)), (32, (30, 40)),
                                      (3, (50, 62))])
def test_s2d_stride2_conv_exact(cin, size):
    from multi_view_stereonet_tpu.models.layers import init_conv2d, conv2d
    from multi_view_stereonet_tpu.models.s2d import conv2d_stride2_s2d

    rng = np.random.default_rng(7)
    H, W = size
    p = init_conv2d(jax.random.PRNGKey(1), 5, 5, cin, 32, bias=(cin == 32))
    x = jnp.asarray(rng.normal(size=(2, H, W, cin)).astype(np.float32))
    ref = conv2d(p, x, stride=2)
    out = conv2d_stride2_s2d(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_cost_volume_filter_s2d_exact(params):
    from multi_view_stereonet_tpu.models.cost_volume import (
        cost_volume_filter, cost_volume_filter_s2d,
    )

    rng = np.random.default_rng(9)
    vol = jnp.asarray(np.abs(rng.normal(size=(2, 6, 16, 24, 32))).astype(np.float32))
    a = cost_volume_filter(params["volume_filter4"], vol)
    b = cost_volume_filter_s2d(params["volume_filter4"], vol)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-6, rtol=1e-5)


def test_feature_network_s2d_exact(params):
    from multi_view_stereonet_tpu.models.feature_network import feature_network

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 96, 3)).astype(np.float32))
    a = feature_network(params["feature_network"], x)
    b = feature_network(params["feature_network"], x, use_s2d=True)
    for la, lb in zip(a, b):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=2e-6, rtol=1e-5)


def test_feature_network_s2d_chain_exact(params):
    """The chained frontend == plain frontend with pyramid levels 1..3
    unpacked from s2d layout."""
    from multi_view_stereonet_tpu.models.feature_network import (
        feature_network, feature_network_s2d_chain, s2d_chain_supported)

    rng = np.random.default_rng(9)
    assert s2d_chain_supported(64, 96)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 96, 3)).astype(np.float32))
    a = feature_network(params["feature_network"], x)
    b = feature_network_s2d_chain(params["feature_network"], x)
    for lvl in (1, 2, 3):
        b[lvl] = depth_to_space(b[lvl])
    for la, lb in zip(a, b):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=2e-6, rtol=1e-5)


def test_s2d_stride2_out_and_chain_exact():
    """Output-pack-folded stride-2 convs == conv + explicit s2d pack."""
    from multi_view_stereonet_tpu.models.layers import conv2d
    from multi_view_stereonet_tpu.models.s2d import (
        conv2d_stride2_s2d_out, conv2d_stride2_s2d_chain,
        conv2d_stride2_s2d_in)

    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)).astype(np.float32))
    p0 = {"w": jnp.asarray(
              rng.normal(scale=0.1, size=(5, 5, 3, 8)).astype(np.float32)),
          "b": jnp.asarray(rng.normal(size=(8,)).astype(np.float32))}
    y = conv2d(p0, x, stride=2)                        # (2, 16, 24, 8)
    np.testing.assert_allclose(
        np.asarray(conv2d_stride2_s2d_out(p0, x)),
        np.asarray(space_to_depth(y)), atol=2e-6, rtol=1e-5)

    p1 = {"w": jnp.asarray(
              rng.normal(scale=0.1, size=(5, 5, 8, 8)).astype(np.float32))}
    z = conv2d(p1, y, stride=2)                        # (2, 8, 12, 8)
    np.testing.assert_allclose(
        np.asarray(conv2d_stride2_s2d_chain(p1, space_to_depth(y))),
        np.asarray(space_to_depth(z)), atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(conv2d_stride2_s2d_in(p1, space_to_depth(y))),
        np.asarray(z), atol=2e-6, rtol=1e-5)


def test_s2d_refiner_split_guidance_exact(params):
    """idepthmap_refiner_s2d(feats_s2d=...) == the concatenated-guidance
    path (conv0 split by linearity)."""
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.uniform(-1, 1, (2, 16, 24, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(2, 16, 24, 32)).astype(np.float32))
    idp = jnp.asarray(rng.uniform(0.1, 2.0, (2, 16, 24)).astype(np.float32))
    a = idepthmap_refiner_s2d(params["refiner3"],
                              jnp.concatenate([img, feats], axis=-1), idp)
    b = idepthmap_refiner_s2d(params["refiner3"], img, idp,
                              feats_s2d=space_to_depth(feats))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-6, rtol=1e-5)


def test_upsample2x_to_s2d_matches_resize():
    from multi_view_stereonet_tpu.models.s2d import upsample2x_to_s2d
    from multi_view_stereonet_tpu.ops import resize_bilinear

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.uniform(0.1, 2.0, (2, 15, 21)).astype(np.float32))
    ref = space_to_depth(
        resize_bilinear(x, (30, 42))[..., None])  # (2, 15, 21, 4)
    out = upsample2x_to_s2d(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_s2d_refiner_lowres_prior_exact(params):
    """Upsample-folded refiner == s2d refiner on the upsampled prior."""
    from multi_view_stereonet_tpu.models.s2d import (
        idepthmap_refiner_s2d_lowres)
    from multi_view_stereonet_tpu.ops import resize_bilinear

    rng = np.random.default_rng(14)
    img = jnp.asarray(rng.uniform(-1, 1, (2, 16, 24, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(2, 16, 24, 32)).astype(np.float32))
    low = jnp.asarray(rng.uniform(0.1, 2.0, (2, 8, 12)).astype(np.float32))
    prior = resize_bilinear(low, (16, 24))
    g = jnp.concatenate([img, feats], axis=-1)
    ref = idepthmap_refiner_s2d(params["refiner3"], g, prior)
    out = idepthmap_refiner_s2d_lowres(params["refiner3"], g, low)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # Split-guidance (chained-frontend) form too.
    out2 = idepthmap_refiner_s2d_lowres(params["refiner3"], img, low,
                                        feats_s2d=space_to_depth(feats))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_mvsnet_forward_chained_frontend_exact(params):
    """Full forward with the chained frontend == default routing."""
    from multi_view_stereonet_tpu.models import (
        MultiViewStereoNetConfig, mvsnet_forward)

    rng = np.random.default_rng(12)
    B, V, H, W = 1, 1, 64, 96
    left_pyr, right_pyrs, K_pyr = [], [], []
    h, w = H, W
    for lvl in range(5):
        left_pyr.append(jnp.asarray(
            rng.uniform(-1, 1, (B, h, w, 3)).astype(np.float32)))
        right_pyrs.append(jnp.asarray(
            rng.uniform(-1, 1, (B, V, h, w, 3)).astype(np.float32)))
        K = np.eye(4, dtype=np.float32)
        K[0, 0] = K[1, 1] = 40.0 / (2 ** lvl)
        K[0, 2], K[1, 2] = w / 2.0, h / 2.0
        K_pyr.append(jnp.asarray(np.tile(K, (B, 1, 1))))
        h, w = h // 2, w // 2
    T = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    T[:, :, 0, 3] = 0.5
    T = jnp.asarray(T)

    out_a = mvsnet_forward(params, left_pyr, K_pyr, T, right_pyrs,
                           MultiViewStereoNetConfig(
                               use_s2d_chained_frontend=False))
    out_b = mvsnet_forward(params, left_pyr, K_pyr, T, right_pyrs,
                           MultiViewStereoNetConfig(
                               use_s2d_chained_frontend=True))
    for la, lb in zip(out_a["left_idepthmap_pyr"],
                      out_b["left_idepthmap_pyr"]):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=5e-5, rtol=1e-4)


def test_pallas_warp_interpret_matches_gather():
    """Kernel semantics vs the XLA gather, via the Pallas interpreter."""
    from multi_view_stereonet_tpu.ops.warp import homography_grid, grid_sample
    from multi_view_stereonet_tpu.ops.pallas import warp_kernel as wk
    from multi_view_stereonet_tpu.ops.warp import _unnormalize_clamp
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(3)
    B, H, W, C = 1, 480, 640, 3
    img = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    Hm = np.eye(3, dtype=np.float32)
    Hm[0, 2] = 5.3
    Hm[1, 2] = 2.1
    Hm[0, 1] = 0.02
    Hj = jnp.asarray(Hm[None])
    grid = homography_grid(Hj, H, W)
    ref, _ = grid_sample(img, grid)

    ix = _unnormalize_clamp(grid[..., 0], W)
    iy = _unnormalize_clamp(grid[..., 1], H)
    (yb, xb, xoff, xoff_half,
     fits, fits_narrow, fits_half) = wk._band_bases(ix, iy, H, W)
    assert bool(fits) and bool(fits_narrow) and bool(fits_half)
    try:
        with pltpu.force_tpu_interpret_mode():
            out = wk._pallas_resample(img, ix, iy, yb, xb, xoff, exact=True,
                                      comp_kx=wk.COMP_KX)
            outw = wk._pallas_resample(img, ix, iy, yb, xb, xoff, exact=True)
            outh = wk._pallas_resample(img, ix, iy, yb, xb, xoff_half,
                                       exact=True, comp_kx=wk.HALF_KX,
                                       split_halves=True)
            outp = wk._pallas_resample(img, ix, iy, yb, xb, xoff, exact=True,
                                       comp_kx=wk.COMP_KX, planar=True)
    except Exception as e:  # interpreter support varies across jax versions
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # Wide (full-band, rotate-free) kernel: same values as the narrow one.
    np.testing.assert_array_equal(np.asarray(outw), np.asarray(out))
    # Split-halves kernel: same values through per-half rotates.
    np.testing.assert_array_equal(np.asarray(outh), np.asarray(out))
    # Planar output: same values through the (B, C, H, W) layout.
    np.testing.assert_array_equal(
        np.asarray(jnp.transpose(outp, (0, 2, 3, 1))), np.asarray(out))
    # bf16 output dtype: the f32 interpolation rounded once at the write.
    try:
        with pltpu.force_tpu_interpret_mode():
            outb = wk._pallas_resample(img, ix, iy, yb, xb, xoff, exact=True,
                                       comp_kx=wk.COMP_KX,
                                       out_dtype=jnp.bfloat16)
    except Exception as e:
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    assert outb.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(outb), np.asarray(out.astype(jnp.bfloat16)))
    # Split-halves x planar (the dispatch routes planar callers through
    # the per-channel VPU output path of the split kernel) and
    # split-halves at "default" precision (the hat one-hot construction):
    # both must still match the gather.
    try:
        with pltpu.force_tpu_interpret_mode():
            outhp = wk._pallas_resample(img, ix, iy, yb, xb, xoff_half,
                                        exact=True, comp_kx=wk.HALF_KX,
                                        split_halves=True, planar=True)
            outhd = wk._pallas_resample(img, ix, iy, yb, xb, xoff_half,
                                        exact="default", comp_kx=wk.HALF_KX,
                                        split_halves=True)
    except Exception as e:
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_array_equal(
        np.asarray(jnp.transpose(outhp, (0, 2, 3, 1))), np.asarray(out))
    np.testing.assert_allclose(np.asarray(outhd), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_warp_span_dispatch_interpret():
    """Span dispatch: a tile x-span past COMP_KX-1 classifies wide (the
    full-band kernel handles it); a large sub-128 slack exercises the
    narrow kernel's lane rotate. Both match the XLA gather."""
    from multi_view_stereonet_tpu.ops.warp import grid_sample, _unnormalize_clamp
    from multi_view_stereonet_tpu.ops.pallas import warp_kernel as wk
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(7)
    B, H, W, C = 1, 480, 640, 3
    Ho, Wo = wk.TILE_R, wk.TILE_C  # one tile
    img = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))

    def make_grid(x0, x1):
        ix = np.linspace(x0, x1, Wo, dtype=np.float32)[None, None, :]
        iy = np.linspace(5.0, 20.0, Ho, dtype=np.float32)[None, :, None]
        ix = np.broadcast_to(ix, (B, Ho, Wo))
        iy = np.broadcast_to(iy, (B, Ho, Wo))
        return jnp.asarray(np.stack([(2.0 * ix + 1.0) / W - 1.0,
                                     (2.0 * iy + 1.0) / H - 1.0], axis=-1))

    # Wide case: span 280 > COMP_KX-1 but fits the BAND_KX band.
    grid_w = make_grid(10.3, 290.3)
    ixc = _unnormalize_clamp(grid_w[..., 0], W)
    iyc = _unnormalize_clamp(grid_w[..., 1], H)
    yb, xb, xoff, _, fits, fits_narrow, fits_half = wk._band_bases(
        ixc, iyc, H, W)
    assert bool(fits) and not bool(fits_narrow) and not bool(fits_half)
    ref_w, _ = grid_sample(img, grid_w)
    try:
        with pltpu.force_tpu_interpret_mode():
            out_w = wk._pallas_resample(img, ixc, iyc, yb, xb, xoff,
                                        exact=True)  # comp_kx=BAND_KX
            out_d = wk._resample_value(img, grid_w, exact="highest")
    except Exception as e:
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(ref_w),
                               rtol=1e-5, atol=1e-5)
    # The span dispatch routed to the wide kernel and agrees.
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(ref_w),
                               rtol=1e-5, atol=1e-5)

    # Narrow case with a large slack rotate: xmin=120.7 -> xoff=120,
    # span 250 <= COMP_KX-1 after the rotate (per-half spans ~124 also
    # fit the split-halves window; the direct call pins the narrow
    # kernel, and the dispatch also takes narrow -- the half branch is
    # gated off by default, wk.USE_SPLIT_HALVES -- same values).
    grid_n = make_grid(120.7, 370.7)
    ixc = _unnormalize_clamp(grid_n[..., 0], W)
    iyc = _unnormalize_clamp(grid_n[..., 1], H)
    yb, xb, xoff, _, fits, fits_narrow, fits_half = wk._band_bases(
        ixc, iyc, H, W)
    assert bool(fits) and bool(fits_narrow) and bool(fits_half)
    assert int(np.max(np.asarray(xoff))) >= 100  # the rotate is exercised
    ref_n, _ = grid_sample(img, grid_n)
    try:
        with pltpu.force_tpu_interpret_mode():
            out_n = wk._pallas_resample(img, ixc, iyc, yb, xb, xoff,
                                        exact=True, comp_kx=wk.COMP_KX)
            out_nd = wk._resample_value(img, grid_n, exact="highest")
    except Exception as e:
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(np.asarray(out_n), np.asarray(ref_n),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_nd), np.asarray(ref_n),
                               rtol=1e-5, atol=1e-5)

    # Middle branch: left half spans 200 (> HALF_KX-1) while the re-based
    # tile span stays <= COMP_KX-1 -> fits_narrow without fits_half.
    ix_piece = np.concatenate([
        np.linspace(10.0, 210.0, Wo // 2, dtype=np.float32),
        np.linspace(210.0, 240.0, Wo // 2, dtype=np.float32)])
    ixp = jnp.asarray(np.broadcast_to(ix_piece[None, None, :], (B, Ho, Wo)))
    iyp = _unnormalize_clamp(grid_n[..., 1], H)
    _, _, _, _, fits, fits_narrow, fits_half = wk._band_bases(
        ixp, iyp, H, W)
    assert bool(fits) and bool(fits_narrow) and not bool(fits_half)

    # Split-halves at B>1 with per-batch-DIFFERENT grids: the per-half
    # rotate offsets index as (b, 2*tid+h); a batched serving config
    # (batch x views folded into B) must hit the right slots.
    Bn = 3
    grids = np.concatenate([np.asarray(make_grid(120.7 + 40.0 * b,
                                                 370.7 + 40.0 * b))
                            for b in range(Bn)], axis=0)
    gridb = jnp.asarray(grids)
    imgb = jnp.asarray(rng.normal(size=(Bn, H, W, C)).astype(np.float32))
    ixb = _unnormalize_clamp(gridb[..., 0], W)
    iyb = _unnormalize_clamp(gridb[..., 1], H)
    yb, xb, _, xoff_half, fits, _, fits_half = wk._band_bases(
        ixb, iyb, H, W)
    assert bool(fits) and bool(fits_half)
    ref_b, _ = grid_sample(imgb, gridb)
    try:
        with pltpu.force_tpu_interpret_mode():
            out_b = wk._pallas_resample(imgb, ixb, iyb, yb, xb, xoff_half,
                                        exact=True, comp_kx=wk.HALF_KX,
                                        split_halves=True)
    except Exception as e:
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref_b),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("N", [1, 2])
def test_fused_incremental_chain_interpret_matches_scan(N):
    """ops/pallas/incremental_chain.py vs the lax.scan reference, via the
    Pallas interpreter: forward values and parameter VJP. N=1 covers the
    unrolled tile path, N=2 the fori_loop tile path."""
    from multi_view_stereonet_tpu.models.refiners import init_feature_refiner
    from multi_view_stereonet_tpu.models.mvsnet import _incremental_scan
    from multi_view_stereonet_tpu.ops.pallas.incremental_chain import (
        incremental_chain_fused, incremental_chain_supported)
    from multi_view_stereonet_tpu.geometry import (
        create_plane_sweep_homographies, incremental_homographies)
    from jax.experimental.pallas import tpu as pltpu

    key = jax.random.PRNGKey(0)
    D, h4, w4, C = 5, 16, 24, 32
    assert incremental_chain_supported(h4, w4, C)
    params = init_feature_refiner(key, C)
    params = jax.tree.map(
        lambda x: x + 0.03 * (jnp.arange(x.size, dtype=x.dtype)
                              .reshape(x.shape) % 5), params)
    feats0 = jax.random.normal(key, (N, h4, w4, C))
    image_rest = jax.random.normal(jax.random.PRNGKey(1), (N, D - 1, h4, w4, 3))
    K = jnp.tile(jnp.array([[[20.0, 0, w4 / 2], [0, 20, h4 / 2],
                             [0, 0, 1]]]), (N, 1, 1))
    T = jnp.tile(jnp.eye(4)[None], (N, 1, 1)).at[:, 0, 3].set(-1.0)
    samples = jnp.tile(jnp.linspace(0.05, 0.6, D)[None], (N, 1))
    H_inc = incremental_homographies(
        create_plane_sweep_homographies(T, K, samples))

    rest = _incremental_scan(params, feats0, image_rest, H_inc)
    ref = jnp.concatenate([feats0[:, None], rest], axis=1)
    try:
        with pltpu.force_tpu_interpret_mode():
            got = incremental_chain_fused(params, feats0, image_rest, H_inc)
    except Exception as e:  # interpreter support varies across jax versions
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5 * scale, rtol=2e-4)

    # Parameter VJP must be bitwise the XLA scan's (custom_vjp recompute).
    ct = jax.random.normal(key, ref.shape)

    def loss_scan(p):
        r = _incremental_scan(p, feats0, image_rest, H_inc)
        return jnp.sum(jnp.concatenate([feats0[:, None], r], axis=1) * ct)

    g1 = jax.grad(loss_scan)(params)
    with pltpu.force_tpu_interpret_mode():
        g2 = jax.grad(lambda p: jnp.sum(
            incremental_chain_fused(p, feats0, image_rest, H_inc) * ct))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
@pytest.mark.parametrize("cg,size,B", [(35, (30, 40), 1), (3, (16, 24), 2),
                                       (35, (60, 80), 1)])
def test_fused_refiner_interpret_matches_s2d(params, cg, size, B):
    """ops/pallas/refiner_kernel.py vs the XLA s2d refiner, via the
    Pallas interpreter: forward values and parameter VJP. Covers the
    feature-guided shape (cg=35, levels 4..2 geometry) and the image-only
    shape (cg=3), plus B>1 grid serialization."""
    from multi_view_stereonet_tpu.ops.pallas.refiner_kernel import (
        idepthmap_refiner_fused, fused_refiner_supported)
    from jax.experimental.pallas import tpu as pltpu

    H, W = size
    assert fused_refiner_supported(H, W, B)
    name = "refiner4" if cg == 35 else "refiner0"
    rng = np.random.default_rng(11)
    g = jnp.asarray(rng.uniform(-1, 1, (B, H, W, cg)).astype(np.float32))
    idp = jnp.asarray(rng.uniform(0, 2, (B, H, W)).astype(np.float32))

    ref = idepthmap_refiner_s2d(params[name], g, idp)
    try:
        with pltpu.force_tpu_interpret_mode():
            got = idepthmap_refiner_fused(params[name], g, idp)
    except Exception as e:  # interpreter support varies across jax versions
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5 * scale, rtol=2e-4)

    # Parameter VJP must be bitwise the XLA s2d path's (custom_vjp).
    ct = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))
    g1 = jax.grad(lambda p: jnp.sum(
        idepthmap_refiner_s2d(p, g, idp) * ct))(params[name])
    with pltpu.force_tpu_interpret_mode():
        g2 = jax.grad(lambda p: jnp.sum(
            idepthmap_refiner_fused(p, g, idp) * ct))(params[name])
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gn_apply_residual_fused_interpret_matches_xla():
    """Fused GN-apply+LeakyReLU+residual kernel vs the XLA composition
    (Pallas interpret mode; the kernel itself only engages on TPU)."""
    import numpy as np

    from multi_view_stereonet_tpu.models.s2d import group_norm_s2d
    from multi_view_stereonet_tpu.models.layers import leaky_relu
    from multi_view_stereonet_tpu.ops.pallas.gn_apply import (
        gn_apply_residual_fused, gn_apply_residual_supported)

    rng = np.random.default_rng(0)
    B, H, W, C4 = 2, 6, 16, 128
    x = jnp.asarray(rng.normal(size=(B, H, W, C4)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(B, H, W, C4)).astype(np.float32))
    gn = {"scale": jnp.asarray(rng.normal(size=(C4 // 4,)).astype(np.float32)),
          "bias": jnp.asarray(rng.normal(size=(C4 // 4,)).astype(np.float32))}
    groups = (C4 // 4) // 8
    assert gn_apply_residual_supported(x)

    want = leaky_relu(group_norm_s2d(gn, x, groups=groups)) + res
    try:
        got = gn_apply_residual_fused(gn, x, res, groups, True)
    except Exception as e:  # interpreter support varies across jax versions
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    # bf16 storage: the kernel rounds the apply THEN adds the residual at
    # bf16, matching the XLA path's order exactly.
    xb, rb = x.astype(jnp.bfloat16), res.astype(jnp.bfloat16)
    want16 = leaky_relu(group_norm_s2d(gn, xb, groups=groups)) + rb
    got16 = gn_apply_residual_fused(gn, xb, rb, groups, True)
    np.testing.assert_array_equal(np.asarray(got16, np.float32),
                                  np.asarray(want16, np.float32))

    # custom VJP: grads flow and match the XLA composition.
    def f_fused(p, a, r):
        return jnp.sum(jnp.cos(gn_apply_residual_fused(p, a, r, groups, True)))

    def f_xla(p, a, r):
        return jnp.sum(jnp.cos(
            leaky_relu(group_norm_s2d(p, a, groups=groups)) + r))

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(gn, x, res)
    g2 = jax.grad(f_xla, argnums=(0, 1, 2))(gn, x, res)
    # The ~1e-7 f32 fma-order forward difference perturbs the cos
    # cotangent, so grads agree to ~1e-3 relative, not bitwise.
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
