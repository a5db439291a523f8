"""Bilinear-gather warps (grid_sample equivalent) and homography plane sweeps.

Correctness spec (must match torch ``grid_sample(mode="bilinear",
padding_mode="border", align_corners=False)`` as used throughout the
reference, e.g. image_predictor.py:519-521):

- unnormalize:  ix = ((gx + 1) * W - 1) / 2
- border padding: clamp the *float* coordinate to [0, size-1] before
  flooring, so interpolation weights come from the clamped coordinate;
- the invalid mask is computed from the *normalized* coordinates before
  clamping: invalid = |gx| > 1 or |gy| > 1 (image_predictor.py:513-516).

This module is the pure-XLA implementation (one fused gather for all depth
hypotheses). A Pallas kernel with the same semantics can be swapped in via
``multi_view_stereonet_tpu.ops.pallas``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.projection import pixel_grid


def _unnormalize_clamp(g: jnp.ndarray, size: int) -> jnp.ndarray:
    ix = ((g + 1.0) * size - 1.0) * 0.5
    return jnp.clip(ix, 0.0, size - 1.0)


def grid_sample(image: jnp.ndarray, grid: jnp.ndarray):
    """Bilinear sampling of ``image`` at normalized ``grid`` locations.

    image: (B, H, W, C); grid: (B, ..., 2) normalized coords (x, y).
    Returns (sampled (B, ..., C), invalid (B, ...) bool) where invalid=True
    marks out-of-bounds samples (pre-clamp), matching the reference's mask
    convention (mask=True means invalid).
    """
    B, H, W, C = image.shape
    out_shape = grid.shape[:-1]

    gx = grid[..., 0].reshape(B, -1)
    gy = grid[..., 1].reshape(B, -1)

    invalid = (jnp.abs(gx) > 1.0) | (jnp.abs(gy) > 1.0)

    ix = _unnormalize_clamp(gx, W)
    iy = _unnormalize_clamp(gy, H)

    x0f = jnp.floor(ix)
    y0f = jnp.floor(iy)
    wx = ix - x0f
    wy = iy - y0f

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)

    flat = image.reshape(B, H * W, C)

    def gather(yy, xx):
        idx = yy * W + xx  # (B, N)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)  # (B, N, C)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)

    # Interpolate at the image dtype (weights are exact in f32; for bf16
    # images the value rounding dominates anyway).
    wx = wx[..., None].astype(image.dtype)
    wy = wy[..., None].astype(image.dtype)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    out = top * (1.0 - wy) + bot * wy

    return out.reshape(*out_shape, C), invalid.reshape(out_shape)


def grid_sample_onehot(image: jnp.ndarray, grid: jnp.ndarray):
    """Gather-free bilinear sampling for SMALL images via one-hot matmuls.

    TPU gathers lower to scalar loops; for small sources (level-4 feature
    maps, 30x40) it is faster to express the x-interpolation as a dense
    one-hot matmul over the source width and the y-interpolation as a
    select-accumulate -- everything runs on MXU/VPU. Exact same semantics
    as ``grid_sample`` (f32 weights, HIGHEST-precision contraction).

    image: (B, H, W, C); grid: (B, ..., 2). Cost scales with W and H, so
    use only when H*W is small (see ``grid_sample_auto``).
    """
    B, H, W, C = image.shape
    out_shape = grid.shape[:-1]

    gx = grid[..., 0].reshape(B, -1)
    gy = grid[..., 1].reshape(B, -1)
    N = gx.shape[1]

    invalid = (jnp.abs(gx) > 1.0) | (jnp.abs(gy) > 1.0)

    ix = _unnormalize_clamp(gx, W)
    iy = _unnormalize_clamp(gy, H)

    x0f = jnp.floor(ix)
    wx = (ix - x0f)[..., None]
    x0 = x0f.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y0f = jnp.floor(iy)
    wy = (iy - y0f)[..., None]
    y0 = y0f.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)

    cols = jax.lax.broadcasted_iota(jnp.int32, (B, N, W), 2)
    Wx = (jnp.where(cols == x0[..., None], 1.0 - wx, 0.0)
          + jnp.where(cols == x1[..., None], wx, 0.0))
    # x-interpolate every source row at every sample's x position.
    xi = jnp.einsum("bnw,bhwc->bnhc", Wx, image, precision="highest")

    ys = jax.lax.broadcasted_iota(jnp.int32, (B, N, H), 2)
    Wy = (jnp.where(ys == y0[..., None], 1.0 - wy, 0.0)
          + jnp.where(ys == y1[..., None], wy, 0.0))
    out = jnp.einsum("bnh,bnhc->bnc", Wy, xi, precision="highest")
    out = out.astype(image.dtype)  # f32 weights promote bf16 values

    return out.reshape(*out_shape, C), invalid.reshape(out_shape)


# Sources at or below this pixel count route to the one-hot matmul path.
_ONEHOT_MAX_SOURCE_PIXELS = 2048


def grid_sample_auto(image: jnp.ndarray, grid: jnp.ndarray):
    """grid_sample with TPU-aware implementation selection."""
    small = image.shape[1] * image.shape[2] <= _ONEHOT_MAX_SOURCE_PIXELS
    if small and jax.default_backend() == "tpu":
        return grid_sample_onehot(image, grid)
    return grid_sample(image, grid)


def homography_grid(H: jnp.ndarray, rows: int, cols: int) -> jnp.ndarray:
    """Normalized sampling grid for warping by homographies.

    H: (B, ..., 3, 3) mapping *output* pixels to source pixels (left->right).
    Returns (B, ..., rows, cols, 2) normalized coords.
    Reference: HomographyImagePredictor (image_predictor.py:463-510).
    """
    pix = pixel_grid(rows, cols, H.dtype).reshape(3, -1)  # (3, N)
    xyz = jnp.einsum("...ij,jn->...in", H, pix, precision="highest")  # (B, ..., 3, N)
    uv = xyz[..., :2, :] / xyz[..., 2:3, :]
    # normalize: x' = 2 (x + 0.5)/cols - 1 (image_predictor.py:506-510)
    x = 2.0 * (uv[..., 0, :] + 0.5) / cols - 1.0
    y = 2.0 * (uv[..., 1, :] + 0.5) / rows - 1.0
    g = jnp.stack([x, y], axis=-1)  # (B, ..., N, 2)
    return g.reshape(*H.shape[:-2], rows, cols, 2)


def homography_warp(image: jnp.ndarray, H: jnp.ndarray):
    """Warp ``image`` (B, H, W, C) by per-batch homographies H (B, 3, 3).

    Returns (warped (B, H, W, C), invalid (B, H, W)).
    """
    rows, cols = image.shape[1], image.shape[2]
    grid = homography_grid(H, rows, cols)
    return grid_sample_auto(image, grid)


def homography_warp_auto(image: jnp.ndarray, H: jnp.ndarray,
                         zero_invalid: bool = False,
                         precision: str = "highest",
                         planar: bool = False,
                         out_dtype=None):
    """Homography warp routed to the Pallas band kernel when profitable.

    Uses the Pallas kernel on TPU for tile-compatible shapes (~3x faster
    than the XLA gather at 480x640); falls back to ``grid_sample``
    otherwise. Semantics identical to ``homography_warp``. ``planar``
    routes the Pallas output through a (B, C, H, W) custom call (same
    values, conv-friendly layout for small C; no effect off-TPU).
    ``out_dtype`` sets the output storage dtype (interpolation stays f32;
    one rounding at the write -- both paths).
    """
    rows, cols = image.shape[1], image.shape[2]
    grid = homography_grid(H, rows, cols)

    use_pallas = False
    if jax.default_backend() == "tpu":
        from .pallas import pallas_warp_supported
        use_pallas = pallas_warp_supported(image.shape, grid.shape)

    if use_pallas:
        from .pallas import homography_warp_pallas
        out, invalid = homography_warp_pallas(image, grid, exact=precision,
                                              planar=planar,
                                              out_dtype=out_dtype)
    else:
        out, invalid = grid_sample_auto(image, grid)
        if out_dtype is not None:
            out = out.astype(out_dtype)
    if zero_invalid:
        out = jnp.where(invalid[..., None], 0.0, out)
    return out, invalid


def plane_sweep_warp(image: jnp.ndarray, H_family: jnp.ndarray,
                     zero_invalid: bool = True):
    """Warp one image through a family of homographies into a volume.

    image: (B, H, W, C); H_family: (B, D, 3, 3).
    Returns (volume (B, D, H, W, C), invalid (B, D, H, W)).
    Invalid voxels are zeroed when ``zero_invalid`` (reference
    PlaneSweepWarper, multi_view_stereonet.py:196-235).

    All D hypotheses are sampled by a single fused gather -- the hypothesis
    axis is a real array axis, not a batch fold.
    """
    rows, cols = image.shape[1], image.shape[2]
    grid = homography_grid(H_family, rows, cols)  # (B, D, rows, cols, 2)
    vol, invalid = grid_sample_auto(image, grid)
    if zero_invalid:
        vol = jnp.where(invalid[..., None], 0.0, vol)
    return vol, invalid
