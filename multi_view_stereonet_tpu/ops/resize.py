"""Separable matmul image resizes (bilinear + area) and pooling.

Design: torch's ``F.interpolate`` bilinear/area resamplings are separable
linear maps with *static* weights once the shapes are known. Instead of
emitting gathers, we precompute (numpy, at trace time) the per-axis weight
matrices and apply them as two small matmuls -- which XLA tiles onto the
MXU and fuses with neighboring elementwise work. This is both faster on TPU
than gather-based resampling and lets us match the reference's exact
conventions:

- bilinear, align_corners=False, half-pixel centers with the negative-side
  clamp (src = max(0, (dst + 0.5) * scale - 0.5)); used by the reference's
  Upsampler / MaskUpsampler / loss resizes
  (multi_view_stereonet.py:355-396, losses.py:32-34).
- "area" = adaptive average pooling with integer bin edges
  start = floor(i * in/out), end = ceil((i+1) * in/out), equal weights;
  used by the reference's image pyramid with ceil-halved sizes
  (utils/image_utils.py:111-128).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=256)
def _bilinear_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out_size, in_size) row-stochastic bilinear resampling matrix."""
    if out_size == in_size:
        return np.eye(out_size, dtype=np.float32)
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    src = np.maximum(src, 0.0)  # torch clamps negative source indices to 0
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    lam = (src - i0).astype(np.float32)
    i1 = np.minimum(i0 + 1, in_size - 1)
    M = np.zeros((out_size, in_size), dtype=np.float32)
    M[np.arange(out_size), i0] += 1.0 - lam
    M[np.arange(out_size), i1] += lam
    return M


@functools.lru_cache(maxsize=256)
def _area_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out_size, in_size) adaptive-average-pooling matrix."""
    if out_size == in_size:
        return np.eye(out_size, dtype=np.float32)
    M = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil
        M[i, start:end] = 1.0 / (end - start)
    return M


def _apply_separable(x: jnp.ndarray, Mh: np.ndarray, Mw: np.ndarray) -> jnp.ndarray:
    """Apply per-axis resampling matrices to NHWC (or NHW) input."""
    Mh = jnp.asarray(Mh, dtype=x.dtype)
    Mw = jnp.asarray(Mw, dtype=x.dtype)
    if x.ndim == 3:  # (B, H, W)
        return jnp.einsum("oh,pw,bhw->bop", Mh, Mw, x, precision="highest")
    return jnp.einsum("oh,pw,bhwc->bopc", Mh, Mw, x, precision="highest")


def resize_bilinear(x: jnp.ndarray, out_size) -> jnp.ndarray:
    """Bilinear resize (align_corners=False), NHWC or NHW input.

    Formulation note (measured on v5e, scripts/profile_micro.py): the
    separable `highest`-precision einsum beats every elementwise
    rewriting tried for the 2x up/down special cases -- stride-2
    lane-dim slicing costs relayouts (0.47 ms vs 0.20 ms for a 4-level
    480x640 pyramid), reshape-add is 12x worse, and the two-tap
    interleave upsample is ~10% slower than the matrix form. Keep the
    matmuls.
    """
    rows, cols = out_size
    h_axis = 1
    return _apply_separable(
        x, _bilinear_matrix(rows, x.shape[h_axis]), _bilinear_matrix(cols, x.shape[h_axis + 1])
    )


def resize_area(x: jnp.ndarray, out_size) -> jnp.ndarray:
    """Area (adaptive average pooling) resize, NHWC or NHW input."""
    rows, cols = out_size
    return _apply_separable(
        x, _area_matrix(rows, x.shape[1]), _area_matrix(cols, x.shape[2])
    )


def build_image_pyramid(image: jnp.ndarray, num_levels: int) -> list:
    """Area-downsampled pyramid with ceil-halved sizes.

    image: (B, H, W, C). Reference: utils/image_utils.py:111-128.
    """
    pyr = [image]
    for _ in range(1, num_levels):
        h = (pyr[-1].shape[1] + 1) // 2
        w = (pyr[-1].shape[2] + 1) // 2
        pyr.append(resize_area(pyr[-1], (h, w)))
    return pyr


def upsample_mask(mask: jnp.ndarray, out_size) -> jnp.ndarray:
    """Bilinear-upsample a boolean mask and re-threshold at 0.5.

    mask: (B, H, W) or (B, H, W, C) bool.
    Reference: MaskUpsampler (multi_view_stereonet.py:382-396).
    """
    maskf = mask.astype(jnp.float32)
    return resize_bilinear(maskf, out_size) > 0.5


def avg_pool_same(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """Same-size average pooling with zero padding counted in the mean.

    Matches torch ``avg_pool2d(x, patch, stride=1, padding=patch//2)`` with
    count_include_pad=True (reference utils/losses.py:104-109,131-132).
    x: (B, H, W, C) or (B, H, W).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    pad = patch // 2
    C = x.shape[-1]
    # Depthwise uniform conv (differentiable, unlike a raw reduce_window).
    w = jnp.full((patch, patch, 1, C), 1.0 / (patch * patch), dtype=x.dtype)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
    return out[..., 0] if squeeze else out
