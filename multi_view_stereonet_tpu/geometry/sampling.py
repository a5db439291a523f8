"""Data-dependent inverse-depth hypothesis grids.

JIT-safe re-design of the reference's ``create_idepth_samples``
(multi_view_stereonet.py:131-165): boolean-mask means become where-based
masked reductions so everything stays shape-static.
"""

from __future__ import annotations

import jax.numpy as jnp

from .projection import disparity_to_idepth


def create_idepth_samples(T_right_in_left: jnp.ndarray, K: jnp.ndarray,
                          rows: int, cols: int, num_idepth_samples: int) -> jnp.ndarray:
    """Per-batch linear idepth grid from 0 to a geometry-derived max.

    Max idepth = mean over valid pixels of the idepth corresponding to the
    maximum representable disparity (num_samples - 1), clamped to <= 2.0 and
    clamped so no sample falls behind the right camera (1 / tz).

    T_right_in_left: (B, 4, 4) *unit-baseline* pose; K: (B, 4, 4).
    Returns (B, num_idepth_samples).
    Reference: multi_view_stereonet.py:131-165.
    """
    B = T_right_in_left.shape[0]
    dtype = T_right_in_left.dtype

    max_disp = (num_idepth_samples - 1) * jnp.ones((B, rows, cols), dtype=dtype)
    max_idepthmap = disparity_to_idepth(K, T_right_in_left, max_disp)
    max_idepthmap = jnp.where(max_idepthmap > 0, max_idepthmap, 0.0)

    flat = max_idepthmap.reshape(B, -1)
    total = jnp.sum(flat, axis=1)
    count = jnp.sum(flat > 0, axis=1).astype(dtype)
    max_idepths = total / count  # matches reference (NaN if count==0, as there)
    max_idepths = jnp.minimum(max_idepths, 2.0)

    # Keep samples in front of the right camera (:152-154).
    tz = T_right_in_left[:, 2, 3]
    behind = (1.0 / max_idepths) < tz
    max_idepths = jnp.where(behind, 1.0 / tz, max_idepths)

    steps = jnp.arange(num_idepth_samples, dtype=dtype)  # min idepth = 0
    delta = max_idepths / (num_idepth_samples - 1)
    return steps[None, :] * delta[:, None]
