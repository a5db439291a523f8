"""3-D cost-volume regularization and soft-argmin idepth extraction.

References:
- CostVolumeFilter (multi_view_stereonet.py:302-353): four 3x3x3 Conv3d
  (32->32) + GroupNorm3d(4, 32) + LeakyReLU(0.2), then Conv3d 32->1.
- extract_idepthmap (multi_view_stereonet.py:486-492): softmin over the
  hypothesis axis (beta = 1.0) dotted with the idepth sample grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import init_conv3d, conv3d, init_group_norm, group_norm, leaky_relu


def init_cost_volume_filter(key, channels: int = 32):
    keys = jax.random.split(key, 5)
    params = {}
    for i in range(4):
        params[f"conv{i}"] = init_conv3d(keys[i], 3, channels, channels, bias=True)
        params[f"gn{i}"] = init_group_norm(channels)
    params["conv4"] = init_conv3d(keys[4], 3, channels, 1, bias=True)
    return params


def cost_volume_filter(params, volume: jnp.ndarray) -> jnp.ndarray:
    """volume: (B, D, H, W, C) -> filtered cost (B, D, H, W)."""
    c = volume.shape[-1]
    x = volume
    for i in range(4):
        x = leaky_relu(group_norm(params[f"gn{i}"], conv3d(params[f"conv{i}"], x), groups=c // 8))
    return conv3d(params["conv4"], x)[..., 0]


def cost_volume_filter_s2d(params, volume: jnp.ndarray) -> jnp.ndarray:
    """HW-space-to-depth execution of the filter -- same outputs, 128-lane
    convs (models/s2d.py; measured 0.21 -> 0.14 ms on v5e). Requires even
    H, W; callers fall back to the plain path otherwise."""
    from .s2d import (
        space_to_depth, depth_to_space, conv3d_s2d, group_norm_s2d,
    )

    c = volume.shape[-1]
    x = space_to_depth(volume)
    for i in range(4):
        x = leaky_relu(group_norm_s2d(
            params[f"gn{i}"], conv3d_s2d(params[f"conv{i}"], x),
            groups=c // 8))
    return depth_to_space(conv3d_s2d(params["conv4"], x))[..., 0]


def extract_idepthmap(cost_volume: jnp.ndarray, idepth_samples: jnp.ndarray,
                      beta: float = 1.0) -> jnp.ndarray:
    """Soft-argmin: sum_d softmin(beta * cost)_d * idepth_d.

    cost_volume: (B, D, H, W); idepth_samples: (B, D).
    Returns (B, H, W).
    """
    probs = jax.nn.softmax(-beta * cost_volume, axis=1)
    # HIGHEST: the call site guarantees f32 soft-argmin (idepth values
    # are precision-sensitive); without the pin the D-axis contraction
    # still truncates to bf16 on the TPU MXU at default precision.
    return jnp.einsum("bdhw,bd->bhw", probs,
                      idepth_samples.astype(probs.dtype),
                      precision="highest")
