"""Feature-quality regularizers (defined for capability parity; unused by
the shipped training recipe, like the reference: utils/losses.py:20-89)."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import avg_pool_same
from ..ops.gradients import central_gradx, central_grady


def _znorm(features: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    mu = jnp.mean(features, axis=(1, 2), keepdims=True)
    # torch.std uses the unbiased (ddof=1) estimator.
    n = features.shape[1] * features.shape[2]
    var = jnp.sum(jnp.square(features - mu), axis=(1, 2), keepdims=True) / (n - 1)
    return (features - mu) / (jnp.sqrt(var) + eps)


def corner_loss(features: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """exp(-0.1 * mean det(structure tensor)) promoting corner-ness.

    features: (B, H, W, C). Reference: utils/losses.py:20-59.
    """
    z = _znorm(features)
    gx = central_gradx(z)
    gy = central_grady(z)
    gx2 = avg_pool_same(gx * gx, patch_size)
    gy2 = avg_pool_same(gy * gy, patch_size)
    gxy = avg_pool_same(gx * gy, patch_size)
    det = gx2 * gy2 - gxy * gxy
    return jnp.exp(-0.1 * jnp.mean(det))


def gradient_matching_loss(image: jnp.ndarray, features: jnp.ndarray) -> jnp.ndarray:
    """exp(-mean projection of feature gradients on image gradients).

    image: (B, H, W, C); features: (B, H, W, Cf).
    Reference: utils/losses.py:61-89.
    """
    gx_i = jnp.mean(central_gradx(image), axis=-1)
    gy_i = jnp.mean(central_grady(image), axis=-1)
    mag = jnp.sqrt(gx_i * gx_i + gy_i * gy_i)
    gxn = gx_i / (mag + 1e-3)
    gyn = gy_i / (mag + 1e-3)

    z = _znorm(features)
    gx_f = jnp.mean(central_gradx(z), axis=-1)
    gy_f = jnp.mean(central_grady(z), axis=-1)

    proj = jnp.mean(gxn * gx_f + gyn * gy_f)
    return jnp.exp(-proj)
