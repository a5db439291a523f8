"""Photometric losses: SSIM, SSIM+L1 reconstruction, edge-aware smoothness."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import avg_pool_same
from ..ops.gradients import gaussian_blur, forward_gradx, forward_grady
from .supervised import masked_mean


def ssim(x: jnp.ndarray, y: jnp.ndarray, patch_size: int = 3) -> jnp.ndarray:
    """Monodepth-style SSIM distance in [0, 1] (elementwise map).

    x, y: (B, H, W, C). Returns (1 - SSIM)/2 clamped to [0, 1].
    Reference: utils/losses.py:91-120 (3x3 avg-pool means/variances).
    """
    C1 = 0.01**2
    C2 = 0.03**2

    mu_x = avg_pool_same(x, patch_size)
    mu_y = avg_pool_same(y, patch_size)
    sigma_x = avg_pool_same(x * x, patch_size) - mu_x * mu_x
    sigma_y = avg_pool_same(y * y, patch_size) - mu_y * mu_y
    sigma_xy = avg_pool_same(x * y, patch_size) - mu_x * mu_y

    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x * mu_x + mu_y * mu_y + C1) * (sigma_x + sigma_y + C2)
    s = (1 - n / d) / 2
    return jnp.clip(s, 0.0, 1.0)


def reconstruction_photometric_loss(image: jnp.ndarray, image_pred: jnp.ndarray,
                                    invalid_mask: jnp.ndarray,
                                    ssim_factor: float = 0.85) -> jnp.ndarray:
    """0.85*SSIM + 0.15*L1 over valid pixels.

    image, image_pred: (B, H, W, C); invalid_mask: (B, H, W) bool, True =
    exclude. The SSIM term uses the invalid mask dilated by a 3x3 avg-pool
    (SSIM needs valid neighbors). Reference: utils/losses.py:122-141.
    """
    valid = ~invalid_mask[..., None]
    validc = jnp.broadcast_to(valid, image.shape)
    l1 = masked_mean(jnp.abs(image_pred - image), validc)

    patch = 3
    dilated = avg_pool_same(invalid_mask.astype(image.dtype), patch) > 0
    dvalid = jnp.broadcast_to(~dilated[..., None], image.shape)
    ssim_map = ssim(image_pred, image, patch)
    ssim_loss = masked_mean(ssim_map, dvalid)

    return ssim_factor * ssim_loss + (1.0 - ssim_factor) * l1


def smoothness_loss(image: jnp.ndarray, output: jnp.ndarray, alpha: float
                    ) -> jnp.ndarray:
    """Edge-aware TV-L1 smoothness with Gaussian-blurred image gradients.

    image: (B, H, W, C); output: (B, H, W, Co).
    Reference: utils/losses.py:143-171.
    """
    image_smooth = gaussian_blur(image, 5, 1.0)
    igx = forward_gradx(image_smooth)
    igy = forward_grady(image_smooth)

    ogx = forward_gradx(output)
    ogy = forward_grady(output)

    wx = jnp.exp(-alpha * jnp.mean(jnp.abs(igx), axis=-1, keepdims=True))
    wy = jnp.exp(-alpha * jnp.mean(jnp.abs(igy), axis=-1, keepdims=True))

    sx = jnp.mean(jnp.abs(ogx) * wx)
    sy = jnp.mean(jnp.abs(ogy) * wy)
    return sx + sy
