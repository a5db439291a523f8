"""Image gradients and Gaussian blur.

Reference: utils/image_utils.py:11-109. Gradients use replicate padding.
The reference's GaussianBlur builds a depthwise torch Conv2d with
padding_mode="border" -- a mode torch never actually implemented for convs;
under torch 1.5 any unknown mode silently behaved as zero padding, so the
effective (and reproduced) semantics are a zero-padded depthwise conv.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def forward_gradx(image: jnp.ndarray) -> jnp.ndarray:
    """Forward horizontal gradient, replicate-padded (x[i] - x[i+1]).

    image: (B, H, W, C). Reference: image_utils.py:65-75.
    """
    pad = jnp.concatenate([image, image[:, :, -1:]], axis=2)
    return pad[:, :, :-1] - pad[:, :, 1:]


def forward_grady(image: jnp.ndarray) -> jnp.ndarray:
    """Forward vertical gradient, replicate-padded."""
    pad = jnp.concatenate([image, image[:, -1:]], axis=1)
    return pad[:, :-1] - pad[:, 1:]


def central_gradx(image: jnp.ndarray) -> jnp.ndarray:
    """Central horizontal gradient 0.5*(x[i+1]-x[i-1]), replicate-padded."""
    pad = jnp.concatenate([image[:, :, :1], image, image[:, :, -1:]], axis=2)
    return 0.5 * (pad[:, :, 2:] - pad[:, :, :-2])


def central_grady(image: jnp.ndarray) -> jnp.ndarray:
    """Central vertical gradient, replicate-padded."""
    pad = jnp.concatenate([image[:, :1], image, image[:, -1:]], axis=1)
    return 0.5 * (pad[:, 2:] - pad[:, :-2])


@functools.lru_cache(maxsize=16)
def _gaussian_kernel(kernel_size: int, sigma: float) -> np.ndarray:
    coords = np.arange(kernel_size, dtype=np.float64)
    mean = (kernel_size - 1) / 2.0
    g = np.exp(-((coords - mean) ** 2) / (2 * sigma**2))
    k2 = np.outer(g, g)
    return (k2 / k2.sum()).astype(np.float32)


def gaussian_blur(image: jnp.ndarray, kernel_size: int = 5, sigma: float = 1.0
                  ) -> jnp.ndarray:
    """Depthwise Gaussian blur, zero ("same") padding.

    image: (B, H, W, C). Reference: image_utils.py:11-46.
    """
    C = image.shape[-1]
    k = jnp.asarray(_gaussian_kernel(kernel_size, sigma), dtype=image.dtype)
    w = jnp.tile(k[:, :, None, None], (1, 1, 1, C))  # HWIO with I=1 (depthwise)
    p = kernel_size // 2
    return jax.lax.conv_general_dilated(
        image, w,
        window_strides=(1, 1),
        padding=((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def blur_with_zeros(image: jnp.ndarray, kernel_size: int = 5, sigma: float = 1.0
                    ) -> jnp.ndarray:
    """Gaussian blur that ignores non-positive entries.

    Reference: image_utils.py:48-63 (ratio of blurred image to blurred
    validity mask).
    """
    mask = (image > 0).astype(image.dtype)
    blurred = gaussian_blur(image, kernel_size, sigma)
    weights = gaussian_blur(mask, kernel_size, sigma)
    out = jnp.where(weights == 0, 0.0, blurred / jnp.where(weights == 0, 1.0, weights))
    return out
