"""Supervised inverse-depth losses."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import resize_bilinear


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of x over elements where mask is True (jit-safe).

    An empty mask contributes 0 instead of 0/0 = NaN -- the codebase-wide
    empty-mask policy (see consistency._masked_mean_or_zero): a batch
    with no valid GT, or a fully-occluded photometric mask, must not
    poison the training step. Identical to the plain mean whenever the
    mask is non-empty.
    """
    m = mask.astype(x.dtype)
    count = jnp.sum(m)
    return jnp.where(count > 0, jnp.sum(x * m) / jnp.maximum(count, 1.0), 0.0)


def pseudo_huber_loss(truth: jnp.ndarray, pred: jnp.ndarray, scale: float = 2.0,
                      mask=None) -> jnp.ndarray:
    """mean(sqrt(((pred-truth)/scale)^2 + 1) - 1) over masked elements.

    Reference: utils/losses.py:11-18 (Barron-style robust loss, scale 2.0).
    """
    diff2 = jnp.square((pred - truth) / scale)
    elem = jnp.sqrt(diff2 + 1.0) - 1.0
    if mask is None:
        return jnp.mean(elem)
    return masked_mean(elem, mask)


def supervised_idepthmap_loss(idepthmap: jnp.ndarray, truth: jnp.ndarray,
                              truth_mask: jnp.ndarray,
                              scale_factor: float = 1000.0,
                              normalize: bool = True) -> jnp.ndarray:
    """Pseudo-Huber loss between a (resized) prediction and GT idepth.

    idepthmap: (B, h, w) prediction at any level; truth/truth_mask:
    (B, H, W) ground truth and validity. The prediction is bilinearly
    resized to the truth size; both sides are normalized by the per-image
    mean of *valid* true idepths and scaled by ``scale_factor``.
    Reference: multi_view_stereonet/losses.py:14-40.
    """
    pred = resize_bilinear(idepthmap, truth.shape[-2:])

    if normalize:
        m = truth_mask.astype(truth.dtype)
        count = jnp.sum(m, axis=(1, 2), keepdims=True)
        # An all-invalid GT map would make this 0/0 = NaN and (NaN * 0)
        # would poison the whole batch loss through the masked mean. The
        # reference asserts on that input (losses.py:38); here such an
        # image contributes 0 instead (same deliberate divergence as the
        # LR-consistency empty-mask case, docs/PARITY.md).
        mean_idepths = (jnp.sum(truth * m, axis=(1, 2), keepdims=True)
                        / jnp.maximum(count, 1.0))
        mean_idepths = jnp.where(count > 0, mean_idepths, 1.0)
    else:
        mean_idepths = jnp.ones_like(truth[:, :1, :1])

    t = scale_factor * truth / mean_idepths
    p = scale_factor * pred / mean_idepths
    return pseudo_huber_loss(t, p, mask=truth_mask)
