"""Validation metrics: disparity EPE + outlier rates + D1.

The reference's validation.txt columns (pretrained/*/validation.txt:
``epoch loss epe outlier_rate1 outlier_rate2 outlier_rate3 d1_all``) come
from its external training harness; reconstructed here with the standard
definitions: EPE = mean |disp_est - disp_true| over valid pixels,
outlier_rateK = fraction with error > K px, D1 = fraction with error
> 3 px AND > 5% of true disparity (KITTI).

Disparities come from idepthmaps via the general epipolar conversion
(geometry.idepth_to_disparity), using unit-baseline quantities, so EPE is
in pixels at the evaluation resolution.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry import idepth_to_disparity


def disparity_metrics(K, T_right_in_left, idepth_est, idepth_true):
    """All inputs (B, ...); idepth maps (B, H, W) at the same scale.

    Returns dict of scalars (jnp) with keys epe, outlier_rate1/2/3, d1_all.
    """
    disp_est = idepth_to_disparity(K, T_right_in_left, idepth_est)
    disp_true = idepth_to_disparity(K, T_right_in_left, idepth_true)

    valid = idepth_true > 0
    err = jnp.abs(disp_est - disp_true)
    n = jnp.maximum(jnp.sum(valid), 1)

    def rate(mask):
        return jnp.sum(mask & valid) / n

    epe = jnp.sum(jnp.where(valid, err, 0.0)) / n
    return {
        "epe": epe,
        "outlier_rate1": rate(err > 1.0),
        "outlier_rate2": rate(err > 2.0),
        "outlier_rate3": rate(err > 3.0),
        "d1_all": rate((err > 3.0) & (err > 0.05 * disp_true)),
    }
