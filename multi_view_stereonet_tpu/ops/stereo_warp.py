"""Rectified and general-disparity view synthesis.

Counterpart of the reference's legacy two-view stereo path
(image_predictor.py:289-351 RectifiedImagePredictor and :578-601
ImagePredictor): horizontal-shift warping for rectified pairs and the
disparity -> idepth -> project -> sample composite for general motion
stereo. Carried for capability parity with the reference's
KITTI/SceneFlow-style datasets.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry import disparity_to_idepth, project_idepthmap
from ..geometry.projection import pixel_grid, normalize_pixel_coords
from .warp import grid_sample


def rectified_image_predictor(K, T_right_in_left, left_disparity, right_image):
    """Predict the left image from a rectified pair + left disparity.

    K, T_right_in_left: (B, 4, 4); left_disparity: (B, H, W);
    right_image: (B, H, W, C). The horizontal shift direction follows
    sign(tx) (image_predictor.py:322-327).
    Returns (pred (B, H, W, C), invalid (B, H, W)).
    """
    B, rows, cols = left_disparity.shape
    pix = pixel_grid(rows, cols, left_disparity.dtype)  # (3, H, W)
    sign = jnp.sign(T_right_in_left[:, 0, 3])[:, None, None]

    x = pix[0][None] - sign * left_disparity
    y = jnp.broadcast_to(pix[1][None], x.shape)
    uv = jnp.stack([x, y], axis=-1)
    grid = normalize_pixel_coords(uv, rows, cols)

    pred, invalid = grid_sample(right_image, grid)
    return pred, invalid


def disparity_image_predictor(K, T_right_in_left, left_disparity, right_image):
    """General (non-rectified) disparity view synthesis.

    disparity -> idepth -> project into right frame -> sample.
    Reference: ImagePredictor (image_predictor.py:578-601).
    Returns (pred (B, H, W, C), invalid (B, H, W)).
    """
    idepth = disparity_to_idepth(K, T_right_in_left, left_disparity)
    pixels, _idepths, invalid = project_idepthmap(K, T_right_in_left, idepth)
    pred, _ = grid_sample(right_image, pixels)
    return pred, invalid
