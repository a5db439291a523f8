"""Cross-view consistency: occlusion masks, view-synthesis reconstruction,
left/right idepth consistency."""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry import project_idepthmap
from ..geometry.transforms import se3_inverse, mat3_inverse
from ..geometry.projection import backproject_idepthmap, project_points
from ..ops import grid_sample, resize_bilinear
from .photometric import reconstruction_photometric_loss


def _masked_mean_or_zero(x, mask):
    """Masked mean that contributes 0 when the mask is empty.

    The reference's boolean-indexing mean NaNs on an empty selection
    (losses.py:136-138); since the unoccluded-in-both-views intersection
    can legitimately be empty, an empty mask contributes no loss here
    instead of poisoning the training step.
    """
    m = mask.astype(x.dtype)
    count = jnp.sum(m)
    return jnp.where(count > 0, jnp.sum(x * m) / jnp.maximum(count, 1.0), 0.0)


def predict_image_from_idepth(K: jnp.ndarray, T_right_in_left: jnp.ndarray,
                              left_idepthmap: jnp.ndarray,
                              right_image: jnp.ndarray):
    """Predict the left image by sampling the right image at projected pixels.

    K, T_right_in_left: (B, 4, 4); left_idepthmap: (B, H, W);
    right_image: (B, H, W, C). Returns (pred (B, H, W, C),
    invalid mask (B, H, W)). Reference: IDepthImagePredictor
    (image_predictor.py:353-398).
    """
    T_left_in_right = se3_inverse(T_right_in_left)
    points = backproject_idepthmap(K, left_idepthmap)
    pixels = project_points(K, T_left_in_right,
                            right_image.shape[1:3], points)
    invalid = (jnp.abs(pixels[..., 0]) > 1.0) | (jnp.abs(pixels[..., 1]) > 1.0)
    pred, _ = grid_sample(right_image, pixels)
    return pred, invalid


def get_occlusion_mask(K, T_right_in_left, left_idepthmap, left_invalid_mask,
                       right_idepthmap, right_invalid_mask):
    """Mask of left pixels occluded in the right view (adaptive threshold).

    left/right_idepthmap: (B, H, W). Returns (B, H, W) bool, True=occluded.
    Reference: multi_view_stereonet/losses.py:42-78 ("Depth from Videos in
    the Wild" style: a pixel is occluded when the sampled right idepth
    exceeds the projected idepth by more than the mean absolute diff).
    The left/right invalid masks are accepted for API parity but unused,
    exactly as in the reference (:75-76).
    """
    del left_invalid_mask, right_invalid_mask
    B = left_idepthmap.shape[0]

    uv_prime, id_prime, prime_invalid = project_idepthmap(
        K, T_right_in_left, left_idepthmap)
    id_pred, _ = grid_sample(right_idepthmap[..., None], uv_prime)
    id_pred = id_pred[..., 0]

    id_diff = id_pred - id_prime
    thresh = jnp.mean(jnp.abs(id_diff.reshape(B, -1)), axis=1)[:, None, None]
    occluded = id_diff > thresh
    return occluded | prime_invalid


def reconstruction_loss(T_right_in_left, K, left_image, right_image,
                        left_idepthmap, left_occlusion_mask):
    """View-synthesis loss at full image resolution.

    left_idepthmap: (B, h, w) at any level (resized internally);
    left_occlusion_mask: (B, h, w) bool.
    Returns (loss, predicted left image (B, H, W, C)).
    Reference: multi_view_stereonet/losses.py:81-106.
    """
    size = left_image.shape[1:3]
    idepth = resize_bilinear(left_idepthmap, size)
    occ = resize_bilinear(left_occlusion_mask.astype(left_image.dtype), size) > 0.5
    pred, _ = predict_image_from_idepth(K, T_right_in_left, idepth, right_image)
    loss = reconstruction_photometric_loss(left_image, pred, occ)
    return loss, pred


def left_right_idepthmap_consistency_losses(
        T_right_in_left, T_left_in_right, K_pyr,
        left_idepthmap_pyr, left_occlusion_mask_pyr,
        right_idepthmap_pyr, right_occlusion_mask_pyr):
    """Bidirectional project-and-sample L1 between left/right idepthmaps.

    Pyramid entries: (B, h, w) idepthmaps, (B, h, w) bool occlusion masks.
    Reference: multi_view_stereonet/losses.py:108-160.
    """
    loss = 0.0
    for lvl in range(len(left_idepthmap_pyr)):
        if left_idepthmap_pyr[lvl] is None:
            continue
        K = K_pyr[lvl]

        # left -> right
        l2r_pix, l2r_id, _ = project_idepthmap(K, T_right_in_left,
                                               left_idepthmap_pyr[lvl])
        r_samp, _ = grid_sample(right_idepthmap_pyr[lvl][..., None], l2r_pix)
        r_occ_samp, _ = grid_sample(
            right_occlusion_mask_pyr[lvl][..., None].astype(jnp.float32), l2r_pix)
        r_unocc = (~left_occlusion_mask_pyr[lvl]) & ~(r_occ_samp[..., 0] > 0)
        right_loss = _masked_mean_or_zero(jnp.abs(l2r_id - r_samp[..., 0]), r_unocc)

        # right -> left
        r2l_pix, r2l_id, _ = project_idepthmap(K, T_left_in_right,
                                               right_idepthmap_pyr[lvl])
        l_samp, _ = grid_sample(left_idepthmap_pyr[lvl][..., None], r2l_pix)
        l_occ_samp, _ = grid_sample(
            left_occlusion_mask_pyr[lvl][..., None].astype(jnp.float32), r2l_pix)
        l_unocc = (~right_occlusion_mask_pyr[lvl]) & ~(l_occ_samp[..., 0] > 0)
        left_loss = _masked_mean_or_zero(jnp.abs(r2l_id - l_samp[..., 0]), l_unocc)

        loss = loss + right_loss + left_loss
    return loss
