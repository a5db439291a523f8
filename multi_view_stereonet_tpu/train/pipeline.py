"""Batch unpacking: pyramids, K pyramid, baseline normalization, GT idepth.

Device-side, jit-compatible re-design of the reference unpack functions
(multi_view_stereonet_utils.py:406-501 and :541-641). Host-side work
(decoding, resizing to the training size) lives in ``data``; everything
here is pure array math so it fuses into the compiled step.

Array conventions: images NHWC; right-view stacks carry a view axis V
(B, V, H, W, C); depthmaps (B, H, W).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry import build_K_pyramid, baseline_norm, normalize_baseline
from ..geometry.transforms import se3_inverse
from ..ops import build_image_pyramid


def _pyramid_sizes(H: int, W: int, num_levels: int):
    sizes = [(H, W)]
    for _ in range(1, num_levels):
        H = (H + 1) // 2
        W = (W + 1) // 2
        sizes.append((H, W))
    return sizes


def _idepth_from_depth(depth: jnp.ndarray) -> jnp.ndarray:
    """1/depth where depth > 0, else 0 (reference :491-497)."""
    return jnp.where(depth > 0, 1.0 / jnp.where(depth > 0, depth, 1.0), depth)


def unpack_batch(batch: dict, num_levels: int = 5) -> dict:
    """Two-view unpack: unit-baseline pose, pyramids, GT scaling.

    batch: left_image (B,H,W,3), right_image (B,H,W,3), K (B,4,4),
    T_right_in_left (B,4,4), optional left/right_depthmap_true (B,H,W).
    Reference: multi_view_stereonet_utils.py:406-501.
    """
    left = batch["left_image"]
    right = batch["right_image"]
    B, H, W = left.shape[0], left.shape[1], left.shape[2]

    T_right_in_left, baseline = normalize_baseline(batch["T_right_in_left"])
    T_left_in_right = se3_inverse(T_right_in_left)

    left_pyr = build_image_pyramid(left, num_levels)
    right_pyr = build_image_pyramid(right, num_levels)
    K_pyr = build_K_pyramid(batch["K"], _pyramid_sizes(H, W, num_levels))

    inputs = {
        "T_right_in_left": T_right_in_left,
        "T_left_in_right": T_left_in_right,
        "K_pyr": K_pyr,
        "left_image_pyr": left_pyr,
        "right_image_pyr": right_pyr,
        "baseline": baseline,
    }

    if "left_depthmap_true" in batch:
        b = baseline[:, None, None]
        inputs["left_depthmap_true"] = batch["left_depthmap_true"] / b
        inputs["right_depthmap_true"] = batch["right_depthmap_true"] / b
        inputs["left_idepthmap_true"] = _idepth_from_depth(inputs["left_depthmap_true"])
        inputs["right_idepthmap_true"] = _idepth_from_depth(inputs["right_depthmap_true"])
    return inputs


def multi_view_unpack_batch(batch: dict, num_levels: int = 5) -> dict:
    """Multi-view unpack: poses scaled by the FIRST right camera's baseline.

    batch: left_image (B,H,W,3), right_images (B,V,H,W,3), K (B,4,4),
    T_right_in_left (B,V,4,4), optional left_depthmap_true (B,H,W) and
    right_depthmap_true (B,V,H,W).
    Reference: multi_view_stereonet_utils.py:541-641 (baseline at :596-604).
    """
    left = batch["left_image"]
    rights = batch["right_images"]
    B, V = rights.shape[0], rights.shape[1]
    H, W = left.shape[1], left.shape[2]

    T = batch["T_right_in_left"]  # (B, V, 4, 4)
    baseline = baseline_norm(T[:, 0])  # (B,) -- first right camera
    T = T.at[..., :3, 3].divide(baseline[:, None, None])
    T_left_in_right = se3_inverse(T)

    left_pyr = build_image_pyramid(left, num_levels)
    rights_flat = build_image_pyramid(
        rights.reshape((B * V,) + rights.shape[2:]), num_levels)
    right_pyrs = [r.reshape((B, V) + r.shape[1:]) for r in rights_flat]

    K_pyr = build_K_pyramid(batch["K"], _pyramid_sizes(H, W, num_levels))

    inputs = {
        "T_right_in_left": T,
        "T_left_in_right": T_left_in_right,
        "K_pyr": K_pyr,
        "left_image_pyr": left_pyr,
        "right_image_pyr": right_pyrs,
        "baseline": baseline,
    }

    if "left_depthmap_true" in batch:
        b = baseline[:, None, None]
        inputs["left_depthmap_true"] = batch["left_depthmap_true"] / b
        inputs["left_idepthmap_true"] = _idepth_from_depth(inputs["left_depthmap_true"])
        if "right_depthmap_true" in batch:
            bb = baseline[:, None, None, None]
            inputs["right_depthmap_true"] = batch["right_depthmap_true"] / bb
            inputs["right_idepthmap_true"] = _idepth_from_depth(
                inputs["right_depthmap_true"])
    return inputs
