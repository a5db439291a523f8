"""Loss dispatcher: weighted sum of supervised / consistency / photometric.

Reference: compute_losses (multi_view_stereonet_utils.py:664-793). The
shipped pretrained recipe is pure supervision (supervision_factor 1.0,
others 0.0; pretrained/gta_sfm_150epochs/params.yaml:36-39) with
idepth_scale_factor = 100 hard-coded (:674); the consistency and
reconstruction paths exist for capability parity and the two-view
(estimate_right_idepthmap) recipe.
"""

from __future__ import annotations

import dataclasses

from .supervised import supervised_idepthmap_loss
from .consistency import (
    get_occlusion_mask,
    reconstruction_loss,
    left_right_idepthmap_consistency_losses,
)


@dataclasses.dataclass(frozen=True)
class LossConfig:
    supervision_factor: float = 1.0
    reconstruction_factor: float = 0.0
    left_right_factor: float = 0.0
    idepth_scale_factor: float = 100.0


def compute_losses(inputs: dict, outputs: dict, config: LossConfig):
    """Returns (total loss, loss dict, predictions dict).

    inputs: left_idepthmap_true (B, H, W) [+ right_idepthmap_true],
    K_pyr, T_right_in_left / T_left_in_right (B, 4, 4) for the two-view
    consistency paths, left/right_image_pyr.
    outputs: model forward outputs (idepthmaps (B, h, w)).
    """
    loss = 0.0
    loss_dict = {}
    predictions = {}

    if config.supervision_factor > 0.0:
        left_true = inputs["left_idepthmap_true"]
        left_mask = left_true > 0
        supervised_losses = []
        for lvl in range(len(outputs["left_idepthmap_pyr"])):
            if outputs["left_idepthmap_pyr"][lvl] is None:
                continue
            supervised_losses.append(supervised_idepthmap_loss(
                outputs["left_idepthmap_pyr"][lvl], left_true, left_mask,
                config.idepth_scale_factor))
        # Raw coarsest level (:689-692).
        supervised_losses.append(supervised_idepthmap_loss(
            outputs["left_idepthmap_raw_pyr"][-1], left_true, left_mask,
            config.idepth_scale_factor))

        if "right_idepthmap_pyr" in outputs:
            right_true = inputs["right_idepthmap_true"]
            right_mask = right_true > 0
            for lvl in range(len(outputs["right_idepthmap_pyr"])):
                if outputs["right_idepthmap_pyr"][lvl] is None:
                    continue
                supervised_losses.append(supervised_idepthmap_loss(
                    outputs["right_idepthmap_pyr"][lvl], right_true, right_mask,
                    config.idepth_scale_factor))

        loss_dict["supervised_losses"] = supervised_losses
        supervised_loss = sum(supervised_losses) / len(supervised_losses)
        loss = loss + config.supervision_factor * supervised_loss
        loss_dict["supervised_loss"] = supervised_loss

    if "right_idepthmap_pyr" in outputs:
        # Occlusion masks per level (:712-746). The masks passed through for
        # API parity are the model's validity masks; as in the reference they
        # do not affect the occlusion logic.
        n = len(outputs["left_idepthmap_pyr"])
        left_occ = [None] * n
        right_occ = [None] * n
        for lvl in range(n):
            if outputs["left_idepthmap_pyr"][lvl] is None:
                continue
            left_occ[lvl] = get_occlusion_mask(
                inputs["K_pyr"][lvl], inputs["T_right_in_left"],
                outputs["left_idepthmap_pyr"][lvl], None,
                outputs["right_idepthmap_pyr"][lvl], None)
            right_occ[lvl] = get_occlusion_mask(
                inputs["K_pyr"][lvl], inputs["T_left_in_right"],
                outputs["right_idepthmap_pyr"][lvl], None,
                outputs["left_idepthmap_pyr"][lvl], None)
        predictions["left_occlusion_mask_pyr"] = left_occ
        predictions["right_occlusion_mask_pyr"] = right_occ

        predictions["left_occlusion_mask_true"] = get_occlusion_mask(
            inputs["K_pyr"][0], inputs["T_right_in_left"],
            inputs["left_idepthmap_true"], None,
            inputs["right_idepthmap_true"], None)
        predictions["right_occlusion_mask_true"] = get_occlusion_mask(
            inputs["K_pyr"][0], inputs["T_left_in_right"],
            inputs["right_idepthmap_true"], None,
            inputs["left_idepthmap_true"], None)

    if config.left_right_factor > 0.0:
        lr_loss = left_right_idepthmap_consistency_losses(
            inputs["T_right_in_left"], inputs["T_left_in_right"],
            inputs["K_pyr"],
            outputs["left_idepthmap_pyr"], predictions["left_occlusion_mask_pyr"],
            outputs["right_idepthmap_pyr"], predictions["right_occlusion_mask_pyr"])
        loss = loss + config.left_right_factor * lr_loss
        loss_dict["left_right_loss"] = lr_loss

    if config.reconstruction_factor > 0.0:
        recon_losses = []
        n = len(outputs["left_idepthmap_pyr"])
        predictions["left_image_pred_pyr"] = [None] * n
        for lvl in range(n):
            if outputs["left_idepthmap_pyr"][lvl] is None:
                continue
            r, pred = reconstruction_loss(
                inputs["T_right_in_left"], inputs["K_pyr"][0],
                inputs["left_image_pyr"][0], inputs["right_image_pyr"][0],
                outputs["left_idepthmap_pyr"][lvl],
                predictions["left_occlusion_mask_pyr"][lvl])
            predictions["left_image_pred_pyr"][lvl] = pred
            recon_losses.append(r)

        if "right_idepthmap_pyr" in outputs:
            predictions["right_image_pred_pyr"] = [None] * n
            for lvl in range(n):
                if outputs["right_idepthmap_pyr"][lvl] is None:
                    continue
                r, pred = reconstruction_loss(
                    inputs["T_left_in_right"], inputs["K_pyr"][0],
                    inputs["right_image_pyr"][0], inputs["left_image_pyr"][0],
                    outputs["right_idepthmap_pyr"][lvl],
                    predictions["right_occlusion_mask_pyr"][lvl])
                predictions["right_image_pred_pyr"][lvl] = pred
                recon_losses.append(r)

        loss_dict["reconstruction_losses"] = recon_losses
        recon_loss = sum(recon_losses)
        loss = loss + config.reconstruction_factor * recon_loss
        loss_dict["reconstruction_loss"] = recon_loss

    return loss, loss_dict, predictions
