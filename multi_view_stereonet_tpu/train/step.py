"""Training step: optax Adam + exponential decay, optional grad accumulation.

Mirrors the reference recipe (pretrained/gta_sfm_150epochs/params.yaml:
adam, learning_rate 1e-3, scheduler_gamma 1.0 -- torch ExponentialLR steps
the rate once per *epoch*; optax expresses that as exponential_decay with
``transition_steps = steps_per_epoch`` in optimizer steps). Gradient
accumulation (batches_per_step) uses optax.MultiSteps.

Data parallelism: the step function is sharding-agnostic -- jit it with a
mesh and sharded batches (see ``parallel``) and XLA inserts the gradient
all-reduce over ICI; no explicit pmean is needed.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import optax

from ..models import MultiViewStereoNetConfig, mvsnet_forward
from ..losses import compute_losses, LossConfig
from .pipeline import multi_view_unpack_batch, unpack_batch


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    optimizer: str = "adam"
    learning_rate: float = 1e-3
    scheduler_gamma: float = 1.0
    steps_per_epoch: int = 1
    batches_per_step: int = 1


def make_optimizer(config: OptimizerConfig) -> optax.GradientTransformation:
    if config.scheduler_gamma != 1.0:
        lr = optax.exponential_decay(
            config.learning_rate,
            transition_steps=config.steps_per_epoch,
            decay_rate=config.scheduler_gamma,
            staircase=True,
        )
    else:
        lr = config.learning_rate
    if config.optimizer == "adam":
        tx = optax.adam(lr)
    elif config.optimizer == "rmsprop":
        tx = optax.rmsprop(lr)
    elif config.optimizer == "sgd":
        tx = optax.sgd(lr)
    else:
        raise ValueError(f"unknown optimizer {config.optimizer}")
    if config.batches_per_step > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=config.batches_per_step)
    return tx


def make_loss_fn(model_config: MultiViewStereoNetConfig,
                 loss_config: LossConfig,
                 multi_view: bool = True,
                 estimate_right_idepthmap: bool = False,
                 transfer_u8: str | None = None) -> Callable:
    """Build loss(params, batch) -> (loss, loss_dict).

    When ``estimate_right_idepthmap`` (two-view recipe,
    multi_view_stereonet_utils.py:522-537), a second forward runs with the
    roles of left/right swapped and its outputs feed the right-view losses.

    ``transfer_u8`` ("unit" | "full" | None): the batch's images arrive
    as RAW uint8 (the training u8 transport -- 4x fewer H2D bytes, zero
    host float work) and the float stage(s) the host pipeline omitted
    are replicated bit-exactly on-device first: "unit" = bare x/255
    (the augmented recipe omits Normalize), "full" = x/255*2-1
    (ops/quantize; mode from data.training_u8_dequantize_mode).
    """
    if transfer_u8:
        from ..ops.quantize import (dequantize_images_u8,
                                    dequantize_images_u8_unit)
        deq = (dequantize_images_u8_unit if transfer_u8 == "unit"
               else dequantize_images_u8)

    def loss_fn(params, batch):
        if transfer_u8:
            # Dequantize whichever image keys this recipe's batch carries
            # ("right_images" V-axis form, or the two-view adapter's
            # singular "right_image" -- train_cli renames it before the
            # step when estimate_right_idepthmap is on).
            batch = dict(batch)
            for key in ("left_image", "right_images", "right_image"):
                if key in batch:
                    batch[key] = deq(batch[key])
        if multi_view:
            inputs = multi_view_unpack_batch(batch)
            T = inputs["T_right_in_left"]
            right_pyrs = inputs["right_image_pyr"]
        else:
            inputs = unpack_batch(batch)
            T = inputs["T_right_in_left"][:, None]
            right_pyrs = [p[:, None] for p in inputs["right_image_pyr"]]

        outputs = mvsnet_forward(
            params, inputs["left_image_pyr"], inputs["K_pyr"], T, right_pyrs,
            model_config)

        if estimate_right_idepthmap and not multi_view:
            T_l = inputs["T_left_in_right"][:, None]
            left_as_right = [p[:, None] for p in inputs["left_image_pyr"]]
            right_out = mvsnet_forward(
                params, inputs["right_image_pyr"], inputs["K_pyr"], T_l,
                left_as_right, model_config)
            outputs = dict(outputs)
            outputs["right_idepthmap_pyr"] = right_out["left_idepthmap_pyr"]
            outputs["right_idepthmap_raw_pyr"] = right_out["left_idepthmap_raw_pyr"]
            outputs["right_idepthmap_mask_pyr"] = right_out["left_idepthmap_mask_pyr"]

        loss, loss_dict, _ = compute_losses(inputs, outputs, loss_config)
        return loss, loss_dict

    return loss_fn


def make_train_step(model_config: MultiViewStereoNetConfig,
                    loss_config: LossConfig,
                    tx: optax.GradientTransformation,
                    multi_view: bool = True,
                    estimate_right_idepthmap: bool = False,
                    transfer_u8: str | None = None) -> Callable:
    """Build step(params, opt_state, batch) -> (params, opt_state, loss, dict)."""
    loss_fn = make_loss_fn(model_config, loss_config, multi_view,
                           estimate_right_idepthmap,
                           transfer_u8=transfer_u8)

    def train_step(params, opt_state, batch):
        (loss, loss_dict), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, loss_dict

    return train_step
