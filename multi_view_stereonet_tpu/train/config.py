"""Config loading: flat params.yaml compatible with the reference.

The reference eval trusts the training-time params file
(test.py:338-340); key inventory documented in
pretrained/gta_sfm_150epochs/params.yaml. The shipped DeMoN params.yaml
lacks ``cost_volume_filter`` and ``refiners`` (the reference would
KeyError, with commented-out defaults at test.py:342-344) -- here those
keys default to the values the checkpoints were trained with.
"""

from __future__ import annotations

import yaml

DEFAULTS = {
    "size": [480, 640],
    "num_levels": 5,
    "num_idepth_samples": 12,
    "cost_volume_filter": True,
    "refiners": [True, True, True, True, True],
    # 8 matches the reference recipe (params.yaml:14, per-GPU batch).
    # Measured sweet spot on one v5e is 16 (139.3 img/s vs 127.6 at b8;
    # b32 fits but gains nothing) -- docs/ROOFLINE.md "Training
    # batch/remat/storage sweep".
    "batch_size": 8,
    "batches_per_step": 1,
    # Off: costs 17-19% img/s at every batch that fits, and with bf16
    # activation storage even b32 fits without it (same sweep). Turn on
    # only when activation pressure rises (bigger sizes, V>1 training,
    # f32 storage -- b32+f32 is the measured corner that needs it).
    "remat_refiners": False,
    "num_epochs": 150,
    "num_train_images": 0,
    "num_val_images": 0,
    "shuffle": True,
    "augment": True,
    "seed": 3,
    "optimizer": "adam",
    "learning_rate": 1e-3,
    "scheduler_gamma": 1.0,
    "estimate_right_idepthmap": False,
    "supervision_factor": 1.0,
    "reconstruction_factor": 0.0,
    "left_right_factor": 0.0,
    # Reference num_workers: 4 (params.yaml:19, torch DataLoader workers);
    # here: BatchLoader decode threads.
    "num_workers": 4,
    # "auto" = the native C++ decoder when usable, else PIL. On the
    # native path the whole decode+resize+color-jitter chain runs in C++
    # (native/image_loader.cc) -- it is its verified BIT-EXACTNESS with
    # PIL (tests/test_native_loader.py, incl. the jitter blend/L/HSV
    # semantics) that keeps training numerics backend-invariant, not any
    # PIL materialization.
    "decode_backend": "auto",
    "print_freq": 1,
    "debug_image_freq": 50,
    "plot_freq": 500,
    # uint8 image transport for the training feed: pixels stay raw u8
    # through the host pipeline (native decode+jitter emit u8 natively)
    # and the omitted float stage(s) are replicated BIT-EXACTLY inside
    # the jitted train step (ops/quantize) -- 4x fewer image bytes
    # host->device and zero host float work per image, numerics
    # identical to the f32 feed. Off by default to match the reference
    # recipe's torch DataLoader semantics exactly.
    "transfer_u8": False,
    "previous_checkpoint_dir": "",
    "split": "gta_sfm",
}


def load_params_yaml(path: str | None) -> dict:
    """Load a params.yaml, filling reference-compatible defaults."""
    params = dict(DEFAULTS)
    if path:
        import os

        if os.path.exists(path):
            with open(path, "r") as f:
                loaded = yaml.safe_load(f) or {}
            params.update(loaded)
    return params
