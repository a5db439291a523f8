"""Native checkpoint format: msgpack param files + orbax training state.

Two granularities, mirroring the reference's split between the shippable
network file (TorchScript ``stereo_network.pt``) and the training-state
tarball (``checkpoint.tar``, reference SURVEY section 5):

- ``save_params`` / ``load_params``: just the network weights, one
  msgpack file (flax.serialization) -- the artifact eval consumes;
- ``save_train_state`` / ``load_train_state` / ``latest_epoch``: params +
  optimizer state + step/epoch via orbax, one directory per epoch
  (``checkpoints/epochNNNN`` like the reference layout).
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np

PARAMS_FILE = "stereo_network.msgpack"


def save_params(directory: str, params) -> str:
    from flax import serialization

    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, PARAMS_FILE)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    return path


def load_params(directory_or_file: str, template=None):
    from flax import serialization

    path = directory_or_file
    if os.path.isdir(path):
        path = os.path.join(path, PARAMS_FILE)
    with open(path, "rb") as f:
        data = f.read()
    if template is None:
        from ..models import init_mvsnet

        template = init_mvsnet(jax.random.PRNGKey(0))
    return serialization.from_bytes(template, data)


def load_any_params(weights_dir: str):
    """Load weights from a native msgpack or a reference TorchScript file."""
    native = os.path.join(weights_dir, PARAMS_FILE)
    torchscript = os.path.join(weights_dir, "stereo_network.pt")
    if os.path.exists(native):
        return load_params(native)
    if os.path.exists(torchscript):
        from .torchscript import load_torchscript_weights, convert_reference_state_dict

        return convert_reference_state_dict(load_torchscript_weights(torchscript))
    raise FileNotFoundError(
        f"no {PARAMS_FILE} or stereo_network.pt under {weights_dir}")


def _epoch_dir(root: str, epoch: int) -> str:
    return os.path.join(root, f"epoch{epoch:04d}")


def save_train_state(root: str, epoch: int, params, opt_state, step: int,
                     suffix: str = ""):
    """``suffix`` tags abnormal dumps (e.g. "-nanabort") so they never
    collide with -- or get resumed as -- a regular epoch checkpoint
    (latest_epoch only matches the plain epochNNNN form)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(_epoch_dir(root, epoch) + suffix)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, "state"),
               {"params": jax.device_get(params),
                "opt_state": jax.device_get(opt_state),
                "step": np.asarray(step)},
               force=True)
    save_params(path, params)
    return path


def load_train_state(root: str, epoch: int, template: dict):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(_epoch_dir(root, epoch), "state"))
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(path, item=template)


def latest_epoch(root: str) -> int | None:
    if not os.path.isdir(root):
        return None
    epochs = []
    for name in os.listdir(root):
        m = re.fullmatch(r"epoch(\d{4})", name)
        if m:
            epochs.append(int(m.group(1)))
    return max(epochs) if epochs else None
