"""Mesh construction and sharding specs."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data: int | None = None,
              view: int = 1) -> Mesh:
    """Build a (data, view) mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if data is None:
        data = n_devices // view
    if data * view != n_devices:
        raise ValueError(
            f"mesh shape ({data} data x {view} view) != {n_devices} devices")
    if len(devices) < n_devices:
        raise RuntimeError(
            f"make_mesh needs {n_devices} devices but jax.devices() has only "
            f"{len(devices)} ({devices[0].platform}). For CPU testing, set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices} "
            "and force jax_platforms=cpu BEFORE jax's backend initializes.")
    arr = np.array(devices[:n_devices]).reshape(data, view)
    return Mesh(arr, ("data", "view"))


def batch_spec(ndim: int, has_view_axis: bool) -> P:
    """PartitionSpec for a batch-leading array.

    (B, ...) -> P('data'); (B, V, ...) -> P('data', 'view').
    """
    if has_view_axis:
        return P("data", "view", *([None] * (ndim - 2)))
    return P("data", *([None] * (ndim - 1)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_VIEW_KEYS = ("right_images", "T_right_in_left", "right_depthmap_true")


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put a training batch with data/view sharding."""
    out = {}
    for k, v in batch.items():
        has_view = k in _VIEW_KEYS and v.ndim >= 2
        s = NamedSharding(mesh, batch_spec(v.ndim, has_view))
        out[k] = jax.device_put(v, s)
    return out
