"""Multi-host (multi-process) data-parallel training.

Reference analog: the reference trained multi-GPU with Horovod in its
external harness -- the only in-repo evidence is params.yaml:14 ("For
horovod, this is batch size *per* GPU!") and the per-GPU DataLoader
workers note at params.yaml:19 (SURVEY.md section 5, "Distributed
communication backend"). No comm code exists in the reference to port.

TPU-native design (no hand-written comm layer):

- one JAX process per host, wired with ``jax.distributed.initialize``
  (this module's :func:`initialize`);
- ONE global ``(data, view)`` mesh over all devices of all processes
  (:func:`make_global_mesh`). Same-process devices are contiguous on the
  flattened device list, and ``view`` is the minor mesh axis, so a view
  group never straddles processes: view-axis collectives ride ICI inside
  a host's slice while the gradient psum over ``data`` crosses DCN --
  exactly the hierarchy the hardware provides;
- each process runs its own input pipeline on its shard of the dataset
  (:func:`shard_dataset` / :func:`local_shard_indices`) and assembles
  its host-local batch into global ``jax.Array``\\ s with
  :func:`global_batch` (``jax.make_array_from_process_local_data``);
- the jitted train step is unchanged: XLA inserts the cross-host
  gradient reduction from the shardings, like it inserts the
  single-host one.

Single-process runs are the degenerate case throughout (process_count()
== 1), so the train CLI calls these functions unconditionally.
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding

from .mesh import batch_spec

ENV_COORDINATOR = "MVS_COORDINATOR_ADDRESS"
ENV_NUM_PROCESSES = "MVS_NUM_PROCESSES"
ENV_PROCESS_ID = "MVS_PROCESS_ID"


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Join the multi-process cluster; no-op for single-process runs.

    Arguments default to the ``MVS_COORDINATOR_ADDRESS`` /
    ``MVS_NUM_PROCESSES`` / ``MVS_PROCESS_ID`` environment variables (the
    launcher sets them per host). Returns True if a multi-process cluster
    was joined. Must run before JAX's backend initializes (i.e. before
    the first ``jax.devices()``/array operation in the process).

    On Cloud TPU pods ``jax.distributed.initialize()`` can also
    autodetect all three values; passing an explicit coordinator keeps
    this launcher-agnostic (and testable on CPU).
    """
    coordinator_address = coordinator_address or os.environ.get(ENV_COORDINATOR)
    if not coordinator_address:
        return False
    if num_processes is None:
        num_processes = int(os.environ[ENV_NUM_PROCESSES])
    if process_id is None:
        process_id = int(os.environ[ENV_PROCESS_ID])
    if num_processes == 1:
        return False
    jax.distributed.initialize(coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def is_main_process() -> bool:
    """True on the process that should own logging/plots/checkpoints."""
    return jax.process_index() == 0


def make_global_mesh(view: int = 1, data: int | None = None) -> Mesh:
    """A ``(data, view)`` mesh over ALL devices of ALL processes.

    ``view`` must divide the per-process device count so that a view
    group never crosses a process boundary (its collectives then stay on
    ICI; only the ``data``-axis gradient reduction crosses DCN).
    """
    devices = jax.devices()
    n_local = jax.local_device_count()
    if view > 1 and n_local % view != 0:
        raise ValueError(
            f"view={view} must divide the per-process device count "
            f"({n_local}) so view-axis collectives stay intra-host")
    n = len(devices)
    if data is None:
        data = n // view
    if data * view != n:
        raise ValueError(
            f"mesh shape ({data} data x {view} view) != {n} global devices")
    arr = np.array(devices).reshape(data, view)
    return Mesh(arr, ("data", "view"))


def local_shard_indices(n_samples: int,
                        process_id: int | None = None,
                        process_count: int | None = None) -> list[int]:
    """This process's strided shard of ``range(n_samples)``.

    Strided (``pid::count``) rather than contiguous so every process sees
    samples from the whole split even when the split file is
    sequence-ordered. All processes must construct their datasets with
    the same seed so index ``i`` means the same sample everywhere.
    """
    if process_id is None:
        process_id = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    return list(range(process_id, n_samples, process_count))


class ShardedDataset:
    """View of a dataset restricted to this process's sample shard.

    With ``drop_ragged_tail`` (the default), length is
    ``floor(n / process_count)`` on every process so all processes run
    the same number of steps -- a divergent step count would deadlock
    the cross-host collectives of training. Collective-free consumers
    (fleet-sharded streaming inference) pass False to cover every
    sample.
    """

    def __init__(self, dataset, process_id: int | None = None,
                 process_count: int | None = None,
                 drop_ragged_tail: bool = True):
        if process_id is None:
            process_id = jax.process_index()
        if process_count is None:
            process_count = jax.process_count()
        self._dataset = dataset
        n = len(dataset)
        if drop_ragged_tail:
            n = (n // process_count) * process_count
        self._indices = list(range(process_id, n, process_count))

    def __len__(self):
        return len(self._indices)

    def __getitem__(self, idx):
        return self._dataset[self._indices[idx]]

    def __getattr__(self, name):  # passthrough (e.g. .samples metadata)
        return getattr(self._dataset, name)


_VIEW_KEYS = ("right_images", "T_right_in_left", "right_depthmap_true")


def global_batch(mesh: Mesh, batch: dict) -> dict:
    """Assemble per-process local batches into global sharded arrays.

    ``batch`` holds this process's slice along the batch axis (all view
    entries present -- the view axis is sharded only across this
    process's own devices). The returned arrays are global: batch axis =
    local batch x process_count, sharded ``P('data'[, 'view'])`` exactly
    like :func:`..mesh.shard_batch` produces single-process.
    """
    n_proc = jax.process_count()
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        has_view = k in _VIEW_KEYS and v.ndim >= 2
        sharding = NamedSharding(mesh, batch_spec(v.ndim, has_view))
        global_shape = (v.shape[0] * n_proc,) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(
            sharding, v, global_shape)
    return out
