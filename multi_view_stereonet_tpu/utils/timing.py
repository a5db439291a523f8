"""Step timing + determinism helpers.

Counterpart of reference utils/pytorch_utils.py:15-61 (set_seeds, CUDA
event timers, parameter counters) in JAX terms: ``device_timer`` brackets
a computation with ``block_until_ready`` (the analog of CUDA events);
``set_seeds`` seeds python/numpy and returns a jax PRNG key.
"""

from __future__ import annotations

import contextlib as _contextlib
import random
import time

import numpy as np


def set_seeds(seed: int):
    """Seed python + numpy; return a jax PRNG key for model code."""
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


class device_timer:
    """``with device_timer() as t: ...`` then ``t.ms``. Blocks on the given
    arrays (or all pending work if none registered via ``t.watch``)."""

    def __enter__(self):
        self._start = time.perf_counter()
        self._arrays = []
        return self

    def watch(self, *arrays):
        self._arrays.extend(arrays)
        return arrays[0] if len(arrays) == 1 else arrays

    def __exit__(self, *exc):
        import jax

        if self._arrays:
            jax.block_until_ready(self._arrays)
        self.ms = (time.perf_counter() - self._start) * 1000.0
        return False


def count_parameters(params) -> int:
    import jax

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


@_contextlib.contextmanager
def profile_trace(log_dir=None):
    """``jax.profiler`` trace around a block; a no-op when ``log_dir``
    is falsy or the backend cannot profile (e.g. remote relays).

    The reference's only tracing was CUDA-event wall clocks
    (utils/pytorch_utils.py:31-48); this is the TPU-native equivalent:
    the written trace opens in TensorBoard / Perfetto with per-op device
    timelines.
    """
    if not log_dir:
        yield
        return
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # relay/backend without profiling support
        import warnings

        warnings.warn(f"jax.profiler unavailable ({e}); tracing disabled")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
