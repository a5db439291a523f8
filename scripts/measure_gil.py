#!/usr/bin/env python
"""Bound the BatchLoader thread-scaling assumption (VERDICT r4 #3).

Every host-feed projection in docs/ROOFLINE.md ("~1.7 / ~3.9 decode
cores per chip", "projected_4core_imgps") assumes BatchLoader's worker
THREADS scale with cores -- i.e. the per-sample pipeline holds the GIL
only for a small serial residue. This host has ONE core, so a direct
1-vs-4-thread throughput A/B is flat by construction and proves
nothing. Two measurements that ARE decisive on one core:

1. **Held-GIL discriminator (tracer max-gap).** A tracer thread spins
   in tiny Python bytecode steps timestamping inter-step gaps. A C call
   that HOLDS the GIL stops ALL Python bytecode for its full duration,
   so one long (~600 ms) batched native call would produce one ~600 ms
   gap. A call that RELEASES the GIL caps gaps at OS scheduler quanta
   (tens of ms on a contended single core). Calibration signatures are
   measured in the same run: a pure-Python busy thread (GIL-contended:
   gaps ~= the 5 ms switch interval) and time.sleep idle (gaps ~= 0).

2. **Serial-residue accounting (Amdahl over the GIL).** Instrument the
   actual dataset ``__getitem__`` (native backend, augmented training
   transforms) to time what fraction of per-sample wall is spent INSIDE
   the batched native calls (ctypes drops the GIL there -- verified by
   #1) vs in Python/numpy glue (split parsing, np.load, collate prep --
   counted as GIL-held, a conservative overestimate since numpy
   releases it for many ops). Thread-scaling ceiling ~= 1 / glue_frac.

Prints one machine-readable line: GIL_SCALING {json}.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


class GapTracer:
    """Python-bytecode heartbeat: records the largest inter-step gap
    while running. Any C call holding the GIL shows up as a gap equal to
    the call's duration (bytecode cannot run anywhere meanwhile)."""

    def __init__(self):
        self.max_gap = 0.0
        self._stop = False
        self._thread = None

    def __enter__(self):
        def spin():
            last = time.perf_counter()
            while not self._stop:
                now = time.perf_counter()
                if now - last > self.max_gap:
                    self.max_gap = now - last
                last = now
        self._thread = threading.Thread(target=spin, daemon=True)
        self._thread.start()
        time.sleep(0.05)  # let the tracer reach its loop
        return self

    def __exit__(self, *exc):
        self._stop = True
        self._thread.join()


def traced_call(fn):
    """(wall_s, max_gap_s) for one invocation of ``fn`` under a tracer."""
    with GapTracer() as tr:
        t0 = time.perf_counter()
        fn()
        wall = time.perf_counter() - t0
    return wall, tr.max_gap


def main():
    from synthetic_data import make_gta_sfm_tree
    from multi_view_stereonet_tpu import native
    from multi_view_stereonet_tpu.data import (
        GTASfMMultiViewDataset, get_training_transforms,
    )

    assert native.available(), "native loader must be built for this bound"

    work = "/tmp/gil_measure"
    split = os.path.join(work, "gta_sfm_synth_test.txt")
    if not os.path.exists(split):
        os.makedirs(work, exist_ok=True)
        make_gta_sfm_tree(work, num_sequences=1, frames=10,
                          rows=480, cols=640, seed=3, scene="plane")
    data_dir = os.path.join(work, "data")
    cdir = os.path.join(data_dir, "test", "seq00", "color")
    paths = sorted(os.path.join(cdir, f) for f in os.listdir(cdir))[:8]

    # --- 1. held-GIL discriminator + calibration signatures ----------
    def busy_python():  # holds the GIL except at the 5 ms switch interval
        t_end = time.perf_counter() + 0.6
        x = 0
        while time.perf_counter() < t_end:
            x += 1

    def idle():
        time.sleep(0.6)

    native.load_images_jitter(paths, 480, 640, [0, 1, 2, 3],
                              1.1, 0.9, 1.05, 2)  # warm page/file cache
    wall_n, gap_n = traced_call(
        lambda: native.load_images_jitter(paths, 480, 640, [0, 1, 2, 3],
                                          1.1, 0.9, 1.05, 2))
    wall_p, gap_p = traced_call(busy_python)
    wall_i, gap_i = traced_call(idle)
    discriminator = {
        "native_jitter_batch8": {
            "wall_ms": round(wall_n * 1e3, 1),
            "max_gap_ms": round(gap_n * 1e3, 1),
            # A held GIL would make max_gap ~= wall. Gaps at scheduler-
            # quantum scale mean bytecode kept running: GIL released.
            "gil_released": gap_n < 0.25 * wall_n,
        },
        "calibration_python_busy": {
            "wall_ms": round(wall_p * 1e3, 1),
            "max_gap_ms": round(gap_p * 1e3, 1),
        },
        "calibration_idle": {
            "wall_ms": round(wall_i * 1e3, 1),
            "max_gap_ms": round(gap_i * 1e3, 1),
        },
    }

    # --- 2. serial residue of the real augmented per-sample path -----
    in_native = [0.0]

    def timed(fn):
        def wrapper(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            in_native[0] += time.perf_counter() - t0
            return out
        return wrapper

    saved = {n: getattr(native, n) for n in
             ("load_images", "load_images_u8", "load_images_jitter")}
    for n, fn in saved.items():
        setattr(native, n, timed(fn))
    try:
        cfg = {"size": [480, 640], "augment": True, "seed": 3}
        rng = np.random.default_rng(3)
        ds = GTASfMMultiViewDataset(
            data_dir, split, 0, get_training_transforms(cfg, rng),
            load_groundtruth_depthmaps=True, seed=3,
            decode_backend="native")
        ds[0]  # warm caches outside the timed window
        in_native[0] = 0.0
        reps = 12
        t0 = time.perf_counter()
        for i in range(reps):
            ds[i % len(ds)]
        wall = time.perf_counter() - t0
    finally:
        for n, fn in saved.items():
            setattr(native, n, fn)

    glue_frac = max(1.0 - in_native[0] / wall, 1e-3)
    residue = {
        "per_sample_wall_ms": round(wall / reps * 1e3, 1),
        "in_native_calls_ms": round(in_native[0] / reps * 1e3, 1),
        "python_glue_frac": round(glue_frac, 3),
        # Amdahl over the GIL: glue serializes across worker threads
        # (conservatively counted ALL as GIL-held).
        "thread_scaling_ceiling": round(1.0 / glue_frac, 1),
    }

    verdict = {
        "assumption": "BatchLoader threads scale with cores",
        "gil_released_in_native_calls":
            discriminator["native_jitter_batch8"]["gil_released"],
        "thread_scaling_ceiling": residue["thread_scaling_ceiling"],
        "holds_for_4_threads":
            discriminator["native_jitter_batch8"]["gil_released"]
            and residue["thread_scaling_ceiling"] >= 4.0,
        "discriminator": discriminator,
        "serial_residue": residue,
    }
    print("GIL_SCALING " + json.dumps(verdict), flush=True)


if __name__ == "__main__":
    main()
