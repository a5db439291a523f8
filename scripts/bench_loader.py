#!/usr/bin/env python
"""Measure the host input pipeline: decode+transform throughput vs the step.

VERDICT r2 #4: the training step (docs/ROOFLINE.md, B=8: 61.7 ms =>
~130 img/s device demand) is only real throughput if the host can feed it.
This script measures BatchLoader samples/sec on a synthetic GTA-SfM tree
with REAL jpegs at the recipe resolution (480x640), across decode backend
(pil / native C++), worker threads, and the augmented vs plain pipeline,
and prints the feed ratio against the measured step rate.

Results land in docs/ROOFLINE.md "Host input pipeline".

Usage: python scripts/bench_loader.py [--rows 480 --cols 640 --views 1]
"""

import argparse
import json
import os
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.join(REPO_ROOT, "tests"))

STEP_IMG_PER_SEC = 129.7  # B=8 train step, 61.7 ms (docs/ROOFLINE.md)


def measure(data_dir, split, transform, backend, workers, batch, passes=2):
    from multi_view_stereonet_tpu.data import GTASfMMultiViewDataset, BatchLoader

    ds = GTASfMMultiViewDataset(data_dir, split, 0, transform,
                                load_groundtruth_depthmaps=True,
                                decode_backend=backend)
    loader = BatchLoader(ds, batch, shuffle=False, drop_last=False,
                         workers=workers)
    n = 0
    best = float("inf")
    for _ in range(passes + 1):  # first pass warms page cache / pools
        t0 = time.perf_counter()
        n = sum(b["left_image"].shape[0] for b in loader)
        best = min(best, time.perf_counter() - t0)
    return n / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=480)
    ap.add_argument("--cols", type=int, default=640)
    ap.add_argument("--views", type=int, default=1)
    ap.add_argument("--frames", type=int, default=33)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 4])
    args = ap.parse_args()

    from synthetic_data import make_gta_sfm_tree
    from multi_view_stereonet_tpu.data import (
        get_training_transforms, get_testing_transforms,
    )
    from multi_view_stereonet_tpu import native

    import numpy as np

    root = tempfile.mkdtemp(prefix="bench_loader_")
    data_dir, split = make_gta_sfm_tree(
        root, rows=args.rows, cols=args.cols, frames=args.frames,
        num_sequences=2, comparisons=args.views)

    params = {"size": [args.rows, args.cols], "augment": True, "seed": 0}
    pipelines = {
        "train_augmented": get_training_transforms(
            params, np.random.default_rng(0)),
        "train_plain": get_training_transforms({**params, "augment": False}),
        "test": get_testing_transforms(params),
    }

    rows = []
    backends = ["pil"] + (["native"] if native.available() else [])
    for name, transform in pipelines.items():
        for backend in backends:
            for w in args.workers:
                sps = measure(data_dir, split, transform, backend, w,
                              args.batch)
                rows.append({
                    "pipeline": name, "backend": backend, "workers": w,
                    "samples_per_sec": round(sps, 1),
                    "feed_ratio_vs_step": round(sps / STEP_IMG_PER_SEC, 2),
                })
                print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({
        "host_cores": os.cpu_count(),
        "shape": f"{args.rows}x{args.cols} V={args.views} jpg+npy-depth",
        "step_img_per_sec": STEP_IMG_PER_SEC,
        "native_available": native.available(),
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
