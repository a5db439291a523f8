#!/usr/bin/env python
"""Measure the reference's torch-CPU ms/frame on THIS host.

Anchors bench.py's ``vs_baseline`` denominator (BASELINE.md "Measured
reference runtime"): the reference repo publishes no speed numbers, so the
only measurable anchor is its own code run here. This script loads the
shipped pretrained weights into the reference's own Python
``MultiViewStereoNet`` module (torch.jit.load of the 2020-era archive fails
on this image's torch — frobenius_norm was removed — so the weights come in
via this repo's torch-free zip importer, exactly as the golden-parity tests
do), drives it through the reference's own ``multi_view_forward`` timer
bracket
(/root/reference/multi_view_stereonet/multi_view_stereonet_utils.py:646-655,
time.time on CPU) at the eval config (batch 1, 480x640, 12 idepth samples,
cost-volume filter + all 5 refiners — /root/reference/test.py:38,
pretrained/gta_sfm_150epochs/params.yaml:8,26-28), and prints ms/frame.

The reference source is run, never copied. Usage:
    python scripts/bench_reference_cpu.py [--iters 5] [--views 1]
"""

import argparse
import json
import os
import sys
import types

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_DIR = "/root/reference"
PRETRAINED = os.path.join(
    REFERENCE_DIR,
    "pretrained/gta_sfm_150epochs/checkpoints/epoch0149/stereo_network.pt")


def import_reference():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from multi_view_stereonet import multi_view_stereonet as mvs
        from multi_view_stereonet import multi_view_stereonet_utils as mvs_utils
    return mvs, mvs_utils


def load_pretrained_net(mvs):
    """Reference MultiViewStereoNet with the shipped epoch0149 weights."""
    import numpy as np
    import torch

    from multi_view_stereonet_tpu.checkpoint import load_torchscript_weights

    net = mvs.MultiViewStereoNet()
    state = {k: torch.from_numpy(np.asarray(v))
             for k, v in load_torchscript_weights(PRETRAINED).items()}
    missing, unexpected = net.load_state_dict(state, strict=False)
    assert not missing, missing
    net.eval()
    return net


def make_batch(B, V, H, W, seed=0):
    import numpy as np
    import torch

    rng = np.random.default_rng(seed)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 0.9 * W
    K[0, 2] = (W - 1) / 2.0
    K[1, 2] = (H - 1) / 2.0
    T = [np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)) for _ in range(V)]
    for v in range(V):
        T[v][:, 0, 3] = 0.5
        T[v][:, 2, 3] = 0.05 * v
    # Shapes per the reference loader output consumed by
    # multi_view_unpack_batch (multi_view_stereonet_utils.py:540-641).
    return {
        "left_filename": ["bench_left.jpg"] * B,
        "right_filename": [["bench_right.jpg"] * B for _ in range(V)],
        "left_image": torch.from_numpy(
            rng.uniform(-1, 1, (B, 3, H, W)).astype(np.float32)),
        "right_image": [
            torch.from_numpy(
                rng.uniform(-1, 1, (B, 3, H, W)).astype(np.float32))
            for _ in range(V)],
        "K": torch.from_numpy(np.tile(K[None], (B, 1, 1, 1))),
        "T_right_in_left": [torch.from_numpy(T[v]) for v in range(V)],
        "left_depthmap_true": torch.from_numpy(
            rng.uniform(2, 30, (B, 1, H, W)).astype(np.float32)),
        "right_depthmap_true": [
            torch.from_numpy(
                rng.uniform(2, 30, (B, 1, H, W)).astype(np.float32))
            for _ in range(V)],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--views", type=int, default=1)
    ap.add_argument("--threads", type=int, default=0,
                    help="torch CPU threads (0 = torch default)")
    args = ap.parse_args()

    import torch

    if args.threads:
        torch.set_num_threads(args.threads)

    mvs, mvs_utils = import_reference()
    net = load_pretrained_net(mvs)

    params = {
        "num_idepth_samples": 12,
        "cost_volume_filter": True,
        "refiners": [True] * 5,
        "num_levels": 5,
    }
    batch = make_batch(1, args.views, 480, 640)

    times = []
    with torch.no_grad():
        inputs = mvs_utils.multi_view_unpack_batch(
            batch, torch.device("cpu"), params["num_levels"])
        for i in range(args.warmup + args.iters):
            out = mvs_utils.multi_view_forward(net, inputs, params)
            if i >= args.warmup:
                times.append(out["stereo_time_ms"])

    print(json.dumps({
        "metric": "reference torch-CPU forward ms/frame (this host)",
        "config": f"batch 1, 480x640, D=12, cvf+5 refiners, V={args.views}",
        "torch_threads": torch.get_num_threads(),
        "iters": args.iters,
        "ms_per_frame_mean": round(sum(times) / len(times), 1),
        "ms_per_frame_min": round(min(times), 1),
        "ms_all": [round(t, 1) for t in times],
        "timer": "reference multi_view_forward bracket "
                 "(multi_view_stereonet_utils.py:646-655)",
    }))


if __name__ == "__main__":
    main()
