"""Evaluation CLI: run a checkpoint over a test split and report metrics.

Equivalent of the reference ``test.py`` (test.py:188-409): same dataset
dispatch (split-filename substring), same depth masks (GTA 0-1000 m,
DeMoN 0.5-10 m "Limits from DPSNet"), same output files (losses.txt,
depth_metrics.txt, runtime_metrics.txt, avg_*), same DeMoN per-scene-type
breakdown -- plus TPU-era upgrades: jitted forward, batch size > 1,
and native-or-TorchScript weight loading.

Usage:
  python -m multi_view_stereonet_tpu.eval.test_cli \
      <weights_dir> <data_dir> <test_split> [--save_images] \
      [--output_dir output] [--batch_size 1]
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..checkpoint.native import load_any_params
from ..data import (
    GTASfMMultiViewDataset, DeMoNDataset, BatchLoader, get_testing_transforms,
)
from ..losses import compute_losses, LossConfig
from ..models import MultiViewStereoNetConfig, mvsnet_forward
from ..train.pipeline import multi_view_unpack_batch
from ..train.config import load_params_yaml
from .metrics import get_depth_prediction_metrics, compute_avg_metrics

DEMON_TYPES = ("mvs", "sun3d", "rgbd", "scenes11")


def load_data(data_dir, test_file, params, batch_size=1,
              roll_right_image_180=False, add_translation_noise=False,
              add_rotation_noise=False, decode_backend="auto"):
    """Dataset dispatch by split-filename substring (test.py:283-305).

    ``decode_backend`` "auto" decodes through the native C++ pipeline
    when available (bit-exact with the PIL path; see native/)."""
    transforms = get_testing_transforms(
        params, roll_right_image_180, add_translation_noise, add_rotation_noise)
    if "gta_sfm" in test_file:
        dataset = GTASfMMultiViewDataset(
            data_dir, test_file, 0, transforms, load_groundtruth_depthmaps=True,
            decode_backend=decode_backend)
    elif "demon" in test_file:
        dataset = DeMoNDataset(data_dir, test_file, num_right_images=1,
                               num_left_images=0, transform=transforms,
                               decode_backend=decode_backend)
    else:
        raise ValueError(f"cannot infer dataset type from {test_file}")
    # Parallel decode only when the pipeline is deterministic: the pose /
    # roll perturbations draw from a shared RNG (not thread-safe, and
    # thread order would change the sample<->draw pairing).
    perturbed = (roll_right_image_180 or add_translation_noise
                 or add_rotation_noise)
    return BatchLoader(dataset, batch_size, shuffle=False, drop_last=False,
                       workers=1 if perturbed else 4)


def depth_limits(split):
    if "gta_sfm" in split:
        return 0.0, 1e3
    return 0.5, 10.0  # Limits from DPSNet (test.py:175-185)


@functools.partial(jax.jit, static_argnames=("model_config", "loss_config"))
def _eval_step(params, batch, model_config, loss_config):
    inputs = multi_view_unpack_batch(batch)
    outputs = mvsnet_forward(
        params, inputs["left_image_pyr"], inputs["K_pyr"],
        inputs["T_right_in_left"], inputs["right_image_pyr"], model_config)
    loss, loss_dict, _ = compute_losses(inputs, outputs, loss_config)
    idepth0 = outputs["left_idepthmap_pyr"][0] / inputs["baseline"][:, None, None]
    return loss, loss_dict, idepth0, inputs["baseline"]


def _write_kv(path, d):
    with open(path, "w") as f:
        for k, v in d.items():
            f.write(f"{k}: {v}\n")


def _append_row(path, header, name, values):
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(header + "\n")
    with open(path, "a") as f:
        f.write(name + " " + " ".join(str(v) for v in values) + "\n")


def _flatten_loss_dict(loss_dict):
    # Same list-expanding flatten the training logger uses -- one
    # implementation so the losses.txt formats cannot diverge.
    from ..train.logging import _flatten

    return _flatten(loss_dict)


def run_eval(weights_dir, data_dir, test_split, output_dir="output",
             batch_size=1, save_images=False, params_file=None,
             model_overrides=None, roll_right_image_180=False,
             add_translation_noise=False, add_rotation_noise=False,
             decode_backend="auto", profile_dir=None):
    assert not os.path.exists(output_dir), f"{output_dir} already exists"
    os.makedirs(output_dir)

    if params_file is None:
        params_file = os.path.join(weights_dir, "..", "..", "params.yaml")
    params_cfg = load_params_yaml(params_file)
    if model_overrides:
        params_cfg.update(model_overrides)

    model_config = MultiViewStereoNetConfig(
        num_idepth_samples=params_cfg["num_idepth_samples"],
        do_cost_volume_filter=params_cfg["cost_volume_filter"],
        do_refiners=tuple(params_cfg["refiners"]),
        compute_dtype=params_cfg.get("compute_dtype", "float32"),
        matmul_precision=params_cfg.get("matmul_precision", "default"),
    )
    loss_config = LossConfig(
        supervision_factor=params_cfg["supervision_factor"],
        reconstruction_factor=params_cfg["reconstruction_factor"],
        left_right_factor=params_cfg["left_right_factor"],
    )

    params = load_any_params(weights_dir)
    loader = load_data(data_dir, test_split, params_cfg, batch_size,
                       roll_right_image_180, add_translation_noise,
                       add_rotation_noise, decode_backend=decode_backend)

    min_depth, max_depth = depth_limits(test_split)
    total_loss, num_batches = 0.0, 0

    loss_file = os.path.join(output_dir, "losses.txt")
    depth_file = os.path.join(output_dir, "depth_metrics.txt")
    runtime_file = os.path.join(output_dir, "runtime_metrics.txt")

    # Device-timeline trace of the whole eval run when requested (size
    # the run with a small split); no-op on backends without profiling.
    import contextlib
    from ..utils.timing import profile_trace
    warmed_shapes = set()
    with contextlib.ExitStack() as _prof:
        _prof.enter_context(profile_trace(profile_dir))
        for batch in loader:
            names = batch.pop("left_filenames")
            batch.pop("right_filenames")
            jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

            shape_key = tuple(sorted((k, v.shape) for k, v in jbatch.items()))
            if shape_key not in warmed_shapes:
                # Warm the jit cache before timing EVERY new batch shape
                # (the trailing partial batch compiles again!): a cold
                # dispatch otherwise charges minutes of (remote)
                # compilation to runtime_metrics.txt, swamping the
                # averages the reference's network-only timers
                # (/root/reference/test.py:208-209) are compared against.
                jax.block_until_ready(
                    _eval_step(params, jbatch, model_config, loss_config))
                warmed_shapes.add(shape_key)
            t0 = time.perf_counter()
            out = _eval_step(params, jbatch, model_config, loss_config)
            # One bulk device->host transfer (per-scalar fetches are round
            # trips -- pathologically slow over remoted TPU runtimes).
            loss, loss_dict, idepth0, baseline = jax.device_get(out)
            runtime_ms = (time.perf_counter() - t0) * 1000.0 / len(names)

            loss = float(loss)
            assert np.isfinite(loss), "NaN loss during eval"
            total_loss += loss
            num_batches += 1

            lkeys, lvals = _flatten_loss_dict(loss_dict)

            for i, left_file in enumerate(names):
                # batch depth is the loader's raw metric depth (the reference
                # re-multiplies by baseline only because its unpack normalized
                # it first, test.py:166-186).
                depth_true = batch["left_depthmap_true"][i]
                idepth_est = idepth0[i]
                depth_est = np.where(idepth_est > 0, 1.0 / np.where(
                    idepth_est > 0, idepth_est, 1.0), idepth_est)

                # Reference protocol (test.py:221-235): skip ONLY when the
                # TRUTH mask is empty; the estimate-validity intersection
                # happens after. An image with valid GT but a fully
                # out-of-range prediction therefore still produces a
                # (nan) metrics row instead of being silently dropped --
                # silently dropping the worst predictions would inflate
                # the averages the baseline comparison rests on.
                mask = (depth_true > min_depth) & (depth_true < max_depth)
                if mask.sum() <= 0:
                    print(f"WARNING: No truth for image: {left_file}")
                    continue
                mask &= (depth_est > min_depth) & (depth_est < max_depth)

                if save_images:
                    from ..utils.visualization import save_idepth_images

                    idepth_true = np.where(depth_true > 0, 1.0 / np.where(
                        depth_true > 0, depth_true, 1.0), 0.0)
                    rel = os.path.relpath(left_file, data_dir)
                    img_dir = os.path.join(output_dir, os.path.dirname(rel))
                    os.makedirs(img_dir, exist_ok=True)
                    image_num = os.path.splitext(os.path.basename(rel))[0]
                    save_idepth_images(img_dir, image_num, idepth_est, idepth_true)

                _append_row(loss_file, "file loss " + " ".join(lkeys),
                            left_file, [loss] + lvals)
                m = get_depth_prediction_metrics(depth_true[mask], depth_est[mask])
                _append_row(depth_file, "file " + " ".join(m.keys()),
                            left_file, list(m.values()))
                _append_row(runtime_file, "file runtime_ms", left_file, [runtime_ms])
                print(f"image: {left_file}, LOSS: {loss:.2f}, "
                      f"ABS_REL: {m['abs_rel']:.2f}, A1: {m['a1']:.2f}")
            print(f"Processed batch {num_batches}/{len(loader)}")

    _write_kv(os.path.join(output_dir, "avg_losses.txt"),
              compute_avg_metrics(loss_file))
    avg_depth = compute_avg_metrics(depth_file)
    _write_kv(os.path.join(output_dir, "avg_depth_metrics.txt"), avg_depth)

    runtimes = np.loadtxt(runtime_file, skiprows=1, usecols=1, ndmin=1)
    _write_kv(os.path.join(output_dir, "avg_runtime_metrics.txt"),
              {"runtime_ms": float(np.mean(runtimes)),
               "num_samples": len(runtimes)})

    if "demon" in test_split:
        with open(depth_file, "r") as f:
            lines = f.readlines()
        header, rows = lines[0], lines[1:]
        for demon_type in DEMON_TYPES:
            selected = [ln for ln in rows if demon_type in ln]
            per_type = os.path.join(output_dir,
                                    f"depth_metrics_{demon_type}.txt")
            with open(per_type, "w") as f:
                f.write(header)
                f.writelines(selected)
            if selected:
                _write_kv(os.path.join(
                    output_dir, f"avg_depth_metrics_{demon_type}.txt"),
                    compute_avg_metrics(per_type))

    return total_loss / max(num_batches, 1), avg_depth


def main():
    parser = argparse.ArgumentParser(
        description="Run MultiViewStereoNet (TPU) inference over a split.")
    parser.add_argument("weights_dir")
    parser.add_argument("data_dir")
    parser.add_argument("test_split")
    parser.add_argument("--save_images", action="store_true")
    parser.add_argument("--output_dir", default="output")
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--params_yaml", default=None)
    # Robustness perturbations (reference test.py:285-290, off by default).
    parser.add_argument("--roll_right_image_180", action="store_true")
    parser.add_argument("--add_translation_noise", action="store_true")
    parser.add_argument("--add_rotation_noise", action="store_true")
    parser.add_argument("--decode_backend", default="auto",
                        choices=["auto", "native", "pil"],
                        help="image decode path; auto uses the native C++ "
                             "loader when available (bit-exact with PIL)")
    parser.add_argument("--profile_dir", default=None,
                        help="write a jax.profiler device trace here")
    args = parser.parse_args()

    loss, avg = run_eval(
        os.path.abspath(args.weights_dir), os.path.abspath(args.data_dir),
        os.path.abspath(args.test_split), args.output_dir, args.batch_size,
        args.save_images, args.params_yaml,
        roll_right_image_180=args.roll_right_image_180,
        add_translation_noise=args.add_translation_noise,
        add_rotation_noise=args.add_rotation_noise,
        decode_backend=args.decode_backend, profile_dir=args.profile_dir)
    print("avg loss:", loss)
    print("avg depth metrics:", avg)


if __name__ == "__main__":
    main()
