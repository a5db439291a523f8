#!/usr/bin/env python
"""CLI-level metric parity: the reference's own test.py vs our eval CLI.

The reference's reproducible baseline protocol is ``test.py <weights>
<data> <split>`` over a GTA-SfM tree with the shipped pretrained
checkpoint (/root/reference/test.py:318-409, README.md:72-87). The real
datasets cannot be downloaded on this host, so this script runs BOTH
full eval stacks -- the reference's test.py (its own datasets,
transforms, unpack, forward, losses, metrics, writers, averaging) and
our eval CLI -- over the SAME synthetic GTA-SfM tree with the SAME
checkpoint, and diffs every avg metric plus per-image abs_rel rows.
That upgrades parity evidence from "golden forward at pretrained
weights" to "a user running the documented eval protocol gets the same
numbers from either framework".

Mechanics:
- The reference needs torchvision (absent here): scripts/tv_shim
  provides the 0.6-faithful surface its eval pipeline touches.
- torch.jit.load of the 2020-era archive fails on this torch
  (frobenius_norm removed), so -- exactly as scripts/bench_reference_cpu.py
  and the golden-parity tests do -- the reference's load_models is
  replaced with one that builds the reference's own Python
  MultiViewStereoNet and fills it from the checkpoint via this repo's
  torch-free zip importer. Everything downstream is reference code.
- Each side runs in its own subprocess (fresh cwd for the reference's
  hard-coded ./output; our side pins jax to CPU f32 so the comparison
  is strict-parity mode and leaves the TPU alone).

Usage:
    python scripts/parity_eval_cli.py [--size 480 640] [--sequences 2]
        [--frames 6] [--work /tmp/cli_parity] [--scene layered]
The default config (10 samples, 480x640) matches the eval protocol's
image size; --size 240 320 gives a fast smoke run (the slow test uses
it). Prints one PARITY_CLI json line; exits nonzero if any gate fails.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_DIR = "/root/reference"
SHIM_DIR = os.path.join(REPO_ROOT, "scripts", "tv_shim")
# (pretrained run dir, checkpoint epoch) per dataset family.
PRETRAINED = {"gta": ("gta_sfm_150epochs", "epoch0149"),
              "demon": ("demon_45epochs", "epoch0044")}


def make_weights_dir(work, size, dataset="gta"):
    """Replicate the pretrained dir layout with an eval-size override.

    test.py resolves params.yaml at weights_dir/../../params.yaml
    (test.py:338-340), so both CLIs read the SAME config file and the
    same stereo_network.pt (symlinked, never copied). The shipped DeMoN
    params.yaml lacks cost_volume_filter/refiners (the reference would
    KeyError; its own commented defaults sit at test.py:342-344) -- fill
    them with the values the checkpoint was trained with, as a
    reference user must."""
    import yaml

    run_name, epoch = PRETRAINED[dataset]
    ref_root = os.path.join(REFERENCE_DIR, "pretrained", run_name)
    with open(os.path.join(ref_root, "params.yaml")) as f:
        params = yaml.load(f, Loader=yaml.FullLoader)
    params["size"] = [int(size[0]), int(size[1])]
    params.setdefault("num_idepth_samples", 12)
    params.setdefault("cost_volume_filter", True)
    params.setdefault("refiners", [True] * 5)
    root = os.path.join(work, "pretrained")
    weights_dir = os.path.join(root, "checkpoints", epoch)
    os.makedirs(weights_dir, exist_ok=True)
    with open(os.path.join(root, "params.yaml"), "w") as f:
        yaml.safe_dump(params, f)
    link = os.path.join(weights_dir, "stereo_network.pt")
    if not os.path.exists(link):
        os.symlink(os.path.join(ref_root, "checkpoints", epoch,
                                "stereo_network.pt"), link)
    return weights_dir


def ref_run(weights_dir, data_dir, split, run_dir):
    """Run the reference's test.py main() in this process (called in a
    subprocess with cwd=run_dir so ./output lands there)."""
    sys.path.insert(0, SHIM_DIR)        # torchvision shim
    sys.path.insert(0, REFERENCE_DIR)   # datasets/, stereo/, utils/, ...
    sys.path.insert(0, REPO_ROOT)       # the zip weight importer

    # The reference's datasets/ has no __init__.py, so the installed
    # HuggingFace "datasets" regular package would win over the
    # namespace portion regardless of sys.path order -- pin the name to
    # the reference's directory.
    import types

    datasets_pkg = types.ModuleType("datasets")
    datasets_pkg.__path__ = [os.path.join(REFERENCE_DIR, "datasets")]
    sys.modules["datasets"] = datasets_pkg

    import importlib.util

    import numpy as np
    import torch

    spec = importlib.util.spec_from_file_location(
        "reference_test", os.path.join(REFERENCE_DIR, "test.py"))
    ref_test = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_test)

    from multi_view_stereonet.multi_view_stereonet import MultiViewStereoNet
    from multi_view_stereonet_tpu.checkpoint import load_torchscript_weights

    def load_models(device, wdir, params):
        net = MultiViewStereoNet()
        state = {k: torch.from_numpy(np.asarray(v))
                 for k, v in load_torchscript_weights(
                     os.path.join(wdir, "stereo_network.pt")).items()}
        missing, _ = net.load_state_dict(state, strict=False)
        assert not missing, missing
        net.eval()
        return net.to(device)

    ref_test.load_models = load_models
    os.chdir(run_dir)
    sys.argv = ["test.py", weights_dir, data_dir, split]
    ref_test.main()


def ours_run(weights_dir, data_dir, split, run_dir):
    """Run our eval CLI on CPU f32 (strict-parity mode) in this process."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO_ROOT)
    from multi_view_stereonet_tpu.eval.test_cli import run_eval

    run_eval(weights_dir, data_dir, split,
             output_dir=os.path.join(run_dir, "output"),
             params_file=os.path.join(weights_dir, "..", "..", "params.yaml"))


def read_avgs(path):
    out = {}
    with open(path) as f:
        for line in f:
            if ":" in line:
                k, v = line.split(":", 1)
                out[k.strip()] = float(v)
    return out


def read_rows(path):
    """depth_metrics.txt -> {filename-tail: {metric: value}}."""
    with open(path) as f:
        lines = [ln.split() for ln in f if ln.strip()]
    header, rows = lines[0][1:], lines[1:]
    out = {}
    for row in rows:
        key = "/".join(row[0].split(os.path.sep)[-4:])  # test/seqNN/color/N.jpg
        out[key] = dict(zip(header, map(float, row[1:])))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="gta", choices=("gta", "demon"))
    ap.add_argument("--size", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--sequences", type=int, default=2)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--scene", default="layered",
                    help="GTA tree scene (the DeMoN tree is plane-only)")
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--work", default="/tmp/cli_parity")
    ap.add_argument("--tol_abs_rel", type=float, default=2e-3)
    ap.add_argument("--keep", action="store_true",
                    help="keep an existing work dir's tree and runs")
    ap.add_argument("--ref-run", nargs=4, metavar="ARG", help=argparse.SUPPRESS)
    ap.add_argument("--ours-run", nargs=4, metavar="ARG",
                    help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.ref_run:
        ref_run(*args.ref_run)
        return
    if args.ours_run:
        ours_run(*args.ours_run)
        return

    # Abspath up front: ref_run os.chdir()s into run_dir before the
    # reference test.py resolves its weights/data/split arguments, so a
    # relative --work would make the reference side resolve against the
    # wrong cwd (ADVICE r4).
    args.work = os.path.abspath(args.work)
    if os.path.exists(args.work) and not args.keep:
        shutil.rmtree(args.work)
    os.makedirs(args.work, exist_ok=True)

    sys.path.insert(0, REPO_ROOT)
    from tests.synthetic_data import make_demon_tree, make_gta_sfm_tree

    # GT depth and images at the eval size: test.py assumes the network
    # output matches the GT size (test.py:227 "Assume output is the same
    # size as ground truth"), as the real trees do.
    if args.dataset == "gta":
        data_dir, split = make_gta_sfm_tree(
            args.work, num_sequences=args.sequences, frames=args.frames,
            rows=args.size[0], cols=args.size[1], seed=args.seed,
            comparisons=1, scene=args.scene)
    else:
        data_dir, split = make_demon_tree(
            args.work, num_scenes=args.sequences, frames=args.frames,
            rows=args.size[0], cols=args.size[1], seed=args.seed)
    weights_dir = make_weights_dir(args.work, args.size, args.dataset)

    env = dict(os.environ, MPLBACKEND="Agg",
               MPLCONFIGDIR=os.path.join(args.work, "mpl"))
    outputs = {}
    for side, flag in (("ref", "--ref-run"), ("ours", "--ours-run")):
        run_dir = os.path.join(args.work, f"{side}_run")
        if os.path.exists(run_dir):
            shutil.rmtree(run_dir)
        os.makedirs(run_dir)
        print(f"=== {side}: running eval CLI ===", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag,
             weights_dir, data_dir, split, run_dir],
            env=env, timeout=5400, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        tail = "\n".join(proc.stdout.splitlines()[-12:])
        print(tail, flush=True)
        if proc.returncode != 0:
            print(f"{side} run FAILED rc={proc.returncode}")
            sys.exit(2)
        outputs[side] = os.path.join(run_dir, "output")

    ref_avg = read_avgs(os.path.join(outputs["ref"], "avg_depth_metrics.txt"))
    our_avg = read_avgs(os.path.join(outputs["ours"], "avg_depth_metrics.txt"))
    ref_loss = read_avgs(os.path.join(outputs["ref"], "avg_losses.txt"))
    our_loss = read_avgs(os.path.join(outputs["ours"], "avg_losses.txt"))

    print(f"\n{'metric':12s} {'reference':>12s} {'ours':>12s} {'delta':>12s}")
    deltas = {}
    for k in ref_avg:
        if k in our_avg:
            deltas[k] = our_avg[k] - ref_avg[k]
            print(f"{k:12s} {ref_avg[k]:12.6f} {our_avg[k]:12.6f} "
                  f"{deltas[k]:+12.2e}")
    loss_delta = our_loss.get("loss", float("nan")) - ref_loss.get(
        "loss", float("nan"))
    print(f"{'loss':12s} {ref_loss.get('loss', float('nan')):12.6f} "
          f"{our_loss.get('loss', float('nan')):12.6f} {loss_delta:+12.2e}")

    ref_rows = read_rows(os.path.join(outputs["ref"], "depth_metrics.txt"))
    our_rows = read_rows(os.path.join(outputs["ours"], "depth_metrics.txt"))
    common = sorted(set(ref_rows) & set(our_rows))
    per_image = [abs(our_rows[k]["abs_rel"] - ref_rows[k]["abs_rel"])
                 for k in common]
    max_img = max(per_image) if per_image else float("nan")
    print(f"\nper-image abs_rel: {len(common)}/{len(ref_rows)} rows joined, "
          f"max |delta| {max_img:.2e}")

    ok = (len(common) == len(ref_rows) == len(our_rows)
          and abs(deltas.get("abs_rel", 9)) < args.tol_abs_rel
          and abs(deltas.get("a1", 9)) < args.tol_abs_rel
          and max_img < 5 * args.tol_abs_rel)
    if args.dataset == "demon":
        # Per-scene-type breakdown files (test.py:388-407): both stacks
        # must agree on the per-type averages too.
        for typ in ("mvs", "sun3d"):
            fn = f"avg_depth_metrics_{typ}.txt"
            r = read_avgs(os.path.join(outputs["ref"], fn))
            o = read_avgs(os.path.join(outputs["ours"], fn))
            d = o.get("abs_rel", 9) - r.get("abs_rel", 0)
            print(f"{typ:12s} abs_rel {r.get('abs_rel'):.6f} vs "
                  f"{o.get('abs_rel'):.6f} (delta {d:+.2e})")
            ok = ok and abs(d) < args.tol_abs_rel

    print("PARITY_CLI " + json.dumps({
        "dataset": args.dataset,
        "size": list(args.size), "samples": len(common),
        "scene": args.scene if args.dataset == "gta" else "plane",
        "seed": args.seed,
        "ref_abs_rel": ref_avg.get("abs_rel"),
        "ours_abs_rel": our_avg.get("abs_rel"),
        "delta_abs_rel": deltas.get("abs_rel"),
        "delta_a1": deltas.get("a1"),
        "max_per_image_delta_abs_rel": max_img,
        "ref_loss": ref_loss.get("loss"), "ours_loss": our_loss.get("loss"),
        "ok": ok}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
