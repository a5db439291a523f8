"""Training CLI: the 150-epoch reference recipe, TPU-native.

The reference repo has no training script (training lived in the external
"depthest" harness; SURVEY.md). This CLI reconstructs that recipe from the
in-repo plumbing + params.yaml: multi-view supervised training with Adam,
per-epoch validation (EPE/outlier metrics like validation.txt), per-epoch
checkpoints (``checkpoints/epochNNNN``), loss logs and plots.

TPU-native execution: one jitted train step; data parallelism over a
``(data, view)`` device mesh with XLA-inserted gradient reductions; host
threads keep the input pipeline ahead of the device.

Usage:
  python -m multi_view_stereonet_tpu.train.train_cli \
      --config params.yaml --data_dir <dir> --train_split <file> \
      [--val_split <file>] --output_dir <run_dir> [--max_steps N]
"""

from __future__ import annotations

import argparse
import math
import os
import signal
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..data import (
    GTASfMMultiViewDataset, DeMoNDataset, BatchLoader,
    get_training_transforms, get_testing_transforms,
    training_u8_dequantize_mode,
)
from ..losses import LossConfig
from ..models import MultiViewStereoNetConfig, init_mvsnet, mvsnet_forward
from ..parallel import (
    make_mesh, shard_batch, replicated,
    initialize as distributed_initialize, is_main_process,
    make_global_mesh, ShardedDataset, global_batch,
)
from ..checkpoint import native as ckpt
from .config import load_params_yaml
from .pipeline import multi_view_unpack_batch
from .step import OptimizerConfig, make_optimizer, make_train_step
from .validation import disparity_metrics
from .logging import (
    log_losses, log_validation_metrics, plot_losses, log_debug_images,
)
from ..utils.timing import set_seeds, count_parameters


def make_dataset(params, data_dir, split_file, training, num_images=0, rng=None):
    if training:
        # transfer_u8: pixels stay raw uint8 through the host pipeline
        # (4x fewer image bytes host->device, zero host float work); the
        # omitted float stage(s) are replicated bit-exactly inside the
        # jitted train step (step.make_loss_fn transfer_u8).
        transform = get_training_transforms(
            params, rng, u8_output=params.get("transfer_u8", False))
    else:
        # Validation rides the same u8 transport (testing transforms
        # include Normalize, so the val step applies the FULL bit-exact
        # dequantize -- metrics identical either way).
        transform = get_testing_transforms(
            params, u8_output=params.get("transfer_u8", False))
    backend = params.get("decode_backend", "auto")
    if "gta_sfm" in (params.get("split", "") + split_file):
        return GTASfMMultiViewDataset(
            data_dir, split_file, num_images, transform,
            load_groundtruth_depthmaps=True, seed=params["seed"],
            decode_backend=backend)
    return DeMoNDataset(data_dir, split_file, num_right_images=1,
                        num_left_images=num_images, transform=transform,
                        seed=params["seed"], decode_backend=backend)


def build_train_step(params_cfg, steps_per_epoch):
    # fold_extractor_batch concatenates the P('data') left batch with the
    # P(('data','view')) warped-right batch; under a >1-device mesh GSPMD
    # can only reconcile those shardings by involuntary full
    # rematerialization (observed at 240x320/D12 in dryrun_multichip).
    # "auto": the single-chip fast path when unsharded, the mesh-friendly
    # split extraction otherwise (numerically identical either way --
    # tests/test_parallel.py::test_fold_extractor_batch_numerics).
    fold = params_cfg.get("fold_extractor_batch", "auto")
    if fold == "auto":
        fold = jax.device_count() == 1
    model_config = MultiViewStereoNetConfig(
        num_idepth_samples=params_cfg["num_idepth_samples"],
        do_cost_volume_filter=params_cfg["cost_volume_filter"],
        do_refiners=tuple(params_cfg["refiners"]),
        compute_dtype=params_cfg.get("compute_dtype", "float32"),
        matmul_precision=params_cfg.get("matmul_precision", "default"),
        remat_refiners=params_cfg.get("remat_refiners", False),
        fold_extractor_batch=bool(fold),
    )
    loss_config = LossConfig(
        supervision_factor=params_cfg["supervision_factor"],
        reconstruction_factor=params_cfg["reconstruction_factor"],
        left_right_factor=params_cfg["left_right_factor"],
    )
    tx = make_optimizer(OptimizerConfig(
        optimizer=params_cfg["optimizer"],
        learning_rate=params_cfg["learning_rate"],
        scheduler_gamma=params_cfg["scheduler_gamma"],
        steps_per_epoch=steps_per_epoch,
        batches_per_step=params_cfg["batches_per_step"],
    ))
    # Two-view recipe (estimate_right_idepthmap, reference
    # multi_view_stereonet_utils.py:522-537): second forward with roles
    # swapped feeds the right-view supervised/consistency losses.
    two_view = bool(params_cfg.get("estimate_right_idepthmap", False))
    # Training u8 transport: images arrive as raw uint8 and the omitted
    # host float stage(s) are replicated bit-exactly on-device ("unit" =
    # bare x/255 for the augmented recipe, which omits Normalize).
    u8_mode = None
    if params_cfg.get("transfer_u8", False):
        u8_mode = training_u8_dequantize_mode(params_cfg)
    step = make_train_step(model_config, loss_config, tx,
                           multi_view=not two_view,
                           estimate_right_idepthmap=two_view,
                           transfer_u8=u8_mode)
    return model_config, loss_config, tx, step


def make_val_step(model_config, loss_config):
    """Jitted validation step, built ONCE per run -- a fresh function
    per epoch would never hit the jit cache and recompile the whole
    validation graph every epoch."""
    from ..losses import compute_losses

    @jax.jit
    def val_step(params, batch):
        # u8 transport: dtype-gated at trace time, exactly like
        # eval/streaming.serving_forward (the testing pipeline includes
        # Normalize, so the full dequantize applies).
        batch = dict(batch)
        for key in ("left_image", "right_images"):
            if batch[key].dtype == jnp.uint8:
                from ..ops.quantize import dequantize_images_u8

                batch[key] = dequantize_images_u8(batch[key])
        inputs = multi_view_unpack_batch(batch)
        outputs = mvsnet_forward(
            params, inputs["left_image_pyr"], inputs["K_pyr"],
            inputs["T_right_in_left"], inputs["right_image_pyr"], model_config)
        loss, _, _ = compute_losses(inputs, outputs, loss_config)
        m = disparity_metrics(
            inputs["K_pyr"][0], inputs["T_right_in_left"][:, 0],
            outputs["left_idepthmap_pyr"][0], inputs["left_idepthmap_true"])
        # Dead-refiner telemetry: the refiners end in ReLU(idepth + delta)
        # (reference multi_view_stereonet.py:480-483); when the scene's
        # idepth statistics sit far below the sweep's initial soft-argmin,
        # the x100-scaled loss can drive delta past -idepth early and the
        # output dies at exactly 0 with no recovery gradient (observed on
        # a synthetic scene with sub-pixel level-4 disparities --
        # docs/convergence/SUMMARY_layered.md). Zero-fraction of the
        # finest refined output makes that failure visible in one number.
        m["refined_zero_frac"] = jnp.mean(
            outputs["left_idepthmap_pyr"][0] == 0)
        return loss, m

    return val_step


def validate(params, val_loader, val_step):
    """Per-epoch validation: loss + disparity metrics (validation.txt)."""
    totals = None
    loss_sum, n = 0.0, 0
    for batch in val_loader:
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if not k.endswith("filenames")}
        loss, m = val_step(params, batch)
        loss_sum += float(loss)
        m = {k: float(v) for k, v in m.items()}
        totals = m if totals is None else {
            k: totals[k] + m[k] for k in totals}
        n += 1
    if n == 0:
        return 0.0, {}
    return loss_sum / n, {k: v / n for k, v in totals.items()}


class GracefulStop:
    """Preemption-safe shutdown: SIGTERM -> finish the current step,
    checkpoint, exit cleanly.

    TPU pods (and most batch schedulers) deliver SIGTERM with a grace
    window before killing the job; without this, everything since the
    last epoch checkpoint is lost. The handler only sets a flag -- the
    train loop checks it between steps, writes a checkpoint labeled with
    the current epoch and breaks, so a relaunch resumes from it (at the
    next epoch boundary; the global step count is preserved, keeping the
    LR schedule continuous). In multi-host runs the scheduler signals
    every process, so all hosts leave the collective loop together.
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        self._event = threading.Event()
        self._previous = {}
        for s in signals:
            try:
                self._previous[s] = signal.signal(s, self._handle)
            except ValueError:  # not the main thread: flag-only mode
                pass

    def _handle(self, signum, frame):
        self._event.set()

    def __call__(self) -> bool:
        return self._event.is_set()

    def restore(self):
        for s, h in self._previous.items():
            signal.signal(s, h)


def train(params_cfg, data_dir, train_split, val_split, output_dir,
          max_steps=0, max_epochs=None, profile_dir=None,
          profile_steps=4, stop_check=None):
    os.makedirs(output_dir, exist_ok=True)
    key = set_seeds(params_cfg["seed"])
    rng = np.random.default_rng(params_cfg["seed"])

    # Multi-host: every process runs this same function; ``batch_size``
    # stays the GLOBAL batch (sharded over all devices of all hosts, like
    # the single-host mesh shards it over local devices). Each process
    # loads its strided shard of the split and 1/process_count of the
    # batch; side effects (logs, plots, checkpoints) happen on process 0.
    n_proc = jax.process_count()
    is_main = is_main_process()
    batch_size = params_cfg["batch_size"]
    if batch_size % n_proc != 0:
        raise ValueError(f"batch_size {batch_size} must be divisible by "
                         f"the process count {n_proc}")
    local_batch = batch_size // n_proc

    dataset = make_dataset(params_cfg, data_dir, train_split, True,
                           params_cfg["num_train_images"], rng)
    if n_proc > 1:
        dataset = ShardedDataset(dataset)
    loader = BatchLoader(dataset, local_batch,
                         shuffle=params_cfg["shuffle"], seed=params_cfg["seed"],
                         workers=params_cfg.get("num_workers", 4))
    steps_per_epoch = max(len(loader), 1)

    val_loader = None
    if val_split:
        val_dataset = make_dataset(params_cfg, data_dir, val_split, False,
                                   params_cfg["num_val_images"])
        val_loader = BatchLoader(val_dataset, params_cfg["batch_size"],
                                 shuffle=False, drop_last=False,
                                 workers=params_cfg.get("num_workers", 4))

    model_config, loss_config, tx, train_step = build_train_step(
        params_cfg, steps_per_epoch)

    params = init_mvsnet(key)
    opt_state = tx.init(params)
    start_epoch = 0
    ckpt_root = os.path.join(output_dir, "checkpoints")

    prev = params_cfg.get("previous_checkpoint_dir", "")
    latest = ckpt.latest_epoch(ckpt_root)
    resume_step = 0
    if prev:
        params = ckpt.load_params(prev, template=params)
        if is_main:
            print(f"resumed params from {prev}")
    elif latest is not None:
        state = ckpt.load_train_state(ckpt_root, latest, {
            "params": params, "opt_state": opt_state, "step": np.asarray(0)})
        params, opt_state = state["params"], state["opt_state"]
        start_epoch = latest + 1
        resume_step = int(state["step"])
        if is_main:
            print(f"resumed from epoch {latest} (step {resume_step})")

    if is_main:
        print(f"model parameters: {count_parameters(params)}")
        # Determinism note: with workers>1 the augmented sample<->jitter
        # pairing is scheduling-dependent; exact run-to-run
        # reproducibility needs num_workers: 1 (data/transforms.py
        # ThreadLocalRng contract). Logged so every run records which
        # regime it ran in.
        print(f"data loader workers: {params_cfg.get('num_workers', 4)} "
              "(run-to-run bit-reproducibility requires num_workers: 1)")

    # u8 transport mode for the debug-image path (the train step itself
    # gets it via build_train_step); None = classic f32 feed.
    u8_mode = (training_u8_dequantize_mode(params_cfg)
               if params_cfg.get("transfer_u8", False) else None)
    if u8_mode and is_main:
        print(f"image transport: uint8 (on-device dequantize mode "
              f"'{u8_mode}'); numerics bit-identical to the f32 feed")

    # mesh_view > 1 (params.yaml) shards the comparison-view axis over a
    # second mesh dimension (docs/SCALING.md "view"); requires the
    # dataset's view count to be divisible by it.
    mesh_view = int(params_cfg.get("mesh_view", 1))
    mesh = (make_global_mesh(view=mesh_view) if n_proc > 1
            else make_mesh(view=mesh_view))
    rep = replicated(mesh)
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)
    n_data = mesh.shape["data"]
    if n_proc > 1 and batch_size % n_data != 0:
        raise ValueError(
            f"multi-host training needs batch_size ({batch_size}) divisible "
            f"by the mesh data-axis size ({n_data})")

    # Deliberately NOT donating params/opt_state: the nanabort path below
    # dumps the last state whose loss was verified finite, which requires
    # the pre-step buffers to stay alive across the update. At 0.6 M
    # parameters (~10 MB params+opt) the donation aliasing saves nothing
    # measurable against the 60 ms step.
    jit_step = jax.jit(train_step)
    val_step = (make_val_step(model_config, loss_config)
                if val_loader is not None else None)
    # One reusable jitted forward for debug-image dumps (a fresh lambda
    # per dump would retrace and recompile the model every time).
    debug_forward = jax.jit(lambda p, i: mvsnet_forward(
        p, i["left_image_pyr"], i["K_pyr"], i["T_right_in_left"],
        i["right_image_pyr"], model_config))

    loss_file = os.path.join(output_dir, "losses.txt")
    val_file = os.path.join(output_dir, "validation.txt")
    debug_dir = os.path.join(output_dir, "debug_images")
    step_count = resume_step
    num_epochs = max_epochs if max_epochs is not None else params_cfg["num_epochs"]

    # Device-timeline trace of the first ``profile_steps`` steps
    # (compile + steady state) when requested.
    import contextlib
    from ..utils.timing import profile_trace
    _prof = contextlib.ExitStack()
    if profile_dir:
        _prof.enter_context(profile_trace(profile_dir))

    graceful = None
    if stop_check is None:
        graceful = GracefulStop()
        stop_check = graceful

    # Rolling references for the nanabort dump. ``good_state`` is the
    # last (params, opt_state, step) whose loss was VERIFIED finite --
    # a finite loss implies finite params, since the loss is computed
    # from them and NaN propagates through every conv. ``pending`` is
    # the state that entered the step whose loss has been dispatched
    # but not yet checked (the check runs one step delayed).
    good_state = None
    pending = None

    def abort_if_nonfinite(lossf, epoch):
        """Fail fast on a non-finite loss (the reference asserts inside the
        loss itself, multi_view_stereonet/losses.py:38). The dumped
        "-nanabort" state is the last verified-good one (at most two steps
        before the blowup), NOT the current params -- by abort time the
        optimizer has already applied the NaN update, so the live state is
        poisoned and useless for postmortem or a lower-LR resume. The tag
        keeps it distinct from epoch checkpoints, so the last good one is
        never overwritten; the process exits non-zero. Every process
        raises (a main-only abort would deadlock the others at the next
        collective)."""
        if math.isfinite(lossf):
            return
        if is_main:
            if good_state is not None:
                gp, go, gstep = good_state
            else:  # blew up before any loss was verified: dump as-entered
                gp, go, gstep = pending if pending is not None else (
                    params, opt_state, step_count)
            path = ckpt.save_train_state(ckpt_root, epoch, gp, go,
                                         gstep, suffix="-nanabort")
            print(f"FATAL: non-finite loss {lossf} at step {step_count}; "
                  f"last verified-good state (step {gstep}) dumped to "
                  f"{path}", file=sys.stderr, flush=True)
        raise SystemExit(3)

    try:
        for epoch in range(start_epoch, num_epochs):
            t_epoch = time.time()
            # Shuffle order must be a function of the global epoch, not of
            # this process's iteration count, or a resumed run diverges
            # from the uninterrupted trajectory (loader.set_epoch).
            loader.set_epoch(epoch)
            prev_loss = None
            for batch_idx, batch in enumerate(loader):
                names = batch.pop("left_filenames")
                batch.pop("right_filenames")
                mv_batch = batch  # V-axis form, for the debug-image dump
                if params_cfg.get("estimate_right_idepthmap", False):
                    # Adapt the V-axis batch to the two-view interface.
                    batch = dict(batch)
                    batch["right_image"] = batch.pop("right_images")[:, 0]
                    if "right_depthmap_true" in batch:
                        batch["right_depthmap_true"] = batch["right_depthmap_true"][:, 0]
                    batch["T_right_in_left"] = batch["T_right_in_left"][:, 0]
                if n_proc > 1:
                    jbatch = global_batch(mesh, batch)
                elif batch_size % n_data == 0 and n_data > 1:
                    jbatch = shard_batch(mesh, batch)
                else:
                    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

                entering = (params, opt_state, step_count)
                with mesh:
                    params, opt_state, loss, loss_dict = jit_step(
                        params, opt_state, jbatch)

                step_count += 1
                # Per-step finiteness check, one step delayed: the PREVIOUS
                # loss is already materialized (step N+1 was just
                # dispatched), so float() costs no device-pipeline stall; a
                # NaN burst aborts at most one update late instead of
                # training garbage until the next print/checkpoint.
                if prev_loss is not None:
                    abort_if_nonfinite(float(prev_loss), epoch)
                    good_state = pending  # its loss just verified finite
                pending = entering
                prev_loss = loss
                if profile_dir and step_count >= profile_steps:
                    jax.block_until_ready(loss)
                    _prof.close()
                    profile_dir = None
                if step_count % params_cfg["print_freq"] == 0:
                    lossf = float(loss)
                    abort_if_nonfinite(lossf, epoch)
                    good_state = pending  # current loss verified finite
                    if is_main:
                        print(f"epoch {epoch} batch {batch_idx} step "
                              f"{step_count} loss {lossf:.4f}")
                        log_losses(epoch, batch_idx, step_count, lossf,
                                   jax.device_get(loss_dict), loss_file)
                if (is_main and params_cfg["plot_freq"]
                        and step_count % params_cfg["plot_freq"] == 0):
                    plot_losses(loss_file, os.path.join(output_dir, "plots"))
                if (is_main and params_cfg["debug_image_freq"]
                        and step_count % params_cfg["debug_image_freq"] == 0):
                    # Always from the V-axis batch: the two-view recipe
                    # pops right_images from the adapted copy. Under the
                    # u8 transport the images arrive quantized -- apply
                    # the same on-device dequantize the train step uses.
                    dbg_batch = {k: jnp.asarray(v)
                                 for k, v in mv_batch.items()}
                    if u8_mode:
                        from ..ops.quantize import (
                            dequantize_images_u8, dequantize_images_u8_unit)
                        _deq = (dequantize_images_u8_unit
                                if u8_mode == "unit"
                                else dequantize_images_u8)
                        dbg_batch["left_image"] = _deq(
                            dbg_batch["left_image"])
                        dbg_batch["right_images"] = _deq(
                            dbg_batch["right_images"])
                    inputs = multi_view_unpack_batch(dbg_batch)
                    dparams = jax.device_get(params) if n_proc > 1 else params
                    outputs = debug_forward(dparams, inputs)
                    inputs["left_filenames"] = names
                    log_debug_images(epoch, step_count, 0, inputs,
                                     jax.device_get(outputs), debug_dir)
                if max_steps and step_count >= max_steps:
                    break
                if stop_check():
                    break

            # The delayed check leaves the epoch's LAST step unchecked --
            # verify it before the state is saved as a good epoch checkpoint.
            if prev_loss is not None:
                abort_if_nonfinite(float(prev_loss), epoch)
                good_state = pending

            stopping = stop_check()
            t_train_phase = time.time() - t_epoch
            t_val_phase = 0.0
            if val_loader is not None and is_main and not stopping:
                # Validation has no collectives: process 0 runs it alone on
                # a host-local copy of the (replicated) params.
                t_val0 = time.time()
                vparams = jax.device_get(params) if n_proc > 1 else params
                val_loss, metrics = validate(vparams, val_loader, val_step)
                t_val_phase = time.time() - t_val0
                log_validation_metrics(epoch, val_loss, metrics, val_file)
                print(f"epoch {epoch} validation loss {val_loss:.4f} {metrics}")
                if metrics.get("refined_zero_frac", 0.0) >= 0.999:
                    print("WARNING: finest refined idepth output is all "
                          "zero -- the refiners' output ReLU has likely "
                          "died (delta <= -idepth everywhere; no recovery "
                          "gradient). Check scene/idepth statistics vs "
                          "the hypothesis sweep range, or lower the "
                          "learning rate.", flush=True)

            if is_main:
                t_ckpt0 = time.time()
                path = ckpt.save_train_state(ckpt_root, epoch, params,
                                             opt_state, step_count)
                t_ckpt_phase = time.time() - t_ckpt0
                tag = "preempted at" if stopping else "done in"
                # Phase breakdown: train = feed+step (overlapped via
                # BatchLoader prefetch), val = validation fwd+metrics,
                # ckpt = checkpoint write. Parsed by
                # scripts/bench_train_e2e.py for the per-epoch fixed-cost
                # decomposition.
                print(f"epoch {epoch} {tag} {time.time() - t_epoch:.1f}s "
                      f"(train {t_train_phase:.1f}s, val {t_val_phase:.1f}s, "
                      f"ckpt {t_ckpt_phase:.1f}s); "
                      f"checkpoint: {path}")
            if stopping or (max_steps and step_count >= max_steps):
                break

    finally:
        # Stop a still-open trace (run shorter than
        # profile_steps, or an exception mid-epoch).
        _prof.close()
        if graceful is not None:
            graceful.restore()
    return params


def main():
    parser = argparse.ArgumentParser(description="Train MultiViewStereoNet (TPU).")
    parser.add_argument("--config", required=True, help="params.yaml")
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--train_split", required=True)
    parser.add_argument("--val_split", default="")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--max_steps", type=int, default=0)
    parser.add_argument("--max_epochs", type=int, default=None)
    parser.add_argument("--profile_dir", default=None,
                        help="write a jax.profiler trace of the first "
                             "steps here")
    # Multi-host launch (one process per host). Defaults come from the
    # MVS_COORDINATOR_ADDRESS / MVS_NUM_PROCESSES / MVS_PROCESS_ID env
    # vars; absent both, the run is single-process.
    parser.add_argument("--coordinator", default=None,
                        help="host:port of process 0 for multi-host runs")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--platform", default="default",
                        choices=("default", "cpu"),
                        help="'cpu' forces the CPU backend (the hosted-TPU "
                             "plugin overrides the JAX_PLATFORMS env var, so "
                             "subprocess launchers need a real flag)")
    args = parser.parse_args()

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # Must precede any JAX backend use in this process.
    distributed_initialize(args.coordinator, args.num_processes,
                           args.process_id)

    params_cfg = load_params_yaml(args.config)
    train(params_cfg, args.data_dir, args.train_split, args.val_split,
          args.output_dir, args.max_steps, args.max_epochs,
          profile_dir=args.profile_dir)


if __name__ == "__main__":
    main()
