"""End-to-end training-loop drive: unpack -> forward -> loss -> optax
step -> checkpoint write -> resume, on a tiny synthetic GTA-SfM tree
(the verify skill's surface 4). Also covers the --profile_dir trace
lifecycle for runs shorter than profile_steps."""

import glob

import pytest
import os

import numpy as np

from multi_view_stereonet_tpu.train.config import load_params_yaml
from multi_view_stereonet_tpu.train.train_cli import train

from synthetic_data import make_gta_sfm_tree


def _tiny_cfg():
    cfg = load_params_yaml(None)
    cfg.update({
        "size": [32, 48],
        "num_idepth_samples": 4,
        "batch_size": 2,
        "num_epochs": 1,
        "augment": False,
        "debug_image_freq": 0,
        "plot_freq": 0,
    })
    return cfg


@pytest.mark.slow
def test_train_cli_end_to_end_with_resume_and_profile(tmp_path):
    data_dir, split = make_gta_sfm_tree(str(tmp_path), rows=32, cols=48,
                                        frames=6, num_sequences=1)
    out = str(tmp_path / "run")
    cfg = _tiny_cfg()
    profile_dir = str(tmp_path / "trace")

    # max_steps=2 < profile_steps default (4): the finally-close must
    # still stop the trace and flush artifacts.
    params = train(cfg, data_dir, split, "", out, max_steps=2,
                   profile_dir=profile_dir)
    assert params is not None
    assert os.path.exists(os.path.join(out, "losses.txt"))
    ckpts = sorted(glob.glob(os.path.join(out, "checkpoints", "epoch*")))
    assert ckpts, "no checkpoint written"
    trace_files = [f for _, _, fs in os.walk(profile_dir) for f in fs]
    assert trace_files, "profiler trace not flushed on early stop"

    # Resume from the written checkpoint (latest); extend to a second
    # epoch so there is work to do, and take one more step.
    loss_lines = open(os.path.join(out, "losses.txt")).read().count("\n")
    cfg2 = dict(cfg, num_epochs=2)
    params2 = train(cfg2, data_dir, split, "", out, max_steps=1)
    assert params2 is not None
    loss_lines2 = open(os.path.join(out, "losses.txt")).read().count("\n")
    assert loss_lines2 > loss_lines

    leaves1 = [np.asarray(x) for x in
               __import__("jax").tree.leaves(params)]
    leaves2 = [np.asarray(x) for x in
               __import__("jax").tree.leaves(params2)]
    assert any(not np.array_equal(a, b) for a, b in zip(leaves1, leaves2))


def test_graceful_stop_handler_catches_sigterm():
    """SIGTERM sets the flag (the loop breaks on it); restore() puts the
    previous handler back."""
    import signal

    from multi_view_stereonet_tpu.train.train_cli import GracefulStop

    prev = signal.getsignal(signal.SIGTERM)
    stop = GracefulStop()
    try:
        assert not stop()
        os.kill(os.getpid(), signal.SIGTERM)
        # Delivery is synchronous for a self-signal in the main thread.
        assert stop()
    finally:
        stop.restore()
    assert signal.getsignal(signal.SIGTERM) is prev


@pytest.mark.slow
def test_train_cli_view_sharded_mesh(tmp_path):
    """mesh_view=2 (params.yaml) trains over a (data=4, view=2) mesh:
    the comparison-view axis is sharded across devices end-to-end
    through the CLI path, not just the step-level tests."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    data_dir, split = make_gta_sfm_tree(str(tmp_path), rows=32, cols=48,
                                        frames=6, num_sequences=1,
                                        comparisons=2)
    out = str(tmp_path / "run")
    cfg = _tiny_cfg()
    cfg.update({"batch_size": 4, "mesh_view": 2})
    params = train(cfg, data_dir, split, "", out, max_steps=1)
    assert params is not None
    assert os.path.exists(os.path.join(out, "losses.txt"))


@pytest.mark.slow
def test_preemption_checkpoint_and_resume(tmp_path):
    """A stop request mid-epoch (the SIGTERM path, injected via
    stop_check) writes a checkpoint before exiting, and a relaunch
    resumes from it with the step count preserved."""
    data_dir, split = make_gta_sfm_tree(str(tmp_path), rows=32, cols=48,
                                        frames=6, num_sequences=1)
    out = str(tmp_path / "run")
    cfg = _tiny_cfg()

    steps_seen = []

    def stop_after_one_step():
        # Called once per loop iteration, after each optimizer step.
        steps_seen.append(1)
        return len(steps_seen) >= 1

    train(cfg, data_dir, split, "", out, stop_check=stop_after_one_step)
    ckpts = sorted(glob.glob(os.path.join(out, "checkpoints", "epoch*")))
    assert ckpts, "preemption did not write a checkpoint"

    # Relaunch: resumes from the preemption checkpoint and continues.
    cfg2 = dict(cfg, num_epochs=2)
    train(cfg2, data_dir, split, "", out, max_steps=1)
    ckpts2 = sorted(glob.glob(os.path.join(out, "checkpoints", "epoch*")))
    assert len(ckpts2) > len(ckpts)


@pytest.mark.slow
def test_nan_batch_aborts_with_tagged_checkpoint(tmp_path, monkeypatch):
    """A non-finite loss must fail fast (reference losses.py:38 asserts):
    the loop exits non-zero after dumping a "-nanabort"-tagged state that
    does NOT register as a resumable epoch checkpoint. The dump must be
    the last VERIFIED-good state, not the live one -- by abort time the
    optimizer has already applied the NaN update, so dumping the current
    params would record an all-NaN pytree useless for postmortem."""
    import jax

    import multi_view_stereonet_tpu.train.train_cli as tc
    from multi_view_stereonet_tpu.checkpoint.native import (
        latest_epoch, load_params)

    data_dir, split = make_gta_sfm_tree(str(tmp_path), rows=32, cols=48,
                                        frames=6, num_sequences=1)
    out = str(tmp_path / "run")

    real_loader = tc.BatchLoader

    class PoisonedLoader(real_loader):
        """First batch clean (so one good update lands and its loss is
        verified), every later batch NaN-poisoned."""

        def __iter__(self):
            for i, batch in enumerate(super().__iter__()):
                if i >= 1:
                    batch = dict(batch)
                    img = np.array(batch["left_image"])
                    img[..., 0] = np.nan
                    batch["left_image"] = img
                yield batch

    monkeypatch.setattr(tc, "BatchLoader", PoisonedLoader)
    with pytest.raises(SystemExit) as exc:
        train(_tiny_cfg(), data_dir, split, "", out, max_steps=4)
    assert exc.value.code == 3
    tagged = glob.glob(os.path.join(out, "checkpoints", "epoch*-nanabort"))
    assert tagged, "nanabort state dump missing"
    # The dump must not be mistaken for a good epoch checkpoint.
    assert latest_epoch(os.path.join(out, "checkpoints")) is None
    # ... and it must be finite everywhere (the pre-blowup state).
    dumped = load_params(tagged[0])
    for leaf in jax.tree.leaves(dumped):
        assert np.all(np.isfinite(leaf)), "nanabort dump is NaN-poisoned"


@pytest.mark.slow
def test_training_convergence_regression(tmp_path):
    """Bounded convergence regression on the layered_track scene: the
    exact recipe of docs/convergence/SUMMARY_layered_track.md (96x128,
    batch 4, supervised-only, Adam 1e-3) for a fixed 7-epoch budget.
    Catches silent recipe breaks (a lost gradient path, optimizer
    wiring, LR schedule) that one-step grad parity and plumbing smoke
    tests cannot see. Thresholds are ~2x slack over the committed
    trajectory (losses_layered_track.txt: first-step loss 164 -> epoch-6
    mean ~34; validation EPE 23.2 -> 11.5; refined_zero_frac 0.999 -> 0).

    Also the resume-to-same-trajectory guarantee: a REAL mid-run SIGTERM
    (the production GracefulStop path) delivered at an epoch boundary +
    a fresh train() relaunch must reproduce the uninterrupted run's
    remaining losses BITWISE (loader.set_epoch keeps the shuffle order a
    function of the global epoch; augment=False + num_workers=1 makes
    the pipeline deterministic; CPU XLA is bitwise-reproducible)."""
    import signal

    import multi_view_stereonet_tpu.train.train_cli as tc

    E_TOTAL, E_PREEMPT = 7, 2  # SIGTERM at the end of epoch 2

    data_dir, split = make_gta_sfm_tree(str(tmp_path), num_sequences=2,
                                        frames=10, rows=96, cols=128,
                                        seed=7, scene="layered_track")
    lines = [l for l in open(split) if l.strip()]
    train_split = str(tmp_path / "train_gta_sfm.txt")
    val_split = str(tmp_path / "val_gta_sfm.txt")
    open(train_split, "w").writelines(lines[: int(len(lines) * 0.8)])
    open(val_split, "w").writelines(lines[int(len(lines) * 0.8):])

    cfg = load_params_yaml(None)
    cfg.update({
        "size": [96, 128], "batch_size": 4, "num_epochs": E_TOTAL,
        "augment": False, "supervision_factor": 1.0,
        "reconstruction_factor": 0.0, "left_right_factor": 0.0,
        "learning_rate": 1e-3, "num_workers": 1,
        "debug_image_freq": 0, "plot_freq": 0, "print_freq": 1,
    })

    # Run A: uninterrupted 7 epochs.
    out_a = str(tmp_path / "run_a")
    train(dict(cfg), data_dir, train_split, val_split, out_a)

    losses_a = open(os.path.join(out_a, "losses.txt")).read()
    val_rows = [l.split() for l in open(os.path.join(out_a, "validation.txt"))
                if l.strip()]
    header, rows = val_rows[0], val_rows[1:]
    assert len(rows) == E_TOTAL

    def col(row, name):
        return float(row[header.index(name)])

    # Convergence: loss falls, EPE improves vs epoch 0, refiners alive.
    loss_lines = [l.split() for l in losses_a.splitlines()[1:]]
    first_loss = float(loss_lines[0][3])
    last_epoch_losses = [float(l[3]) for l in loss_lines
                         if int(l[0]) == E_TOTAL - 1]
    assert np.mean(last_epoch_losses) < 0.45 * first_loss, (
        f"training loss did not fall: {first_loss} -> {last_epoch_losses}")
    assert col(rows[-1], "epe") < 0.75 * col(rows[0], "epe"), (
        f"validation EPE did not improve: {rows[0]} -> {rows[-1]}")
    assert col(rows[-1], "refined_zero_frac") < 0.1, (
        "refiners died (dead output ReLU): "
        f"refined_zero_frac={col(rows[-1], 'refined_zero_frac')}")

    # Run B: SIGTERM after the last batch of epoch E_PREEMPT, relaunch.
    out_b = str(tmp_path / "run_b")
    real_loader = tc.BatchLoader

    class SignalingLoader(real_loader):
        """Delivers a real SIGTERM once the train loader (shuffle=True;
        the val loader is shuffle=False) exhausts its E_PREEMPT epoch --
        all of that epoch's steps have run, so the preemption lands on
        an epoch boundary and no training data is skipped."""

        def __iter__(self):
            fire = self.shuffle and self._epoch == E_PREEMPT
            yield from super().__iter__()
            if fire:
                os.kill(os.getpid(), signal.SIGTERM)

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(tc, "BatchLoader", SignalingLoader)
        train(dict(cfg), data_dir, train_split, val_split, out_b)
    ckpts = glob.glob(os.path.join(out_b, "checkpoints", "epoch*"))
    assert len(ckpts) == E_PREEMPT + 1, f"preempted run wrote {ckpts}"

    train(dict(cfg), data_dir, train_split, val_split, out_b)

    losses_b = open(os.path.join(out_b, "losses.txt")).read()
    assert losses_b == losses_a, (
        "resumed run diverged from the uninterrupted trajectory")
    # Validation after resume matches too (the preempted epoch itself
    # skips validation by design, so compare the post-resume rows).
    val_b = {l.split()[0]: l for l in
             open(os.path.join(out_b, "validation.txt")) if l.strip()}
    val_a = {l.split()[0]: l for l in
             open(os.path.join(out_a, "validation.txt")) if l.strip()}
    for epoch in range(E_PREEMPT + 1, E_TOTAL):
        assert val_b[str(epoch)] == val_a[str(epoch)]


@pytest.mark.slow
def test_train_cli_demon_dataset_path(tmp_path):
    """The DeMoN dataset branch of make_dataset drives the same loop:
    the reference's demon_45epochs recipe ran on this layout (scenes +
    cam.txt + world-in-camera poses.txt); exercise split dispatch,
    calibration parsing, GT loading and a real optimizer step +
    validation end-to-end."""
    from synthetic_data import make_demon_tree

    data_dir, split = make_demon_tree(str(tmp_path), num_scenes=2,
                                      frames=3, rows=32, cols=48)
    out = str(tmp_path / "run")
    cfg = _tiny_cfg()
    cfg["split"] = "demon"
    params = train(cfg, data_dir, split, split, out, max_steps=2)
    assert params is not None
    val = os.path.join(out, "validation.txt")
    assert os.path.exists(val)
    rows = [l.split() for l in open(val) if l.strip()]
    header, first = rows[0], rows[1]
    assert "refined_zero_frac" in header
    loss = float(first[header.index("loss")])
    assert np.isfinite(loss) and loss > 0
