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
