"""Observability: loss logs, plots, validation logs, debug images."""

import os

import numpy as np

import jax.numpy as jnp

from multi_view_stereonet_tpu.train.logging import (
    log_losses, log_validation_metrics, plot_losses, plot_validation,
    log_debug_images, log_debug_occlusion_mask,
)


def _write_loss_history(path, steps=12):
    for s in range(steps):
        log_losses(epoch=s // 4, batch=s % 4, step=s, loss=10.0 / (s + 1),
                   loss_dict={"supervised_losses": [jnp.float32(1.0 + s),
                                                    jnp.float32(2.0)],
                              "supervised_loss": jnp.float32(1.5)},
                   output_file=path)


def test_loss_log_format_and_plots(tmp_path):
    loss_file = os.path.join(str(tmp_path), "losses.txt")
    _write_loss_history(loss_file)

    with open(loss_file) as f:
        header = f.readline().split()
    assert header[:4] == ["epoch", "batch", "step", "loss"]
    assert "supervised_losses0" in header and "supervised_loss" in header
    data = np.loadtxt(loss_file, skiprows=1, ndmin=2)
    assert data.shape[0] == 12

    plot_dir = os.path.join(str(tmp_path), "plots")
    plot_losses(loss_file, plot_dir)
    assert os.path.exists(os.path.join(plot_dir, "supervised_loss.jpg"))
    assert os.path.exists(os.path.join(plot_dir, "index.html"))


def test_validation_log_and_plot(tmp_path):
    loss_file = os.path.join(str(tmp_path), "losses.txt")
    _write_loss_history(loss_file)
    val_file = os.path.join(str(tmp_path), "validation.txt")
    for e in range(3):
        log_validation_metrics(e, 5.0 - e, {"epe": 4.0 - e, "d1_all": 0.3},
                               val_file)
    header = open(val_file).readline().split()
    assert header[:2] == ["epoch", "loss"] and "epe" in header

    out = os.path.join(str(tmp_path), "valplots")
    plot_validation(loss_file, val_file, out)
    assert os.path.exists(os.path.join(out, "training_validation_loss.jpg"))


def test_debug_image_dumps(tmp_path):
    rng = np.random.default_rng(0)
    inputs = {
        "left_filenames": ["/data/seq/color/000001.jpg"],
        "left_image_pyr": [jnp.asarray(rng.uniform(-1, 1, (1, 16, 20, 3))
                                       .astype(np.float32))],
        "left_idepthmap_true": jnp.asarray(
            rng.uniform(0, 2, (1, 16, 20)).astype(np.float32)),
    }
    outputs = {"left_idepthmap_pyr": [
        jnp.asarray(rng.uniform(0, 2, (1, 16, 20)).astype(np.float32)), None]}
    d = os.path.join(str(tmp_path), "debug")
    log_debug_images(0, 1, 0, inputs, outputs, d)
    lvl0 = os.path.join(d, "left_idepthmap0")
    files = os.listdir(lvl0)
    assert any(f.endswith("_0000.jpg") for f in files)
    assert any("left_input" in f for f in files)
    assert any("ground_truth" in f for f in files)
    assert os.path.exists(os.path.join(lvl0, "index.html"))

    mask = np.zeros((16, 20), bool)
    mask[4:8] = True
    log_debug_occlusion_mask(0, 1, 1234, mask, mask,
                             os.path.join(str(tmp_path), "occ"))
    assert os.path.exists(os.path.join(str(tmp_path), "occ", "1234_0000.jpg"))
    assert os.path.exists(os.path.join(str(tmp_path), "occ", "1234_true.jpg"))
