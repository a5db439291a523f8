"""Checkpoint round-trips: msgpack params, orbax train state, importer."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_view_stereonet_tpu.checkpoint import native as ckpt
from multi_view_stereonet_tpu.models import init_mvsnet

from tests.conftest import reference_available


def _tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_params_roundtrip(tmp_path):
    params = init_mvsnet(jax.random.PRNGKey(7))
    path = ckpt.save_params(str(tmp_path), params)
    assert path.endswith(ckpt.PARAMS_FILE)
    back = ckpt.load_params(str(tmp_path))
    _tree_equal(params, back)


def test_train_state_roundtrip_and_latest(tmp_path):
    import optax

    params = init_mvsnet(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    root = os.path.join(str(tmp_path), "checkpoints")
    assert ckpt.latest_epoch(root) is None
    ckpt.save_train_state(root, 0, params, opt_state, step=10)
    ckpt.save_train_state(root, 3, params, opt_state, step=40)
    assert ckpt.latest_epoch(root) == 3

    state = ckpt.load_train_state(root, 3, {
        "params": params, "opt_state": opt_state, "step": np.asarray(0)})
    _tree_equal(state["params"], params)
    assert int(state["step"]) == 40


def test_load_any_params_prefers_native(tmp_path):
    params = init_mvsnet(jax.random.PRNGKey(1))
    ckpt.save_params(str(tmp_path), params)
    back = ckpt.load_any_params(str(tmp_path))
    _tree_equal(params, back)
    with pytest.raises(FileNotFoundError):
        ckpt.load_any_params(str(tmp_path / "nonexistent_subdir_x"))


@pytest.mark.skipif(not reference_available(), reason="needs reference ckpt")
def test_torchscript_importer_covers_all_params():
    """Every converted tensor has the shape the model init expects."""
    from multi_view_stereonet_tpu.checkpoint import (
        load_torchscript_weights, convert_reference_state_dict,
    )

    sd = load_torchscript_weights(
        "/root/reference/pretrained/demon_45epochs/checkpoints/epoch0044/"
        "stereo_network.pt")
    converted = convert_reference_state_dict(sd)
    template = init_mvsnet(jax.random.PRNGKey(0))
    tc, tt = jax.tree.leaves(converted), jax.tree.leaves(template)
    assert len(tc) == len(tt)
    for c, t in zip(tc, tt):
        assert c.shape == t.shape and c.dtype == t.dtype


def test_params_yaml_defaults(tmp_path):
    from multi_view_stereonet_tpu.train.config import load_params_yaml

    # Missing file -> pure defaults (incl. the DeMoN params.yaml quirk keys).
    cfg = load_params_yaml(str(tmp_path / "missing.yaml"))
    assert cfg["cost_volume_filter"] is True
    assert cfg["refiners"] == [True] * 5
    assert cfg["num_idepth_samples"] == 12

    p = tmp_path / "p.yaml"
    p.write_text("num_idepth_samples: 6\nsupervision_factor: 0.5\n")
    cfg = load_params_yaml(str(p))
    assert cfg["num_idepth_samples"] == 6
    assert cfg["supervision_factor"] == 0.5
    assert cfg["learning_rate"] == 1e-3  # default preserved
