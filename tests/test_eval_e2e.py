"""End-to-end eval regression: pretrained weights on a synthetic scene.

Guards the full chain (dataset -> transforms -> unpack -> forward ->
baseline handling -> metrics): the pretrained GTA-SfM checkpoint must
recover a synthetic textured plane's depth accurately through the eval
CLI. A baseline-scaling bug anywhere in the chain shows up as a large
abs_rel here (this exact test caught a depth_true *= baseline bug).
"""

import os

import numpy as np
import pytest

from tests.conftest import reference_available
from tests.synthetic_data import make_gta_sfm_tree

PRETRAINED = ("/root/reference/pretrained/gta_sfm_150epochs/checkpoints/"
              "epoch0149/stereo_network.pt")


@pytest.mark.skipif(not reference_available(), reason="needs pretrained weights")
def test_eval_cli_pretrained_on_synthetic_plane(tmp_path, monkeypatch):
    import yaml

    from multi_view_stereonet_tpu.checkpoint import (
        load_torchscript_weights, convert_reference_state_dict,
    )
    from multi_view_stereonet_tpu.checkpoint.native import save_params
    from multi_view_stereonet_tpu.eval.test_cli import run_eval

    root = str(tmp_path)
    data_dir, split = make_gta_sfm_tree(root, rows=240, cols=320,
                                        plane_depth=8.0, frames=3,
                                        num_sequences=1)
    run_dir = os.path.join(root, "run")
    weights_dir = os.path.join(run_dir, "checkpoints", "epoch0000")
    os.makedirs(weights_dir)
    params = convert_reference_state_dict(load_torchscript_weights(PRETRAINED))
    save_params(weights_dir, params)
    with open(os.path.join(run_dir, "params.yaml"), "w") as f:
        yaml.dump({"size": [240, 320]}, f)

    monkeypatch.chdir(root)
    _, avg = run_eval(weights_dir, data_dir, split,
                      output_dir=os.path.join(root, "out"), batch_size=2)

    # The reference stack scores abs_rel ~0.02-0.05 on this scene.
    assert avg["abs_rel"] < 0.10, avg
    assert avg["a1"] > 0.95, avg


@pytest.mark.skipif(not reference_available(), reason="needs pretrained weights")
def test_eval_cli_pretrained_on_layered_occlusion_scene(tmp_path, monkeypatch):
    """Same chain on the HARDEST protocol: the layered occlusion world
    (textured cards over a tilted background, ~4x depth range, real
    occlusion boundaries). The pretrained reference stack scores
    abs_rel ~0.15-0.25 here at 240x320 (the scene is genuinely hard);
    a pipeline regression (baseline/depth scaling, mask handling at
    depth discontinuities) blows well past 0.45."""
    import yaml

    from multi_view_stereonet_tpu.checkpoint import (
        load_torchscript_weights, convert_reference_state_dict,
    )
    from multi_view_stereonet_tpu.checkpoint.native import save_params
    from multi_view_stereonet_tpu.eval.test_cli import run_eval

    root = str(tmp_path)
    data_dir, split = make_gta_sfm_tree(root, rows=240, cols=320, frames=3,
                                        num_sequences=1, scene="layered")
    run_dir = os.path.join(root, "run")
    weights_dir = os.path.join(run_dir, "checkpoints", "epoch0000")
    os.makedirs(weights_dir)
    params = convert_reference_state_dict(load_torchscript_weights(PRETRAINED))
    save_params(weights_dir, params)
    with open(os.path.join(run_dir, "params.yaml"), "w") as f:
        yaml.dump({"size": [240, 320]}, f)

    monkeypatch.chdir(root)
    _, avg = run_eval(weights_dir, data_dir, split,
                      output_dir=os.path.join(root, "out"), batch_size=2)
    assert avg["abs_rel"] < 0.45, avg
    assert avg["a1"] > 0.45, avg


def test_depth_metrics_vs_reference(reference_modules):
    """Metric formulas parity vs reference test.py:41-71."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "reference_test_py", "/root/reference/test.py")
    # test.py imports many things; only the metric function is needed, so
    # evaluate just that function's source context via the module object.
    ref_mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(ref_mod)
    except Exception:
        pytest.skip("reference test.py not importable in this environment")

    from multi_view_stereonet_tpu.eval.metrics import get_depth_prediction_metrics

    rng = np.random.default_rng(0)
    true = rng.uniform(1, 20, size=5000)
    est = true * rng.uniform(0.7, 1.4, size=5000)
    ours = get_depth_prediction_metrics(true, est)
    theirs = ref_mod.get_depth_prediction_metrics(true, est)
    for k in ours:
        np.testing.assert_allclose(ours[k], theirs[k], rtol=1e-6, err_msg=k)
