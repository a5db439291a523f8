"""CLI / tooling coverage: multi-view eval, DeMoN eval, split curation,
PFM round trip, galleries."""

import os

import numpy as np
import pytest

from tests.conftest import reference_available
from tests.synthetic_data import make_gta_sfm_tree, make_demon_tree

PRETRAINED_GTA = ("/root/reference/pretrained/gta_sfm_150epochs/checkpoints/"
                  "epoch0149/stereo_network.pt")


def _stage_weights(run_dir, checkpoint, size):
    import shutil
    import yaml

    weights_dir = os.path.join(run_dir, "checkpoints", "epoch0000")
    os.makedirs(weights_dir)
    shutil.copy(checkpoint, weights_dir)
    with open(os.path.join(run_dir, "params.yaml"), "w") as f:
        yaml.dump({"size": list(size)}, f)
    return weights_dir


@pytest.mark.skipif(not reference_available(), reason="needs pretrained weights")
def test_eval_cli_multi_view_v2(tmp_path, monkeypatch):
    """2-comparison-view eval through the CLI (the reference's
    *_2cmps_test.txt config)."""
    from multi_view_stereonet_tpu.eval.test_cli import run_eval

    root = str(tmp_path)
    data_dir, split = make_gta_sfm_tree(root, rows=240, cols=320,
                                        frames=4, num_sequences=1,
                                        comparisons=2)
    weights_dir = _stage_weights(os.path.join(root, "run"), PRETRAINED_GTA,
                                 (240, 320))
    monkeypatch.chdir(root)
    profile_dir = os.path.join(root, "trace")
    _, avg = run_eval(weights_dir, data_dir, split,
                      output_dir=os.path.join(root, "out"), batch_size=2,
                      profile_dir=profile_dir)
    assert avg["abs_rel"] < 0.10, avg
    # jax.profiler trace artifacts landed (SURVEY section 5 tracing).
    trace_files = [f for _, _, fs in os.walk(profile_dir) for f in fs]
    assert trace_files, "profiler trace not written"


@pytest.mark.skipif(not reference_available(), reason="needs pretrained weights")
def test_eval_cli_demon(tmp_path, monkeypatch):
    """DeMoN dataset + checkpoint through the CLI with per-type breakdown."""
    from multi_view_stereonet_tpu.eval.test_cli import run_eval

    demon_ckpt = ("/root/reference/pretrained/demon_45epochs/checkpoints/"
                  "epoch0044/stereo_network.pt")
    root = str(tmp_path)
    data_dir, split = make_demon_tree(root, rows=240, cols=320,
                                      plane_depth=4.0, num_scenes=1)
    weights_dir = _stage_weights(os.path.join(root, "run"), demon_ckpt,
                                 (240, 320))
    monkeypatch.chdir(root)
    out_dir = os.path.join(root, "out")
    _, avg = run_eval(weights_dir, data_dir, split, output_dir=out_dir,
                      batch_size=2)
    assert avg["abs_rel"] < 0.3, avg  # demon checkpoint is the weaker one
    assert os.path.exists(os.path.join(out_dir, "avg_depth_metrics_mvs.txt"))
    assert os.path.exists(os.path.join(out_dir, "avg_depth_metrics_sun3d.txt"))


def test_create_mvs_split(tmp_path):
    """Offline split curation on the synthetic tree."""
    from multi_view_stereonet_tpu.data import create_mvs_split

    root = str(tmp_path)
    data_dir, _ = make_gta_sfm_tree(root, rows=64, cols=96, frames=4,
                                    num_sequences=1)
    out_file = os.path.join(root, "curated_split.txt")
    create_mvs_split(os.path.join(data_dir, "test"), out_file,
                     num_comparison_frames=1, min_overlap=0.3,
                     min_trans_diff=0.05)
    lines = [l.split() for l in open(out_file) if l.strip()]
    assert lines, "curation produced no pairs"
    for tokens in lines:
        assert len(tokens) == 2
        assert tokens[0].endswith(".jpg")


def test_pfm_roundtrip(tmp_path):
    from multi_view_stereonet_tpu.utils.pfm_utils import read_pfm, write_pfm

    rng = np.random.default_rng(0)
    for shape in [(12, 17), (12, 17, 3)]:
        data = rng.normal(size=shape).astype(np.float32)
        path = os.path.join(str(tmp_path), f"t{len(shape)}.pfm")
        write_pfm(path, data)
        back, scale = read_pfm(path)
        np.testing.assert_array_equal(back, data)


def test_galleries(tmp_path):
    from PIL import Image

    from multi_view_stereonet_tpu.utils.image_gallery import (
        create_simple_gallery, create_training_gallery,
    )

    d = str(tmp_path)
    for name in ["100_0001.jpg", "100_0002.jpg", "200_0001.jpg",
                 "100_left_input.jpg"]:
        Image.new("RGB", (8, 8)).save(os.path.join(d, name))
    create_simple_gallery(d)
    html = open(os.path.join(d, "index.html")).read()
    assert "100_0001.jpg" in html
    create_training_gallery(d)
    html = open(os.path.join(d, "index.html")).read()
    assert "200_0001.jpg" in html


def test_visualization_helpers():
    from multi_view_stereonet_tpu.utils.visualization import (
        apply_cmap, apply_normal_map,
    )

    rng = np.random.default_rng(0)
    rgb = apply_cmap(rng.uniform(size=(8, 10)), 0.0, 1.0)
    assert rgb.shape[-1] >= 3 and rgb.min() >= 0 and rgb.max() <= 1
    n = apply_normal_map(rng.uniform(-1, 1, size=(8, 10, 3)))
    assert n.min() >= 0 and n.max() <= 1
