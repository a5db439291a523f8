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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_create_mvs_split_pose_method(tmp_path):
    """Pose-based curation (reference gta_sfm_dataset.py:17-66): frames are
    kept by translation/viewing-angle windows, no depth IO at all."""
    from multi_view_stereonet_tpu.data import create_mvs_split

    root = str(tmp_path)
    data_dir, _ = make_gta_sfm_tree(root, rows=64, cols=96, frames=4,
                                    num_sequences=1)
    out_file = os.path.join(root, "pose_split.txt")
    create_mvs_split(os.path.join(data_dir, "test"), out_file,
                     num_comparison_frames=1, method="pose",
                     min_trans_diff=0.3, max_trans_diff=5.0)
    lines = [l.split() for l in open(out_file) if l.strip()]
    assert lines, "pose curation produced no pairs"
    for tokens in lines:
        assert len(tokens) == 2
        # cameras sit ~0.4*f apart on x; the window forbids adjacent-only
        # self pairs and identical frames
        assert tokens[0] != tokens[1]


def test_create_mvs_split_keys_tables_by_image_id(tmp_path):
    """Frame-id gaps: the curator must pair calibration by image id, not
    table row position (the reference zips by enumeration and silently
    mispairs; regression for the same latent bug here)."""
    from multi_view_stereonet_tpu.data import create_mvs_split

    root = str(tmp_path)
    data_dir, _ = make_gta_sfm_tree(root, rows=64, cols=96, frames=4,
                                    num_sequences=1)
    # Delete frame 1's files but keep its table rows: ids on disk are
    # now {0, 2, 3} while the tables still list {0, 1, 2, 3}.
    seq_dir = os.path.join(data_dir, "test", "seq00")
    os.remove(os.path.join(seq_dir, "color", "000001.jpg"))
    os.remove(os.path.join(seq_dir, "depth", "000001.npy"))

    # Cameras sit at x ~= 0.4*f. With a [1.0, 5.0] translation window only
    # the (0, 3) pair (~1.2) qualifies. Positional keying would read
    # frames {0, 2, 3} at pose rows {0, 1, 2} (x = 0, 0.4, 0.8) and find
    # no pair at all.
    out_file = os.path.join(root, "gap_split.txt")
    create_mvs_split(os.path.join(data_dir, "test"), out_file,
                     num_comparison_frames=1, method="pose",
                     min_trans_diff=1.0, max_trans_diff=5.0)
    lines = sorted(l.split() for l in open(out_file) if l.strip())
    assert lines == [
        ["seq00/color/000000.jpg", "seq00/color/000003.jpg"],
        ["seq00/color/000003.jpg", "seq00/color/000000.jpg"],
    ], lines


@pytest.mark.slow
def test_eval_warms_every_batch_shape(tmp_path, monkeypatch):
    """The trailing partial batch has a new shape; eval must warm the jit
    cache for it too, or minutes of compile land in runtime_metrics.txt
    (the reference times only the network, test.py:208-209)."""
    import yaml

    import multi_view_stereonet_tpu.eval.test_cli as tc
    from multi_view_stereonet_tpu.checkpoint.native import save_params
    from multi_view_stereonet_tpu.models import init_mvsnet

    import jax

    root = str(tmp_path)
    data_dir, split = make_gta_sfm_tree(root, rows=64, cols=96, frames=4,
                                        num_sequences=1)  # 3 samples
    run_dir = os.path.join(root, "run")
    weights_dir = os.path.join(run_dir, "checkpoints", "epoch0000")
    os.makedirs(weights_dir)
    save_params(weights_dir, init_mvsnet(jax.random.PRNGKey(0)))
    with open(os.path.join(run_dir, "params.yaml"), "w") as f:
        yaml.dump({"size": [64, 96]}, f)

    shape_calls = {}
    real_step = tc._eval_step

    def counting_step(params, batch, model_config, loss_config):
        key = tuple(sorted((k, v.shape) for k, v in batch.items()))
        shape_calls[key] = shape_calls.get(key, 0) + 1
        return real_step(params, batch, model_config, loss_config)

    monkeypatch.setattr(tc, "_eval_step", counting_step)
    monkeypatch.chdir(root)
    tc.run_eval(weights_dir, data_dir, split,
                output_dir=os.path.join(root, "out"), batch_size=2)

    # 3 samples / batch 2 -> a full batch and a trailing batch: two
    # distinct shapes, each warmed once = 2 calls per shape.
    assert len(shape_calls) == 2, shape_calls
    assert all(n == 2 for n in shape_calls.values()), shape_calls


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
