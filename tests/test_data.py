"""Dataset/loader tests: calibration parity vs the reference datasets on a
synthetic on-disk tree, batch assembly shapes, transform behavior."""

import os
import time

import numpy as np
import pytest

from multi_view_stereonet_tpu.data import (
    GTASfMMultiViewDataset, DeMoNDataset, BatchLoader,
    get_testing_transforms,
)
from tests.synthetic_data import make_gta_sfm_tree, make_demon_tree


@pytest.fixture(scope="module")
def gta_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("gta")
    return make_gta_sfm_tree(str(root), rows=64, cols=96)


@pytest.fixture(scope="module")
def demon_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("demon")
    return make_demon_tree(str(root), rows=64, cols=96)


def test_gta_calibration_vs_reference(reference_modules, gta_tree):
    data_dir, split = gta_tree
    import datasets.gta_sfm_dataset as gtad

    ours = GTASfMMultiViewDataset(data_dir, split, transform=None,
                                  load_groundtruth_depthmaps=True, shuffle=False)
    ref = gtad.GTASfMMultiViewStereoDataset(data_dir, split, 0, None,
                                            load_groundtruth_depthmaps=True)
    # The reference shuffles unseeded; match entries by left filename.
    ref_by_name = {}
    for i in range(len(ref)):
        K_ref, T_ref = ref.get_calibration(i)
        ref_by_name[ref.left_filenames[i]] = (K_ref, T_ref)

    assert len(ours) == len(ref)
    for i in range(len(ours)):
        name = ours.left_names[i]
        K_ref, T_ref = ref_by_name[name]
        s = ours[i]
        np.testing.assert_allclose(s["K"], K_ref, rtol=1e-6)
        for v in range(len(T_ref)):
            np.testing.assert_allclose(s["T_right_in_left"][v], T_ref[v],
                                       rtol=1e-5, atol=1e-6)
        depth_ref = ref.get_groundtruth_depthmap(
            os.path.join(data_dir, name))
        np.testing.assert_allclose(s["left_depthmap_true"], depth_ref)


def test_gta_gapped_frame_ids(tmp_path):
    """Non-contiguous image ids resolve to the right calibration rows.

    4 of 200 sequences in the real gta_sfm_overlap0.5_train split have
    frame-id gaps (e.g. train/20190125_153845: 176 ids spanning 0..179).
    The runtime lookup here is keyed by image id (`_SequenceCache`), so a
    gap must not shift poses -- and split curation (`create_mvs_split`)
    must keep working where the reference's positional zip of the image
    list against the pose table rows would mis-pair every frame after
    the gap (reference datasets/gta_sfm_dataset.py:68-161).
    """
    from multi_view_stereonet_tpu.data.gta_sfm import create_mvs_split

    ids = [0, 2, 3, 7]  # gapped: ids 1, 4-6 missing
    data_dir, split = make_gta_sfm_tree(
        str(tmp_path), num_sequences=1, frames=len(ids), rows=48, cols=64,
        frame_ids=ids)

    ds = GTASfMMultiViewDataset(data_dir, split, transform=None,
                                load_groundtruth_depthmaps=True,
                                shuffle=False)
    # Expected relative poses straight from the id-keyed table on disk.
    seq_dir = os.path.join(data_dir, "test", "seq00")
    rows = np.loadtxt(os.path.join(seq_dir, "poses.txt"), skiprows=1,
                      ndmin=2)
    pose_by_id = {int(r[0]): r[1:].reshape(4, 4) for r in rows}
    assert sorted(pose_by_id) == ids
    assert len(ds) == len(ids) - 1
    for i in range(len(ds)):
        s = ds[i]
        lid = int(os.path.splitext(os.path.basename(s["left_filename"]))[0])
        rid = int(os.path.splitext(
            os.path.basename(s["right_filenames"][0]))[0])
        T_expect = np.linalg.inv(pose_by_id[lid]) @ pose_by_id[rid]
        np.testing.assert_allclose(s["T_right_in_left"][0], T_expect,
                                   rtol=1e-5, atol=1e-6)
        assert s["left_depthmap_true"].shape == (48, 64)

    # Curation on the gapped tree: id-keyed, must emit pairs for every
    # reference frame with a valid partner (table-vs-disk mismatch is
    # covered separately in test_cli_coverage.py).
    out = os.path.join(str(tmp_path), "curated.txt")
    create_mvs_split(os.path.join(data_dir, "test"), out,
                     num_comparison_frames=1, method="pose",
                     min_trans_diff=0.1, max_trans_diff=10.0)
    lines = [l.split() for l in open(out) if l.strip()]
    assert len(lines) == len(ids)  # every frame has an in-window partner
    for toks in lines:
        assert all(
            os.path.exists(os.path.join(data_dir, "test", t)) for t in toks)


def test_demon_poses_vs_reference(reference_modules, demon_tree):
    data_dir, split = demon_tree
    import datasets.demon_dataset as dd

    ours = DeMoNDataset(data_dir, split, num_right_images=1, transform=None,
                        shuffle=False)
    ref = dd.DeMoNDataset(data_dir, split, num_right_images=1, num_left_images=0,
                          transform=None)
    ref_by_name = {s["left_filename"]: s for s in ref.samples}
    assert len(ours) == len(ref)
    for i in range(len(ours)):
        raw = ours.samples[i]
        r = ref_by_name[raw["left_filename"]]
        np.testing.assert_allclose(raw["K"], r["K"], rtol=1e-6)
        assert raw["right_filenames"] == r["right_filename"]
        for v in range(len(raw["T_right_in_left"])):
            np.testing.assert_allclose(raw["T_right_in_left"][v],
                                       r["T_right_in_left"][v],
                                       rtol=1e-5, atol=1e-6)


def test_testing_transform_resizes_and_rescales_K(gta_tree):
    data_dir, split = gta_tree
    t = get_testing_transforms({"size": [32, 48]})
    ds = GTASfMMultiViewDataset(data_dir, split, transform=t,
                                load_groundtruth_depthmaps=True, shuffle=False)
    raw = GTASfMMultiViewDataset(data_dir, split, transform=None,
                                 load_groundtruth_depthmaps=False, shuffle=False)
    s = ds[0]
    r = raw[0]
    assert s["left_image"].shape == (32, 48, 3)
    assert s["left_image"].min() >= -1.0 and s["left_image"].max() <= 1.0
    np.testing.assert_allclose(s["K"][0, 0], np.asarray(r["K"])[0, 0] * 48 / 96,
                               rtol=1e-6)
    # GT not resized (reference ResizeImageStereo: "Don't resize groundtruth").
    assert s["left_depthmap_true"].shape == (64, 96)


def test_batch_loader_shapes_and_determinism(gta_tree):
    data_dir, split = gta_tree
    t = get_testing_transforms({"size": [64, 96]})
    ds = GTASfMMultiViewDataset(data_dir, split, transform=t,
                                load_groundtruth_depthmaps=True, shuffle=False)
    loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=7, prefetch=2)
    b1 = [b["left_filenames"] for b in loader]
    loader2 = BatchLoader(ds, batch_size=2, shuffle=True, seed=7, prefetch=0)
    b2 = [b["left_filenames"] for b in loader2]
    assert b1 == b2  # same seed + epoch -> same order, threaded or not

    # Parallel decode preserves order, contents, and partial batches.
    serial = list(BatchLoader(ds, batch_size=2, prefetch=0, drop_last=False))
    parallel = list(BatchLoader(ds, batch_size=2, prefetch=0, drop_last=False,
                                workers=4))
    assert len(serial) == len(parallel)
    for a, b in zip(serial, parallel):
        assert a["left_filenames"] == b["left_filenames"]
        np.testing.assert_array_equal(a["left_image"], b["left_image"])

    batch = next(iter(BatchLoader(ds, batch_size=2)))
    assert batch["left_image"].shape == (2, 64, 96, 3)
    assert batch["right_images"].shape == (2, 1, 64, 96, 3)
    assert batch["K"].shape == (2, 4, 4)
    assert batch["T_right_in_left"].shape == (2, 1, 4, 4)
    assert batch["left_depthmap_true"].shape == (2, 64, 96)
    assert batch["right_depthmap_true"].shape == (2, 1, 64, 96)


def test_depthmap_utils_vs_reference(reference_modules):
    from multi_view_stereonet_tpu.utils import depthmap_utils as du
    from utils import depthmap_utils as ref_du

    rng = np.random.default_rng(0)
    K = np.array([[50.0, 0, 31.5], [0, 50.0, 23.5], [0, 0, 1]])
    depth = rng.uniform(0, 10, size=(48, 64))
    depth[depth < 2] = 0.0

    pts = du.depthmap_to_point_cloud(K, depth)
    pts_ref = ref_du.depthmap_to_point_cloud(K, depth)
    np.testing.assert_allclose(pts, pts_ref, rtol=1e-6)

    T = np.eye(4)
    T[0, 3] = 0.5
    P = np.eye(4)
    P[:3, :3] = K
    dm = du.point_cloud_to_depthmap((48, 64), P, T, pts)
    dm_ref = ref_du.point_cloud_to_depthmap((48, 64), P, T, pts_ref)
    np.testing.assert_allclose(dm, dm_ref, rtol=1e-5)

    disp = du.depthmap_to_disparity(K, T, depth)
    disp_ref = ref_du.depthmap_to_disparity(K, T, depth)
    np.testing.assert_allclose(disp, disp_ref, rtol=1e-5, atol=1e-6)


def test_batch_loader_early_exit_reaps_worker(gta_tree):
    """Breaking out of a prefetching BatchLoader must not leave the
    prefetch thread blocked in q.put forever (serving loops abandon the
    generator mid-epoch)."""
    import threading

    data_dir, split = gta_tree
    t = get_testing_transforms({"size": [64, 96]})
    ds = GTASfMMultiViewDataset(data_dir, split, transform=t, shuffle=False)

    before = threading.active_count()
    for _ in range(3):
        for batch in BatchLoader(ds, batch_size=1, prefetch=2):
            break  # abandon mid-epoch with a full prefetch queue
    deadline = time.time() + 10.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "prefetch thread leaked"


def test_gta_depth_path_extension_handling():
    """depth_path must key on the real extension (png splits exist; a
    substring replace also corrupted stems containing 'jpg')."""
    import os as _os

    p = _os.path.sep.join(["scene", "color", "000001.png"])
    assert GTASfMMultiViewDataset.depth_path(p) == _os.path.sep.join(
        ["scene", "depth", "000001.npy"])
    p = _os.path.sep.join(["scene", "color", "jpg001.jpg"])
    assert GTASfMMultiViewDataset.depth_path(p) == _os.path.sep.join(
        ["scene", "depth", "jpg001.npy"])


def test_slanted_scene_groundtruth_geometry(tmp_path):
    """The tilted-plane synthetic scene (plane_normal) produces GT depth
    that (a) varies substantially across the image -- the non-degenerate
    accuracy scene used by scripts/accuracy_speed.py -- and (b) is
    geometrically exact: every backprojected point lies on the plane
    through (0, 0, plane_depth) with the requested normal, in every view."""
    normal = np.array([0.35, 0.25, 1.0])
    depth0 = 8.0
    data_dir, split = make_gta_sfm_tree(
        str(tmp_path), num_sequences=1, frames=3, rows=48, cols=64,
        plane_depth=depth0, plane_normal=normal)
    n = normal / np.linalg.norm(normal)
    d = n[2] * depth0

    ds = GTASfMMultiViewDataset(data_dir, split, transform=None,
                                shuffle=False,
                                load_groundtruth_depthmaps=True)
    for idx in range(len(ds)):
        sample = ds[idx]
        depth = np.asarray(sample["left_depthmap_true"])
        assert depth.max() / depth.min() > 1.5, "depth should vary >= 1.5x"
        # Backproject with the (already -0.5-fixed) loader intrinsics and
        # the camera-in-world pose; check the plane equation.
        K = np.asarray(sample["K"])[:3, :3]
        # ds poses: T_right_in_left chains off the stored camera-in-world
        # poses; recover this view's camera-in-world from the raw file.
        seq_dir = os.path.join(data_dir, "test", "seq00")
        rows_txt = np.loadtxt(os.path.join(seq_dir, "poses.txt"),
                              skiprows=1)
        T_cam = rows_txt[idx][1:].reshape(4, 4)
        r, c = depth.shape
        ys, xs = np.mgrid[0:r, 0:c]
        pix = np.stack([xs.ravel(), ys.ravel(), np.ones(r * c)])
        Xc = np.linalg.inv(K) @ pix * depth.ravel()
        Xw = T_cam[:3, :3] @ Xc + T_cam[:3, 3:4]
        residual = np.abs(n @ Xw - d)
        assert residual.max() < 1e-3, residual.max()


def test_thread_local_rng_streams_and_augmented_workers(gta_tree):
    """ThreadLocalRng: exact single-thread stream; safe multi-worker use.

    The train CLI now runs the augmented (jitter) pipeline with
    num_workers=4 decode threads (reference num_workers: 4); the
    transform RNG must (a) keep the historical draw stream when only
    one thread draws, (b) give pool threads independent streams.
    """
    import threading

    from multi_view_stereonet_tpu.data.transforms import ThreadLocalRng
    from multi_view_stereonet_tpu.data import get_training_transforms

    # (a) owner thread sees the base generator's exact stream.
    base = np.random.default_rng(11)
    expect = np.random.default_rng(11).uniform(size=5)
    np.testing.assert_array_equal(ThreadLocalRng(base).uniform(size=5), expect)

    # (b) pool threads get independent, non-colliding streams.
    rng = ThreadLocalRng(np.random.default_rng(11))
    rng.uniform()  # claim base on the main thread
    draws = {}

    def draw(k):
        draws[k] = rng.uniform(size=3)

    threads = [threading.Thread(target=draw, args=(k,)) for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    flat = [tuple(v) for v in draws.values()]
    assert len(set(flat)) == 4  # spawned children, all distinct

    # (c) the full augmented pipeline survives 4 decode workers: every
    # sample present exactly once, images jittered but valid.
    data_dir, split = gta_tree
    t = get_training_transforms({"size": [64, 96], "augment": True},
                                np.random.default_rng(3))
    ds = GTASfMMultiViewDataset(data_dir, split, transform=t,
                                load_groundtruth_depthmaps=True, shuffle=False)
    batches = list(BatchLoader(ds, batch_size=2, prefetch=0, drop_last=False,
                               workers=4))
    names = [n for b in batches for n in b["left_filenames"]]
    expected = [os.path.join(data_dir, n) for n in ds.left_names]
    assert sorted(names) == sorted(expected)

    # (d) determinism contract at workers=1 + prefetch: each epoch's
    # transforms run on a FRESH prefetch thread, which claims the next
    # deterministic child stream -- two identically-seeded loaders must
    # produce bit-identical pixels across MULTIPLE epochs (the pairing
    # is reproducible run-to-run even though epoch 2+ does not continue
    # epoch 1's raw stream).
    def two_epochs(seed):
        t = get_training_transforms({"size": [64, 96], "augment": True},
                                    np.random.default_rng(seed))
        d = GTASfMMultiViewDataset(data_dir, split, transform=t,
                                   load_groundtruth_depthmaps=False,
                                   shuffle=False)
        loader = BatchLoader(d, batch_size=2, prefetch=2, drop_last=False,
                             workers=1)
        return [b["left_image"] for _ in range(2) for b in loader]

    for a, b in zip(two_epochs(5), two_epochs(5)):
        np.testing.assert_array_equal(a, b)
    for b in batches:
        assert np.isfinite(b["left_image"]).all()
        assert 0.0 <= b["left_image"].min() and b["left_image"].max() <= 1.0


def test_layered_scene_groundtruth_geometry(tmp_path):
    """The layered occlusion scene's GT is geometrically exact.

    Checks (a) near/far mix >= 3.5x with real depth discontinuities,
    (b) cross-view consistency: every left pixel projected into the next
    view either agrees with that view's depth (co-visible) or is
    OCCLUDED there (the other view sees a strictly nearer surface), and
    that genuinely occluded pixels exist, (c) texture has multi-frequency
    content (not the near-degenerate smooth plane texture).
    """
    from tests.synthetic_data import make_gta_sfm_tree

    rows, cols = 120, 160
    data_dir, split = make_gta_sfm_tree(
        str(tmp_path), rows=rows, cols=cols, frames=3, num_sequences=1,
        scene="layered")
    t = get_testing_transforms({"size": [rows, cols]})
    ds = GTASfMMultiViewDataset(data_dir, split, transform=t,
                                load_groundtruth_depthmaps=True,
                                shuffle=False)
    s = ds[0]
    d_left = np.asarray(s["left_depthmap_true"])
    d_right = np.asarray(s["right_depthmaps_true"][0])
    valid = d_left > 0
    assert d_left[valid].max() / d_left[valid].min() >= 3.5

    gy, gx = np.gradient(np.where(valid, d_left, np.nan))
    jumps = np.nan_to_num(np.abs(gx) + np.abs(gy))
    assert (jumps > 1.0).sum() > rows  # card edges: multi-unit depth steps

    K = np.asarray(s["K"])[:3, :3]
    T_rl = np.asarray(s["T_right_in_left"][0])  # right-in-left
    ys, xs = np.mgrid[0:rows, 0:cols]
    pix = np.stack([xs[valid], ys[valid], np.ones(valid.sum())])
    Xl = np.linalg.inv(K) @ pix * d_left[valid]
    Xr = (np.linalg.inv(T_rl) @ np.concatenate(
        [Xl, np.ones((1, Xl.shape[1]))]))[:3]
    ur = K @ Xr
    in_front = Xr[2] > 0.1
    u = ur[0] / ur[2]
    v = ur[1] / ur[2]
    inside = in_front & (u >= 0) & (u <= cols - 1) & (v >= 0) & (v <= rows - 1)
    ui = np.clip(np.round(u[inside]).astype(int), 0, cols - 1)
    vi = np.clip(np.round(v[inside]).astype(int), 0, rows - 1)
    z_proj = Xr[2][inside]
    z_right = d_right[vi, ui]
    ok_right = z_right > 0
    agree = np.abs(z_proj - z_right) < 0.12 * z_proj  # nearest-pixel slack
    occluded = z_right < z_proj * (1 - 0.05)
    frac_bad = (~(agree | occluded) & ok_right).mean()
    assert frac_bad < 0.02, frac_bad  # boundary-pixel rounding only
    assert (occluded & ok_right & ~agree).mean() > 0.01  # real occlusion

    img = np.asarray(s["left_image"])
    f = np.fft.fft2(img.mean(axis=-1) - img.mean())
    power = np.abs(f) ** 2
    hi = power[rows // 4: 3 * rows // 4, cols // 4: 3 * cols // 4].sum()
    assert hi / power.sum() > 0.01  # genuine high-frequency texture energy
