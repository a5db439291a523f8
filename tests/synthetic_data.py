"""Synthetic on-disk datasets in GTA-SfM / DeMoN layouts.

Scenes are textured fronto-parallel planes rendered with the exact
homography geometry, so estimated depth at the plane idepth minimizes
photometric error and GT depthmaps are consistent with poses/intrinsics.
Used by dataset tests and dataset-free CLI drives.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def _smooth_texture(rng, rows, cols):
    base = rng.uniform(0, 255, size=(rows // 8, cols // 8, 3))
    img = np.array(Image.fromarray(base.astype(np.uint8)).resize(
        (cols, rows), Image.BILINEAR))
    noise = rng.uniform(-20, 20, size=img.shape)
    return np.clip(img + noise, 0, 255).astype(np.uint8)


def _checker_texture(rng, rows, cols, periods=(32, 8)):
    """Multi-frequency texture: checkerboards at two scales + smooth and
    fine noise -- localizes cost-volume matching (unlike the smooth
    texture, which is near-degenerate for stereo)."""
    ys, xs = np.mgrid[0:rows, 0:cols]
    img = np.full((rows, cols, 3), 128.0)
    for p in periods:
        sign = ((xs // p + ys // p) % 2 * 2 - 1).astype(np.float64)
        img += sign[..., None] * rng.uniform(18, 40, size=3)
    img += (_smooth_texture(rng, rows, cols).astype(np.float64) - 128.0) * 0.5
    return np.clip(img, 0, 255).astype(np.uint8)


def _sample_bilinear_wrap(texture, x, y):
    """Bilinear sample with wraparound (tiling) addressing."""
    tex_rows, tex_cols = texture.shape[:2]
    x = np.mod(x, tex_cols)
    y = np.mod(y, tex_rows)
    # np.mod of a tiny negative float can return the divisor itself
    # (np.mod(-1e-15, 64) == 64.0), which would index one past the last
    # texel row/col -- clamp the integer cell into range.
    x0 = np.minimum(np.floor(x).astype(int), tex_cols - 1)
    y0 = np.minimum(np.floor(y).astype(int), tex_rows - 1)
    x1 = (x0 + 1) % tex_cols
    y1 = (y0 + 1) % tex_rows
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    tex = texture.reshape(-1, 3).astype(np.float64)
    idx = lambda yy, xx: tex[yy * tex_cols + xx]
    return ((idx(y0, x0) * (1 - wx) + idx(y0, x1) * wx) * (1 - wy)
            + (idx(y1, x0) * (1 - wx) + idx(y1, x1) * wx) * wy)


def _plane_basis(n):
    """Orthonormal (e1, e2) spanning the plane with unit normal n."""
    e1 = np.cross([0.0, 1.0, 0.0], n)
    e1 = e1 / np.linalg.norm(e1)
    e2 = np.cross(n, e1)
    return e1, e2 / np.linalg.norm(e2)


def _add_layer(layers, rng, p0, normal, half_extent, tex_rows, periods):
    """Append one textured plane/card layer (shared by both layered-world
    constructors; the rng draw order is part of the committed artifacts'
    seed contract)."""
    n = np.asarray(normal, np.float64)
    n = n / np.linalg.norm(n)
    hu, hv = half_extent
    tex = _checker_texture(rng, tex_rows, tex_rows, periods=periods)
    layers.append({
        "n": n, "p0": np.asarray(p0, np.float64),
        "basis": _plane_basis(n), "half_extent": (hu, hv),
        "texture": tex,
        "tex_scale": tex_rows / (2.0 * min(hu, hv))
        if np.isfinite(hu) else 24.0,
    })


def _layered_scene(rng):
    """Textured multi-layer world: tilted far background + 3 bounded
    foreground cards at near/mid depths => real occlusion boundaries and
    a ~4x depth range. Returns a list of layer dicts for
    ``_render_layered_view`` (nearest-hit z-buffering makes layer order
    irrelevant)."""
    layers = []

    def add(p0, normal, half_extent, tex_rows, periods):
        _add_layer(layers, rng, p0, normal, half_extent, tex_rows, periods)

    # Background: tilted plane through (0, 0, 14), depth varies across view.
    add((0.0, 0.0, 14.0), (0.25, 0.15, 1.0), (np.inf, np.inf), 512, (32, 8))
    # Foreground cards (position, tilt, half-extent chosen to stay in view
    # for cameras tracking +x in [0, ~2]).
    add((0.9, -0.35, 3.5), (0.10, 0.05, 1.0), (0.95, 0.75), 256, (48, 12))
    add((2.1, 0.45, 5.0), (-0.15, 0.10, 1.0), (1.15, 0.90), 256, (24, 6))
    add((0.3, 0.85, 7.0), (0.05, -0.20, 1.0), (1.45, 1.10), 256, (64, 16))
    return layers


def _layered_track_scene(rng, span, depth_scale=0.25):
    """Layered-world variant for TRAINING sequences: cards spread along
    the whole camera track (every frame sees 1-2 cards) at depths scaled
    so unit-baseline idepth spans ~0.1-0.5 -- the regime of real GTA
    data, where level-4 disparities are resolvable by the 12-hypothesis
    sweep. (The fixed ``_layered_scene`` used by the accuracy protocol
    keeps its committed/measured layout; at its depths a 96x128 training
    scene has sub-pixel level-4 disparities, which starves the cost
    volume and lets the refiners' output ReLU collapse -- see
    docs/convergence/SUMMARY_layered.md.)"""
    layers = []

    def add(p0, normal, half_extent, tex_rows, periods):
        _add_layer(layers, rng, p0, normal, half_extent, tex_rows, periods)

    ds = depth_scale
    add((span / 2, 0.0, 14.0 * ds), (0.25, 0.15, 1.0), (np.inf, np.inf),
        512, (32, 8))
    n_cards = max(3, int(span / 0.6))
    depths = [3.5 * ds, 5.0 * ds, 7.0 * ds]
    periods = [(48, 12), (24, 6), (64, 16)]
    for i in range(n_cards):
        z = depths[i % 3]
        x = span * i / max(n_cards - 1, 1) + rng.uniform(-0.1, 0.1)
        y = rng.uniform(-0.3, 0.3) * ds * 4
        tilt = (rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2), 1.0)
        he = (rng.uniform(0.8, 1.1) * ds * 4 * z / 3.5,
              rng.uniform(0.6, 0.9) * ds * 4 * z / 3.5)
        add((x, y, z), tilt, he, 256, periods[i % 3])
    return layers


def _render_layered_view(layers, K, rows, cols, T_cam):
    """Ray-cast the layered world from camera-in-world pose T_cam with
    intrinsics K: nearest plane hit per pixel (exact z-buffer) => image
    with true occlusion boundaries + exact GT depth. Pixels hitting no
    layer get depth 0 (invalid, masked by the eval protocol)."""
    Rwc = T_cam[:3, :3]
    twc = T_cam[:3, 3]
    Kinv = np.linalg.inv(K)
    ys, xs = np.mgrid[0:rows, 0:cols]
    pix = np.stack([xs.ravel(), ys.ravel(), np.ones(rows * cols)], axis=0)
    rays = Rwc @ (Kinv @ pix)                     # (3, N)
    ray_z_cam = (Rwc.T @ rays)[2]                 # camera-frame z per unit lam
    N = rays.shape[1]
    zbuf = np.full(N, np.inf)
    img = np.zeros((N, 3))
    depth = np.zeros(N)
    for layer in layers:
        n, p0 = layer["n"], layer["p0"]
        denom = n @ rays
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = (n @ (p0 - twc)) / denom
        X = rays * lam + twc[:, None]
        rel = X - p0[:, None]
        e1, e2 = layer["basis"]
        u, v = e1 @ rel, e2 @ rel
        z = lam * ray_z_cam
        ok = np.isfinite(lam) & (lam > 1e-6) & (z > 0.1)
        hu, hv = layer["half_extent"]
        if np.isfinite(hu):
            ok &= (np.abs(u) <= hu) & (np.abs(v) <= hv)
        win = ok & (z < zbuf)
        s = layer["tex_scale"]
        tex = layer["texture"]
        img[win] = _sample_bilinear_wrap(
            tex, u[win] * s + tex.shape[1] / 2.0,
            v[win] * s + tex.shape[0] / 2.0)
        depth[win] = z[win]
        zbuf[win] = z[win]
    return (img.reshape(rows, cols, 3).astype(np.uint8),
            depth.reshape(rows, cols).astype(np.float32))


def _camera(rows, cols):
    K = np.eye(3, dtype=np.float64)
    K[0, 0] = K[1, 1] = 0.9 * cols
    # The GTA-SfM loader subtracts 0.5 from the stored principal point.
    K[0, 2] = (cols - 1) / 2.0 + 0.5
    K[1, 2] = (rows - 1) / 2.0 + 0.5
    return K

def _render_view(texture, tex_K, K, rows, cols, T_cam, plane_depth,
                 plane_normal=None):
    """Render a (rows, cols) view with intrinsics K of the world-frame plane
    {X : n.X = plane_depth * n_z-normalization} from camera pose T_cam
    (camera-in-world). ``plane_normal`` None means fronto-parallel
    (z = plane_depth); otherwise the plane passes through
    (0, 0, plane_depth) with that normal, so depth VARIES across the image
    (exercises the cost volume/refiners away from the constant-depth
    degenerate case). The world camera at identity with intrinsics tex_K
    sees ``texture``."""
    T_wc = T_cam  # camera-in-world = transform cam coords to world coords
    Rwc = T_wc[:3, :3]
    twc = T_wc[:3, 3]
    if plane_normal is None:
        n = np.array([0.0, 0.0, 1.0])
    else:
        n = np.asarray(plane_normal, np.float64)
        n = n / np.linalg.norm(n)
    d = n[2] * plane_depth  # plane through (0, 0, plane_depth)
    # point on plane: X_w = lambda * (Rwc K^-1 u_c) + twc with n.X_w = d
    Kinv = np.linalg.inv(K)
    ys, xs = np.mgrid[0:rows, 0:cols]
    pix = np.stack([xs.ravel(), ys.ravel(), np.ones(rows * cols)], axis=0)
    rays = Rwc @ (Kinv @ pix)
    lam = (d - n @ twc) / (n @ rays)
    Xw = rays * lam + twc[:, None]
    uw = tex_K @ Xw
    uw = uw[:2] / uw[2]
    # bilinear sample texture at uw
    tex_rows, tex_cols = texture.shape[:2]
    x = np.clip(uw[0], 0, tex_cols - 1)
    y = np.clip(uw[1], 0, tex_rows - 1)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    x1 = np.minimum(x0 + 1, tex_cols - 1)
    y1 = np.minimum(y0 + 1, tex_rows - 1)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    tex = texture.reshape(-1, 3).astype(np.float64)
    idx = lambda yy, xx: tex[yy * tex_cols + xx]
    img = ((idx(y0, x0) * (1 - wx) + idx(y0, x1) * wx) * (1 - wy)
           + (idx(y1, x0) * (1 - wx) + idx(y1, x1) * wx) * wy)
    # depth in the *camera* frame: z of X in cam coords
    Xc = (np.linalg.inv(T_wc) @ np.concatenate(
        [Xw, np.ones((1, Xw.shape[1]))], axis=0))[:3]
    return (img.reshape(rows, cols, 3).astype(np.uint8),
            Xc[2].reshape(rows, cols).astype(np.float32))


def make_gta_sfm_tree(root, num_sequences=2, frames=4, rows=96, cols=128,
                      plane_depth=8.0, seed=0, comparisons=1,
                      plane_normal=None, scene="plane", frame_ids=None):
    """Write a GTA-SfM-layout tree + a multi-view split file.

    ``comparisons`` controls the number of comparison views per split line
    (the reference's *_Ncmps_test.txt variants). ``plane_normal`` tilts the
    scene plane (None = fronto-parallel constant depth; e.g. (0.35, 0.25, 1)
    gives GT depth varying ~2x across the image -- a non-degenerate scene
    for accuracy measurements). ``scene="layered"`` replaces the single
    plane with the multi-layer occlusion world (checker/noise textures at
    multiple frequencies, 3 foreground cards over a tilted background,
    depth 3.5-16+, real occlusion boundaries) -- the hardest accuracy
    protocol. ``frame_ids`` (len == ``frames``) assigns explicit,
    possibly non-contiguous image ids to the frames -- 4 of 200
    sequences in the real gta_sfm_overlap0.5_train split have id gaps
    (e.g. train/20190125_153845: 176 ids spanning 0..179), so gapped
    trees exercise the id-keyed calibration lookup. Returns
    (data_dir, split_path).
    """
    if frame_ids is None:
        frame_ids = list(range(frames))
    assert len(frame_ids) == frames
    rng = np.random.default_rng(seed)
    data_dir = os.path.join(root, "data")
    split_lines = []
    for s in range(num_sequences):
        seq = os.path.join("test", f"seq{s:02d}")
        cdir = os.path.join(data_dir, seq, "color")
        ddir = os.path.join(data_dir, seq, "depth")
        os.makedirs(cdir, exist_ok=True)
        os.makedirs(ddir, exist_ok=True)
        K = _camera(rows, cols)           # stored (+0.5 convention)
        K_true = K.copy()
        K_true[0, 2] -= 0.5
        K_true[1, 2] -= 0.5
        texture = _smooth_texture(rng, rows, cols)
        if scene == "layered":
            layers = _layered_scene(rng)
        elif scene == "layered_track":
            layers = _layered_track_scene(rng, span=0.4 * frames)
        else:
            layers = None

        k_lines = ["id k"]
        p_lines = ["id t"]
        names = []
        for f in range(frames):
            T_cam = np.eye(4)
            T_cam[0, 3] = 0.4 * f + rng.uniform(-0.02, 0.02)
            T_cam[1, 3] = rng.uniform(-0.05, 0.05)
            if layers is not None:
                img, depth = _render_layered_view(layers, K_true, rows, cols,
                                                  T_cam)
            else:
                img, depth = _render_view(texture, K_true, K_true, rows, cols,
                                          T_cam, plane_depth,
                                          plane_normal=plane_normal)
            name = f"{frame_ids[f]:06d}"
            Image.fromarray(img).save(os.path.join(cdir, name + ".jpg"),
                                      quality=95)
            np.save(os.path.join(ddir, name + ".npy"), depth)
            k_lines.append(f"{frame_ids[f]} "
                           + " ".join(str(v) for v in K.ravel()))
            p_lines.append(f"{frame_ids[f]} "
                           + " ".join(str(v) for v in T_cam.ravel()))
            names.append(f"{seq}/color/{name}.jpg")

        with open(os.path.join(data_dir, seq, "intrinsics.txt"), "w") as fh:
            fh.write("\n".join(k_lines) + "\n")
        with open(os.path.join(data_dir, seq, "poses.txt"), "w") as fh:
            fh.write("\n".join(p_lines) + "\n")

        for f in range(frames - comparisons):
            cmps = " ".join(names[f + 1:f + 1 + comparisons])
            split_lines.append(f"{names[f]} {cmps}")

    split_path = os.path.join(root, "gta_sfm_synth_test.txt")
    with open(split_path, "w") as fh:
        fh.write("\n".join(split_lines) + "\n")
    return data_dir, split_path


def make_demon_tree(root, num_scenes=2, frames=3, rows=96, cols=128,
                    plane_depth=4.0, seed=0):
    """Write a DeMoN-layout tree + scene-list split. Returns (dir, split)."""
    rng = np.random.default_rng(seed)
    data_dir = os.path.join(root, "demon_data")
    scene_names = []
    for s in range(num_scenes):
        for kind in ("mvs", "sun3d"):
            scene = f"{kind}_test_{s:05d}"
            sdir = os.path.join(data_dir, scene)
            os.makedirs(sdir, exist_ok=True)
            K = _camera(rows, cols)
            K[0, 2] -= 0.5  # demon has no principal-point fixup
            K[1, 2] -= 0.5
            texture = _smooth_texture(rng, rows, cols)

            pose_rows = []
            for f in range(frames):
                T_cam = np.eye(4)
                T_cam[0, 3] = 0.25 * f
                img, depth = _render_view(texture, K, K, rows, cols,
                                          T_cam, plane_depth)
                name = f"{f:07d}"
                Image.fromarray(img).save(os.path.join(sdir, name + ".jpg"),
                                          quality=95)
                np.save(os.path.join(sdir, name + ".npy"), depth)
                T_w_in_c = np.linalg.inv(T_cam)
                pose_rows.append(" ".join(str(v) for v in T_w_in_c[:3].ravel()))

            np.savetxt(os.path.join(sdir, "cam.txt"), K, fmt="%f")
            with open(os.path.join(sdir, "poses.txt"), "w") as fh:
                fh.write("\n".join(pose_rows) + "\n")
            scene_names.append(scene)

    split_path = os.path.join(root, "demon_synth_test.txt")
    with open(split_path, "w") as fh:
        fh.write("\n".join(scene_names) + "\n")
    return data_dir, split_path
