"""Dataset-free end-to-end drive of the geometry/ops library boundary.

Renders a textured fronto-parallel plane at a known inverse depth, warps
it into a synthetic right view, plane-sweeps the right view back over a
hypothesis ladder, and checks the photometric error is minimized at the
hypothesis nearest the true inverse depth. Also drives the epipolar-LSQ
`disparity_to_idepth` and asserts finiteness. Runs on whatever backend
jax picks (the real TPU under the axon relay; CPU elsewhere).

This is the verify skill's "surface 1" drive, kept runnable so the
conventions don't have to be re-derived each time:

- `ops.homography_warp(img, H)` maps OUTPUT pixels through H into the
  source: out[x] = img[H x]. Generating a right view from a left image
  therefore needs H_{r->l} = inv(H_{l->r}).
- `get_fronto_parallel_homography(K_l, K_r, T_left_in_right, idepth)`
  returns H_{l->r}; `create_plane_sweep_homographies` takes
  T_RIGHT_in_left and inverts internally.
- `disparity_to_idepth` takes the 4x4 K form.
- Use smooth textures: per-pixel noise aliases under bilinear
  resampling and floods the photometric error even at the true
  hypothesis.

Usage: python scripts/verify_sweep.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from multi_view_stereonet_tpu import geometry as geo, ops


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    rows, cols = 64, 96

    # Smooth multi-frequency texture (bilinear-resample friendly).
    yy, xx = np.mgrid[0:rows, 0:cols].astype(np.float32)
    img = np.stack([
        np.sin(xx / 6.0) * np.cos(yy / 5.0),
        np.sin(xx / 11.0 + 1.0),
        np.cos((xx + yy) / 9.0),
    ], -1)[None].astype(np.float32)

    K = np.array([[[80.0, 0, cols / 2], [0, 80.0, rows / 2], [0, 0, 1]]],
                 np.float32)
    T_l_in_r = np.eye(4, dtype=np.float32)[None].copy()
    T_l_in_r[0, 0, 3] = -0.3  # right camera 0.3 to the right of left
    true_id = 0.7

    H_lr = geo.get_fronto_parallel_homography(
        jnp.asarray(K), jnp.asarray(K), jnp.asarray(T_l_in_r),
        jnp.asarray(np.float32([true_id])))
    right, _ = ops.homography_warp(jnp.asarray(img), jnp.linalg.inv(H_lr))

    samples = jnp.asarray(np.linspace(0.1, 1.5, 12, dtype=np.float32)[None])
    T_r_in_l = jnp.asarray(np.linalg.inv(T_l_in_r[0])[None])
    Hs = geo.create_plane_sweep_homographies(T_r_in_l, jnp.asarray(K), samples)
    swept, invalid = ops.plane_sweep_warp(right, Hs)

    err = (jnp.where(invalid[..., None], 0.0,
                     jnp.abs(swept - jnp.asarray(img)[:, None])
                     ).sum((0, 2, 3, 4))
           / jnp.maximum((~invalid).sum((0, 2, 3)), 1))
    best = int(jnp.argmin(err))
    s = np.asarray(samples[0])
    print("per-hypothesis err:", np.asarray(err).round(4), flush=True)
    print(f"best hypothesis idepth={s[best]:.3f}, true={true_id}", flush=True)
    assert abs(s[best] - true_id) == min(abs(s - true_id)), "sweep minimum off"

    # Epipolar-LSQ path (4x4 K), must be finite everywhere on device.
    K4 = np.eye(4, dtype=np.float32)[None].copy()
    K4[0, :3, :3] = K[0]
    disp = jnp.asarray(
        rng.uniform(0, 11, size=(1, rows, cols)).astype(np.float32))
    idp = geo.disparity_to_idepth(jnp.asarray(K4), jnp.asarray(T_l_in_r), disp)
    assert bool(jnp.isfinite(idp).all()), "disparity_to_idepth non-finite"
    print("disparity_to_idepth finite, mean", float(idp.mean()), flush=True)
    print("VERIFY SWEEP OK", flush=True)


if __name__ == "__main__":
    main()
