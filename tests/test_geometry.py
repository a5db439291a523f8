"""Geometry parity tests vs the reference torch implementation (CPU oracle)."""

import numpy as np
import pytest

import jax.numpy as jnp

from multi_view_stereonet_tpu import geometry as geo


def random_pose(rng, scale=0.5):
    """Random SE(3) with a reasonable rotation and translation."""
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = rng.uniform(-0.3, 0.3)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = rng.normal(size=3) * scale
    return T.astype(np.float32)


def random_K(rows, cols):
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = 0.9 * cols
    K[1, 1] = 0.9 * cols
    K[0, 2] = (cols - 1) / 2.0
    K[1, 2] = (rows - 1) / 2.0
    return K


def test_se3_inverse():
    rng = np.random.default_rng(0)
    T = np.stack([random_pose(rng) for _ in range(4)])
    Tinv = np.asarray(geo.se3_inverse(jnp.asarray(T)))
    np.testing.assert_allclose(Tinv @ T, np.broadcast_to(np.eye(4), (4, 4, 4)), atol=1e-6)


def test_mat3_inverse():
    rng = np.random.default_rng(1)
    H = rng.normal(size=(5, 3, 3)).astype(np.float32) + 2 * np.eye(3, dtype=np.float32)
    Hinv = np.asarray(geo.mat3_inverse(jnp.asarray(H)))
    np.testing.assert_allclose(Hinv @ H, np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-5)


def test_fronto_parallel_homography_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(2)
    B = 3
    rows, cols = 30, 40
    K = np.stack([random_K(rows, cols) for _ in range(B)])
    T_r_in_l = np.stack([random_pose(rng) for _ in range(B)])
    T_l_in_r = np.linalg.inv(T_r_in_l).astype(np.float32)
    idepth = rng.uniform(0.0, 2.0, size=B).astype(np.float32)

    H_ref = reference_modules.ip.get_fronto_parallel_homography(
        torch.from_numpy(K[:, :3, :3]), torch.from_numpy(K[:, :3, :3]),
        torch.from_numpy(T_l_in_r), torch.from_numpy(idepth)).numpy()

    H_jax = np.asarray(geo.get_fronto_parallel_homography(
        jnp.asarray(K[:, :3, :3]), jnp.asarray(K[:, :3, :3]),
        jnp.asarray(T_l_in_r), jnp.asarray(idepth)))

    np.testing.assert_allclose(H_jax, H_ref, rtol=1e-5, atol=1e-5)


def test_plane_sweep_homographies_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(3)
    B, D = 2, 12
    rows, cols = 30, 40
    K = np.stack([random_K(rows, cols) for _ in range(B)])
    T_r_in_l = np.stack([random_pose(rng) for _ in range(B)])
    samples = np.sort(rng.uniform(0.0, 2.0, size=(B, D)).astype(np.float32), axis=1)

    H_ref = reference_modules.mvs.create_plane_sweep_homographies(
        torch.from_numpy(T_r_in_l), torch.from_numpy(K),
        torch.from_numpy(samples), [rows, cols]).numpy()

    H_jax = np.asarray(geo.create_plane_sweep_homographies(
        jnp.asarray(T_r_in_l), jnp.asarray(K), jnp.asarray(samples)))

    np.testing.assert_allclose(H_jax, H_ref, rtol=1e-4, atol=1e-5)


def test_disparity_to_idepth_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(4)
    B, rows, cols = 2, 30, 40
    K = np.stack([random_K(rows, cols) for _ in range(B)])
    T_r_in_l = np.stack([random_pose(rng, scale=1.0) for _ in range(B)])
    disp = rng.uniform(0.0, 11.0, size=(B, 1, rows, cols)).astype(np.float32)

    id_ref = reference_modules.ip.disparity_to_idepth(
        torch.from_numpy(K), torch.from_numpy(T_r_in_l),
        torch.from_numpy(disp)).numpy()

    id_jax = np.asarray(geo.disparity_to_idepth(
        jnp.asarray(K), jnp.asarray(T_r_in_l), jnp.asarray(disp[:, 0])))

    np.testing.assert_allclose(id_jax, id_ref[:, 0], rtol=1e-4, atol=1e-5)


def test_idepth_to_disparity_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(5)
    B, rows, cols = 2, 16, 20
    K = np.stack([random_K(rows, cols) for _ in range(B)])
    T_r_in_l = np.stack([random_pose(rng, scale=1.0) for _ in range(B)])
    idepth = rng.uniform(0.05, 2.0, size=(B, 1, rows, cols)).astype(np.float32)

    mod = reference_modules.ip.IDepthToDisparity()
    disp_ref = mod(torch.from_numpy(K), torch.from_numpy(T_r_in_l),
                   torch.from_numpy(idepth)).numpy()

    disp_jax = np.asarray(geo.idepth_to_disparity(
        jnp.asarray(K), jnp.asarray(T_r_in_l), jnp.asarray(idepth[:, 0])))

    np.testing.assert_allclose(disp_jax, disp_ref[:, 0], rtol=1e-3, atol=1e-3)


def test_project_idepthmap_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(6)
    B, rows, cols = 2, 16, 20
    K = np.stack([random_K(rows, cols) for _ in range(B)])
    T_r_in_l = np.stack([random_pose(rng, scale=1.0) for _ in range(B)])
    idepth = rng.uniform(0.05, 2.0, size=(B, 1, rows, cols)).astype(np.float32)

    mod = reference_modules.ip.IDepthmapProjector()
    pix_ref, id_ref, mask_ref = mod(torch.from_numpy(K), torch.from_numpy(T_r_in_l),
                                    torch.from_numpy(idepth))

    pix_jax, id_jax, mask_jax = geo.project_idepthmap(
        jnp.asarray(K), jnp.asarray(T_r_in_l), jnp.asarray(idepth[:, 0]))

    np.testing.assert_allclose(np.asarray(pix_jax), pix_ref.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(id_jax), id_ref.numpy()[:, 0], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(mask_jax), mask_ref.numpy()[:, 0])


def test_create_idepth_samples_vs_reference(reference_modules):
    import torch

    rng = np.random.default_rng(7)
    B, rows, cols = 3, 30, 40
    K = np.stack([random_K(rows, cols) for _ in range(B)])
    T_r_in_l = np.stack([random_pose(rng) for _ in range(B)])
    # Unit baseline, as the model guarantees before calling (mvs:566-571).
    for b in range(B):
        T_r_in_l[b, :3, 3] /= np.linalg.norm(T_r_in_l[b, :3, 3])

    s_ref = reference_modules.mvs.create_idepth_samples(
        torch.from_numpy(T_r_in_l), torch.from_numpy(K), rows, cols, 12).numpy()

    s_jax = np.asarray(geo.create_idepth_samples(
        jnp.asarray(T_r_in_l), jnp.asarray(K), rows, cols, 12))

    np.testing.assert_allclose(s_jax, s_ref, rtol=1e-4, atol=1e-5)


def test_k_pyramid_vs_reference():
    K = jnp.asarray(np.stack([random_K(480, 640)]))
    sizes = [(480, 640), (240, 320), (120, 160), (60, 80), (30, 40)]
    pyr = geo.build_K_pyramid(K, sizes)
    assert len(pyr) == 5
    K4 = np.asarray(pyr[4][0])
    # fx scales by 1/16; cx via half-pixel rule.
    np.testing.assert_allclose(K4[0, 0], 0.9 * 640 / 16, rtol=1e-6)
    np.testing.assert_allclose(K4[0, 2], ((640 - 1) / 2 + 0.5) / 16 - 0.5, rtol=1e-6)
