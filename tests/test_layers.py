"""Layer-level parity vs torch (conv/groupnorm/resblock/conv3d)."""

import numpy as np

import jax
import jax.numpy as jnp

from multi_view_stereonet_tpu.models import layers as L


def test_conv2d_vs_torch():
    import torch

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 17, 23)).astype(np.float32)
    w = rng.normal(size=(8, 3, 5, 5)).astype(np.float32) * 0.1
    b = rng.normal(size=(8,)).astype(np.float32)

    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=2, padding=2).numpy()

    p = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))), "b": jnp.asarray(b)}
    out = L.conv2d(p, jnp.asarray(np.moveaxis(x, 1, -1)), stride=2)
    out = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_conv2d_dilated_vs_torch():
    import torch

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 4, 15, 15)).astype(np.float32)
    w = rng.normal(size=(4, 4, 3, 3)).astype(np.float32) * 0.1
    for dil in (1, 2, 4, 8):
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), None,
            padding=dil, dilation=dil).numpy()
        p = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
        out = L.conv2d(p, jnp.asarray(np.moveaxis(x, 1, -1)), dilation=dil)
        out = np.moveaxis(np.asarray(out), -1, 1)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_conv3d_vs_torch():
    import torch

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 8, 6, 7, 9)).astype(np.float32)  # NCDHW
    w = rng.normal(size=(4, 8, 3, 3, 3)).astype(np.float32) * 0.1
    b = rng.normal(size=(4,)).astype(np.float32)
    ref = torch.nn.functional.conv3d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        padding=1).numpy()
    p = {"w": jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0))), "b": jnp.asarray(b)}
    out = L.conv3d(p, jnp.asarray(np.moveaxis(x, 1, -1)))
    out = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_group_norm_vs_torch():
    import torch

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 32, 9, 11)).astype(np.float32)
    scale = rng.normal(size=(32,)).astype(np.float32)
    bias = rng.normal(size=(32,)).astype(np.float32)
    ref = torch.nn.functional.group_norm(
        torch.from_numpy(x), 4, torch.from_numpy(scale), torch.from_numpy(bias)).numpy()
    p = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    out = L.group_norm(p, jnp.asarray(np.moveaxis(x, 1, -1)), groups=4)
    out = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_group_norm3d_vs_torch():
    import torch

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 32, 5, 9, 11)).astype(np.float32)  # NCDHW
    scale = rng.normal(size=(32,)).astype(np.float32)
    bias = rng.normal(size=(32,)).astype(np.float32)
    ref = torch.nn.functional.group_norm(
        torch.from_numpy(x), 4, torch.from_numpy(scale), torch.from_numpy(bias)).numpy()
    p = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    out = L.group_norm(p, jnp.asarray(np.moveaxis(x, 1, -1)), groups=4)
    out = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_leaky_relu():
    x = jnp.asarray(np.array([-2.0, -0.5, 0.0, 1.0], np.float32))
    np.testing.assert_allclose(np.asarray(L.leaky_relu(x)), [-0.4, -0.1, 0.0, 1.0], rtol=1e-6)
