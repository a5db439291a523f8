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


def test_upsampler_refine_relu_vs_torch(reference_modules):
    """Upsampler(refine=True, relu=True) parity vs the reference module
    (multi_view_stereonet.py:355-380), incl. the dirac weight init."""
    import torch

    mvs = reference_modules.mvs
    torch.manual_seed(0)
    ref_up = mvs.Upsampler(4, True, True)

    # Fresh init is a dirac conv: weight is the identity kernel.
    p = L.init_upsampler(jax.random.PRNGKey(0), 4, refine=True)
    np.testing.assert_array_equal(
        np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)),
        ref_up.refiner.weight.detach().numpy())

    # Perturb the weights to exercise the conv path, then compare.
    rng = np.random.default_rng(2)
    w = rng.normal(size=(4, 4, 3, 3)).astype(np.float32) * 0.1
    b = rng.normal(size=(4,)).astype(np.float32)
    with torch.no_grad():
        ref_up.refiner.weight.copy_(torch.from_numpy(w))
        ref_up.refiner.bias.copy_(torch.from_numpy(b))
    p = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))), "b": jnp.asarray(b)}

    x = rng.normal(size=(2, 4, 9, 13)).astype(np.float32)
    with torch.no_grad():
        ref = ref_up(torch.from_numpy(x), [17, 25]).numpy()
    out = L.upsampler(p, jnp.asarray(np.moveaxis(x, 1, -1)), (17, 25))
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out), -1, 1), ref, rtol=1e-4, atol=1e-5)

    # refine=False + relu=False is the plain bilinear the model ships.
    ref_plain = mvs.Upsampler(4, False, False)(
        torch.from_numpy(x), [17, 25]).numpy()
    out_plain = L.upsampler(L.init_upsampler(jax.random.PRNGKey(0), 4, False),
                            jnp.asarray(np.moveaxis(x, 1, -1)), (17, 25),
                            relu=False)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out_plain), -1, 1), ref_plain,
        rtol=1e-4, atol=1e-5)
