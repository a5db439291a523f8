"""Golden forward parity: JAX model vs the reference torch model.

The reference source at /root/reference runs on torch-CPU as the oracle;
weights flow either from a fresh torch init (random-weight parity) or from
the shipped pretrained TorchScript archive via the zip importer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_view_stereonet_tpu.models import (
    MultiViewStereoNetConfig, mvsnet_forward,
)
from multi_view_stereonet_tpu.checkpoint import (
    load_torchscript_weights, convert_reference_state_dict,
)
from multi_view_stereonet_tpu import ops
from multi_view_stereonet_tpu.geometry import build_K_pyramid

from tests.test_geometry import random_K, random_pose

PRETRAINED = ("/root/reference/pretrained/gta_sfm_150epochs/checkpoints/"
              "epoch0149/stereo_network.pt")
DEMON_PRETRAINED = ("/root/reference/pretrained/demon_45epochs/checkpoints/"
                    "epoch0044/stereo_network.pt")


def make_inputs(B=1, V=1, H=64, W=80, seed=0):
    rng = np.random.default_rng(seed)
    left = rng.uniform(-1, 1, size=(B, 3, H, W)).astype(np.float32)
    rights = rng.uniform(-1, 1, size=(B, V, 3, H, W)).astype(np.float32)
    K = np.stack([random_K(H, W) for _ in range(B)])
    T = np.stack([[random_pose(rng, scale=0.8) for _ in range(V)] for _ in range(B)])
    return left, rights, K, T


def torch_forward(reference_modules, state_dict, left, rights, K, T, D=12,
                  cvf=True, refiners=(True,) * 5):
    import torch

    net = reference_modules.mvs.MultiViewStereoNet()
    missing, unexpected = net.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in state_dict.items()},
        strict=False)
    assert not missing, f"missing keys: {missing}"
    net.eval()

    B, V = T.shape[0], T.shape[1]
    uimage = reference_modules.uimage
    left_pyr = uimage.build_image_pyramid(torch.from_numpy(left), 5)
    right_pyrs = [uimage.build_image_pyramid(torch.from_numpy(rights[:, v]), 5)
                  for v in range(V)]
    K_pyr = [torch.from_numpy(K)]
    for idx in range(1, 5):
        xf = float(left_pyr[idx].shape[-1]) / left_pyr[0].shape[-1]
        yf = float(left_pyr[idx].shape[-2]) / left_pyr[0].shape[-2]
        Kl = torch.from_numpy(K).clone()
        Kl[:, 0, 0] *= xf
        Kl[:, 1, 1] *= yf
        Kl[:, 0, 2] = xf * (Kl[:, 0, 2] + 0.5) - 0.5
        Kl[:, 1, 2] = yf * (Kl[:, 1, 2] + 0.5) - 0.5
        K_pyr.append(Kl)
    Ts = [torch.from_numpy(T[:, v].copy()) for v in range(V)]
    with torch.no_grad():
        out = net(left_pyr, K_pyr, Ts, right_pyrs, D, cvf, list(refiners))
    return {k: [x.numpy() for x in v] for k, v in out.items()}


def jax_forward(state_dict, left, rights, K, T, D=12, cvf=True,
                refiners=(True,) * 5):
    params = convert_reference_state_dict(state_dict)
    B, V, _, H, W = rights.shape
    left_nhwc = jnp.asarray(np.moveaxis(left, 1, -1))
    rights_nhwc = jnp.asarray(np.moveaxis(rights, 2, -1))  # (B, V, H, W, 3)

    left_pyr = ops.build_image_pyramid(left_nhwc, 5)
    right_flat = ops.build_image_pyramid(rights_nhwc.reshape(B * V, H, W, 3), 5)
    right_pyrs = [r.reshape(B, V, *r.shape[1:]) for r in right_flat]
    sizes = [(p.shape[1], p.shape[2]) for p in left_pyr]
    K_pyr = build_K_pyramid(jnp.asarray(K), sizes)

    config = MultiViewStereoNetConfig(
        num_idepth_samples=D, do_cost_volume_filter=cvf, do_refiners=refiners)
    out = mvsnet_forward(params, left_pyr, K_pyr, jnp.asarray(T), right_pyrs, config)
    return out


def assert_outputs_close(jax_out, ref_out, idepth_tol=2e-3):
    for lvl in range(5):
        est = np.asarray(jax_out["left_idepthmap_pyr"][lvl])
        ref = ref_out["left_idepthmap_pyr"][lvl][:, 0]
        scale = max(np.abs(ref).max(), 1e-3)
        np.testing.assert_allclose(est, ref, atol=idepth_tol * scale, rtol=0,
                                   err_msg=f"idepthmap level {lvl}")
        raw = np.asarray(jax_out["left_idepthmap_raw_pyr"][lvl])
        raw_ref = ref_out["left_idepthmap_raw_pyr"][lvl][:, 0]
        np.testing.assert_allclose(raw, raw_ref, atol=idepth_tol * scale, rtol=0,
                                   err_msg=f"raw level {lvl}")
        mask = np.asarray(jax_out["left_idepthmap_mask_pyr"][lvl])
        mask_ref = ref_out["left_idepthmap_mask_pyr"][lvl]
        # Bilinear 0.5-thresholding can flip borderline pixels; allow a few.
        frac = np.mean(mask != mask_ref)
        assert frac < 0.01, f"mask mismatch {frac:.4f} at level {lvl}"


@pytest.fixture(scope="module")
def pretrained_sd():
    return load_torchscript_weights(PRETRAINED)


@pytest.mark.slow
def test_forward_parity_pretrained_single_view(reference_modules, pretrained_sd):
    left, rights, K, T = make_inputs(B=1, V=1)
    ref_out = torch_forward(reference_modules, pretrained_sd, left, rights, K, T)
    jax_out = jax_forward(pretrained_sd, left, rights, K, T)
    assert_outputs_close(jax_out, ref_out)


@pytest.mark.slow
def test_forward_parity_pretrained_multi_view(reference_modules, pretrained_sd):
    left, rights, K, T = make_inputs(B=1, V=3, seed=1)
    ref_out = torch_forward(reference_modules, pretrained_sd, left, rights, K, T)
    jax_out = jax_forward(pretrained_sd, left, rights, K, T)
    assert_outputs_close(jax_out, ref_out)


def test_forward_parity_no_filter_no_refiners(reference_modules, pretrained_sd):
    left, rights, K, T = make_inputs(B=1, V=1, seed=2)
    refiners = (False, False, True, False, False)
    ref_out = torch_forward(reference_modules, pretrained_sd, left, rights, K, T,
                            cvf=False, refiners=refiners)
    jax_out = jax_forward(pretrained_sd, left, rights, K, T,
                          cvf=False, refiners=refiners)
    assert_outputs_close(jax_out, ref_out)


@pytest.mark.slow
def test_forward_parity_pretrained_non16_size(reference_modules, pretrained_sd):
    """Golden parity at a resolution that is NOT a multiple of 16.

    Forces every TPU-fast-path auto-fallback at once: the s2d chained
    frontend (needs H, W % 16 == 0), the s2d cost filter (odd level-4
    dims: 72x88 -> 5x6 at level 4), and the s2d refiners at the odd
    pyramid levels (9x11 at level 3). Pins that the fallback routing
    composes correctly through the whole forward, not just per-op.
    """
    left, rights, K, T = make_inputs(B=1, V=1, H=72, W=88, seed=4)
    ref_out = torch_forward(reference_modules, pretrained_sd, left, rights, K, T)
    jax_out = jax_forward(pretrained_sd, left, rights, K, T)
    assert_outputs_close(jax_out, ref_out)


@pytest.mark.slow
def test_forward_parity_pretrained_demon(reference_modules):
    """Golden parity with the SECOND shipped checkpoint (demon_45epochs).

    The DeMoN recipe's params.yaml lacks the cost_volume_filter/refiners
    keys (/root/reference/pretrained/demon_45epochs/params.yaml; test.py
    would KeyError, see train/config.py defaults) -- eval runs it with
    the defaults (filter on, all refiners on), so parity is checked at
    that config. Weights differ enough from the GTA checkpoint (separate
    45-epoch training run) that this exercises a genuinely different
    point in weight space through the importer and the forward.
    """
    sd = load_torchscript_weights(DEMON_PRETRAINED)
    left, rights, K, T = make_inputs(B=1, V=2, seed=5)
    ref_out = torch_forward(reference_modules, sd, left, rights, K, T)
    jax_out = jax_forward(sd, left, rights, K, T)
    assert_outputs_close(jax_out, ref_out)


@pytest.mark.slow
def test_forward_parity_random_weights(reference_modules):
    """Fresh torch init exported to JAX: exercises every parameter mapping."""
    import torch

    torch.manual_seed(0)
    net = reference_modules.mvs.MultiViewStereoNet()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    left, rights, K, T = make_inputs(B=2, V=1, seed=3)
    ref_out = torch_forward(reference_modules, sd, left, rights, K, T)
    jax_out = jax_forward(sd, left, rights, K, T)
    assert_outputs_close(jax_out, ref_out)
