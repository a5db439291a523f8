"""Golden BACKWARD parity: jax.grad of the training recipe vs torch autograd.

The forward-parity tests (tests/test_model_parity.py) pin the inference
path; these pin the *training* path -- the full supervised recipe loss
(all refined levels + raw coarsest, idepth_scale_factor=100,
multi_view_stereonet_utils.py:664-711) and the two-view recipe with every
loss branch active (estimate_right_idepthmap + LR consistency +
reconstruction, :712-793) -- by comparing per-parameter gradients of the
pretrained weights against torch autograd run through the reference's own
unpack/forward/compute_losses plumbing.

Mechanism: torch gradients are keyed by the reference state-dict names, so
feeding the gradient dict through ``convert_reference_state_dict`` yields a
pytree congruent with ``jax.grad``'s output (same conv-kernel transposes,
same tree). Weight sharing (the right extractor reuses the left extractor's
tensors, multi_view_stereonet.py:507) is handled by torch itself: autograd
accumulates both uses into the shared parameter, which named_parameters
reports once under ``left_feature_extractor.*``.

Run directly (``python tests/test_grad_parity.py``) for a per-leaf
diff report instead of pass/fail.
"""

import numpy as np
import pytest

import jax

from multi_view_stereonet_tpu.models import MultiViewStereoNetConfig
from multi_view_stereonet_tpu.losses import LossConfig
from multi_view_stereonet_tpu.checkpoint import (
    load_torchscript_weights, convert_reference_state_dict,
)
from multi_view_stereonet_tpu.train.step import make_loss_fn

from tests.test_model_parity import PRETRAINED, make_inputs


def _grad_state_dict(net):
    """Per-parameter grads keyed by reference names (zeros if untouched)."""
    import torch

    out = {}
    for name, p in net.named_parameters():
        g = p.grad
        out[name] = (np.zeros(p.shape, dtype=np.float32) if g is None
                     else g.detach().numpy())
    return out


def _load_net(reference_modules, state_dict):
    import torch

    net = reference_modules.mvs.MultiViewStereoNet()
    missing, _ = net.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in state_dict.items()},
        strict=False)
    assert not missing
    net.eval()
    return net


def _torch_grads_multiview(reference_modules, state_dict, left, rights, K, T,
                           depth_left, depth_rights, D=12):
    import torch

    net = _load_net(reference_modules, state_dict)
    B, V = T.shape[0], T.shape[1]
    batch = {
        "left_filename": ["left"] * B,
        "right_filename": [["right"] * B for _ in range(V)],
        "left_image": torch.from_numpy(left),
        "right_image": [torch.from_numpy(rights[:, v].copy()) for v in range(V)],
        "K": torch.from_numpy(K),
        "T_right_in_left": [torch.from_numpy(T[:, v].copy()) for v in range(V)],
        "left_depthmap_true": torch.from_numpy(depth_left[:, None].copy()),
        "right_depthmap_true": [
            torch.from_numpy(depth_rights[:, v, None].copy()) for v in range(V)],
    }
    params = {"num_idepth_samples": D, "cost_volume_filter": True,
              "refiners": [True] * 5, "estimate_right_idepthmap": False,
              "supervision_factor": 1.0, "left_right_factor": 0.0,
              "reconstruction_factor": 0.0}
    mvs_utils = reference_modules.mvs_utils
    inputs = mvs_utils.multi_view_unpack_batch(batch, torch.device("cpu"), 5)
    outputs = mvs_utils.multi_view_forward(net, inputs, params)
    loss, _, _ = mvs_utils.compute_losses(inputs, outputs, params)
    net.zero_grad()
    loss.backward()
    return float(loss), _grad_state_dict(net)


def _torch_grads_two_view(reference_modules, state_dict, left, right, K, T,
                          depth_left, depth_right, D=12):
    import torch

    net = _load_net(reference_modules, state_dict)
    B = left.shape[0]
    batch = {
        "left_filename": ["left"] * B,
        "right_filename": ["right"] * B,
        "left_image": torch.from_numpy(left),
        "right_image": torch.from_numpy(right),
        "K": torch.from_numpy(K),
        "T_right_in_left": torch.from_numpy(T.copy()),
        "left_depthmap_true": torch.from_numpy(depth_left[:, None].copy()),
        "right_depthmap_true": torch.from_numpy(depth_right[:, None].copy()),
    }
    params = {"num_idepth_samples": D, "cost_volume_filter": True,
              "refiners": [True] * 5, "estimate_right_idepthmap": True,
              "supervision_factor": 1.0, "left_right_factor": 0.5,
              "reconstruction_factor": 0.5}
    mvs_utils = reference_modules.mvs_utils
    inputs = mvs_utils.unpack_batch(batch, torch.device("cpu"), 5)
    outputs = mvs_utils.forward(net, inputs, params)
    loss, _, _ = mvs_utils.compute_losses(inputs, outputs, params)
    net.zero_grad()
    loss.backward()
    return float(loss), _grad_state_dict(net)


def _jax_grads(state_dict, batch_np, loss_config, multi_view,
               estimate_right_idepthmap=False, D=12):
    import jax.numpy as jnp

    params = convert_reference_state_dict(state_dict)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    config = MultiViewStereoNetConfig(num_idepth_samples=D)
    loss_fn = make_loss_fn(config, loss_config, multi_view=multi_view,
                           estimate_right_idepthmap=estimate_right_idepthmap)
    (loss, loss_dict), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(params, batch)
    return float(loss), jax.device_get(grads), loss_dict


def _walk(tree_a, tree_b, path=""):
    if isinstance(tree_a, dict):
        for k in sorted(tree_a):
            yield from _walk(tree_a[k], tree_b[k], f"{path}/{k}")
    else:
        yield path, np.asarray(tree_a), np.asarray(tree_b)


def report_or_assert(jax_grads, ref_grads, rtol, report=False):
    """Per-leaf: max|diff| <= rtol * max|ref| plus a cosine-direction check
    (guards against a leaf that matches in magnitude but not direction).

    Leaves whose reference gradient is < 1e-4 of the global max are compared
    against that floor instead: e.g. volume_filter4.conv4.bias has a TRUE
    zero gradient (softmin over D is invariant to a constant cost shift), so
    both frameworks return ~1e-6 roundoff noise there and a relative
    comparison is meaningless."""
    ref_tree = convert_reference_state_dict(ref_grads)
    leaves = list(_walk(jax_grads, ref_tree))
    global_scale = max(float(np.abs(b).max()) for _, _, b in leaves)
    floor = 1e-4 * global_scale
    rows = []
    for path, a, b in leaves:
        scale = max(float(np.abs(b).max()), floor)
        err = float(np.abs(a - b).max()) / scale
        na, nb = float(np.linalg.norm(a)), float(np.linalg.norm(b))
        cos = (float(np.vdot(a, b)) / (na * nb)) if na > 0 and nb > 0 else 1.0
        rows.append((path, err, cos, nb))
        if not report:
            assert err <= rtol, (
                f"{path}: rel err {err:.3e} > {rtol:.1e} (|ref|max={scale:.3e})")
            if float(np.abs(b).max()) > floor:
                assert cos > 1 - 1e-5, f"{path}: cosine {cos}"
    if report:
        rows.sort(key=lambda r: -r[1])
        for path, err, cos, nb in rows:
            print(f"{err:10.3e}  cos={cos:+.8f}  |ref|={nb:9.3e}  {path}",
                  flush=True)
        print(f"worst rel err: {rows[0][1]:.3e}", flush=True)


def _multiview_case(reference_modules, report=False):
    sd = load_torchscript_weights(PRETRAINED)
    rng = np.random.default_rng(7)
    B, V, H, W = 1, 2, 64, 80
    left, rights, K, T = make_inputs(B=B, V=V, H=H, W=W, seed=0)
    depth_left = rng.uniform(2.0, 10.0, size=(B, H, W)).astype(np.float32)
    # ~10% invalid GT: exercises the masked-mean gradient (a wrong `where`
    # would leak gradient through masked-out pixels).
    depth_left[rng.uniform(size=depth_left.shape) < 0.1] = 0.0
    depth_rights = rng.uniform(2.0, 10.0, size=(B, V, H, W)).astype(np.float32)

    ref_loss, ref_grads = _torch_grads_multiview(
        reference_modules, sd, left, rights, K, T, depth_left, depth_rights)
    batch_np = {
        "left_image": np.moveaxis(left, 1, -1),
        "right_images": np.moveaxis(rights, 2, -1),
        "K": K, "T_right_in_left": T, "left_depthmap_true": depth_left,
        "right_depthmap_true": depth_rights,
    }
    jax_loss, jax_grads, _ = _jax_grads(sd, batch_np, LossConfig(),
                                        multi_view=True)
    if report:
        print(f"[multiview] loss torch={ref_loss:.6f} jax={jax_loss:.6f}",
              flush=True)
    else:
        np.testing.assert_allclose(jax_loss, ref_loss, rtol=1e-4)
    report_or_assert(jax_grads, ref_grads, rtol=5e-3, report=report)


def _two_view_case(reference_modules, report=False):
    """Two-view recipe on a geometrically CONSISTENT rendered scene.

    The occlusion-masked branches (LR consistency, reconstruction) need the
    unoccluded pixel sets to be non-empty: on incoherent random images the
    pretrained net's left/right predictions disagree everywhere, every pixel
    is flagged occluded, and the reference's masked means become 0/0 = NaN
    (losses.py l1_loss over an empty selection). A rendered tilted-plane
    pair keeps the predictions consistent enough that every loss branch has
    real support -- and therefore a real gradient to compare."""
    from tests.synthetic_data import _smooth_texture, _camera, _render_view

    sd = load_torchscript_weights(PRETRAINED)
    rng = np.random.default_rng(11)
    B, H, W = 1, 64, 80
    K3 = _camera(H, W)
    K3[0, 2] -= 0.5
    K3[1, 2] -= 0.5
    texture = _smooth_texture(rng, H, W)
    T_right_cam = np.eye(4)
    T_right_cam[0, 3] = 0.4  # camera-in-world; left camera at identity
    T_right_cam[1, 3] = 0.03
    left_img, depth_left = _render_view(
        texture, K3, K3, H, W, np.eye(4), 8.0, plane_normal=(0.35, 0.25, 1.0))
    right_img, depth_right = _render_view(
        texture, K3, K3, H, W, T_right_cam, 8.0,
        plane_normal=(0.35, 0.25, 1.0))

    def to_chw(img):
        return np.moveaxis(img.astype(np.float32) / 127.5 - 1.0,
                           -1, 0)[None].astype(np.float32)

    left = np.ascontiguousarray(to_chw(left_img))
    right = np.ascontiguousarray(to_chw(right_img))
    K = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    K[:, :3, :3] = K3.astype(np.float32)
    T = np.tile(T_right_cam.astype(np.float32), (B, 1, 1))  # right-in-left
    depth_left = depth_left[None].astype(np.float32)
    depth_right = depth_right[None].astype(np.float32)
    depth_left[rng.uniform(size=depth_left.shape) < 0.1] = 0.0
    depth_right[rng.uniform(size=depth_right.shape) < 0.1] = 0.0

    ref_loss, ref_grads = _torch_grads_two_view(
        reference_modules, sd, left, right, K, T, depth_left, depth_right)
    batch_np = {
        "left_image": np.moveaxis(left, 1, -1),
        "right_image": np.moveaxis(right, 1, -1),
        "K": K, "T_right_in_left": T,
        "left_depthmap_true": depth_left,
        "right_depthmap_true": depth_right,
    }
    loss_config = LossConfig(supervision_factor=1.0, left_right_factor=0.5,
                             reconstruction_factor=0.5)
    jax_loss, jax_grads, loss_dict = _jax_grads(
        sd, batch_np, loss_config, multi_view=False,
        estimate_right_idepthmap=True)
    # Every branch must have real support -- an all-occluded scene would
    # silently reduce this to a supervised-only comparison.
    assert float(loss_dict["left_right_loss"]) > 1e-3
    assert float(loss_dict["reconstruction_loss"]) > 1e-3
    if report:
        print(f"[two-view] loss torch={ref_loss:.6f} jax={jax_loss:.6f}",
              flush=True)
    else:
        np.testing.assert_allclose(jax_loss, ref_loss, rtol=1e-4)
    report_or_assert(jax_grads, ref_grads, rtol=5e-3, report=report)


@pytest.mark.slow
def test_grad_parity_supervised_multiview(reference_modules):
    """Supervised multi-view recipe (the shipped 150-epoch config):
    jax.grad == torch autograd at the pretrained weights."""
    _multiview_case(reference_modules)


@pytest.mark.slow
def test_grad_parity_two_view_all_losses(reference_modules):
    """Two-view recipe with estimate_right_idepthmap and every loss branch
    (supervision + LR consistency + reconstruction): gradient parity."""
    _two_view_case(reference_modules)


if __name__ == "__main__":
    # Debug report: python -m tests.test_grad_parity (from the repo root).
    from tests import conftest as c  # forces CPU + virtual devices

    mods = c.reference_modules.__wrapped__()
    _multiview_case(mods, report=True)
    _two_view_case(mods, report=True)
