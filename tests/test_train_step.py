"""Train-step tests: two-view recipe with all loss paths + optimizer."""

import numpy as np

import pytest

import jax
import jax.numpy as jnp

from multi_view_stereonet_tpu.models import MultiViewStereoNetConfig, init_mvsnet
from multi_view_stereonet_tpu.losses import LossConfig
from multi_view_stereonet_tpu.train.step import (
    OptimizerConfig, make_optimizer, make_loss_fn, make_train_step,
)

from tests.test_geometry import random_K, random_pose


def _two_view_batch(B=2, H=32, W=32, seed=0):
    # Translation-dominant stereo-like poses: harsh random rotations can
    # legitimately produce an empty valid-idepth set in
    # create_idepth_samples (NaN, exactly as in the reference).
    rng = np.random.default_rng(seed)
    K = np.stack([random_K(H, W) for _ in range(B)])
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    T[:, 0, 3] = rng.uniform(0.3, 0.8, size=B)
    T[:, 1, 3] = rng.uniform(-0.05, 0.05, size=B)
    T[:, 2, 3] = rng.uniform(-0.05, 0.05, size=B)
    return {
        "left_image": jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32)),
        "right_image": jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32)),
        "K": jnp.asarray(K),
        "T_right_in_left": jnp.asarray(T),
        "left_depthmap_true": jnp.asarray(rng.uniform(2, 30, (B, H, W)).astype(np.float32)),
        "right_depthmap_true": jnp.asarray(rng.uniform(2, 30, (B, H, W)).astype(np.float32)),
    }


@pytest.mark.slow
def test_two_view_all_losses_grad():
    """Two-view recipe with estimate_right_idepthmap and every loss term
    active (supervision + LR consistency + reconstruction): loss finite,
    grads finite and nonzero. Exercises the occlusion-mask, consistency
    and view-synthesis paths end-to-end."""
    params = init_mvsnet(jax.random.PRNGKey(0))
    model_config = MultiViewStereoNetConfig(num_idepth_samples=4)
    loss_config = LossConfig(supervision_factor=1.0, reconstruction_factor=0.5,
                             left_right_factor=0.5)
    loss_fn = make_loss_fn(model_config, loss_config, multi_view=False,
                           estimate_right_idepthmap=True)
    batch = _two_view_batch()
    (loss, loss_dict), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(params, batch)
    assert np.isfinite(float(loss))
    assert "left_right_loss" in loss_dict
    assert "reconstruction_loss" in loss_dict
    leaves = jax.tree.leaves(grads)
    gnorm = float(jnp.sqrt(sum(jnp.sum(g * g) for g in leaves)))
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.slow
def test_train_step_updates_params_and_accumulates():
    """Adam + 2-step gradient accumulation: params unchanged after the
    first microbatch, changed after the second."""
    import optax

    params = init_mvsnet(jax.random.PRNGKey(0))
    model_config = MultiViewStereoNetConfig(num_idepth_samples=4)
    tx = make_optimizer(OptimizerConfig(batches_per_step=2, learning_rate=1e-3))
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model_config, LossConfig(), tx,
                                   multi_view=False))
    batch = _two_view_batch()
    p0 = params
    params, opt_state, loss1, _ = step(params, opt_state, batch)
    diff1 = max(float(jnp.abs(a - b).max())
                for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p0)))
    assert diff1 == 0.0  # accumulating, no update yet
    params, opt_state, loss2, _ = step(params, opt_state, batch)
    diff2 = max(float(jnp.abs(a - b).max())
                for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p0)))
    assert diff2 > 0.0


def test_lr_schedule_decays():
    import optax

    cfg = OptimizerConfig(learning_rate=1e-3, scheduler_gamma=0.5,
                          steps_per_epoch=10)
    tx = make_optimizer(cfg)
    # The decayed schedule is staircase per epoch: check via the schedule fn.
    sched = optax.exponential_decay(1e-3, 10, 0.5, staircase=True)
    assert abs(float(sched(0)) - 1e-3) < 1e-9
    assert abs(float(sched(10)) - 5e-4) < 1e-9
    assert abs(float(sched(25)) - 2.5e-4) < 1e-9


@pytest.mark.slow
def test_remat_refiners_grads_identical():
    """remat_refiners=True recomputes instead of storing refiner
    activations -- loss and parameter gradients must be unchanged."""
    batch = _two_view_batch(B=1, H=32, W=32, seed=3)
    loss_config = LossConfig(supervision_factor=1.0)
    params = init_mvsnet(jax.random.PRNGKey(0))

    def grads(remat):
        cfg = MultiViewStereoNetConfig(num_idepth_samples=4,
                                       remat_refiners=remat)
        loss_fn = make_loss_fn(cfg, loss_config, multi_view=False)
        (loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        return float(loss), g

    l0, g0 = grads(False)
    l1, g1 = grads(True)
    assert l0 == l1
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
