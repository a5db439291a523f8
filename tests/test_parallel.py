"""Multi-device tests on the 8-virtual-device CPU mesh (pjit/shard_map
path the driver also exercises via __graft_entry__.dryrun_multichip)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_view_stereonet_tpu.parallel import make_mesh, shard_batch, replicated
from multi_view_stereonet_tpu.models import MultiViewStereoNetConfig, init_mvsnet
from multi_view_stereonet_tpu.losses import LossConfig
from multi_view_stereonet_tpu.train.step import (
    OptimizerConfig, make_optimizer, make_train_step,
)

from __graft_entry__ import _example_batch


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_data_view_parallel_train_step():
    mesh = make_mesh(8, view=2)
    batch = _example_batch(B=4, V=2, H=32, W=32)

    params = init_mvsnet(jax.random.PRNGKey(0))
    tx = make_optimizer(OptimizerConfig())
    opt_state = tx.init(params)
    step = make_train_step(
        MultiViewStereoNetConfig(num_idepth_samples=4), LossConfig(), tx)

    rep = replicated(mesh)
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)
    sharded = shard_batch(mesh, batch)

    # The batch really is spread over the mesh.
    assert len(sharded["left_image"].sharding.device_set) == 8 or \
        len(sharded["left_image"].sharding.device_set) == 4

    with mesh:
        params2, opt_state2, loss, _ = jax.jit(step)(params, opt_state, sharded)
        jax.block_until_ready(loss)
    assert np.isfinite(float(loss))

    # Parameters remain replicated after the update (XLA inserted the
    # gradient reduction; no manual psum in the step).
    leaf = jax.tree.leaves(params2)[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_view_parallel_matches_single_device():
    """view=2 mesh vs single device: identical loss AND gradients.

    Exercises the risky path -- the (B, V) -> B*V fold under a sharded
    view axis -- with a numerical oracle, not just a finiteness check.
    Uses the mesh-friendly extractor path (fold_extractor_batch=False),
    the same config dryrun_multichip ships.
    """
    from multi_view_stereonet_tpu.train.step import make_loss_fn

    batch = _example_batch(B=4, V=2, H=32, W=32)
    cfg = MultiViewStereoNetConfig(num_idepth_samples=4,
                                   fold_extractor_batch=False)
    loss_fn = make_loss_fn(cfg, LossConfig())
    params = init_mvsnet(jax.random.PRNGKey(0))
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    single = {k: jnp.asarray(v) for k, v in batch.items()}
    (loss1, _), grads1 = jax.jit(grad_fn)(params, single)

    mesh = make_mesh(8, view=2)
    sharded = shard_batch(mesh, batch)
    with mesh:
        (loss8, _), grads8 = jax.jit(grad_fn)(
            jax.device_put(params, replicated(mesh)), sharded)
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    # f32 reduction order differs between the single big reduce and the
    # 8-way psum; allow ~1e-4 relative error, with an absolute floor set
    # by the global gradient scale (near-zero leaves are ± cancellation
    # noise). A wrong-axis fold would produce O(1) relative errors.
    leaves1 = [np.asarray(p) for p in jax.tree.leaves(grads1)]
    leaves8 = [np.asarray(p) for p in jax.tree.leaves(grads8)]
    gscale = max(np.abs(p).max() for p in leaves1)
    for p1, p8 in zip(leaves1, leaves8):
        np.testing.assert_allclose(p1, p8, rtol=1e-4, atol=1e-6 * gscale)


@pytest.mark.slow
def test_fold_extractor_batch_numerics():
    """fold_extractor_batch=True/False are numerically identical.

    The fold is a pure batching trick (GroupNorm stats are per-sample);
    this pins that invariant so the mesh path and the single-chip fast
    path can never drift apart.
    """
    from multi_view_stereonet_tpu.train.step import make_loss_fn

    batch = _example_batch(B=2, V=2, H=32, W=32)
    params = init_mvsnet(jax.random.PRNGKey(0))
    single = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = []
    for fold in (True, False):
        cfg = MultiViewStereoNetConfig(num_idepth_samples=4,
                                       fold_extractor_batch=fold)
        loss, _ = jax.jit(make_loss_fn(cfg, LossConfig()))(params, single)
        losses.append(float(loss))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)


@pytest.mark.slow
def test_dryrun_multichip_fresh_subprocess():
    """The driver's contract: import the module fresh (no env vars set)
    and call dryrun_multichip(8). Regression for MULTICHIP_r01.json rc=1."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # Tiny shape: this test probes the env-bootstrap contract, not the
    # flagship graph (that's test_dryrun_flagship_shape below).
    env["GRAFT_DRYRUN_SHAPE"] = "32x32x4"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok" in proc.stdout


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_dryrun_flagship_shape(monkeypatch):
    """The full dryrun at its default REALISTIC shape (240x320, D=12,
    V=2): both fold_extractor_batch sharded graphs compile+run and agree,
    and sharded loss/grads match the single-device graph at that shape
    (VERDICT r2 #3 -- GSPMD decisions are shape-dependent; 32x32 would
    not have caught the round-1 rematerialization bug). ~6-8 min on the
    1-core CPU host."""
    import __graft_entry__ as g

    monkeypatch.delenv("GRAFT_DRYRUN_SHAPE", raising=False)
    g.dryrun_multichip(8)  # asserts internally


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_data_parallel_matches_single_device():
    """Same batch, 1 device vs 8 devices: identical loss."""
    from multi_view_stereonet_tpu.train.step import make_loss_fn

    batch = _example_batch(B=8, V=1, H=32, W=32)
    loss_fn = make_loss_fn(MultiViewStereoNetConfig(num_idepth_samples=4),
                           LossConfig())
    params = init_mvsnet(jax.random.PRNGKey(0))

    single = {k: jnp.asarray(v) for k, v in batch.items()}
    loss1, _ = jax.jit(loss_fn)(params, single)

    mesh = make_mesh(8, view=1)
    sharded = shard_batch(mesh, batch)
    with mesh:
        loss8, _ = jax.jit(loss_fn)(jax.device_put(params, replicated(mesh)),
                                    sharded)
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
