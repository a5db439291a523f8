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
