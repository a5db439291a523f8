"""Multi-host (multi-process) data parallelism: parallel.distributed.

The reference's multi-GPU training capability was external Horovod DP
(SURVEY.md section 5; reference params.yaml:14 "batch size *per* GPU").
Here that maps to jax.distributed + a global (data, view) mesh; these
tests exercise it for real by spawning N separate processes, each a
simulated "host" with its own virtual CPU devices, talking over Gloo.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from multi_view_stereonet_tpu.parallel import (
    ShardedDataset, local_shard_indices, global_batch, shard_batch,
    make_mesh,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_distributed_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(mode, nproc=2, ndev=2, timeout=900, extra_args=()):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, mode, str(pid), str(nproc),
             str(port), str(ndev), *map(str, extra_args)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"worker {pid} printed no RESULT:\n{out[-3000:]}"
        results.append(float(lines[-1].split()[1]))
    return results


# ---------------------------------------------------------------- unit


def test_local_shard_indices_strided():
    assert local_shard_indices(10, 0, 3) == [0, 3, 6, 9]
    assert local_shard_indices(10, 2, 3) == [2, 5, 8]
    assert local_shard_indices(5, 0, 1) == [0, 1, 2, 3, 4]


def test_sharded_dataset_equal_lengths_and_coverage():
    data = [f"s{i}" for i in range(11)]
    shards = [ShardedDataset(data, pid, 3) for pid in range(3)]
    # Ragged tail dropped: every process sees the same length.
    assert [len(s) for s in shards] == [3, 3, 3]
    seen = sorted(s[i] for s in shards for i in range(len(s)))
    assert seen == sorted(data[:9])
    # Attribute passthrough to the wrapped dataset.
    assert shards[0].count("s0") == 1

    # Collective-free consumers (fleet-sharded streaming) keep the tail:
    # every sample covered exactly once.
    full = [ShardedDataset(data, pid, 3, drop_ragged_tail=False)
            for pid in range(3)]
    assert [len(s) for s in full] == [4, 4, 3]
    seen = sorted(s[i] for s in full for i in range(len(s)))
    assert seen == sorted(data)


def test_global_batch_matches_shard_batch_single_process():
    """Single-process degenerate case: global_batch produces the same
    values and shardings as the single-host shard_batch path."""
    mesh = make_mesh(4, view=1)
    rng = np.random.default_rng(0)
    batch = {
        "left_image": rng.normal(size=(4, 8, 8, 3)).astype(np.float32),
        "right_images": rng.normal(size=(4, 1, 8, 8, 3)).astype(np.float32),
        "K": np.tile(np.eye(4, dtype=np.float32), (4, 1, 1)),
    }
    a = global_batch(mesh, batch)
    b = shard_batch(mesh, batch)
    for k in batch:
        assert a[k].shape == b[k].shape
        assert a[k].sharding == b[k].sharding, k
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


# ------------------------------------------------------- multi-process


def test_two_process_collective_sum():
    """2 processes x 2 virtual devices: initialize + make_global_mesh +
    global_batch + a cross-host reduction, end to end over Gloo."""
    results = _run_workers("toy", nproc=2, ndev=2, timeout=300)
    # sum over concat(proc0 rows, proc0+100 rows) = 15 + (15 + 600)
    expected = float(np.arange(6).sum() * 2 + 100.0 * 6)
    assert results == [expected, expected], results


@pytest.mark.slow
def test_two_process_train_step_matches_single_process():
    """The REAL jitted train step over a 2-process global mesh produces
    the same loss trajectory as a single-process run on the same global
    batch -- the multi-host gradient psum (DCN analog) is exact."""
    from __graft_entry__ import _example_batch
    from multi_view_stereonet_tpu.models import (
        MultiViewStereoNetConfig, init_mvsnet,
    )
    from multi_view_stereonet_tpu.losses import LossConfig
    from multi_view_stereonet_tpu.parallel import replicated
    from multi_view_stereonet_tpu.train.step import (
        OptimizerConfig, make_optimizer, make_train_step,
    )

    # Single-process reference on a 4-device mesh (same global mesh shape
    # the 2x2 workers build), same params/batch/steps.
    mesh = make_mesh(4, view=1)
    gbatch = _example_batch(B=4, V=1, H=32, W=32)
    params = init_mvsnet(jax.random.PRNGKey(0))
    tx = make_optimizer(OptimizerConfig())
    opt_state = tx.init(params)
    step = make_train_step(
        MultiViewStereoNetConfig(num_idepth_samples=4,
                                 fold_extractor_batch=False),
        LossConfig(), tx)
    rep = replicated(mesh)
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)
    with mesh:
        jit_step = jax.jit(step)
        for _ in range(2):
            params, opt_state, loss, _ = jit_step(
                params, opt_state, shard_batch(mesh, gbatch))
    ref_loss = float(loss)

    results = _run_workers("train", nproc=2, ndev=2)
    assert results[0] == results[1], results  # replicated state in sync
    np.testing.assert_allclose(results[0], ref_loss, rtol=1e-4)


@pytest.mark.slow
def test_flagship_aspect_multihost_grads_match_single_device(tmp_path):
    """The MULTICHIP shape class over the multi-host path: 120x160, D=12,
    V=2 on a (data=4, view=2) global mesh spanning 2 processes x 4
    virtual devices. The DCN path's GSPMD decisions are as
    shape-dependent as the ICI path's (dryrun_multichip docstring), so
    the toy 32x32/D4 run above is not evidence for this regime. Asserts
    loss AND gradient equality against the plain single-device graph,
    with the NORM-level tolerances of __graft_entry__.dryrun_multichip
    (shard-layout ULP noise flips LeakyReLU branches at the
    GroupNorm-centered zero; ~5e-4 global from one flip, a real sharding
    bug is ~1e-1)."""
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from multi_view_stereonet_tpu.models import (
        MultiViewStereoNetConfig, init_mvsnet,
    )
    from multi_view_stereonet_tpu.losses import LossConfig
    from multi_view_stereonet_tpu.train.step import make_loss_fn

    H, W, D, B, V = 120, 160, 12, 4, 2
    grads_file = str(tmp_path / "flagship_grads.npy")
    results = _run_workers("flagship", nproc=2, ndev=4, timeout=1800,
                           extra_args=(grads_file,))
    assert results[0] == results[1], results  # replicated loss in sync

    params = init_mvsnet(jax.random.PRNGKey(0))
    loss_fn = make_loss_fn(
        MultiViewStereoNetConfig(num_idepth_samples=D,
                                 fold_extractor_batch=False), LossConfig())
    batch = {k: jnp.asarray(v)
             for k, v in _example_batch(B=B, V=V, H=H, W=W).items()}
    (loss1, _), grads1 = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(params, batch)
    np.testing.assert_allclose(results[0], float(loss1), rtol=1e-5)

    flat1 = np.concatenate([np.asarray(g, np.float64).ravel()
                            for g in jax.tree.leaves(grads1)])
    flat2 = np.load(grads_file)
    assert flat1.shape == flat2.shape
    global_rel = float(np.linalg.norm(flat1 - flat2)
                       / np.linalg.norm(flat1))
    assert global_rel < 2e-2, (
        f"multi-host grads deviate from single-device: global norm-rel "
        f"{global_rel:.3e}")
    print(f"MULTIHOST mesh=(4x2) over 2 procs x 4 devs, "
          f"shape={H}x{W}xD{D}, B={B}, V={V}, loss={float(loss1):.4f}, "
          f"grad_global_norm_rel={global_rel:.2e}")
