#!/usr/bin/env python
"""Fused incremental-chain kernel vs the XLA scan, on the real TPU.

Device-side loop timing (CLAUDE.md profiling rules), realistic sweep
homographies. Run after touching ops/pallas/incremental_chain.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from multi_view_stereonet_tpu.models.refiners import init_feature_refiner
    from multi_view_stereonet_tpu.models.mvsnet import _incremental_scan
    from multi_view_stereonet_tpu.ops.pallas.incremental_chain import (
        incremental_chain_fused)
    from multi_view_stereonet_tpu.geometry import (
        create_plane_sweep_homographies, incremental_homographies)

    D, h4, w4, C = 12, 30, 40, 32
    key = jax.random.PRNGKey(0)
    params = init_feature_refiner(key, C)

    def inputs(N):
        feats0 = jax.random.normal(key, (N, h4, w4, C))
        image_rest = jax.random.normal(jax.random.PRNGKey(1),
                                       (N, D - 1, h4, w4, 3))
        K = jnp.tile(jnp.array([[[20.0, 0, w4 / 2], [0, 20, h4 / 2],
                                 [0, 0, 1]]]), (N, 1, 1))
        T = jnp.tile(jnp.eye(4)[None], (N, 1, 1)).at[:, 0, 3].set(-1.0)
        samples = jnp.tile(jnp.linspace(0.05, 0.6, D)[None], (N, 1))
        H_inc = incremental_homographies(
            create_plane_sweep_homographies(T, K, samples))
        return feats0, image_rest, H_inc

    def timed(label, fn, feats0, image_rest, H_inc, iters=200):
        @jax.jit
        def loop():
            def body(i, acc):
                f0 = feats0 + i.astype(jnp.float32) * 1e-12
                return acc + jnp.sum(fn(params, f0, image_rest, H_inc))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        jax.block_until_ready(loop())
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(loop())
            times.append(time.perf_counter() - t0)
        ms = min(times) / iters * 1000.0
        print(f"{label:40s} {ms:8.3f} ms", flush=True)
        return ms

    def scan_full(p, f0, imgs, H):
        rest = _incremental_scan(p, f0, imgs, H)
        return jnp.concatenate([f0[:, None], rest], axis=1)

    for N in (1, 2, 4, 8, 16):
        feats0, image_rest, H_inc = inputs(N)
        f = timed(f"fused  N={N}", lambda p, f0, i, H: incremental_chain_fused(
            p, f0, i, H, "float32"), feats0, image_rest, H_inc)
        s = timed(f"scan   N={N}", scan_full, feats0, image_rest, H_inc)
        print(f"  -> fused/scan = {f/s:.2f}x", flush=True)


if __name__ == "__main__":
    main()
