#!/usr/bin/env python
"""Characterize the fori_loop per-iteration overhead + warp at real H."""

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

    def timeit(name, make_loop, iters):
        loop = jax.jit(make_loop(iters))
        jax.block_until_ready(loop())
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(loop())
            times.append(time.perf_counter() - t0)
        ms = min(times) / iters * 1000.0
        print(f"{name:52s} {ms:8.4f} ms/iter", flush=True)
        return ms

    tiny = jnp.ones((8, 128), jnp.float32)

    def scalar_carry(iters):
        def loop():
            def body(i, acc):
                return acc + jnp.sum(tiny + i.astype(jnp.float32) * 1e-12)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return loop

    def array_carry(iters):
        def loop():
            def body(i, acc):
                return acc + (tiny + i.astype(jnp.float32) * 1e-12)
            return jnp.sum(jax.lax.fori_loop(0, iters, body,
                                             jnp.zeros_like(tiny)))
        return loop

    def unrolled(iters):
        def loop():
            def body(i, acc):
                return acc + jnp.sum(tiny + i.astype(jnp.float32) * 1e-12)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0),
                                     unroll=8)
        return loop

    timeit("noop scalar carry", scalar_carry, 100)
    timeit("noop scalar carry x1000", scalar_carry, 1000)
    timeit("noop array carry", array_carry, 100)
    timeit("noop unroll=8", unrolled, 100)

    # Big warp at a realistic min-idepth homography (pure rotation-ish),
    # both precisions -- this is the Pallas path, not the gather fallback.
    from multi_view_stereonet_tpu.ops.warp import homography_warp_auto
    from multi_view_stereonet_tpu.geometry import (
        create_plane_sweep_homographies,
    )
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (1, 480, 640, 3), jnp.float32)
    K = jnp.array([[[576.0, 0, 319.5, 0],
                    [0, 576.0, 239.5, 0],
                    [0, 0, 1, 0],
                    [0, 0, 0, 1]]], jnp.float32)
    T = jnp.eye(4, dtype=jnp.float32)[None].at[:, 0, 3].set(1.0)
    samples = jnp.array([[0.05]], jnp.float32)
    Hm = create_plane_sweep_homographies(T, K, samples)[:, 0]

    for prec in ("default", "highest"):
        def warp(iters, p=prec):
            def loop():
                def body(i, acc):
                    out, _ = homography_warp_auto(
                        img + i.astype(jnp.float32) * 1e-12, Hm,
                        zero_invalid=True, precision=p)
                    return acc + jnp.sum(out)
                return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
            return loop
        timeit(f"big warp pallas realistic H ({prec})", warp, 100)


if __name__ == "__main__":
    main()
