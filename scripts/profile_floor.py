#!/usr/bin/env python
"""Measure the device-loop timing floor + key rooflines on the TPU.

Cases:
- noop: fori_loop body that only perturbs + sums a tiny array (the
  measurement overhead floor every profile_components number includes);
- conv128: one 3x3 128->128 conv at 240x320 (the S2D refiner workhorse)
  -> prints achieved TF/s vs the ~197 TF/s v5e bf16 peak;
- warp_default / warp_highest: the big Pallas warp at both precisions
  (the model uses "default" unless matmul_precision="highest").
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

    iters = 100

    def timeit(name, fn):
        @jax.jit
        def loop():
            def body(i, acc):
                out = fn(i.astype(jnp.float32) * 1e-12)
                return acc + jnp.sum(out.astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        float(loop())
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop())
            times.append(time.perf_counter() - t0)
        ms = min(times) / iters * 1000.0
        print(f"{name:40s} {ms:8.4f} ms", flush=True)
        return ms

    key = jax.random.PRNGKey(0)
    tiny = jnp.ones((8, 128), jnp.float32)
    timeit("noop (loop floor)", lambda t: tiny + t)

    x = jax.random.normal(key, (1, 240, 320, 128), jnp.float32)
    w = jax.random.normal(key, (3, 3, 128, 128), jnp.float32) * 0.01

    def conv(t):
        return jax.lax.conv_general_dilated(
            x + t, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ms = timeit("conv 3x3 128ch 240x320 (f32 default)", conv)
    gflop = 240 * 320 * 9 * 128 * 128 * 2 / 1e9
    print(f"  -> {gflop / ms:8.1f} TF/s (workload {gflop:.1f} GFLOP)")

    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    def convb(t):
        return jax.lax.conv_general_dilated(
            xb + t.astype(jnp.bfloat16), wb, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ms = timeit("conv 3x3 128ch 240x320 (bf16)", convb)
    print(f"  -> {gflop / ms:8.1f} TF/s")

    from multi_view_stereonet_tpu.ops.warp import homography_warp_auto
    from multi_view_stereonet_tpu.geometry import (
        get_fronto_parallel_homography)
    img = jax.random.normal(key, (1, 480, 640, 3), jnp.float32)
    # Realistic warp: unit-baseline pose + mid-range idepth, like the model's
    # min-idepth full-res warp. (An arbitrary H with nonzero projective row
    # makes tiles exceed the band and silently measures the XLA fallback.)
    K = jnp.array([[[500.0, 0, 320], [0, 500, 240], [0, 0, 1]]], jnp.float32)
    T = jnp.eye(4, dtype=jnp.float32)[None].at[:, 0, 3].set(-1.0)
    H = get_fronto_parallel_homography(K, K, T, jnp.array([0.5], jnp.float32))

    for prec in ("default", "highest"):
        timeit(f"big warp 480x640x3 pallas ({prec})",
               lambda t, p=prec: homography_warp_auto(
                   img + t, H, zero_invalid=True, precision=p)[0])


if __name__ == "__main__":
    main()
