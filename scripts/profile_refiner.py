#!/usr/bin/env python
"""Per-piece roofline profile of the idepthmap refiner at full res.

Times refiner0 (480x640, the dominant forward cost) as a whole and as
individual pieces (conv0, each dilated resblock, final conv), in f32 and
bf16, plain vs s2d layout. Device-side loop timing. The per-piece sums
vs the whole-refiner time expose fusion gaps; the bandwidth model gives
the HBM floor each piece should hit.
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

    from multi_view_stereonet_tpu.models.refiners import (
        init_idepthmap_refiner, idepthmap_refiner, DILATIONS)
    from multi_view_stereonet_tpu.models.layers import (
        conv2d, group_norm, leaky_relu, resnet_block)
    from multi_view_stereonet_tpu.models.s2d import idepthmap_refiner_s2d

    H, W, B = 480, 640, 1
    key = jax.random.PRNGKey(0)
    params = init_idepthmap_refiner(key, 3)  # refiner0: guidance = image
    guidance = jax.random.normal(key, (B, H, W, 3))
    idepth = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(1), (B, H, W)))
    x32 = jax.random.normal(jax.random.PRNGKey(2), (B, H, W, 32))

    def timed(label, fn, *args, iters=100, bytes_moved=None):
        @jax.jit
        def loop():
            def body(i, acc):
                a0 = args[0] + i.astype(args[0].dtype) * jnp.asarray(
                    1e-12, args[0].dtype)
                return acc + jnp.sum(fn(a0, *args[1:]).astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        jax.block_until_ready(loop())
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(loop())
            times.append(time.perf_counter() - t0)
        ms = min(times) / iters * 1000.0
        floor = ""
        if bytes_moved:
            floor = f"  (HBM floor ~{bytes_moved / 819e9 * 1e3:.3f} ms)"
        print(f"{label:44s} {ms:8.3f} ms{floor}", flush=True)
        return ms

    act4 = B * H * W * 32 * 4  # one (B, H, W, 32) f32 tensor in bytes

    for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        g = guidance.astype(dt)
        x = x32.astype(dt)
        esize = 4 if dt == jnp.float32 else 2
        act = B * H * W * 32 * esize
        print(f"--- {dt_name} ---", flush=True)

        timed(f"refiner0 whole ({dt_name})",
              lambda gg: idepthmap_refiner(params, gg, idepth, dt), g,
              bytes_moved=14 * act)
        timed(f"refiner0 whole s2d ({dt_name})",
              lambda gg: idepthmap_refiner_s2d(params, gg, idepth, dt), g,
              bytes_moved=14 * act)

        timed(f"conv0 4->32 + GN + lrelu ({dt_name})",
              lambda xx: leaky_relu(group_norm(
                  params["gn0"], conv2d(params["conv0"], jnp.concatenate(
                      [xx, idepth[..., None].astype(dt)], -1)), 4)),
              g, bytes_moved=2 * act)
        for i, d in enumerate(DILATIONS):
            timed(f"resblock{i} dil={d} ({dt_name})",
                  lambda xx, i=i, d=d: resnet_block(params[f"res{i}"], xx, d),
                  x, bytes_moved=2 * act)
        timed(f"conv_final 32->1 ({dt_name})",
              lambda xx: conv2d(params["conv_final"], xx),
              x, bytes_moved=act)


if __name__ == "__main__":
    main()
