#!/usr/bin/env python
"""Ablation timing of the flagship forward: toggle pieces, diff the cost.

Times the full jitted forward (480x640, 12 hyps, V=1) under config
ablations with a device-side ``lax.fori_loop`` -- the differences
attribute wall time to each component *in situ* (including fusion
effects the per-component profiler can't see).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from multi_view_stereonet_tpu.models import (
        MultiViewStereoNetConfig, mvsnet_forward, init_mvsnet,
    )
    from multi_view_stereonet_tpu.train.pipeline import multi_view_unpack_batch
    from __graft_entry__ import _example_batch

    params = init_mvsnet(jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, _example_batch(B=args.batch, V=1,
                                                     H=480, W=640))

    def timeit(name, config):
        def step(params, batch, t):
            inputs = multi_view_unpack_batch(batch)
            left = inputs["left_image_pyr"]
            left = [left[0] + t] + list(left[1:])
            out = mvsnet_forward(params, left, inputs["K_pyr"],
                                 inputs["T_right_in_left"],
                                 inputs["right_image_pyr"], config)
            return jnp.sum(out["left_idepthmap_pyr"][0]) * 1e-12

        def loop():
            def body(i, acc):
                return acc + step(params, batch, i.astype(jnp.float32) * 1e-9)
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0.0))

        fn = jax.jit(loop)
        jax.block_until_ready(fn())
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            times.append(time.perf_counter() - t0)
        ms = min(times) / args.iters * 1000.0
        print(f"{name:56s} {ms:8.3f} ms/iter", flush=True)
        return ms

    base = dict(compute_dtype=args.dtype)
    C = MultiViewStereoNetConfig
    full = timeit("full forward", C(**base))
    for lvl in range(5):
        refs = tuple(i != lvl for i in range(5))
        ms = timeit(f"  - refiner{lvl} off", C(do_refiners=refs, **base))
        print(f"    -> refiner{lvl} ~ {full - ms:6.3f} ms")
    ms = timeit("  - cost filter off", C(do_cost_volume_filter=False, **base))
    print(f"    -> cost filter ~ {full - ms:6.3f} ms")
    ms = timeit("  - D=2 (vs 12)", C(num_idepth_samples=2, **base))
    print(f"    -> 10 incremental steps ~ {full - ms:6.3f} ms")
    timeit("  - no s2d refiners", C(use_s2d_refiners=False, **base))
    # s2d frontend defaults OFF -- ablate by turning it ON.
    timeit("  + s2d frontend", C(use_s2d_frontend=True, **base))
    timeit("  - no s2d cost filter", C(use_s2d_cost_filter=False, **base))
    timeit("  - no fused incremental chain",
           C(use_fused_incremental=False, **base))


if __name__ == "__main__":
    main()
