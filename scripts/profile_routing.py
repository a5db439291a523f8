#!/usr/bin/env python
"""A/B the routing toggles (s2d frontend, fused incremental chain) in situ.

Interleaved measurement rounds in one process so host contention hits all
configs equally; per-config result is the min over rounds of the
device-loop time. Use this before flipping a routing default.
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

    from multi_view_stereonet_tpu.models import (
        MultiViewStereoNetConfig, mvsnet_forward, init_mvsnet,
    )
    from multi_view_stereonet_tpu.train.pipeline import multi_view_unpack_batch
    from __graft_entry__ import _example_batch

    iters = int(os.environ.get("ITERS", 100))
    B = int(os.environ.get("BATCH", 1))

    params = init_mvsnet(jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, _example_batch(B=B, V=1, H=480, W=640))

    configs = {
        "frontend=off chain=fused": MultiViewStereoNetConfig(),
        "frontend=on  chain=fused": MultiViewStereoNetConfig(
            use_s2d_frontend=True),
        "frontend=off chain=scan": MultiViewStereoNetConfig(
            use_fused_incremental=False),
        "frontend=on  chain=scan": MultiViewStereoNetConfig(
            use_s2d_frontend=True, use_fused_incremental=False),
    }

    loops = {}
    for name, config in configs.items():
        def step(params, batch, t, config=config):
            inputs = multi_view_unpack_batch(batch)
            left = inputs["left_image_pyr"]
            left = [left[0] + t] + list(left[1:])
            out = mvsnet_forward(params, left, inputs["K_pyr"],
                                 inputs["T_right_in_left"],
                                 inputs["right_image_pyr"], config)
            return jnp.sum(out["left_idepthmap_pyr"][0]) * 1e-12

        def loop(params, batch, step=step):
            def body(i, acc):
                return acc + step(params, batch,
                                  i.astype(jnp.float32) * 1e-9)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        loops[name] = jax.jit(loop)
        float(loops[name](params, batch))  # compile + warm
        print(f"compiled {name}", flush=True)

    best = {name: float("inf") for name in configs}
    for round_i in range(5):
        for name in configs:
            t0 = time.perf_counter()
            float(loops[name](params, batch))
            dt = (time.perf_counter() - t0) / iters * 1000.0
            best[name] = min(best[name], dt)
    for name, ms in best.items():
        print(f"{name:28s} {ms:7.3f} ms/frame ({B * 1000.0 / ms:6.1f} dm/s)",
              flush=True)


if __name__ == "__main__":
    main()
