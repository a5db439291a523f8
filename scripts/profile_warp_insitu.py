#!/usr/bin/env python
"""In-situ A/B of the warp kernel's narrow-compute rotate (dev tooling).

Whole-forward device loops, interleaved rounds, min-of-N -- the same
methodology as scripts/profile_routing.py. "wide" monkeypatches
warp_kernel.COMP_KX to BAND_KX before tracing, which makes the narrow
dispatch branch compile the original full-band kernel (rotate disabled,
384-lane one-hot); "narrow" is the new default (256-lane compute after
the slack rotate).
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
    from multi_view_stereonet_tpu.ops.pallas import warp_kernel as wk
    from multi_view_stereonet_tpu.train.pipeline import multi_view_unpack_batch
    from __graft_entry__ import _example_batch

    iters = int(os.environ.get("ITERS", 200))
    B = int(os.environ.get("BATCH", 1))
    V = int(os.environ.get("VIEWS", 1))

    params = init_mvsnet(jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, _example_batch(B=B, V=V, H=480, W=640))
    config = MultiViewStereoNetConfig()

    narrow_kx = wk.COMP_KX
    variants = {"narrow": narrow_kx, "wide": wk.BAND_KX}

    loops, outs = {}, {}
    for name, kx in variants.items():
        wk.COMP_KX = kx  # read at trace time by _resample_value

        def step(params, batch, t):
            inputs = multi_view_unpack_batch(batch)
            left = inputs["left_image_pyr"]
            left = [left[0] + t] + list(left[1:])
            out = mvsnet_forward(params, left, inputs["K_pyr"],
                                 inputs["T_right_in_left"],
                                 inputs["right_image_pyr"], config)
            return jnp.sum(out["left_idepthmap_pyr"][0])

        def loop(params, batch):
            def body(i, acc):
                return acc + step(params, batch,
                                  i.astype(jnp.float32) * 1e-9) * 1e-12
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        loops[name] = jax.jit(loop).lower(params, batch).compile()
        outs[name] = float(jax.jit(step)(params, batch, jnp.float32(0.0)))
        print(f"compiled {name} (COMP_KX={kx})", flush=True)
    wk.COMP_KX = narrow_kx

    print(f"value check: narrow={outs['narrow']:.6f} wide={outs['wide']:.6f}",
          flush=True)

    best = {name: float("inf") for name in variants}
    for _ in range(6):
        for name in variants:
            t0 = time.perf_counter()
            float(loops[name](params, batch))
            dt = (time.perf_counter() - t0) / iters * 1000.0
            best[name] = min(best[name], dt)
    for name, ms in best.items():
        print(f"{name:8s} {ms:7.3f} ms/frame ({B * 1000.0 / ms:6.1f} dm/s)",
              flush=True)


if __name__ == "__main__":
    main()
