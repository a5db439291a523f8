#!/usr/bin/env python
"""In-situ A/B of the d2s output emission: reshape pair vs dirac conv.

Whole-forward device loops, interleaved rounds, min-of-N -- the same
methodology as scripts/profile_warp_insitu.py. "reshape" is the default
(reshape/moveaxis pair, which XLA lowers with a relayout copy at the
refiner outputs, ~0.11 ms/frame at 480x640 f32 -- docs/ROOFLINE.md);
"conv" monkeypatches depth_to_space with the lhs-dilated dirac-kernel
conv (exact, tests/test_fast_paths.py) at trace time in both consuming
modules (s2d refiner outputs + cost-volume filter).
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
    from multi_view_stereonet_tpu.models import s2d
    from multi_view_stereonet_tpu.train.pipeline import multi_view_unpack_batch
    from __graft_entry__ import _example_batch

    iters = int(os.environ.get("ITERS", 200))
    B = int(os.environ.get("BATCH", 1))
    V = int(os.environ.get("VIEWS", 1))

    params = init_mvsnet(jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, _example_batch(B=B, V=V, H=480, W=640))
    config = MultiViewStereoNetConfig()

    orig = s2d.depth_to_space
    variants = {"reshape": orig, "conv": s2d.depth_to_space_conv}

    loops, outs = {}, {}
    try:
        for name, fn in variants.items():
            # Covers every call site: the refiner emissions call the
            # module global, and cost_volume's function-local import
            # resolves s2d.depth_to_space at trace time.
            s2d.depth_to_space = fn

            def step(params, batch, t):
                inputs = multi_view_unpack_batch(batch)
                left = inputs["left_image_pyr"]
                left = [left[0] + t] + list(left[1:])
                right = inputs["right_image_pyr"]
                right = [right[0] + t] + list(right[1:])
                out = mvsnet_forward(params, left, inputs["K_pyr"],
                                     inputs["T_right_in_left"],
                                     right, config)
                return jnp.sum(out["left_idepthmap_pyr"][0])

            def loop(params, batch):
                def body(i, acc):
                    return acc + step(params, batch,
                                      i.astype(jnp.float32) * 1e-9) * 1e-12
                return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

            loops[name] = jax.jit(loop).lower(params, batch).compile()
            outs[name] = float(jax.jit(step)(params, batch, jnp.float32(0.0)))
            print(f"compiled {name}", flush=True)
    finally:
        s2d.depth_to_space = orig

    print("value check: " + " ".join(
        f"{k}={v:.6f}" for k, v in outs.items()), flush=True)

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
