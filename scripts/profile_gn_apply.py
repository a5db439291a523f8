#!/usr/bin/env python
"""In-situ A/B of the fused Pallas GN-apply+residual kernel at b8.

VERDICT r2 #6: one measured attack on the b8 GN-apply/residual kLoop
fusions (2 x ~0.9 ms at ~20% HBM bw, docs/ROOFLINE.md "b8-specific
overheads"). Whole-forward interleaved device loops (repo lore: never
trust standalone diffs); flag PALLAS_GN_APPLY toggled per traced config.

Usage: [BATCH=8 ITERS=60] python scripts/profile_gn_apply.py
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

    iters = int(os.environ.get("ITERS", 60))
    B = int(os.environ.get("BATCH", 8))

    params = init_mvsnet(jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, _example_batch(B=B, V=1, H=480, W=640))
    config = MultiViewStereoNetConfig()

    def make_loop():
        def step(params, batch, t):
            inputs = multi_view_unpack_batch(batch)
            left = inputs["left_image_pyr"]
            left = [left[0] + t] + list(left[1:])
            out = mvsnet_forward(params, left, inputs["K_pyr"],
                                 inputs["T_right_in_left"],
                                 inputs["right_image_pyr"], config)
            return jnp.sum(out["left_idepthmap_pyr"][0]) * 1e-12

        def loop(params, batch):
            def body(i, acc):
                return acc + step(params, batch,
                                  i.astype(jnp.float32) * 1e-9)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return jax.jit(loop)

    loops, outs = {}, {}
    for name, flag in (("xla_gn_apply", False), ("pallas_gn_apply", True)):
        s2d.PALLAS_GN_APPLY = flag  # read at trace time
        loops[name] = make_loop()
        outs[name] = float(loops[name](params, batch))  # compile + warm
        print(f"compiled {name} (acc={outs[name]:.6f})", flush=True)
    s2d.PALLAS_GN_APPLY = False
    # Same math sanity: accumulated outputs agree to bf16-level noise.
    rel = abs(outs["pallas_gn_apply"] - outs["xla_gn_apply"]) / (
        abs(outs["xla_gn_apply"]) + 1e-12)
    print(f"output agreement: rel={rel:.2e}", flush=True)

    best = {name: float("inf") for name in loops}
    for _ in range(5):
        for name in loops:
            t0 = time.perf_counter()
            float(loops[name](params, batch))
            dt = (time.perf_counter() - t0) / iters * 1000.0
            best[name] = min(best[name], dt)
    for name, ms in best.items():
        print(f"{name:18s} {ms:7.3f} ms/step ({B * 1000.0 / ms:6.1f} dm/s)",
              flush=True)


if __name__ == "__main__":
    main()
