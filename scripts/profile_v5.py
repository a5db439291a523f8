#!/usr/bin/env python
"""In-situ A/B of the V=5 (5-comparison-view) forward's routing toggles.

The V=5 trace (scripts/profile_trace.py --views 5, 2026-08-19) shows the
warp-output relayout copy growing SUPERLINEARLY with V (0.058 ms at V=1
-> 0.556 ms at V=5, bf16[5,480,640,3] {3,2,1,0}->{2,1,3,0}): the folded
left+right extractor concatenates a (1,...) left batch with the (5,...)
warped-right batch, and GSPMD-free XLA still has to reconcile their
layouts at the concat. ``fold_extractor_batch=False`` runs two extractor
calls instead and skips the concat -- it lost 0.5 ms at V=1 (two
dispatches of underfilled convs) but may win at V=5 where the relayout
is 10x bigger. Same interleaved-device-loop methodology as
profile_routing.py (min over rounds; host contention hits all configs
equally). Also re-checks the fused incremental chain at V=5 (its V=1
verdict was a 1-3% loss; the scan batch is 6x wider here).

Usage: ITERS=60 python scripts/profile_v5.py
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

    iters = int(os.environ.get("ITERS", 60))
    V = int(os.environ.get("VIEWS", 5))

    params = init_mvsnet(jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, _example_batch(B=1, V=V, H=480, W=640))

    configs = {
        "fold=on  chain=scan (default)": MultiViewStereoNetConfig(),
        "fold=off chain=scan": MultiViewStereoNetConfig(
            fold_extractor_batch=False),
        "fold=on  chain=fused": MultiViewStereoNetConfig(
            use_fused_incremental=True),
        "fold=off chain=fused": MultiViewStereoNetConfig(
            fold_extractor_batch=False, use_fused_incremental=True),
    }

    loops = {}
    for name, config in configs.items():
        def step(params, batch, t, config=config):
            inputs = multi_view_unpack_batch(batch)
            left = inputs["left_image_pyr"]
            left = [left[0] + t] + list(left[1:])
            right = [r + t for r in inputs["right_image_pyr"]]
            out = mvsnet_forward(params, left, inputs["K_pyr"],
                                 inputs["T_right_in_left"], right, config)
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
    for _ in range(6):
        for name in configs:
            t0 = time.perf_counter()
            float(loops[name](params, batch))
            dt = (time.perf_counter() - t0) / iters * 1000.0
            best[name] = min(best[name], dt)
    for name, ms in best.items():
        print(f"{name:32s} {ms:7.3f} ms/frame ({1000.0 / ms:6.1f} dm/s)",
              flush=True)


if __name__ == "__main__":
    main()
