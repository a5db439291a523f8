#!/usr/bin/env python
"""In-situ A/B of the warp kernel's compute-window variants (dev tooling).

Whole-forward device loops, interleaved rounds, min-of-N -- the same
methodology as scripts/profile_routing.py. Variants force a dispatch
branch by masking the band-fit predicates that _resample_value switches
on (all four kernels still compile per variant; only the selected branch
executes):

  half    per-64-col-half rotates, 128-lane windows (measured LOSING
          2026-08-18: 4.178 vs narrow 3.835 ms -- off by default)
  narrow  full-tile rotate, 256-lane window (the default)
  wide    rotate-free full 384-lane band (the round-1 kernel)
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

    orig_bases = wk._band_bases
    orig_half_flag = wk.USE_SPLIT_HALVES
    # The half branch is gated off by default; enable it so the "half"
    # variant actually dispatches to the split-halves kernel.
    wk.USE_SPLIT_HALVES = True

    def masked_bases(kill_half, kill_narrow):
        def bases(ix, iy, H, W):
            yb, xb, xo, xo2, fits, fitsn, fitsh = orig_bases(ix, iy, H, W)
            false = fits & (~fits)
            if kill_half:
                fitsh = false
            if kill_narrow:
                fitsn = false
            return yb, xb, xo, xo2, fits, fitsn, fitsh
        return bases

    variants = {
        "half": masked_bases(False, False),
        "narrow": masked_bases(True, False),
        "wide": masked_bases(True, True),
    }

    loops, outs = {}, {}
    try:
        for name, bases in variants.items():
            wk._band_bases = bases  # read at trace time by _resample_value

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
        # A killed/failed compile must not leave the module-globals patched.
        wk._band_bases = orig_bases
        wk.USE_SPLIT_HALVES = orig_half_flag

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
