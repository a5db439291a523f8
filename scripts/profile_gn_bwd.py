#!/usr/bin/env python
"""Micro go/no-go for a Pallas GN-backward reduce kernel (dev tooling).

The train-step trace shows the GN backward's fused mul+reduce over
bf16[8,240,320,128] (per-lane sums of dy and dy*x, all in one fusion)
running at ~1.3 ms -- ~3.4x the 0.38 ms HBM floor. Before wiring a
custom VJP, measure standalone at default layouts:

  xla      one fused pass: s_dy = sum(dy), s_dyx = sum(dy*x) over spatial
  pallas   same outputs from a Pallas kernel (grid over batch x H tiles,
           f32 accumulators in VMEM)

If Pallas cannot beat XLA here (both at default layouts), the in-situ
case (where the inputs live at batch-in-sublanes layouts and pallas_call
would force relayout copies) is hopeless and the idea dies cheap.
"""

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, L = 8, 240, 320, 128
    TH = 40  # rows per grid step; tile = (TH, W, L) bf16 = 3.3 MB x2 inputs
    iters = int(os.environ.get("ITERS", 50))

    key = jax.random.PRNGKey(0)
    dy = jax.random.normal(key, (B, H, W, L), jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, L), jnp.bfloat16)

    def xla_sums(dy, x):
        dyf = dy.astype(jnp.float32)
        return (jnp.sum(dyf, axis=(1, 2)),
                jnp.sum(dyf * x.astype(jnp.float32), axis=(1, 2)))

    def kernel(dy_ref, x_ref, s_dy_ref, s_dyx_ref):
        b = pl.program_id(0)
        h = pl.program_id(1)
        dyf = dy_ref[...].astype(jnp.float32)
        xf = x_ref[...].astype(jnp.float32)
        part_dy = jnp.sum(dyf, axis=(0, 1, 2))        # (L,)
        part_dyx = jnp.sum(dyf * xf, axis=(0, 1, 2))  # (L,)

        @pl.when((b == 0) & (h == 0))
        def _init():
            s_dy_ref[...] = jnp.zeros_like(s_dy_ref)
            s_dyx_ref[...] = jnp.zeros_like(s_dyx_ref)

        row = (jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0) == b)
        s_dy_ref[...] += jnp.where(row, part_dy[None], 0.0)
        s_dyx_ref[...] += jnp.where(row, part_dyx[None], 0.0)

    @jax.jit
    def pallas_sums(dy, x):
        grid = (B, H // TH)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, TH, W, L), lambda b, h: (b, h, 0, 0)),
                pl.BlockSpec((1, TH, W, L), lambda b, h: (b, h, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((B, L), lambda b, h: (0, 0)),
                pl.BlockSpec((B, L), lambda b, h: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, L), jnp.float32),
                jax.ShapeDtypeStruct((B, L), jnp.float32),
            ],
        )(dy, x)

    # correctness
    ref = jax.jit(xla_sums)(dy, x)
    got = pallas_sums(dy, x)
    for r, g in zip(ref, got):
        err = float(jnp.max(jnp.abs(r - g)) / (jnp.max(jnp.abs(r)) + 1e-9))
        print(f"rel err {err:.2e}")
        assert err < 1e-5

    def bench(fn, name):
        def loop(dy, x):
            def body(i, acc):
                s1, s2 = fn(dy + (acc * jnp.bfloat16(1e-12)), x)
                return (acc + jnp.sum(s1) * 1e-20).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, iters, body, jnp.bfloat16(0.0))

        jl = jax.jit(loop)
        float(jl(dy, x))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(jl(dy, x))
            best = min(best, (time.perf_counter() - t0) / iters * 1000.0)
        floor = (2 * B * H * W * L * 2) / 819e9 * 1e3
        print(f"{name:8s} {best:6.3f} ms  (HBM floor ~{floor:.3f} ms)",
              flush=True)

    bench(jax.jit(xla_sums), "xla")
    bench(pallas_sums, "pallas")


if __name__ == "__main__":
    main()
