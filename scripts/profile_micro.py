#!/usr/bin/env python
"""Micro-benchmarks for small-op formulation questions (device-side loops).

Run on TPU to settle: pyramid downsample variants, 2x bilinear upsample
variants, create_idepth_samples. Each prints ms per call.
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

    def timed(label, fn, x, iters=200):
        @jax.jit
        def loop(x):
            # abs() blocks algebraic collapse of linear fns under the sum;
            # the acc-dependent input serializes iterations for real.
            def body(i, acc):
                r = fn(x + acc * jnp.asarray(1e-30, x.dtype))
                return acc + jnp.sum(jnp.abs(r)).astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        float(loop(x))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(loop(x))
            times.append(time.perf_counter() - t0)
        print(f"{label:52s} {min(times) / iters * 1000.0:8.4f} ms", flush=True)

    from multi_view_stereonet_tpu.ops.resize import (
        _apply_separable, _area_matrix, _bilinear_matrix)

    def _down2_dim(x, d):  # stride-2 slice variant (measured: loses)
        a = jax.lax.slice_in_dim(x, 0, None, stride=2, axis=d)
        b = jax.lax.slice_in_dim(x, 1, None, stride=2, axis=d)
        return (a + b) * jnp.asarray(0.5, x.dtype)

    def _up2_dim(x, d):  # two-tap interleave variant (measured: loses)
        n = x.shape[d]
        lo = jax.lax.slice_in_dim(x, 0, n - 1, axis=d)
        hi = jax.lax.slice_in_dim(x, 1, n, axis=d)
        q, t = jnp.asarray(0.25, x.dtype), jnp.asarray(0.75, x.dtype)
        even = jnp.concatenate(
            [jax.lax.slice_in_dim(x, 0, 1, axis=d), q * lo + t * hi], axis=d)
        odd = jnp.concatenate(
            [t * lo + q * hi, jax.lax.slice_in_dim(x, n - 1, n, axis=d)],
            axis=d)
        out = jnp.stack([even, odd], axis=d + 1)
        return out.reshape(x.shape[:d] + (2 * n,) + x.shape[d + 1:])

    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (2, 480, 640, 3))

    def pyr_einsum(x):
        out = []
        cur = x
        for _ in range(4):
            h, w = cur.shape[1] // 2, cur.shape[2] // 2
            cur = _apply_separable(cur, _area_matrix(h, cur.shape[1]),
                                   _area_matrix(w, cur.shape[2]))
            out.append(cur)
        return sum(jnp.sum(jnp.abs(o)) for o in out) * jnp.ones(())

    def pyr_slice(x):
        out = []
        cur = x
        for _ in range(4):
            cur = _down2_dim(_down2_dim(cur, 1), 2)
            out.append(cur)
        return sum(jnp.sum(jnp.abs(o)) for o in out) * jnp.ones(())

    def pyr_window(x):
        out = []
        cur = x
        for _ in range(4):
            s = jax.lax.reduce_window(
                cur, jnp.asarray(0.0, cur.dtype), jax.lax.add,
                (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            cur = s * jnp.asarray(0.25, cur.dtype)
            out.append(cur)
        return sum(jnp.sum(jnp.abs(o)) for o in out) * jnp.ones(())

    def pyr_reshape(x):
        out = []
        cur = x
        for _ in range(4):
            B, H, W, C = cur.shape
            r = cur.reshape(B, H // 2, 2, W // 2, 2, C)
            cur = (r[:, :, 0] + r[:, :, 1])
            cur = (cur[:, :, :, 0] + cur[:, :, :, 1]) * jnp.asarray(
                0.25, x.dtype)
            out.append(cur)
        return sum(jnp.sum(jnp.abs(o)) for o in out) * jnp.ones(())

    timed("pyramid 4-level einsum-highest", pyr_einsum, img)
    timed("pyramid 4-level stride-slice", pyr_slice, img)
    timed("pyramid 4-level reduce_window", pyr_window, img)
    timed("pyramid 4-level reshape-add", pyr_reshape, img)

    prior = jax.random.normal(key, (1, 240, 320))

    def up_einsum(x):
        return _apply_separable(x, _bilinear_matrix(480, 240),
                                _bilinear_matrix(640, 320))

    def up_elem(x):
        return _up2_dim(_up2_dim(x, 1), 2)

    timed("bilinear up2 240x320->480x640 einsum", up_einsum, prior)
    timed("bilinear up2 240x320->480x640 elementwise", up_elem, prior)

    from multi_view_stereonet_tpu.geometry.sampling import create_idepth_samples
    T = jnp.tile(jnp.eye(4)[None], (1, 1, 1)).at[0, 0, 3].set(1.0)
    K = jnp.asarray([[[60., 0, 20, 0], [0, 60., 15, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]]])

    def samples(t):
        return create_idepth_samples(t, K, 30, 40, 12)

    timed("create_idepth_samples (30x40, D=12)", samples, T)


if __name__ == "__main__":
    main()
