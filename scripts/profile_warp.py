#!/usr/bin/env python
"""Break down the full-res homography warp's cost on TPU (dev tooling).

Times each stage of ops.warp.homography_warp_auto at 480x640x3 with a
device-side ``lax.fori_loop`` (host timing lies over the relay). Each
iteration perturbs the homography with the loop index so no stage is
loop-invariant.
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

    from multi_view_stereonet_tpu.ops.warp import (
        homography_grid, homography_warp_auto, _unnormalize_clamp)
    from multi_view_stereonet_tpu.ops.pallas.warp_kernel import (
        _band_bases, _pallas_resample)
    from multi_view_stereonet_tpu.geometry import (
        get_fronto_parallel_homography)

    B, H, W, C = 1, 480, 640, 3
    key = jax.random.PRNGKey(0)
    image = jax.random.uniform(key, (B, H, W, C), jnp.float32)
    # Realistic warp (see profile_floor.py): unit baseline, mid idepth.
    K = jnp.array([[[500.0, 0, 320], [0, 500, 240], [0, 0, 1]]], jnp.float32)
    T = jnp.eye(4, dtype=jnp.float32)[None].at[:, 0, 3].set(-1.0)
    Hm = get_fronto_parallel_homography(K, K, T, jnp.array([0.5], jnp.float32))

    iters = 100

    def timeit(name, body_fn):
        def loop():
            def body(i, acc):
                eps = i.astype(jnp.float32) * 1e-9
                out = body_fn(Hm + eps)
                return acc + jnp.sum(out) * 1e-12
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        fn = jax.jit(loop)
        jax.block_until_ready(fn())
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            times.append(time.perf_counter() - t0)
        ms = min(times) / iters * 1000.0
        print(f"{name:48s} {ms:8.3f} ms/iter", flush=True)
        return ms

    floor = timeit("noop (loop floor)", lambda Hm_: Hm_)

    timeit("homography_grid 480x640", lambda Hm_: homography_grid(Hm_, H, W))

    from multi_view_stereonet_tpu.ops.pallas.warp_kernel import (
        BAND_KX, COMP_KX, HALF_KX)

    def bases_only(Hm_):
        grid = homography_grid(Hm_, H, W)
        ix = _unnormalize_clamp(grid[..., 0], W)
        iy = _unnormalize_clamp(grid[..., 1], H)
        yb, xb, xo, xo2, fits, fitsn, fitsh = _band_bases(ix, iy, H, W)
        return (jnp.sum(yb) + jnp.sum(xb) + jnp.sum(xo) + jnp.sum(xo2)
                + fits.astype(jnp.int32) + fitsn.astype(jnp.int32)
                + fitsh.astype(jnp.int32))

    timeit("grid + band bases", bases_only)

    # Guard: every timed kernel variant must actually be valid for this
    # homography, else we'd time clipped (wrong-value) compute and the
    # numbers could drive a bad routing decision. Checked once -- the
    # loop's 1e-9 perturbation cannot move a tile span by a pixel.
    g0 = homography_grid(Hm, H, W)
    _, _, _, _, fits0, fitsn0, fitsh0 = _band_bases(
        _unnormalize_clamp(g0[..., 0], W), _unnormalize_clamp(g0[..., 1], H),
        H, W)
    assert bool(fits0) and bool(fitsn0) and bool(fitsh0), (
        "profile homography exceeds a kernel window; timings would be bogus")

    def kernel_only(Hm_, exact, comp_kx):
        grid = homography_grid(Hm_, H, W)
        ix = _unnormalize_clamp(grid[..., 0], W)
        iy = _unnormalize_clamp(grid[..., 1], H)
        yb, xb, xo, xo2, _, _, _ = _band_bases(ix, iy, H, W)
        if comp_kx == HALF_KX:
            return _pallas_resample(image, ix, iy, yb, xb, xo2, exact=exact,
                                    comp_kx=comp_kx, split_halves=True)
        return _pallas_resample(image, ix, iy, yb, xb, xo, exact=exact,
                                comp_kx=comp_kx)

    timeit("grid + bases + kernel(default, half)",
           lambda Hm_: kernel_only(Hm_, "default", HALF_KX))
    timeit("grid + bases + kernel(default, narrow)",
           lambda Hm_: kernel_only(Hm_, "default", COMP_KX))
    timeit("grid + bases + kernel(default, wide)",
           lambda Hm_: kernel_only(Hm_, "default", BAND_KX))
    timeit("grid + bases + kernel(highest, half)",
           lambda Hm_: kernel_only(Hm_, "highest", HALF_KX))
    timeit("grid + bases + kernel(highest, narrow)",
           lambda Hm_: kernel_only(Hm_, "highest", COMP_KX))
    timeit("grid + bases + kernel(highest, wide)",
           lambda Hm_: kernel_only(Hm_, "highest", BAND_KX))

    timeit("full homography_warp_auto (default)",
           lambda Hm_: homography_warp_auto(image, Hm_, zero_invalid=True,
                                            precision="default")[0])
    timeit("full homography_warp_auto (highest)",
           lambda Hm_: homography_warp_auto(image, Hm_, zero_invalid=True,
                                            precision="highest")[0])


if __name__ == "__main__":
    main()
