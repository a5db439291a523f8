#!/usr/bin/env python
"""Per-component TPU timing for the flagship forward (dev tooling).

Times each stage of the 480x640 / 12-hypothesis / V=1 eval config with a
device-side ``lax.fori_loop`` (host timing through the axon relay is
unreliable; see CLAUDE.md). Each loop iteration perturbs one input with
the loop index to defeat loop-invariant hoisting. Prints one line per
component: name, ms/iter.

Usage: python scripts/profile_components.py [--iters N] [--dtype bfloat16]
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
    ap.add_argument("--only", default=None, help="substring filter")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from multi_view_stereonet_tpu.models import (
        MultiViewStereoNetConfig, init_mvsnet,
    )
    from multi_view_stereonet_tpu.models.feature_network import feature_network
    from multi_view_stereonet_tpu.models.cost_volume import (
        cost_volume_filter, extract_idepthmap,
    )
    from multi_view_stereonet_tpu.models.s2d import idepthmap_refiner_s2d
    from multi_view_stereonet_tpu.models.mvsnet import incremental_right_features
    from multi_view_stereonet_tpu.ops import plane_sweep_warp, homography_warp
    from multi_view_stereonet_tpu.ops.warp import homography_warp_auto
    from multi_view_stereonet_tpu.train.pipeline import multi_view_unpack_batch
    from multi_view_stereonet_tpu.geometry import (
        create_idepth_samples, create_plane_sweep_homographies,
        incremental_homographies, normalize_baseline,
    )
    from __graft_entry__ import _example_batch

    B = args.batch
    H, W = 480, 640
    h4, w4 = H // 16, W // 16
    D = 12
    C = 32
    cdt = jnp.dtype(args.dtype)
    config = MultiViewStereoNetConfig(compute_dtype=args.dtype)

    key = jax.random.PRNGKey(0)
    params = init_mvsnet(key)
    batch = {k: jnp.asarray(v) for k, v in _example_batch(B, 1, H, W).items()}
    inputs = multi_view_unpack_batch(batch)

    T_bv, baseline = normalize_baseline(
        inputs["T_right_in_left"].reshape(B, 4, 4))
    K4 = inputs["K_pyr"][4]
    K0 = inputs["K_pyr"][0]
    right0 = inputs["right_image_pyr"][0].reshape(B, H, W, 3)
    right4 = inputs["right_image_pyr"][4].reshape(B, h4, w4, 3)
    samples = create_idepth_samples(T_bv, K4, h4, w4, D)
    H_fam = create_plane_sweep_homographies(T_bv, K4, samples)
    H_min = create_plane_sweep_homographies(T_bv, K0, samples[:, :1])[:, 0]
    H_inc = incremental_homographies(H_fam)
    feats4 = jnp.zeros((B, h4, w4, C), cdt)
    cost = jnp.abs(jax.random.normal(key, (B, D, h4, w4, C), cdt))
    guidance1 = jnp.zeros((B, H // 2, W // 2, C + 3), cdt)
    guidance0 = jnp.zeros((B, H, W, 3), cdt)
    idepth1 = jnp.ones((B, H // 2, W // 2), jnp.float32)
    idepth0 = jnp.ones((B, H, W), jnp.float32)
    img_vol = jnp.zeros((B, D, h4, w4, 3), cdt)

    wp = "default" if args.dtype == "bfloat16" else "highest"

    cases = {
        "unpack (pyramids + K pyramid)":
            lambda t: multi_view_unpack_batch(
                dict(batch, left_image=batch["left_image"] + t)
            )["left_image_pyr"][4],
        "feature_network 480x640":
            lambda t: feature_network(
                params["feature_network"],
                (inputs["left_image_pyr"][0] + t).astype(cdt))[-1],
        "big warp 480x640x3 (pallas)":
            lambda t: homography_warp_auto(
                right0 + t, H_min, zero_invalid=True, precision=wp)[0],
        "plane_sweep_warp L4 (D=12)":
            lambda t: plane_sweep_warp(right4 + t, H_fam)[0],
        "incremental chain (scan x11 warp+refine)":
            lambda t: _inc_chain(params, H_inc, img_vol, feats4 + t),
        "incremental_right_features (all)":
            lambda t: incremental_right_features(
                params, T_bv, K0, K4, right0 + t, right4, samples,
                compute_dtype=cdt, warp_precision=wp)[0],
        "cost_volume_filter":
            lambda t: cost_volume_filter(params["volume_filter4"], cost + t),
        "softargmin":
            lambda t: extract_idepthmap(
                jnp.sum(cost, -1).astype(jnp.float32) + t, samples),
        "idepth_samples":
            lambda t: create_idepth_samples(T_bv, K4 + t * 0, h4, w4, D),
        "refiner1 s2d 240x320":
            lambda t: idepthmap_refiner_s2d(
                params["refiner1"], guidance1, idepth1 + t, cdt),
        "refiner0 s2d 480x640":
            lambda t: idepthmap_refiner_s2d(
                params["refiner0"], guidance0, idepth0 + t, cdt),
    }

    def _inc_chain(params, H_inc, img_vol, feats0):
        from multi_view_stereonet_tpu.models.refiners import feature_refiner

        def step(feats_prev, xs):
            H_i, image_i = xs
            warped, invalid = homography_warp(feats_prev, H_i)
            warped = jnp.where(invalid[..., None],
                               jnp.zeros((), warped.dtype), warped)
            feats = feature_refiner(params["feature_refiner"],
                                    image_i.astype(warped.dtype), warped)
            return feats, ()
        xs = (jnp.moveaxis(H_inc, 0, 1), jnp.moveaxis(img_vol[:, 1:], 0, 1))
        out, _ = jax.lax.scan(step, feats0, xs)
        return out

    print(f"device={jax.devices()[0]}, dtype={args.dtype}, batch={B}, "
          f"iters={args.iters}", flush=True)

    for name, fn in cases.items():
        if args.only and args.only not in name:
            continue

        @jax.jit
        def loop(_fn=fn):
            def body(i, acc):
                out = _fn(i.astype(jnp.float32) * 1e-12)
                return acc + jnp.sum(out.astype(jnp.float32))
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0.0))

        try:
            float(loop())  # compile + warm
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop())
                times.append(time.perf_counter() - t0)
            ms = min(times) / args.iters * 1000.0
            print(f"{name:45s} {ms:8.3f} ms", flush=True)
        except Exception as e:  # keep profiling the rest
            print(f"{name:45s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
