#!/usr/bin/env python
"""Exercise the jax.export serving artifact on the real TPU.

The artifact is backend-specialized by design (checkpoint/export.py
routing note), and until round 4 it only had CPU round-trip coverage
(tests/test_export.py). This script is the actual deployment path: it
exports the flagship serving function ON the TPU host at the serving
shape, loads the artifact in a FRESH process (no model source state),
verifies outputs against the live jitted forward, and times both with
the same device-side loop methodology as bench.py. Reference analog:
``torch.jit.load`` serving, /root/reference/test.py:307-316.

Usage: python scripts/bench_export.py           (export + fresh serve)
       python scripts/bench_export.py --serve <artifact> <data.npz>
"""

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ITERS = 200


def _configure_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _loop_time(fn, args, iters=ITERS):
    """min-of-3 device-side fori_loop ms/call (bench.py methodology):
    perturb the left image with the loop index so no iteration is
    loop-invariant, one dispatch covers all iterations. u8 inputs are
    perturbed by +/-(i & 1) (wrapping), f32 by i*1e-12."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(left, rights, K, T):
        def body(i, acc):
            if left.dtype == jnp.uint8:
                eps = (i & 1).astype(jnp.uint8)
            else:
                eps = i.astype(jnp.float32) * 1e-12
            out = fn(left + eps, rights + eps, K, T)
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(*args))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / iters * 1000.0


def serve(artifact_path, data_path):
    import numpy as np

    jax = _configure_jax()

    from multi_view_stereonet_tpu.checkpoint.export import load_exported

    data = np.load(data_path)
    args = tuple(data[k] for k in ("left", "rights", "K", "T"))
    B = int(args[0].shape[0])
    exported = load_exported(artifact_path)
    out = np.asarray(exported.call(*args))
    live = data["live_out"]
    bit_identical = (out.dtype == live.dtype
                     and np.array_equal(out.view(np.uint8),
                                        live.view(np.uint8)))
    max_abs = float(np.abs(out.astype(np.float32)
                           - live.astype(np.float32)).max())
    rng = float(live.astype(np.float32).max()
                - live.astype(np.float32).min())
    ms = _loop_time(exported.call, args, iters=ITERS if B == 1 else 60)
    print("EXPORT_SERVE " + json.dumps({
        "ms_per_frame": round(ms / B, 3),
        "batch": B,
        "bit_identical_vs_live": bool(bit_identical),
        "max_abs_diff_vs_live": max_abs,
        "diff_pct_of_range": round(100.0 * max_abs / rng, 5),
        "platforms": list(exported.platforms),
        "device": str(jax.devices()[0]),
    }), flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--serve":
        serve(sys.argv[2], sys.argv[3])
        return

    import numpy as np

    jax = _configure_jax()

    from multi_view_stereonet_tpu.checkpoint.export import (
        export_inference, make_serving_fn, save_exported,
    )
    from multi_view_stereonet_tpu.checkpoint.native import load_any_params
    from multi_view_stereonet_tpu.models import (
        MultiViewStereoNetConfig, init_mvsnet,
    )
    from __graft_entry__ import _example_batch

    pretrained = ("/root/reference/pretrained/gta_sfm_150epochs/"
                  "checkpoints/epoch0149")
    params = (load_any_params(pretrained) if os.path.exists(pretrained)
              else init_mvsnet(jax.random.PRNGKey(0)))
    config = MultiViewStereoNetConfig()

    batch = _example_batch(B=1, V=1, H=480, W=640)
    args = (batch["left_image"], batch["right_images"], batch["K"],
            batch["T_right_in_left"])

    live_fn = jax.jit(make_serving_fn(params, config))
    live_out = np.asarray(live_fn(*args))
    live_ms = _loop_time(live_fn, args)
    print(f"live jitted forward: {live_ms:.3f} ms/frame "
          f"({1000.0 / live_ms:.1f} dm/s)", flush=True)

    workdir = tempfile.mkdtemp(prefix="export_bench_")
    artifact = os.path.join(workdir, "mvsnet.jaxexport")
    exported = export_inference(params, config)
    save_exported(exported, artifact)
    data_path = os.path.join(workdir, "data.npz")
    np.savez(data_path, left=args[0], rights=args[1], K=args[2], T=args[3],
             live_out=live_out)
    print(f"exported for platforms={list(exported.platforms)} "
          f"({os.path.getsize(artifact) / 1e6:.1f} MB); "
          "loading in a fresh process...", flush=True)

    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--serve", artifact,
         data_path],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=1800)
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr[-2000:])
    if proc.returncode != 0:
        raise SystemExit(f"fresh-process serve failed rc={proc.returncode}")
    line = [l for l in proc.stdout.splitlines()
            if l.startswith("EXPORT_SERVE ")][0]
    result = json.loads(line[len("EXPORT_SERVE "):])
    result["live_ms_per_frame"] = round(live_ms, 3)
    result["export_vs_live_pct"] = round(
        100.0 * (result["ms_per_frame"] - live_ms) / live_ms, 2)
    print("EXPORT_BENCH " + json.dumps(result), flush=True)

    # ---- production serving contract (VERDICT r4 #4): b24, u8 image
    # transport, f16 fetch -- the configuration README "Serving
    # transport flags" actually recommends. The live oracle is the REAL
    # StreamingRunner device path (StreamingRunner.forward with
    # transfer_u8 + f16 fetch), not a re-derivation, so bit-identity
    # here certifies the artifact serves exactly what the live pipeline
    # serves (they share one trace -- eval/streaming.serving_forward).
    from multi_view_stereonet_tpu.eval.streaming import StreamingRunner

    B, V, H, W = 24, 1, 480, 640
    rng = np.random.default_rng(0)
    pose = _example_batch(B=B, V=V, H=H, W=W)
    u8_args = (
        rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8),
        rng.integers(0, 256, (B, V, H, W, 3), dtype=np.uint8),
        pose["K"], pose["T_right_in_left"],
    )
    runner = StreamingRunner(params, config, fetch_dtype="float16",
                             transfer_u8=True)

    def live_u8(left, rights, K, T):
        return runner.forward(
            {"left_image": left, "right_images": rights, "K": K,
             "T_right_in_left": T})

    live_out_u8 = np.asarray(live_u8(*u8_args))
    live_ms_u8 = _loop_time(live_u8, u8_args, iters=60) / B
    print(f"live StreamingRunner u8/f16 path: {live_ms_u8:.3f} ms/img "
          f"(b{B}, {1000.0 / live_ms_u8:.1f} dm/s)", flush=True)

    artifact_u8 = os.path.join(workdir, "mvsnet_b24_u8_f16.jaxexport")
    exported_u8 = export_inference(params, config, batch_size=B, views=V,
                                   size=(H, W), input_u8=True,
                                   fetch_dtype="float16")
    save_exported(exported_u8, artifact_u8)
    data_u8 = os.path.join(workdir, "data_u8.npz")
    np.savez(data_u8, left=u8_args[0], rights=u8_args[1], K=u8_args[2],
             T=u8_args[3], live_out=live_out_u8)
    print(f"exported serving contract b{B}/u8/f16 for platforms="
          f"{list(exported_u8.platforms)} "
          f"({os.path.getsize(artifact_u8) / 1e6:.1f} MB); "
          "loading in a fresh process...", flush=True)

    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--serve", artifact_u8,
         data_u8],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=1800)
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr[-2000:])
    if proc.returncode != 0:
        raise SystemExit(
            f"fresh-process u8 serve failed rc={proc.returncode}")
    line = [l for l in proc.stdout.splitlines()
            if l.startswith("EXPORT_SERVE ")][0]
    result_u8 = json.loads(line[len("EXPORT_SERVE "):])
    result_u8["contract"] = "b24_u8_f16"
    result_u8["live_ms_per_frame"] = round(live_ms_u8, 3)
    result_u8["export_vs_live_pct"] = round(
        100.0 * (result_u8["ms_per_frame"] - live_ms_u8) / live_ms_u8, 2)
    print("EXPORT_BENCH_U8 " + json.dumps(result_u8), flush=True)


if __name__ == "__main__":
    main()
