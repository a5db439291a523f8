#!/usr/bin/env python
"""Extended benchmarks beyond bench.py's headline: training step,
multi-view (V=5), and strict-parity (matmul_precision=highest) timings.

Device-side loop timing like bench.py (amortizes the ~25 ms relay
dispatch overhead). Prints one line per config.
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
    from multi_view_stereonet_tpu.losses import LossConfig
    from multi_view_stereonet_tpu.train.pipeline import multi_view_unpack_batch
    from multi_view_stereonet_tpu.train.step import (
        OptimizerConfig, make_optimizer, make_train_step,
    )
    from __graft_entry__ import _example_batch

    params = init_mvsnet(jax.random.PRNGKey(0))

    def timed(label, loop_fn, n_units, iters):
        out = loop_fn()  # compile + warm
        jax.block_until_ready(out)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(loop_fn())
            times.append(time.perf_counter() - t0)
        ms = min(times) / iters * 1000.0
        print(f"{label:54s} {ms:8.2f} ms ({n_units / (ms / 1000.0):.1f}/s)",
              flush=True)

    # ---- forward configs ----
    def forward_loop(B, V, config, iters):
        batch = {k: jnp.asarray(v) for k, v in _example_batch(B, V, 480, 640).items()}

        @jax.jit
        def loop():
            def body(i, acc):
                b = dict(batch)
                b["left_image"] = batch["left_image"] + i.astype(jnp.float32) * 1e-12
                inputs = multi_view_unpack_batch(b)
                out = mvsnet_forward(
                    params, inputs["left_image_pyr"], inputs["K_pyr"],
                    inputs["T_right_in_left"], inputs["right_image_pyr"], config)
                return acc + jnp.sum(out["left_idepthmap_pyr"][0])
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return loop

    timed("V=5 multi-view forward, batch 1, f32",
          forward_loop(1, 5, MultiViewStereoNetConfig(), 100), 1, 100)
    timed("strict parity (matmul_precision=highest), batch 1",
          forward_loop(1, 1, MultiViewStereoNetConfig(
              matmul_precision="highest"), 100), 1, 100)

    # ---- training step (full recipe: B=8, supervised) ----
    tx = make_optimizer(OptimizerConfig())
    opt_state = tx.init(params)
    step = make_train_step(MultiViewStereoNetConfig(), LossConfig(), tx)
    batch = {k: jnp.asarray(v) for k, v in _example_batch(8, 1, 480, 640).items()}

    @jax.jit
    def train_loop(params, opt_state, batch):
        def body(i, carry):
            p, s, acc = carry
            b = dict(batch)
            b["left_image"] = batch["left_image"] + i.astype(jnp.float32) * 1e-12
            p, s, loss, _ = step(p, s, b)
            return (p, s, acc + loss)
        return jax.lax.fori_loop(0, 30, body, (params, opt_state, jnp.float32(0.0)))

    timed("train step (B=8, 150-epoch recipe)",
          lambda: train_loop(params, opt_state, batch)[2], 8, 30)

    # ---- deployment artifact (jax.export): export on this host, load in
    # a fresh process, compare against the live jitted serving fn.
    # Delegates to scripts/bench_export.py (VERDICT r3 #7); skippable for
    # quick runs with --no-export since the fresh process pays one
    # compile (cached after the first run).
    if "--no-export" not in sys.argv:
        import subprocess
        try:
            proc = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(__file__), "bench_export.py")],
                capture_output=True, text=True, timeout=1800)
            rows = [l for l in proc.stdout.splitlines()
                    if l.startswith("EXPORT_BENCH ")]
        except subprocess.TimeoutExpired:
            # A relay hang should cost the export row, not the whole bench.
            proc, rows = None, []
        if rows:
            import json
            r = json.loads(rows[0][len("EXPORT_BENCH "):])
            print(f"{'export artifact (fresh proc) vs live serving fn':54s} "
                  f"{r['ms_per_frame']:8.2f} ms "
                  f"(live {r['live_ms_per_frame']:.2f}, "
                  f"{r['export_vs_live_pct']:+.1f}%, "
                  f"max|diff| {r['max_abs_diff_vs_live']:g})", flush=True)
            u8_rows = [l for l in proc.stdout.splitlines()
                       if l.startswith("EXPORT_BENCH_U8 ")]
            if u8_rows:
                r = json.loads(u8_rows[0][len("EXPORT_BENCH_U8 "):])
                print(f"{'export b24/u8/f16 contract vs live streaming':54s} "
                      f"{r['ms_per_frame']:8.2f} ms/img "
                      f"(live {r['live_ms_per_frame']:.2f}, "
                      f"{r['export_vs_live_pct']:+.1f}%, "
                      f"bit_identical={r.get('bit_identical_vs_live')})",
                      flush=True)
        else:
            reason = ("timeout after 1800 s" if proc is None else
                      (proc.stderr.strip().splitlines()[-1][:200]
                       if proc.stderr.strip() else f"rc={proc.returncode}"))
            print("export row FAILED: " + reason, flush=True)


if __name__ == "__main__":
    main()
