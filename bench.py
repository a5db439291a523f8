#!/usr/bin/env python
"""Flagship benchmark: MultiViewStereoNet inference throughput on TPU.

Measures the reference's headline workload (test.py eval config: 480x640,
12 idepth hypotheses, cost-volume filter + all 5 refiners, batch 1 --
BASELINE.md) end-to-end: pyramid build + K pyramid + full forward, with
pretrained weights when the reference checkpoint is mounted.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "depthmaps/sec", "vs_baseline": N}

vs_baseline divides by 24 depthmaps/sec -- the central estimate of a
measured derivation chain (BASELINE.md "Measured reference runtime"):
reference torch-CPU on this host = 1673 ms/frame with the reference's own
timer, projected to a 2020-era GPU via achieved-FLOP + launch-overhead
modeling => a 12-48 dm/s band, geometric mean 24. The north star is
>= 10x.
"""

import json
import os
import time

import numpy as np

# Central estimate of the reference's PyTorch-GPU speed, derived from a
# measurement on this host (BASELINE.md "Measured reference runtime"):
# torch-CPU 1673 ms/frame -> GPU band 12-48 dm/s, geometric mean 24.
REFERENCE_FPS_ESTIMATE = 24.0
PRETRAINED = ("/root/reference/pretrained/gta_sfm_150epochs/checkpoints/"
              "epoch0149/stereo_network.pt")


def main():
    # Watchdog: the axon TPU relay can hang device discovery/compiles
    # indefinitely after an outage (observed 2026-08-18). Emit an honest
    # error line instead of hanging the harness forever.
    import threading

    def _abort():
        print(json.dumps({
            "metric": "depthmaps/sec single v5e chip (480x640, 12 hyps, "
                      "batch 1)",
            "value": 0.0,
            "unit": "depthmaps/sec",
            "vs_baseline": 0.0,
            "error": "TPU unreachable: device init/compile exceeded 30 min "
                     "(relay hang)",
        }), flush=True)
        os._exit(3)

    watchdog = threading.Timer(1800.0, _abort)
    watchdog.daemon = True
    watchdog.start()

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

    if os.path.exists(PRETRAINED):
        from multi_view_stereonet_tpu.checkpoint import (
            load_torchscript_weights, convert_reference_state_dict,
        )
        params = convert_reference_state_dict(load_torchscript_weights(PRETRAINED))
    else:
        params = init_mvsnet(jax.random.PRNGKey(0))

    def make_forward(config):
        def forward(params, batch):
            inputs = multi_view_unpack_batch(batch)
            out = mvsnet_forward(
                params, inputs["left_image_pyr"], inputs["K_pyr"],
                inputs["T_right_in_left"], inputs["right_image_pyr"], config)
            return out["left_idepthmap_pyr"][0]
        return forward

    forward = make_forward(MultiViewStereoNetConfig())

    def measure(B, iters, V=1):
        """Device-side loop timing: one dispatch covers ``iters`` forwards
        (host-side async timing is unreliable through remoted TPU runtimes);
        the per-iteration input perturbation defeats loop-invariant
        hoisting. ``iters`` must be large enough to amortize the ~25 ms
        fixed dispatch+fetch round trip through the TPU relay (measured:
        the same loop costs 0.26 ms/iter at 100 iters but 0.026 ms/iter at
        1000), else per-frame time is overstated by ~25/iters ms."""
        batch = {k: jnp.asarray(v) for k, v in _example_batch(B, V, 480, 640).items()}

        @jax.jit
        def loop(params, batch):
            def body(i, acc):
                # Perturb BOTH sides: anything derived only from the right
                # images (pyramid resizes, x V views) would otherwise be
                # loop-invariant and hoistable out of the fori_loop.
                b = dict(batch)
                eps = i.astype(jnp.float32) * 1e-12
                b["left_image"] = batch["left_image"] + eps
                b["right_images"] = batch["right_images"] + eps
                return acc + jnp.sum(forward(params, b))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        float(loop(params, batch))  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(params, batch))
            times.append(time.perf_counter() - t0)
        return B * iters / min(times)

    fps_b1 = measure(1, 400)
    watchdog.cancel()  # device demonstrably alive; no false abort later
    fps_b8 = measure(8, 60)
    # Serving sweet spot: the b8->b32 sweep (2026-08-19) measured 338.6 /
    # 358.8 / 363.3 / 348.8 dm/s at b8/16/24/32 -- b24 peaks (+7% over
    # b8; HBM working-set pressure wins above that). 60 iters so the
    # ~25 ms relay round trip amortizes to <0.5% (20 iters biased ~2%).
    fps_b24 = measure(24, 60)
    fps_v5 = measure(1, 150, V=5)  # 5-comparison-view config (5cmp split)
    forward = make_forward(MultiViewStereoNetConfig(compute_dtype="bfloat16"))
    fps_b1_bf16 = measure(1, 400)
    fps_b8_bf16 = measure(8, 60)

    # Sustained end-to-end serving: disk -> native decode -> H2D ->
    # forward -> D2H readback through eval.streaming.StreamingRunner
    # (u8 input transfer + f16 fetch, b24), on a cached synthetic
    # 480x640 GTA-style tree. On THIS host the number is bound by the
    # axon relay's time-varying ~10-45 MB/s link, so the block also
    # records same-run link rates and a decomposition that transfers to
    # production hosts (docs/ROOFLINE.md "Serving end-to-end").
    # Optional -- never fails the bench.
    streaming = {}
    try:
        import sys as _sys

        repo = os.path.dirname(os.path.abspath(__file__))
        _sys.path.insert(0, os.path.join(repo, "tests"))
        _sys.path.insert(0, os.path.join(repo, "scripts"))

        from multi_view_stereonet_tpu.data import (
            BatchLoader, GTASfMMultiViewDataset, get_testing_transforms,
        )
        from multi_view_stereonet_tpu.eval.streaming import StreamingRunner
        from synthetic_data import make_gta_sfm_tree

        B, rows, cols = 24, 480, 640
        tag = f"/tmp/stream_bench_tree/{rows}x{cols}x24"
        split = os.path.join(tag, "gta_sfm_synth_test.txt")
        if not os.path.exists(split):
            os.makedirs(tag, exist_ok=True)
            make_gta_sfm_tree(tag, rows=rows, cols=cols, frames=24,
                              num_sequences=2, scene="plane")
        rep = os.path.join(tag, "bench_rep.txt")
        lines = [l for l in open(split) if l.strip()] * 5
        lines = lines[:len(lines) - len(lines) % B]
        with open(rep, "w") as f:
            f.writelines(lines)

        # Same-run link rates (they vary minute-to-minute on the relay).
        probe = np.random.rand(8 << 20).astype(np.float32)  # 32 MB
        h2d_t, d2h_t = [], []
        for _ in range(2):
            t0 = time.perf_counter()
            x = jax.device_put(probe)
            jax.block_until_ready(x)
            h2d_t.append(time.perf_counter() - t0)
            y = x + 1.0
            jax.block_until_ready(y)
            t0 = time.perf_counter()
            np.asarray(y)
            d2h_t.append(time.perf_counter() - t0)
        h2d_mbs, d2h_mbs = 32.0 / min(h2d_t), 32.0 / min(d2h_t)

        def make_ds():
            # u8_output: pixels stay uint8 straight from the native
            # decoder; the device replicates ToArray+Normalize bit-
            # exactly (eval/streaming.dequantize_images_u8).
            return GTASfMMultiViewDataset(
                os.path.join(tag, "data"), rep, 0,
                get_testing_transforms({"size": [rows, cols]},
                                       u8_output=True),
                shuffle=False, decode_backend="auto")

        loader = BatchLoader(make_ds(), B, shuffle=False, drop_last=True,
                             workers=4)
        n, t0 = 0, None
        for i, b in enumerate(loader):
            if i == 1:
                t0, n = time.perf_counter(), 0
            n += b["left_image"].shape[0]
        decode_rate = n / (time.perf_counter() - t0)

        runner = StreamingRunner(params, MultiViewStereoNetConfig(),
                                 fetch_dtype="float16", transfer_u8=True)
        n, t0, got = 0, None, 0
        for idepths, names in runner.run(make_ds(), batch_size=B, workers=4):
            got += 1
            if got == 2:
                t0, n = time.perf_counter(), 0
            n += len(names)
        sustained = n / (time.perf_counter() - t0)

        legs = {
            "link_h2d": B * rows * cols * 3 * 2 / (h2d_mbs * 1e6),
            "link_d2h": B * rows * cols * 2 / (d2h_mbs * 1e6),
            "device": B / fps_b24,
            "host_decode": B / decode_rate,
        }
        streaming = {
            "streaming_e2e": {
                "sustained_dmps": round(sustained, 1),
                "batch": B, "workers": 4,
                "transfer": "u8", "fetch": "f16",
                "bound_by": max(legs, key=legs.get),
                "link_h2d_MBps": round(h2d_mbs, 1),
                "link_d2h_MBps": round(d2h_mbs, 1),
                # Decode rate of the u8 serving pipeline (native decode,
                # pixels stay uint8, normalize on-device). The f32
                # eval-path pipeline decodes slower (~94 samples/s/core,
                # docs/ROOFLINE.md "Production decomposition") and is NOT
                # what this block measures.
                "host_decode_rate_u8": round(decode_rate, 1),
                # What the same pipeline does once the link is PCIe-class
                # (legs then: device vs host decode only).
                "production_bound_by": ("host_decode"
                                        if legs["host_decode"]
                                        > legs["device"] else "device"),
                "decode_cores_to_feed_device_u8": round(
                    fps_b24 / decode_rate, 1),
            }
        }

        # The relay tunnel's speed varies by session (10-50 MB/s), and
        # sustained_dmps tracks the same-run link probe ~linearly
        # (docs/ROOFLINE.md "tunnel attribution"), so a single-session
        # sample can land on a slow tunnel. Keep an append-only history
        # of (sustained, probe) samples and report the best observed --
        # the figure where the tunnel binds LEAST -- next to today's.
        hist_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_history", "streaming.jsonl")
        try:
            history = [json.loads(l) for l in open(hist_path)
                       if l.strip()] if os.path.exists(hist_path) else []
            entry = {
                "date": time.strftime("%Y-%m-%d"),
                "sustained_dmps": round(sustained, 1),
                "link_h2d_MBps": round(h2d_mbs, 1),
                "link_d2h_MBps": round(d2h_mbs, 1),
                "transfer": "u8", "fetch": "f16", "batch": B,
                "source": "bench.py",
            }
            history.append(entry)
            os.makedirs(os.path.dirname(hist_path), exist_ok=True)
            with open(hist_path, "a") as f:
                f.write(json.dumps(entry) + "\n")
            best = max(history, key=lambda h: h["sustained_dmps"])
            streaming["streaming_e2e"]["best_observed"] = {
                "sustained_dmps": best["sustained_dmps"],
                "link_h2d_MBps": best["link_h2d_MBps"],
                "date": best["date"],
                "sessions": len(history),
            }
        except Exception as e:  # pragma: no cover - history is optional
            streaming["streaming_e2e"]["history_error"] = str(e)[:120]
    except Exception as e:  # pragma: no cover - streaming row is optional
        streaming = {"streaming_error": str(e)[:200]}

    # Accuracy at the headline config: abs_rel on the LAYERED occlusion
    # scene (textured cards over a tilted background -- the hardest
    # synthetic protocol) with pretrained weights, vs the f32-exact mode.
    # Uses THE canonical protocol (scripts/accuracy_speed.canonical_batches,
    # seeded, 2 sequences x 3 samples) so this headline equals the
    # docs/PARITY.md ladder row exactly. Optional -- never fails the bench.
    accuracy = {}
    try:
        from accuracy_speed import abs_rel_over_batches, canonical_batches

        batches = canonical_batches(scene="layered")

        def abs_rel(config):
            fwd = jax.jit(make_forward(config))

            def run(b):
                jb = {k: jnp.asarray(v) for k, v in b.items()}
                inputs = multi_view_unpack_batch(jb)
                return np.asarray(fwd(params, jb)) / np.asarray(
                    inputs["baseline"])[:, None, None]

            return abs_rel_over_batches(run, batches)

        r_default = abs_rel(MultiViewStereoNetConfig())
        r_exact = abs_rel(MultiViewStereoNetConfig(
            matmul_precision="highest"))
        accuracy = {
            # r3+: the hardest synthetic protocol (textured cards over a
            # tilted background, real occlusion). NOT comparable to the
            # r1/r2 rows, which used the easy fronto-parallel plane
            # (abs_rel ~0.022), NOR to the r3 row (1 sequence x 2
            # samples of the same scene, abs_rel 0.19659 -- superseded
            # by the canonical 2x3 protocol); the delta vs f32-exact is
            # the comparable number.
            "accuracy_scene": "layered_occlusion",
            "accuracy_protocol": "canonical_2seq_x3",
            "abs_rel_headline": round(r_default, 5),
            "abs_rel_f32_exact": round(r_exact, 5),
            "abs_rel_delta_pct": round(
                100.0 * (r_default - r_exact) / max(r_exact, 1e-9), 3),
        }
    except Exception as e:  # pragma: no cover - accuracy row is optional
        accuracy = {"accuracy_error": str(e)[:200]}

    # Integrated training pipeline at recipe shape (the training analog
    # of streaming_e2e): the REAL train CLI -- BatchLoader feed (native
    # decode + augment, 4 workers) -> jitted step -> per-epoch validate
    # -> checkpoint -- on a cached synthetic 480x640 tree, reported as
    # sustained img/s with a bound-by decomposition
    # (scripts/bench_train_e2e.py; docs/ROOFLINE.md "Training
    # end-to-end"). Optional -- never fails the bench; costs ~8-20 min
    # on this host, so `--no-training` skips it for quick sanity runs
    # (same escape hatch bench_extended gives the export row).
    training = {}
    import sys as _sys2

    if "--no-training" in _sys2.argv:
        training = {"training_e2e": "skipped (--no-training)"}
    else:
        try:
            import subprocess

            repo = os.path.dirname(os.path.abspath(__file__))
            proc = subprocess.run(
                [_sys2.executable,
                 os.path.join(repo, "scripts", "bench_train_e2e.py"),
                 "--batch", "8", "--epochs", "4", "--transfer_u8"],
                capture_output=True, text=True, timeout=2400)
            lines = [l for l in proc.stdout.splitlines()
                     if l.startswith("TRAIN_E2E ")]
            if proc.returncode == 0 and lines:
                training = {"training_e2e": json.loads(lines[0][10:])}
                # Same tunnel-variance story as streaming: sustained
                # tracks the relay's minute-to-minute rate, so keep an
                # append-only sample history and surface the best
                # observed figure for this transport/batch next to
                # today's (the probe runs after the epochs and can miss
                # slow minutes inside them).
                try:
                    t = training["training_e2e"]
                    hist_path = os.path.join(repo, "bench_history",
                                             "training.jsonl")
                    history = [json.loads(l) for l in open(hist_path)
                               if l.strip()] \
                        if os.path.exists(hist_path) else []
                    entry = {
                        "date": time.strftime("%Y-%m-%d"),
                        "sustained_imgps": t["sustained_imgps"],
                        "link_h2d_MBps": t.get("link_h2d_MBps"),
                        "transfer": t.get("transfer"),
                        "batch": t.get("batch"),
                        "source": "bench.py",
                    }
                    history.append(entry)
                    os.makedirs(os.path.dirname(hist_path), exist_ok=True)
                    with open(hist_path, "a") as f:
                        f.write(json.dumps(entry) + "\n")
                    same = [h for h in history
                            if h.get("transfer") == t.get("transfer")
                            and h.get("batch") == t.get("batch")]
                    best = max(same, key=lambda h: h["sustained_imgps"])
                    t["best_observed"] = {
                        "sustained_imgps": best["sustained_imgps"],
                        "link_h2d_MBps": best["link_h2d_MBps"],
                        "date": best["date"],
                        "sessions": len(same),
                    }
                except Exception as e:  # pragma: no cover
                    training["training_e2e"]["history_error"] = str(e)[:120]
            else:
                tail = (proc.stderr.strip().splitlines() or ["?"])[-1][:160]
                training = {"training_error": f"rc={proc.returncode}: {tail}"}
        except Exception as e:  # pragma: no cover - training row is optional
            training = {"training_error": str(e)[:200]}

    result = {
        "metric": "depthmaps/sec single v5e chip (480x640, 12 hyps, batch 1)",
        "value": round(fps_b1, 1),
        "unit": "depthmaps/sec",
        "vs_baseline": round(fps_b1 / REFERENCE_FPS_ESTIMATE, 1),
        # Uncertainty band of the derived denominator (12-48 dm/s,
        # BASELINE.md): vs_baseline across the band.
        "vs_baseline_band": [round(fps_b1 / 48.0, 1), round(fps_b1 / 12.0, 1)],
        "batch8_throughput": round(fps_b8, 1),
        "batch24_throughput": round(fps_b24, 1),
        "multiview_v5_throughput": round(fps_v5, 1),
        "bf16_batch1": round(fps_b1_bf16, 1),
        "batch8_bf16_throughput": round(fps_b8_bf16, 1),
        "ms_per_frame_b1": round(1000.0 / fps_b1, 2),
        "device": str(jax.devices()[0]),
        "weights": "pretrained" if os.path.exists(PRETRAINED) else "random",
        **streaming,
        **accuracy,
        **training,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
