#!/usr/bin/env python
"""Training-throughput sweep: batch x remat_refiners x activation-storage
dtype on the real v5e chip.

``remat_refiners`` and the bf16 storage policy (refiner_dtype /
frontend_dtype "auto") exist FOR large per-chip batches; this measures
what they actually buy. Full 150-epoch-recipe train step (fwd + bwd +
Adam) at 480x640/D12/V=1, device-side fori_loop timing (bench.py
methodology), min of 3. Configs that fail to fit HBM are recorded as
OOM instead of aborting the sweep. Reference analog: the recipe
/root/reference/pretrained/gta_sfm_150epochs/params.yaml:14-19
(batch 8 per GPU x 4 GPUs).

Each point runs in its OWN subprocess with a timeout: the axon relay
can wedge a device call for tens of minutes after rapid client
turnover (CLAUDE.md), and point isolation means one hang costs one
retry, not the battery. A hung/OOM point is recorded as "HANG"/"OOM".

Usage: python scripts/bench_train_sweep.py [--batches 8 16 32]
       python scripts/bench_train_sweep.py --one B REMAT STORAGE
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_one(B, remat, storage):
    """img/s for one (batch, remat, storage) point, printed as one
    POINT json line; exits nonzero on failure."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from multi_view_stereonet_tpu.models import (
        MultiViewStereoNetConfig, init_mvsnet,
    )
    from multi_view_stereonet_tpu.losses import LossConfig
    from multi_view_stereonet_tpu.train.step import (
        OptimizerConfig, make_optimizer, make_train_step,
    )
    from __graft_entry__ import _example_batch

    params = init_mvsnet(jax.random.PRNGKey(0))
    tx = make_optimizer(OptimizerConfig())
    opt_state = tx.init(params)

    kw = {}
    if storage == "f32":
        kw = dict(refiner_dtype="float32", frontend_dtype="float32")
    config = MultiViewStereoNetConfig(remat_refiners=remat, **kw)
    step = make_train_step(config, LossConfig(), tx)
    batch = {k: jnp.asarray(v)
             for k, v in _example_batch(B, 1, 480, 640).items()}
    iters = max(8, 240 // B)

    @jax.jit
    def loop(params, opt_state, batch):
        def body(i, carry):
            p, s, acc = carry
            b = dict(batch)
            b["left_image"] = (batch["left_image"]
                               + i.astype(jnp.float32) * 1e-12)
            p, s, loss, _ = step(p, s, b)
            return (p, s, acc + loss)
        return jax.lax.fori_loop(
            0, iters, body, (params, opt_state, jnp.float32(0.0)))[2]

    try:
        print("compiled+warm in", flush=True)
        t0 = time.perf_counter()
        float(loop(params, opt_state, batch))  # compile + warm
        print(f"  {time.perf_counter() - t0:.1f} s", flush=True)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(params, opt_state, batch))
            times.append(time.perf_counter() - t0)
        ms = min(times) / iters * 1000.0
        print("POINT " + json.dumps(
            {"ms_per_step": round(ms, 2), "img_s": round(B / (ms / 1e3), 1)}),
            flush=True)
    except Exception as e:
        # Relay-side compile OOMs surface as "Ran out of memory in memory
        # space hbm" inside an INTERNAL remote_compile error, so match
        # case-insensitively and include that phrasing (b32/remat-off/f32
        # hit exactly this: 16.06G of 15.75G hbm).
        msg = str(e).lower()
        if "resource_exhausted" in msg or "out of memory" in msg \
                or "exceeds the limit" in msg \
                or re.search(r"\boom\b", msg) is not None:
            print("POINT " + json.dumps({"oom": True}), flush=True)
        else:
            raise


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--one", nargs=3, metavar=("B", "REMAT", "STORAGE"),
                    help="run a single point in-process (driver use)")
    ap.add_argument("--timeout", type=float, default=900.0,
                    help="per-point subprocess timeout (s)")
    args = ap.parse_args()

    if args.one:
        run_one(int(args.one[0]), bool(int(args.one[1])), args.one[2])
        return

    results = {}
    for B in args.batches:
        for remat in (False, True):
            for storage in ("auto_bf16", "f32"):
                key = f"b{B}_remat{int(remat)}_{storage}"
                point, status = None, "HANG"
                for attempt in range(2):
                    try:
                        proc = subprocess.run(
                            [sys.executable, os.path.abspath(__file__),
                             "--one", str(B), str(int(remat)), storage],
                            capture_output=True, text=True,
                            timeout=args.timeout)
                    except subprocess.TimeoutExpired:
                        print(f"{key:28s} HANG (attempt {attempt + 1})",
                              flush=True)
                        # Sleep after EVERY hang, including the final
                        # attempt: the killed subprocess leaves the chip
                        # in its post-kill recovery window (CLAUDE.md),
                        # and the NEXT grid point would otherwise launch
                        # straight into it and cascade into spurious
                        # HANG rows.
                        print("waiting for chip recovery", flush=True)
                        time.sleep(60.0)
                        continue
                    lines = [l for l in proc.stdout.splitlines()
                             if l.startswith("POINT ")]
                    if lines:
                        point = json.loads(lines[0][len("POINT "):])
                        break
                    err = (proc.stderr.strip().splitlines()[-1][:200]
                           if proc.stderr.strip() else "(no stderr)")
                    print(f"{key:28s} FAILED rc={proc.returncode}: {err}",
                          flush=True)
                    status = "FAIL"
                    break
                if point is None:
                    results[key] = status
                elif point.get("oom"):
                    print(f"{key:28s} OOM", flush=True)
                    results[key] = "OOM"
                else:
                    print(f"{key:28s} {point['ms_per_step']:8.2f} ms/step "
                          f"({point['img_s']:6.1f} img/s)", flush=True)
                    results[key] = point["img_s"]
    print(json.dumps(results))


if __name__ == "__main__":
    main()
