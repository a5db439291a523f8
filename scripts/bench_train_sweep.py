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

Usage: python scripts/bench_train_sweep.py [--batches 8 16 32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 16, 32])
    args = ap.parse_args()

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

    def measure(B, remat, storage):
        """img/s for one (batch, remat, storage) point; None on OOM."""
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
            float(loop(params, opt_state, batch))  # compile + warm
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(params, opt_state, batch))
                times.append(time.perf_counter() - t0)
            ms = min(times) / iters * 1000.0
            return B / (ms / 1000.0), ms
        except Exception as e:
            msg = str(e)
            if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg \
                    or "exceeds the limit" in msg or "OOM" in msg:
                return None, None
            raise

    results = {}
    for B in args.batches:
        for remat in (False, True):
            for storage in ("auto_bf16", "f32"):
                key = f"b{B}_remat{int(remat)}_{storage}"
                rate, ms = measure(B, remat, storage)
                if rate is None:
                    print(f"{key:28s} OOM", flush=True)
                    results[key] = "OOM"
                else:
                    print(f"{key:28s} {ms:8.2f} ms/step "
                          f"({rate:6.1f} img/s)", flush=True)
                    results[key] = round(rate, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
