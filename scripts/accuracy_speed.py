#!/usr/bin/env python
"""Accuracy-at-speed sweep: abs_rel (synthetic plane scene, pretrained
weights) AND device-side forward time per precision config, on the TPU.

North star (BASELINE.md): abs_rel within 1% of the reference at >= 10x
its throughput. The reference value is this script's "highest" row
(bit-parity with the torch reference). Stage overrides localize which
bf16 stage drives the deviation.

Usage: python scripts/accuracy_speed.py [config ...]
  (default: a curated ladder; names below)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PRETRAINED = "/root/reference/pretrained/gta_sfm_150epochs/checkpoints/epoch0149"

def canonical_batches(scene="layered", rows=480, cols=640, comparisons=1,
                      plane_normal=None):
    """THE canonical accuracy protocol, shared by this ladder and
    bench.py's headline accuracy row so both artifacts quote the same
    number for the same named scene.

    Seeded synthetic GTA-SfM tree (tests/synthetic_data.make_gta_sfm_tree,
    seed=0): 2 sequences x max(4, comparisons+2) frames -> 2 x 3 samples
    at comparisons=1; testing transforms at (rows, cols); ground truth
    loaded; BatchLoader batch_size=2 in split order, filenames popped.
    Returns a list of numpy batches.

    Reference analog: the eval protocol of test.py:41-71,166-186 (fixed
    split order, GTA depth mask 0-1000 applied by the abs_rel helper).
    """
    import tempfile

    from multi_view_stereonet_tpu.data import (
        GTASfMMultiViewDataset, BatchLoader, get_testing_transforms,
    )
    try:
        from tests.synthetic_data import make_gta_sfm_tree
    except ImportError:  # bench.py puts tests/ itself on sys.path
        from synthetic_data import make_gta_sfm_tree

    root = tempfile.mkdtemp(prefix="accproto_")
    data_dir, split = make_gta_sfm_tree(
        root, rows=rows, cols=cols, frames=max(4, comparisons + 2),
        num_sequences=2, comparisons=comparisons, plane_normal=plane_normal,
        scene=scene)
    ds = GTASfMMultiViewDataset(data_dir, split, 0,
                                get_testing_transforms({"size": [rows, cols]}),
                                load_groundtruth_depthmaps=True)
    batches = []
    for b in BatchLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                         workers=2):
        b.pop("left_filenames")
        b.pop("right_filenames")
        batches.append(b)
    return batches


def abs_rel_over_batches(idepth_fn, batches):
    """Mean per-sample abs_rel over the canonical batches.

    ``idepth_fn(batch)`` -> numpy (B, H, W) idepth in TRUE (metric) units,
    i.e. already divided by the unit-baseline normalizer. Applies the GTA
    depth mask (0 < depth < 1000, reference test.py:41-58) to both truth
    and estimate.
    """
    import numpy as np

    rels = []
    for b in batches:
        idepth = idepth_fn(b)
        for i in range(idepth.shape[0]):
            depth_true = b["left_depthmap_true"][i]
            est = np.where(idepth[i] > 0,
                           1.0 / np.maximum(idepth[i], 1e-9), 0.0)
            mask = (depth_true > 0) & (depth_true < 1e3) \
                & (est > 0) & (est < 1e3)
            rels.append(np.mean(np.abs(depth_true[mask] - est[mask])
                                / depth_true[mask]))
    return float(np.mean(rels))


CONFIGS = {
    "highest": dict(matmul_precision="highest"),
    "high": dict(matmul_precision="high"),
    "default": dict(),
    "bf16": dict(compute_dtype="bfloat16"),
    "refiners_f32": dict(refiner_dtype="float32"),
    "cost_high": dict(stage_precision=(("cost", "high"),)),
    "refiners_high": dict(stage_precision=(("refiners", "high"),)),
    "extractor_high": dict(stage_precision=(("extractor", "high"),)),
    "chain_high": dict(stage_precision=(("chain", "high"),)),
    "warp_high": dict(stage_precision=(("warp", "high"),)),
    "cost_refiners_high": dict(
        stage_precision=(("cost", "high"), ("refiners", "high"))),
    "all_but_refiners_high": dict(
        stage_precision=(("cost", "high"), ("extractor", "high"),
                         ("chain", "high"), ("warp", "high"))),
}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from multi_view_stereonet_tpu.checkpoint.native import load_any_params
    from multi_view_stereonet_tpu.models import (
        MultiViewStereoNetConfig, mvsnet_forward,
    )
    from multi_view_stereonet_tpu.train.pipeline import multi_view_unpack_batch
    from __graft_entry__ import _example_batch

    names = sys.argv[1:] or list(CONFIGS)

    rows = int(os.environ.get("ACC_ROWS", 480))
    cols = int(os.environ.get("ACC_COLS", 640))
    # ACC_SCENE=slanted tilts the scene plane so GT depth varies ~2x across
    # the image; ACC_SCENE=layered renders the multi-layer occlusion world
    # (textured cards over a tilted background, ~4x depth range, real
    # occlusion boundaries) -- the hardest protocol, used by bench.py's
    # accuracy row. Default stays the fronto-parallel plane.
    # ACC_COMPARISONS=N makes N-view split lines (the reference's
    # *_Ncmps_test.txt analog).
    scene = os.environ.get("ACC_SCENE", "plane")
    normal = (0.35, 0.25, 1.0) if scene == "slanted" else None
    comparisons = int(os.environ.get("ACC_COMPARISONS", 1))
    batches = canonical_batches(
        scene="layered" if scene == "layered" else "plane",
        rows=rows, cols=cols, comparisons=comparisons, plane_normal=normal)
    params = load_any_params(PRETRAINED)

    def forward(config, jbatch):
        inputs = multi_view_unpack_batch(jbatch)
        out = mvsnet_forward(params, inputs["left_image_pyr"],
                             inputs["K_pyr"], inputs["T_right_in_left"],
                             inputs["right_image_pyr"], config)
        return out["left_idepthmap_pyr"][0] / inputs["baseline"][:, None, None]

    bench_batch = {k: jnp.asarray(v)
                   for k, v in _example_batch(1, comparisons, 480, 640).items()}

    print(f"{'config':24s} {'abs_rel':>9s} {'max_dev%':>9s} "
          f"{'ms_b1':>7s} {'dm/s':>6s}", flush=True)
    results = {}
    ref_maps = {}  # batch idx -> idepth map of the bit-parity config
    for name in names:
        config = MultiViewStereoNetConfig(**CONFIGS[name])
        fwd = jax.jit(lambda b, c=config: forward(c, b))

        maps = []

        def run(b, fwd=fwd, maps=maps):
            jb = {k: jnp.asarray(v) for k, v in b.items()}
            idepth = np.asarray(fwd(jb))
            maps.append(idepth)
            return idepth

        abs_rel = abs_rel_over_batches(run, batches)
        max_dev = 0.0
        for bi, idepth in enumerate(maps):
            if name == "highest":
                ref_maps[bi] = idepth
            elif bi in ref_maps:
                rng_ = ref_maps[bi].max() - ref_maps[bi].min()
                max_dev = max(max_dev, float(
                    np.abs(idepth - ref_maps[bi]).max() / rng_ * 100.0))

        @jax.jit
        def loop(b=bench_batch, c=config):
            def body(i, acc):
                bb = dict(b)
                bb["left_image"] = b["left_image"] + i.astype(jnp.float32) * 1e-12
                return acc + jnp.sum(forward(c, bb))
            return jax.lax.fori_loop(0, 50, body, jnp.float32(0.0))

        jax.block_until_ready(loop())
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(loop())
            times.append(time.perf_counter() - t0)
        ms = min(times) / 50 * 1000.0
        results[name] = (abs_rel, ms)
        print(f"{name:24s} {abs_rel:9.5f} {max_dev:9.3f} {ms:7.2f} "
              f"{1000.0/ms:6.1f}", flush=True)

    if "highest" in results:
        ref = results["highest"][0]
        print(f"\nreference abs_rel (bit-parity mode): {ref:.5f}")
        for name, (r, ms) in results.items():
            print(f"{name:24s} abs_rel_delta={100.0 * (r - ref) / ref:+7.3f}%"
                  f"  {1000.0/ms:6.1f} dm/s", flush=True)


if __name__ == "__main__":
    main()
