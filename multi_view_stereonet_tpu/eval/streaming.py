"""Batched streaming inference over a device mesh.

The production-serving configuration (BASELINE.md: "batched streaming
inference on a v5e-8 slice"): a host-side loader thread keeps a queue of
fixed-shape batches while the devices run the jitted forward; batches are
sharded over the ``data`` mesh axis, so an N-chip slice processes N
device-batches per step with no code changes.

Usage (library):
    runner = StreamingRunner(params, model_config, mesh=make_mesh())
    for idepthmaps, names in runner.run(dataset, batch_size=8):
        ...

CLI:
    python -m multi_view_stereonet_tpu.eval.streaming \
        <weights_dir> <data_dir> <split> [--batch_size 8] [--bf16]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..data import BatchLoader
from ..models import MultiViewStereoNetConfig, mvsnet_forward
from ..parallel import make_mesh, shard_batch, replicated
from ..train.pipeline import multi_view_unpack_batch


# De/quantization numerics live in ops.quantize (shared with the
# training u8 transport and the export serving contract); re-exported
# here for the serving surface and existing callers/tests.
from ..ops.quantize import (  # noqa: F401
    dequantize_images_u8, quantize_images_u8,
)


def serving_forward(params, batch, config, fetch_dtype=None):
    """THE serving computation: (metric batch) -> metric inverse depth.

    Shared verbatim by the live StreamingRunner and the jax.export
    deployment artifact (checkpoint/export.make_serving_fn) so both
    trace the IDENTICAL graph -- at default TPU matmul precision, two
    merely-equivalent graphs can fuse bf16 work differently and drift
    by ~1e-2; one shared trace keeps the artifact bit-identical to the
    live path (tests/test_export.py, scripts/bench_export.py).

    u8 images (the serving transport) are dequantized on-device
    bit-exactly; f32 images pass through. ``fetch_dtype`` casts the
    output before readback (half the D2H bytes at float16).
    """
    batch = dict(batch)
    for key in ("left_image", "right_images"):
        if batch[key].dtype == jnp.uint8:
            batch[key] = dequantize_images_u8(batch[key])
    inputs = multi_view_unpack_batch(batch)
    out = mvsnet_forward(
        params, inputs["left_image_pyr"], inputs["K_pyr"],
        inputs["T_right_in_left"], inputs["right_image_pyr"], config)
    idepth = out["left_idepthmap_pyr"][0]
    idepth = idepth / inputs["baseline"][:, None, None]
    if fetch_dtype is not None:
        idepth = idepth.astype(fetch_dtype)
    return idepth


class StreamingRunner:
    def __init__(self, params, model_config: MultiViewStereoNetConfig,
                 mesh=None, fetch_dtype=None, transfer_u8=False):
        """``fetch_dtype`` (e.g. "float16") casts idepthmaps on-device
        before the device->host transfer -- halves fetch bytes.
        ``transfer_u8`` ships input images as uint8 and normalizes
        on-device -- 4x fewer host->device bytes (177 -> 44 MB per
        480x640 b24 batch), which is what bounds serving throughput on
        hosts with a slow device link (the axon relay here moves ~40
        MB/s each way; on a PCIe host it is still 4x less H2D traffic).
        Pair it with a dataset built via
        ``get_testing_transforms(..., u8_output=True)`` so pixels stay
        uint8 straight from the decoder (zero extra host work); batches
        that arrive f32 are quantized on the host as a fallback
        (quantize_images_u8 -- exact, but it costs host time). Outputs
        are bit-identical to the f32 path on CPU and TPU: the on-device
        dequantize replicates ToArray+Normalize's rounding exactly
        (tests/test_streaming.py, docs/ROOFLINE.md
        "Serving end-to-end")."""
        self.mesh = mesh if mesh is not None else make_mesh(view=1)
        # Read-only: forward() closes over these at construction (the
        # same-trace rule below); rebinding runner.params would be
        # silently ignored, so the property makes that assignment loud.
        # Build a NEW runner to serve different weights.
        self._params = jax.device_put(params, replicated(self.mesh))
        self.model_config = model_config
        self.fetch_dtype = jnp.dtype(fetch_dtype) if fetch_dtype else None
        self.transfer_u8 = bool(transfer_u8)

        # Close params/config/fetch into the jit (constants, exactly as
        # the self-contained jax.export artifact embeds them) so the
        # live graph and the exported graph are THE SAME trace -- with
        # params as traced arguments instead, XLA fuses the bf16 work
        # differently and the artifact drifts ~1e-2 from the live path
        # at default TPU precision (scripts/bench_export.py history).
        self.forward = jax.jit(
            lambda batch: serving_forward(self._params, batch,
                                          model_config,
                                          fetch_dtype=self.fetch_dtype))

    @property
    def params(self):
        """The weights this runner serves (fixed at construction --
        forward() closed over them; see __init__)."""
        return self._params

    def run(self, dataset, batch_size=8, prefetch=4, workers=4):
        """Yields (idepthmaps (B, H, W) np.ndarray, left filenames).

        The loader thread stays ``prefetch`` batches ahead with
        ``workers`` parallel sample decoders (test-time transforms are
        deterministic, so thread order cannot change results); device
        steps are dispatched asynchronously, so decode, H2D, compute and
        D2H overlap across consecutive batches.
        """
        loader = BatchLoader(dataset, batch_size, shuffle=False,
                             prefetch=prefetch, drop_last=False,
                             workers=workers)
        n_data = self.mesh.devices.size
        pending = []
        with self.mesh:
            for batch in loader:
                names = batch.pop("left_filenames")
                batch.pop("right_filenames", None)
                batch.pop("left_depthmap_true", None)
                batch.pop("right_depthmap_true", None)
                if self.transfer_u8:
                    for key in ("left_image", "right_images"):
                        if batch[key].dtype != np.uint8:
                            batch[key] = quantize_images_u8(batch[key])
                actual = batch["left_image"].shape[0]
                if actual % n_data == 0 and n_data > 1:
                    jbatch = shard_batch(self.mesh, batch)
                else:  # trailing partial batch: replicate instead of shard
                    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
                out = self.forward(jbatch)
                pending.append((out, names))
                # Keep a couple of steps in flight so device compute runs
                # ahead of the (possibly slow) device->host readback.
                if len(pending) > 2:
                    done, dnames = pending.pop(0)
                    yield np.asarray(done), dnames
            for done, dnames in pending:
                yield np.asarray(done), dnames


def main():
    from ..checkpoint.native import load_any_params
    from ..data import GTASfMMultiViewDataset, DeMoNDataset, get_testing_transforms
    from ..train.config import load_params_yaml

    parser = argparse.ArgumentParser(description="Batched streaming inference.")
    parser.add_argument("weights_dir")
    parser.add_argument("data_dir")
    parser.add_argument("test_split")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--fetch_f16", action="store_true",
                        help="cast idepthmaps to float16 on-device before "
                             "readback (halves device->host bytes)")
    parser.add_argument("--transfer_u8", action="store_true",
                        help="ship input images as uint8 and normalize "
                             "on-device (4x fewer host->device bytes; "
                             "outputs unchanged)")
    parser.add_argument("--workers", type=int, default=4,
                        help="parallel sample-decode threads")
    parser.add_argument("--params_yaml", default=None)
    parser.add_argument("--decode_backend", default="auto",
                        choices=["auto", "native", "pil"],
                        help="image decode path; auto uses the native C++ "
                             "loader when available (bit-exact with PIL)")
    # Fleet sharding: inference has no cross-host collectives, so a
    # multi-host serving fleet is N independent processes, each taking a
    # strided shard of the split (every sample covered exactly once).
    parser.add_argument("--shard_id", type=int, default=0)
    parser.add_argument("--num_shards", type=int, default=1)
    args = parser.parse_args()
    if not 0 <= args.shard_id < args.num_shards:
        parser.error(f"--shard_id {args.shard_id} must be in "
                     f"[0, --num_shards {args.num_shards})")

    params_file = args.params_yaml or os.path.join(
        args.weights_dir, "..", "..", "params.yaml")
    cfg = load_params_yaml(params_file)
    # With u8 transport the dataset itself emits raw uint8 pixels (the
    # decoder's natural output) and the device normalizes -- no host
    # float conversion at all.
    transforms = get_testing_transforms(cfg, u8_output=args.transfer_u8)
    # Same substring dispatch as eval.test_cli.load_data: an
    # unrecognized split must error, not silently parse as DeMoN and
    # serve 0 depthmaps.
    if "gta_sfm" in args.test_split:
        dataset = GTASfMMultiViewDataset(args.data_dir, args.test_split, 0,
                                         transforms,
                                         decode_backend=args.decode_backend)
    elif "demon" in args.test_split:
        dataset = DeMoNDataset(args.data_dir, args.test_split,
                               num_right_images=1, transform=transforms,
                               decode_backend=args.decode_backend,
                               load_groundtruth_depthmaps=False)
    else:
        raise ValueError(
            f"cannot infer dataset type from split {args.test_split!r} "
            "(expected a gta_sfm or DeMoN split name)")
    if args.num_shards > 1:
        from ..parallel import ShardedDataset
        dataset = ShardedDataset(dataset, args.shard_id, args.num_shards,
                                 drop_ragged_tail=False)

    model_config = MultiViewStereoNetConfig(
        num_idepth_samples=cfg["num_idepth_samples"],
        do_cost_volume_filter=cfg["cost_volume_filter"],
        do_refiners=tuple(cfg["refiners"]),
        compute_dtype="bfloat16" if args.bf16 else "float32",
    )
    runner = StreamingRunner(load_any_params(args.weights_dir), model_config,
                             fetch_dtype="float16" if args.fetch_f16 else None,
                             transfer_u8=args.transfer_u8)

    t0 = time.perf_counter()
    count = 0
    for idepths, names in runner.run(dataset, args.batch_size,
                                     workers=args.workers):
        count += len(names)
    dt = time.perf_counter() - t0
    print(f"{count} depthmaps in {dt:.2f}s -> {count / dt:.1f} depthmaps/sec "
          f"on {runner.mesh.devices.size} device(s)")


if __name__ == "__main__":
    main()
