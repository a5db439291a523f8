"""Serialized serving artifacts via ``jax.export`` (StableHLO).

The reference's deployment artifact is a TorchScript module archive --
weights + code in one file, loadable without the source tree
(/root/reference/test.py:311 ``torch.jit.load``). The TPU-native analog
is a ``jax.export`` blob: the jitted inference function, lowered to
StableHLO with the weights baked in as constants, serialized to one
file. A server deserializes and calls it without the model source.

Routing note: the model picks Pallas/s2d fast paths with trace-time
``jax.default_backend()`` checks, so an artifact is specialized to the
backend of the exporting process (exactly like a TorchScript trace is
specialized to its recorded ops). Export on a TPU host for TPU serving;
the artifact records its platform list and jax.export refuses to run it
elsewhere.

CLI:
  python -m multi_view_stereonet_tpu.checkpoint.export \
      <weights_dir> <out.jaxexport> [--size 480 640] [--batch 1]
      [--views 1] [--dtype float32]
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp


def make_serving_fn(params, config):
    """Metric-idepth inference: (left, rights, K, T) -> idepth (B, H, W).

    Inputs follow the eval batch contract (train/pipeline.py
    ``multi_view_unpack_batch``): left_image (B,H,W,3) in [0,1]-ish
    network units, right_images (B,V,H,W,3), K (B,4,4),
    T_right_in_left (B,V,4,4) metric poses. The unit-baseline
    normalization and its inverse are applied inside, so the output is
    metric inverse depth (reference: test.py:208-212).
    """
    from ..models import mvsnet_forward
    from ..train.pipeline import multi_view_unpack_batch
    from ..geometry.transforms import baseline_norm

    def serve(left_image, right_images, K, T_right_in_left):
        batch = {
            "left_image": left_image,
            "right_images": right_images,
            "K": K,
            "T_right_in_left": T_right_in_left,
        }
        inputs = multi_view_unpack_batch(batch)
        out = mvsnet_forward(
            params, inputs["left_image_pyr"], inputs["K_pyr"],
            inputs["T_right_in_left"], inputs["right_image_pyr"], config)
        idepth = out["left_idepthmap_pyr"][0]
        baseline = baseline_norm(T_right_in_left[:, 0])
        return idepth / baseline[:, None, None]

    return serve


def export_inference(params, config, batch_size=1, views=1,
                     size=(480, 640)):
    """Lower + export the serving function for the CURRENT backend.

    Returns a ``jax.export.Exported``; serialize with ``.serialize()``.
    Shapes are static (one artifact per serving config, as with the
    reference's TorchScript traces).
    """
    from jax import export as jexport

    H, W = size
    specs = (
        jax.ShapeDtypeStruct((batch_size, H, W, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, views, H, W, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, 4, 4), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, views, 4, 4), jnp.float32),
    )
    serve = jax.jit(make_serving_fn(params, config))
    return jexport.export(serve)(*specs)


def save_exported(exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str):
    """Deserialize an artifact; run it with ``.call(left, rights, K, T)``."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("weights_dir")
    ap.add_argument("out_path")
    ap.add_argument("--size", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--views", type=int, default=1)
    ap.add_argument("--dtype", default="float32",
                    help="compute dtype (float32 | bfloat16)")
    args = ap.parse_args(argv)

    from ..models import MultiViewStereoNetConfig
    from .native import load_any_params

    params = load_any_params(args.weights_dir)
    config = MultiViewStereoNetConfig(compute_dtype=args.dtype)
    exported = export_inference(params, config, batch_size=args.batch,
                                views=args.views, size=tuple(args.size))
    save_exported(exported, args.out_path)
    nbytes = len(exported.serialize())
    print(f"exported {exported.fun_name} for platforms="
          f"{list(exported.platforms)} to {args.out_path} "
          f"({nbytes / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
