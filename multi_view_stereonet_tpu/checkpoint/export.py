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


def make_serving_fn(params, config, fetch_dtype=None):
    """Metric-idepth inference: (left, rights, K, T) -> idepth (B, H, W).

    Inputs follow the eval batch contract (train/pipeline.py
    ``multi_view_unpack_batch``): left_image (B,H,W,3) in [0,1]-ish
    network units, right_images (B,V,H,W,3), K (B,4,4),
    T_right_in_left (B,V,4,4) metric poses. The unit-baseline
    normalization and its inverse are applied inside, so the output is
    metric inverse depth (reference: test.py:208-212).

    uint8 image inputs (the production serving transport -- 4x fewer
    H2D bytes, README "Serving transport flags") are handled by the
    dtype gate inside the shared ``serving_forward``: export with u8
    input specs (``export_inference(input_u8=True)``) and the
    dequantize is traced in automatically. ``fetch_dtype`` (e.g.
    "float16") casts the output on-device before readback (2x fewer D2H
    bytes). This is exactly the computation StreamingRunner.forward
    serves live -- the SAME traced function, so the artifact is
    bit-identical to the live path.
    """
    from ..eval.streaming import serving_forward

    out_dtype = jnp.dtype(fetch_dtype) if fetch_dtype else None

    def serve(left_image, right_images, K, T_right_in_left):
        # Delegates to THE shared serving computation (the same function
        # StreamingRunner jits), so the exported graph is the live
        # graph verbatim -- two merely-equivalent traces can fuse bf16
        # work differently on TPU and drift; one trace stays
        # bit-identical (the u8 dequantize is dtype-gated inside).
        batch = {
            "left_image": left_image,
            "right_images": right_images,
            "K": K,
            "T_right_in_left": T_right_in_left,
        }
        return serving_forward(params, batch, config,
                               fetch_dtype=out_dtype)

    return serve


def export_inference(params, config, batch_size=1, views=1,
                     size=(480, 640), input_u8=False, fetch_dtype=None):
    """Lower + export the serving function for the CURRENT backend.

    Returns a ``jax.export.Exported``; serialize with ``.serialize()``.
    Shapes are static (one artifact per serving config, as with the
    reference's TorchScript traces). ``input_u8``/``fetch_dtype`` select
    the production serving contract (see make_serving_fn).
    """
    from jax import export as jexport

    H, W = size
    img_dtype = jnp.uint8 if input_u8 else jnp.float32
    specs = (
        jax.ShapeDtypeStruct((batch_size, H, W, 3), img_dtype),
        jax.ShapeDtypeStruct((batch_size, views, H, W, 3), img_dtype),
        jax.ShapeDtypeStruct((batch_size, 4, 4), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, views, 4, 4), jnp.float32),
    )
    serve = jax.jit(make_serving_fn(params, config,
                                    fetch_dtype=fetch_dtype))
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
    ap.add_argument("--u8", action="store_true",
                    help="production transport: uint8 image inputs with "
                         "the on-device dequantize baked in")
    ap.add_argument("--fetch", default=None,
                    help="output dtype cast baked in (e.g. float16)")
    args = ap.parse_args(argv)

    from ..models import MultiViewStereoNetConfig
    from .native import load_any_params

    params = load_any_params(args.weights_dir)
    config = MultiViewStereoNetConfig(compute_dtype=args.dtype)
    exported = export_inference(params, config, batch_size=args.batch,
                                views=args.views, size=tuple(args.size),
                                input_u8=args.u8, fetch_dtype=args.fetch)
    save_exported(exported, args.out_path)
    nbytes = len(exported.serialize())
    print(f"exported {exported.fun_name} for platforms="
          f"{list(exported.platforms)} to {args.out_path} "
          f"({nbytes / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
