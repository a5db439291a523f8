"""Guided refinement heads: feature refiner + idepthmap refiner.

References:
- FeatureRefiner (multi_view_stereonet.py:398-440): conv(35->32) -> GN ->
  LeakyReLU -> one residual block -> conv(32->32); features += delta.
- IDepthmapRefiner (multi_view_stereonet.py:442-484): conv(guidance+1->32)
  -> GN -> LeakyReLU -> six residual blocks with dilations [1,2,4,8,1,1]
  -> conv(32->1); output ReLU(idepth + delta).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import (
    init_conv2d, conv2d, init_group_norm, group_norm, leaky_relu,
    init_resnet_block, resnet_block,
)

DILATIONS = (1, 2, 4, 8, 1, 1)


def init_feature_refiner(key, feature_channels: int = 32):
    k0, k1, k2 = jax.random.split(key, 3)
    return {
        "conv0": init_conv2d(k0, 3, 3, feature_channels + 3, 32, bias=True),
        "gn0": init_group_norm(32),
        "res0": init_resnet_block(k1, 32, 32, bias=True),
        "conv_final": init_conv2d(k2, 3, 3, 32, feature_channels, bias=True),
    }


def feature_refiner(params, image, features):
    """image: (B, H, W, 3) guidance; features: (B, H, W, C).

    Returns features + delta (FeatureRefiner.forward, :424-440). The
    channel concat order is [image, features], matching the reference.
    """
    x = jnp.concatenate([image, features], axis=-1)
    x = leaky_relu(group_norm(params["gn0"], conv2d(params["conv0"], x), groups=4))
    x = resnet_block(params["res0"], x, dilation=DILATIONS[0])
    delta = conv2d(params["conv_final"], x)
    return features + delta


def init_idepthmap_refiner(key, guidance_channels: int):
    keys = jax.random.split(key, 8)
    params = {
        "conv0": init_conv2d(keys[0], 3, 3, guidance_channels + 1, 32, bias=True),
        "gn0": init_group_norm(32),
        "conv_final": init_conv2d(keys[7], 3, 3, 32, 1, bias=True),
    }
    for i in range(6):
        params[f"res{i}"] = init_resnet_block(keys[1 + i], 32, 32, bias=True)
    return params


def idepthmap_refiner(params, guidance, idepthmap, compute_dtype=None):
    """guidance: (B, H, W, Cg); idepthmap: (B, H, W).

    Returns ReLU(idepthmap + delta) (IDepthmapRefiner.forward, :468-484).
    Channel concat order [guidance, idepth]. With ``compute_dtype`` (e.g.
    bfloat16) the conv pipeline runs at that dtype while the residual add
    stays in the idepthmap's dtype -- the prior keeps full precision and
    only the (small) correction is low-precision.
    """
    dt = compute_dtype or idepthmap.dtype
    x = jnp.concatenate(
        [guidance.astype(dt), idepthmap[..., None].astype(dt)], axis=-1)
    x = leaky_relu(group_norm(params["gn0"], conv2d(params["conv0"], x), groups=4))
    for i in range(6):
        x = resnet_block(params[f"res{i}"], x, dilation=DILATIONS[i])
    delta = conv2d(params["conv_final"], x)[..., 0]
    return jax.nn.relu(idepthmap + delta.astype(idepthmap.dtype))
