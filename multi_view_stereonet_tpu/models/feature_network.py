"""Shared multi-scale feature extractor (StereoNet-style).

Reference: FeatureNetwork (multi_view_stereonet.py:78-129): four stride-2
5x5 convs (3->32->32->32->32, no bias), six residual blocks (no bias), a
final 3x3 conv (bias). ``forward`` returns a 5-element pyramid
[input, conv0, conv1, conv2, final-features] -- the intermediate
activations double as the multi-scale guidance pyramid.
"""

from __future__ import annotations

import jax

from .layers import init_conv2d, conv2d, init_resnet_block, resnet_block

CHANNELS = (3, 32, 32, 32, 32)
NUM_RES_BLOCKS = 6
PYRAMID_LEVEL = 4  # features live at 1/16 resolution


def init_feature_network(key, in_channels: int = 3):
    keys = jax.random.split(key, 5 + NUM_RES_BLOCKS)
    chans = (in_channels,) + CHANNELS[1:]
    params = {}
    for i in range(4):
        params[f"conv{i}"] = init_conv2d(keys[i], 5, 5, chans[i], chans[i + 1], bias=False)
    for i in range(NUM_RES_BLOCKS):
        params[f"res{i}"] = init_resnet_block(keys[4 + i], chans[-1], chans[-1], bias=False)
    params["conv_final"] = init_conv2d(keys[-1], 3, 3, chans[-1], chans[-1], bias=True)
    return params


def s2d_chain_supported(H: int, W: int) -> bool:
    """The s2d-chained frontend needs three exact halvings of even dims."""
    return H % 16 == 0 and W % 16 == 0


def feature_network_s2d_chain(params, x):
    """The whole stride-2 front computed in space-to-depth layout, never
    materializing an original-layout intermediate (models/s2d.py: each
    5x5 stride-2 conv is algebraically composed with the 2x2 s2d pack of
    its output). Values equal ``feature_network`` up to f32 summation
    order; requires ``s2d_chain_supported(H, W)``.

    Returns the 5-level pyramid with levels 1..3 IN S2D LAYOUT
    ((B, h/2, w/2, 128) each, channel order (di, dj, c)); levels 0
    (input) and 4 (final features) stay in original layout. Consumers of
    the mid-pyramid (the idepthmap refiners' guidance) take the s2d form
    directly (idepthmap_refiner_s2d feats_s2d=...).
    """
    from .s2d import (
        conv2d_stride2_s2d_out, conv2d_stride2_s2d_chain,
        conv2d_stride2_s2d_in,
    )

    h1 = conv2d_stride2_s2d_out(params["conv0"], x)      # s2d of conv0 out
    h2 = conv2d_stride2_s2d_chain(params["conv1"], h1)   # s2d of conv1 out
    h3 = conv2d_stride2_s2d_chain(params["conv2"], h2)   # s2d of conv2 out
    h = conv2d_stride2_s2d_in(params["conv3"], h3)       # original layout
    for i in range(NUM_RES_BLOCKS):
        h = resnet_block(params[f"res{i}"], h)
    return [x, h1, h2, h3, conv2d(params["conv_final"], h)]


def feature_network(params, x, use_s2d: bool = False):
    """x: (B, H, W, 3). Returns 5-level pyramid; last entry is features.

    Pyramid levels: [x, conv0(x), conv1(.), conv2(.), final features].

    ``use_s2d`` computes each stride-2 conv in space-to-depth layout
    (models/s2d.py: exact same op, MXU-friendly shapes) wherever the input
    dims are even; values are unchanged up to f32 summation order.
    """
    def conv_down(p, h):
        H, W, Cin = h.shape[1], h.shape[2], h.shape[3]
        # S2D only pays when the packed input fills the MXU lanes (4*Cin
        # = 128); for the 3-channel first conv every repacking measured
        # slower than XLA's direct lowering (s2d 0.68 ms, double-s2d 2.0,
        # im2col 2.7 vs direct 0.29 at 480x640 on v5e) -- leave it direct.
        if use_s2d and Cin % 32 == 0 and H % 2 == 0 and W % 2 == 0:
            from .s2d import conv2d_stride2_s2d
            return conv2d_stride2_s2d(p, h)
        return conv2d(p, h, stride=2)

    pyramid = [x]
    h = x
    for i in range(3):
        h = conv_down(params[f"conv{i}"], h)
        pyramid.append(h)
    h = conv_down(params["conv3"], h)
    for i in range(NUM_RES_BLOCKS):
        h = resnet_block(params[f"res{i}"], h)
    pyramid.append(conv2d(params["conv_final"], h))
    return pyramid
