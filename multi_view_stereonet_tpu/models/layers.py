"""Primitive layers: conv2d/conv3d, GroupNorm, residual blocks.

Functional style: ``init_*`` builds a param dict from a PRNG key,
``apply`` functions are pure. Conventions matching the reference:

- conv weight init N(0, 0.01), bias zeros
  (multi_view_stereonet.py:33-48, :68-71)
- GroupNorm(C // 8, C), eps 1e-5 (:25-31)
- LeakyReLU slope 0.2 (:64, :323, :411)
- residual block = conv3x3 -> GroupNorm -> LeakyReLU -> + identity,
  no final activation (utils/resnet.py:62-109)

Layouts: NHWC / (B, D, H, W, C); conv kernels HWIO / DHWIO. Convs run at
the ambient dtype (bf16-capable); normalization statistics accumulate in
float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_conv2d(key, kh: int, kw: int, cin: int, cout: int, bias: bool = True,
                std: float = 0.01):
    """Conv2d params; weight (kh, kw, cin, cout) ~ N(0, std), bias zeros."""
    w = std * jax.random.normal(key, (kh, kw, cin, cout), dtype=jnp.float32)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype=jnp.float32)
    return p


def conv2d(params, x: jnp.ndarray, stride: int = 1, dilation: int = 1,
           padding=None) -> jnp.ndarray:
    """Same-padding Conv2d (padding = kernel//2 per axis unless given).

    x: (B, H, W, Cin) -> (B, H', W', Cout). Matches torch Conv2d with
    padding=k//2 (conv2d_padded, multi_view_stereonet.py:33-48) and the
    dilated conv3x3 with padding=dilation (utils/resnet.py:10-13).
    """
    w = params["w"].astype(x.dtype)
    kh, kw = w.shape[0], w.shape[1]
    if padding is None:
        ph = (kh // 2) * dilation
        pw = (kw // 2) * dilation
        padding = ((ph, ph), (pw, pw))
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in params:
        out = out + params["b"].astype(x.dtype)
    return out


def init_conv3d(key, k: int, cin: int, cout: int, bias: bool = True,
                std: float = 0.01):
    """Conv3d params; weight (k, k, k, cin, cout) ~ N(0, std)."""
    w = std * jax.random.normal(key, (k, k, k, cin, cout), dtype=jnp.float32)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype=jnp.float32)
    return p


def conv3d(params, x: jnp.ndarray) -> jnp.ndarray:
    """Same-padding 3-D conv over (B, D, H, W, C).

    Matches CostVolumeFilter.conv3d (multi_view_stereonet.py:305-316).
    """
    w = params["w"].astype(x.dtype)
    k = w.shape[0]
    p = k // 2
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1, 1),
        padding=((p, p), (p, p), (p, p)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if "b" in params:
        out = out + params["b"].astype(x.dtype)
    return out


def init_group_norm(channels: int):
    return {
        "scale": jnp.ones((channels,), dtype=jnp.float32),
        "bias": jnp.zeros((channels,), dtype=jnp.float32),
    }


def group_norm(params, x: jnp.ndarray, groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over channels-last input of any spatial rank.

    x: (B, *spatial, C). Statistics per (sample, group) over all spatial
    positions and in-group channels, computed in float32.
    Matches torch GroupNorm(groups, C) on NCHW/NCDHW inputs.
    """
    orig_dtype = x.dtype
    B = x.shape[0]
    C = x.shape[-1]
    gs = C // groups
    spatial = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)

    def pool(v):  # (B, C) per-channel -> (B, C) per-group broadcast
        g = jnp.mean(v.reshape(B, groups, gs), axis=2)
        return jnp.repeat(g, gs, axis=1).reshape((B,) + (1,) * len(spatial) + (C,))

    # Spatial-first one-pass moments in the native channels-last layout
    # (no big reshape; both reductions come out of one read -- same trick
    # and measurement as s2d.group_norm_s2d).
    mean = pool(jnp.mean(xf, axis=spatial))
    var = pool(jnp.mean(jnp.square(xf), axis=spatial)) - jnp.square(mean)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * params["scale"] + params["bias"]
    return out.astype(orig_dtype)


def leaky_relu(x: jnp.ndarray, slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, slope * x)


def init_resnet_block(key, cin: int, cout: int, bias: bool = True):
    """Single-conv residual block params (SimpleBasicBlock).

    Reference: resnet_block (multi_view_stereonet.py:50-76): conv3x3 with
    N(0, 0.01) weights, GroupNorm(C//8), LeakyReLU(0.2). The reference's
    optional 1x1 downsampler is never instantiated by the model (all blocks
    are 32->32, stride 1), so it is intentionally not implemented.
    """
    assert cin == cout, "model only uses equal-channel blocks"
    return {
        "conv": init_conv2d(key, 3, 3, cin, cout, bias=bias),
        "gn": init_group_norm(cout),
    }


def resnet_block(params, x: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    """conv3x3 -> GroupNorm -> LeakyReLU(0.2) -> + identity (no final act).

    Reference: SimpleBasicBlock.forward (utils/resnet.py:93-109).
    """
    c = params["conv"]["w"].shape[-1]
    out = conv2d(params["conv"], x, dilation=dilation)
    out = group_norm(params["gn"], out, groups=c // 8)
    out = leaky_relu(out)
    return out + x


def init_upsampler(key, channels: int, refine: bool = True):
    """Upsampler params (reference multi_view_stereonet.py:355-380).

    ``refine=True`` adds a conv3x3 whose weight is dirac-initialized (the
    identity kernel; torch ``tnn.init.dirac_``) with zero bias, so the
    fresh module starts as a pure bilinear upsample. The shipped model
    instantiates ``Upsampler(1, False, False)`` (plain bilinear, see
    ops.resize.resize_bilinear); this variant exists for capability
    parity with the reference class.
    """
    if not refine:
        return {}
    p = init_conv2d(key, 3, 3, channels, channels, bias=True)
    w = np.zeros((3, 3, channels, channels), dtype=np.float32)
    w[1, 1, np.arange(channels), np.arange(channels)] = 1.0
    p["w"] = jnp.asarray(w)
    return p


def upsampler(params, x: jnp.ndarray, out_size, relu: bool = True) -> jnp.ndarray:
    """Bilinear resize -> optional refine conv3x3 -> optional ReLU.

    x: (B, H, W, C). Reference: Upsampler.forward
    (multi_view_stereonet.py:372-380). Pass the empty dict from
    ``init_upsampler(refine=False)`` for the identity-refiner path.
    """
    from ..ops.resize import resize_bilinear

    x = resize_bilinear(x, out_size)
    if params:
        x = conv2d(params, x)
    if relu:
        x = jnp.maximum(x, 0)
    return x


def init_basic_block(key, cin: int, cout: int):
    """Two-conv residual block params (torchvision-style BasicBlock).

    Reference: utils/resnet.py:20-60 -- defined there but unused by the
    shipped model; carried for capability parity.
    """
    k1, k2 = jax.random.split(key)
    return {
        "conv1": init_conv2d(k1, 3, 3, cin, cout, bias=False),
        "gn1": init_group_norm(cout),
        "conv2": init_conv2d(k2, 3, 3, cout, cout, bias=False),
        "gn2": init_group_norm(cout),
    }


def basic_block(params, x: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    """conv-norm-relu-conv-norm + identity, final ReLU (resnet.py:44-60)."""
    c = params["conv1"]["w"].shape[-1]
    out = conv2d(params["conv1"], x, dilation=dilation)
    out = leaky_relu(group_norm(params["gn1"], out, groups=c // 8))
    out = conv2d(params["conv2"], out, dilation=dilation)
    out = group_norm(params["gn2"], out, groups=c // 8)
    return leaky_relu(out + x)


def init_resnet_block3d(key, cin: int, cout: int):
    """Single-conv 3-D residual block params (SimpleBasicBlock3D,
    resnet.py:111-159 -- defined but unused by the reference model)."""
    return {
        "conv": init_conv3d(key, 3, cin, cout, bias=True),
        "gn": init_group_norm(cout),
    }


def resnet_block3d(params, x: jnp.ndarray) -> jnp.ndarray:
    """conv3d -> GroupNorm -> LeakyReLU -> + identity (no final act)."""
    c = params["conv"]["w"].shape[-1]
    out = conv3d(params["conv"], x)
    out = group_norm(params["gn"], out, groups=c // 8)
    out = leaky_relu(out)
    return out + x
