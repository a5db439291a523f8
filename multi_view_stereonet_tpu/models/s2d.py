"""Space-to-depth (2x2) execution of the idepthmap refiners -- exact.

Why: the refiners run 3x3 convs with 32 channels at up to 480x640
(multi_view_stereonet.py:442-484). On the MXU a 32-output-channel conv
uses 32 of 128 lanes (~12 TF/s measured on v5e); re-expressing the same
linear op in a 2x2 space-to-depth layout turns every intermediate conv
into a 128-channel conv at (H/2, W/2) (~95 TF/s measured) -- identical
math, ~4x faster where the model spends most of its time.

Exactness argument (verified by tests against the plain path):
- a 3x3 conv with dilation d on (H, W, C) equals a 3x3 conv with dilation
  max(d//2, 1) on the (H/2, W/2, 4C) S2D tensor, with a transformed kernel:
  output subposition (di, dj) tap (kh, kw) reads absolute input offset
  a = di + (kh-1)*d, which in S2D coordinates is row offset s = a >> 1 and
  parity p = a & 1. For d in {1, 2} s spans {-1, 0, 1}; for even d the
  parity is constant and s spans {-d/2, 0, d/2}, i.e. dilation d/2. Taps
  that fall outside a subposition's support simply get zero weight.
- zero padding: S2D padding by the S2D dilation zero-fills exactly the
  original rows the original padding would, and any extra padded row is
  touched only by zero taps.
- GroupNorm(C//8, C) statistics pool over (spatial x in-group channels);
  in S2D the same elements live at channels {p*C + c} -- reshaping to
  (..., 4, C) reproduces the statistics bit-for-bit.

Requires even H and W (true for every pyramid level of the 480x640
training/eval resolution); callers fall back to the plain path otherwise.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .layers import leaky_relu
from .refiners import DILATIONS


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, C) -> (..., H/2, W/2, 4C), channel order (di, dj, c).

    Leading dims (batch, and e.g. the idepth axis for cost volumes) pass
    through untouched.
    """
    *lead, H, W, C = x.shape
    x = x.reshape(*lead, H // 2, 2, W // 2, 2, C)
    x = jnp.moveaxis(x, -4, -3)  # (..., H/2, W/2, di, dj, C)
    return x.reshape(*lead, H // 2, W // 2, 4 * C)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H/2, W/2, 4C) -> (..., H, W, C)."""
    *lead, Hs, Ws, C4 = x.shape
    C = C4 // 4
    x = x.reshape(*lead, Hs, Ws, 2, 2, C)
    x = jnp.moveaxis(x, -3, -4)
    return x.reshape(*lead, Hs * 2, Ws * 2, C)


def depth_to_space_conv(x: jnp.ndarray) -> jnp.ndarray:
    """``depth_to_space`` as one lhs-dilated 2x2 conv with a dirac kernel.

    Exact (every tap weight is 1.0 and each output reads one input), but
    lowers as a single TPU conv instead of the reshape/moveaxis pair --
    XLA's lowering of the latter at the refiner output materializes a
    relayout copy + reshape (~0.11 ms/frame at 480x640 f32, trace row
    copy.1140/reshape.5207 in docs/ROOFLINE.md). Whether the conv form
    is cheaper depends on the layouts XLA picks around it; route via an
    in-situ A/B, never by assumption.
    """
    *lead, Hs, Ws, C4 = x.shape
    C = C4 // 4
    # out[2i+di, 2j+dj, c] = x[i, j, (2di+dj)*C + c] (channel order
    # (di, dj, c), as produced by space_to_depth). With lhs_dilation 2
    # and pad 1, kernel tap (a, b) feeds output subposition (1-a, 1-b).
    w = np.zeros((2, 2, C4, C), dtype=np.float32)
    for a in range(2):
        for b in range(2):
            for c in range(C):
                w[a, b, (2 * (1 - a) + (1 - b)) * C + c, c] = 1.0
    xb = x.reshape((-1,) + x.shape[-3:])
    out = jax.lax.conv_general_dilated(
        xb, jnp.asarray(w, x.dtype),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return out.reshape(*lead, Hs * 2, Ws * 2, C)


@functools.lru_cache(maxsize=32)
def _s2d_index(dilation: int):
    """Constant gather indices for the S2D kernel transform.

    Returns (KH, KW, V, d2): int arrays (3, 3, 4, 4) indexed
    [khp, kwp, pin, pout] giving the unique source tap (kh, kw) of each
    transformed-kernel entry (at most one exists per entry -- the 1-D
    offset ai = di + (kh-1)*d determines kh from (si, pi) uniquely), V a
    bool validity mask for entries with no source tap.
    """
    d2 = max(dilation // 2, 1)
    KH = np.zeros((3, 3, 4, 4), np.int32)
    KW = np.zeros((3, 3, 4, 4), np.int32)
    V = np.zeros((3, 3, 4, 4), bool)
    for di in range(2):
        for dj in range(2):
            for kh in range(3):
                for kw in range(3):
                    ai = di + (kh - 1) * dilation
                    aj = dj + (kw - 1) * dilation
                    si, pi = ai >> 1, ai & 1
                    sj, pj = aj >> 1, aj & 1
                    assert si % d2 == 0 and sj % d2 == 0, (dilation, kh, di)
                    khp = si // d2 + 1
                    kwp = sj // d2 + 1
                    pin, pout = pi * 2 + pj, di * 2 + dj
                    KH[khp, kwp, pin, pout] = kh
                    KW[khp, kwp, pin, pout] = kw
                    V[khp, kwp, pin, pout] = True
    return KH, KW, V, d2


def s2d_kernel(w: jnp.ndarray, dilation: int) -> tuple:
    """Transform a 3x3 HWIO kernel to its S2D equivalent.

    w: (3, 3, Cin, Cout). Returns (w_s2d (3, 3, 4*Cin, 4*Cout), s2d_dilation).

    One gather + mask (bit-exact): the transform used to be 36 sequential
    ``.at[].set`` updates, which at serving time is ~37 dispatch-bound XLA
    ops *per conv per forward* -- measured ~0.3 ms of pure weight-repack
    dispatch across a refiner's 8 convs on v5e.
    """
    Cin, Cout = w.shape[2], w.shape[3]
    KH, KW, V, d2 = _s2d_index(dilation)
    g = w[KH, KW]                                  # (3, 3, 4, 4, Cin, Cout)
    g = jnp.where(jnp.asarray(V)[..., None, None], g,
                  jnp.zeros((), w.dtype))
    g = jnp.transpose(g, (0, 1, 2, 4, 3, 5))       # (3,3,pin,Cin,pout,Cout)
    return g.reshape(3, 3, 4 * Cin, 4 * Cout), d2


@functools.lru_cache(maxsize=1)
def _s2d_stride2_index():
    KH = np.zeros((3, 3, 4), np.int32)
    KW = np.zeros((3, 3, 4), np.int32)
    V = np.zeros((3, 3, 4), bool)
    for kh in range(5):
        a = kh - 2
        si, pi = a >> 1, a & 1
        for kw in range(5):
            b = kw - 2
            sj, pj = b >> 1, b & 1
            KH[si + 1, sj + 1, pi * 2 + pj] = kh
            KW[si + 1, sj + 1, pi * 2 + pj] = kw
            V[si + 1, sj + 1, pi * 2 + pj] = True
    return KH, KW, V


def s2d_kernel_stride2(w: jnp.ndarray) -> jnp.ndarray:
    """Transform a 5x5 stride-2 'same' (pad 2) kernel to its S2D form.

    w: (5, 5, Cin, Cout) -> (3, 3, 4*Cin, Cout). A 5x5/stride-2/pad-2 conv
    on (H, W, Cin) equals a 3x3/stride-1/pad-1 conv on the (H/2, W/2, 4Cin)
    S2D tensor: stride-2 output row i reads original rows 2i-2..2i+2,
    which in S2D coordinates are rows i-1..i+1 at parity (offset & 1); the
    unused (row +1, parity 1) taps stay zero. Padding matches exactly
    (S2D pad 1 zero-fills original rows -2,-1 and H,H+1 -- the same rows
    torch pad 2 would). One gather + mask, as in ``s2d_kernel``.
    """
    Cin, Cout = w.shape[2], w.shape[3]
    KH, KW, V = _s2d_stride2_index()
    g = w[KH, KW]                                  # (3, 3, 4, Cin, Cout)
    g = jnp.where(jnp.asarray(V)[..., None, None], g,
                  jnp.zeros((), w.dtype))
    return g.reshape(3, 3, 4 * Cin, Cout)


def conv2d_stride2_s2d(params, x: jnp.ndarray) -> jnp.ndarray:
    """5x5 stride-2 'same' conv computed in S2D layout -- exact, fast.

    params: plain conv params (w (5,5,Cin,Cout) [+ b]); x: (B,H,W,Cin)
    with even H, W. Returns (B, H/2, W/2, Cout), equal to
    ``conv2d(params, x, stride=2)`` up to f32 summation order. XLA lowers
    the direct 3-channel 5x5/stride-2 conv at ~1.3 TF/s on v5e (32 output
    lanes, awkward striding); the S2D form reaches MXU-friendly shapes
    (measured ~10x faster for the FeatureNetwork front).
    """
    w = s2d_kernel_stride2(params["w"].astype(x.dtype))
    out = jax.lax.conv_general_dilated(
        space_to_depth(x), w,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in params:
        out = out + params["b"].astype(x.dtype)
    return out


@functools.lru_cache(maxsize=1)
def _s2d_stride2_out_index():
    """Tap map composing a 5x5 stride-2 'same' conv with the 2x2 s2d pack
    of its OUTPUT: s2d-output position po = do*2+dd at row i corresponds to
    conv output row 2i+do, which reads original rows 4i+2do-2 .. 4i+2do+2;
    composite tap t = 2*do + kh relative to base row 4i-2 -> a 7x7 stride-4
    conv with padding ((2, 1), (2, 1))."""
    KH = np.zeros((7, 7, 4), np.int32)
    KW = np.zeros((7, 7, 4), np.int32)
    V = np.zeros((7, 7, 4), bool)
    for do in range(2):
        for dd in range(2):
            po = do * 2 + dd
            for kh in range(5):
                for kw in range(5):
                    KH[2 * do + kh, 2 * dd + kw, po] = kh
                    KW[2 * do + kh, 2 * dd + kw, po] = kw
                    V[2 * do + kh, 2 * dd + kw, po] = True
    return KH, KW, V


def s2d_kernel_stride2_out(w: jnp.ndarray) -> jnp.ndarray:
    """(5, 5, Cin, Cout) -> (7, 7, Cin, 4*Cout): fold the s2d pack of the
    OUTPUT into a 5x5 stride-2 'same' conv, giving one 7x7 stride-4 conv
    from the original input straight into s2d layout."""
    Cin, Cout = w.shape[2], w.shape[3]
    KH, KW, V = _s2d_stride2_out_index()
    g = w[KH, KW]                                  # (7, 7, 4, Cin, Cout)
    g = jnp.where(jnp.asarray(V)[..., None, None], g,
                  jnp.zeros((), w.dtype))
    g = jnp.transpose(g, (0, 1, 3, 2, 4))          # (7, 7, Cin, pout, Cout)
    return g.reshape(7, 7, Cin, 4 * Cout)


def _out_fold_3x3(w3: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) stride-1 'same' kernel -> (4, 4, Ci, 4*Co) stride-2
    kernel (padding ((1, 1), (1, 1))) computing the 2x2 s2d pack of the
    conv's output: s2d-output po = do*2+dd at row i is conv output row
    2i+do, reading input rows 2i+do-1 .. 2i+do+1 -> tap do+kh off base
    2i-1. The tap map is identical to the input-pack fold -- only the
    use-site stride/padding differs -- so delegate to s2d_kernel_packing."""
    return s2d_kernel_packing(w3)


def conv2d_stride2_s2d_out(params, x: jnp.ndarray) -> jnp.ndarray:
    """5x5 stride-2 'same' conv + s2d pack of its output as ONE conv.

    params: plain conv params (w (5,5,Cin,Cout) [+ b]); x: (B, H, W, Cin)
    original layout with H, W % 4 == 0. Returns (B, H/4, W/4, 4*Cout) --
    the s2d packing of the conv's (H/2, W/2, Cout) output -- equal to
    ``space_to_depth(conv2d(params, x, stride=2))`` up to f32 summation
    order. The composite 7x7 stride-4 conv has a 7*7*Cin contraction and
    4*Cout output lanes (full MXU at Cout=32), and never materializes the
    intermediate layout.
    """
    w = s2d_kernel_stride2_out(params["w"].astype(x.dtype))
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(4, 4),
        padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in params:
        out = out + jnp.tile(params["b"], 4).astype(x.dtype)
    return out


def conv2d_stride2_s2d_chain(params, x: jnp.ndarray) -> jnp.ndarray:
    """5x5 stride-2 'same' conv from s2d layout TO s2d layout.

    params: plain conv params (w (5,5,Cin,Cout) [+ b]); x: (B, Hs, Ws,
    4*Cin) the s2d packing of the conv's (2Hs, 2Ws, Cin) input, Hs, Ws
    even. Returns (B, Hs/2, Ws/2, 4*Cout), the s2d packing of the conv's
    output: the stride-2 conv becomes a 3x3 conv on the packed input
    (s2d_kernel_stride2), and folding the output pack turns that into a
    4x4 stride-2 conv -- 4*Cin-wide contraction, 4*Cout output lanes.
    """
    w3 = s2d_kernel_stride2(params["w"].astype(x.dtype))   # (3,3,4Cin,Cout)
    w = _out_fold_3x3(w3)                                  # (4,4,4Cin,4Cout)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(2, 2),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in params:
        out = out + jnp.tile(params["b"], 4).astype(x.dtype)
    return out


def conv2d_stride2_s2d_in(params, x: jnp.ndarray) -> jnp.ndarray:
    """5x5 stride-2 'same' conv consuming an ALREADY-PACKED s2d input.

    params: plain conv params (w (5,5,Cin,Cout) [+ b]); x: (B, Hs, Ws,
    4*Cin) the s2d packing of the conv's (2Hs, 2Ws, Cin) input. Returns
    (B, Hs, Ws, Cout) in original layout (the stride-2 output is exactly
    one sample per packed position).
    """
    w = s2d_kernel_stride2(params["w"].astype(x.dtype))
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in params:
        out = out + params["b"].astype(x.dtype)
    return out


@functools.lru_cache(maxsize=1)
def _s2d_pack_index():
    """Constant indices folding the input s2d pack into a 3x3 conv.

    Entry [a, b, po] gives the source tap (kh, kw) of the 4x4 stride-2
    kernel that emits s2d output position po = do*2+dd: row offset
    u = do + kh - 1 spans {-1..2} -> a = u + 1, and (do, a) determine kh
    uniquely. Entries outside kh/kw in [0, 3) have no source (V False).
    """
    KH = np.zeros((4, 4, 4), np.int32)
    KW = np.zeros((4, 4, 4), np.int32)
    V = np.zeros((4, 4, 4), bool)
    for do in range(2):
        for dd in range(2):
            po = do * 2 + dd
            for kh in range(3):
                for kw in range(3):
                    KH[do + kh, dd + kw, po] = kh
                    KW[do + kh, dd + kw, po] = kw
                    V[do + kh, dd + kw, po] = True
    return KH, KW, V


def s2d_kernel_packing(w: jnp.ndarray) -> jnp.ndarray:
    """Fold the input space-to-depth pack into a 3x3 HWIO kernel.

    w: (3, 3, Cin, Cout) -> (4, 4, Cin, 4*Cout). The composite op
    ``conv2d_s2d(w, space_to_depth(x))`` equals a 4x4 stride-2 conv with
    padding ((1, 2), (1, 2)) applied to the ORIGINAL (B, H, W, Cin)
    tensor: out_s2d[i, j, po*Cout+co] = conv3x3(x)[2i+do, 2j+dd, co].
    This removes the packed activation entirely -- the full-res s2d
    reshape+transpose measured ~0.7 ms/frame of pure relayout for
    refiner0's 480x640 guidance on v5e (trace, scripts/profile_trace.py)
    while the folded conv reads the original layout directly.
    """
    Cin, Cout = w.shape[2], w.shape[3]
    KH, KW, V = _s2d_pack_index()
    g = w[KH, KW]                                  # (4, 4, 4, Cin, Cout)
    g = jnp.where(jnp.asarray(V)[..., None, None], g,
                  jnp.zeros((), w.dtype))
    g = jnp.transpose(g, (0, 1, 3, 2, 4))          # (4, 4, Cin, pout, Cout)
    return g.reshape(4, 4, Cin, 4 * Cout)


def conv2d_s2d_packing(params, x: jnp.ndarray) -> jnp.ndarray:
    """3x3 'same' conv from ORIGINAL layout straight into s2d layout.

    params: plain conv params (w (3,3,Cin,Cout) [+ b]); x: (B, H, W, Cin)
    with even H, W. Returns (B, H/2, W/2, 4*Cout) in s2d channel order --
    bit-exact with ``conv2d_s2d(params, space_to_depth(x))`` up to f32
    summation order, without materializing the packed input.
    """
    w = s2d_kernel_packing(params["w"].astype(x.dtype))
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(2, 2),
        padding=((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in params:
        out = out + jnp.tile(params["b"], 4).astype(x.dtype)
    return out


def conv2d_s2d(params, x: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    """Apply an original-space 3x3 conv to an S2D tensor, staying in S2D.

    params: plain conv params (w (3,3,Cin,Cout) [+ b]); x: (B,Hs,Ws,4*Cin).
    """
    w, d2 = s2d_kernel(params["w"].astype(x.dtype), dilation)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((d2, d2), (d2, d2)),
        rhs_dilation=(d2, d2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in params:
        out = out + jnp.tile(params["b"], 4).astype(x.dtype)
    return out


def conv3d_s2d(params, x: jnp.ndarray) -> jnp.ndarray:
    """Same-padding 3x3x3 conv on an HW-space-to-depth volume.

    params: plain conv3d params (w (3,3,3,Cin,Cout) DHWIO [+ b]);
    x: (B, D, Hs, Ws, 4*Cin). Applies the S2D kernel transform to the HW
    taps of each depth tap -- same exactness argument as ``conv2d_s2d``
    (the D axis is untouched). Used by the cost-volume filter, where the
    32-channel 3-D convs fill only a quarter of the MXU lanes
    (measured 0.21 -> 0.14 ms for the 4-layer filter on v5e).
    """
    w = params["w"].astype(x.dtype)
    KH, KW, V, _ = _s2d_index(1)
    g = w[:, KH, KW]                         # (3, 3, 3, 4, 4, Cin, Cout)
    g = jnp.where(jnp.asarray(V)[..., None, None], g,
                  jnp.zeros((), w.dtype))
    g = jnp.transpose(g, (0, 1, 2, 3, 5, 4, 6))
    Cin, Cout = w.shape[3], w.shape[4]
    w_s2d = g.reshape(3, 3, 3, 4 * Cin, 4 * Cout)
    out = jax.lax.conv_general_dilated(
        x, w_s2d,
        window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if "b" in params:
        out = out + jnp.tile(params["b"], 4).astype(x.dtype)
    return out


def group_norm_s2d(params, x: jnp.ndarray, groups: int, eps: float = 1e-5
                   ) -> jnp.ndarray:
    """GroupNorm over original channels for an S2D tensor (B,...,4C).

    Rank-agnostic: all dims between batch and channels are spatial (e.g.
    the idepth axis of an HW-packed cost volume pools like a spatial dim,
    matching torch GroupNorm on NCDHW).

    Statistics use spatial-first reductions in the native lane layout:
    per-lane spatial moments (B, 4C), then pooled over (parity, in-group
    channels) on those tiny vectors. With equal element counts per lane
    this is mathematically the same mean/var as the one-shot pooled
    reduction, but it avoids reshaping the big activation to 5-D, which
    made XLA insert layout changes between each conv and its norm
    (measured on v5e, 6-resblock chain at 240x320x128: 2.95 ms with the
    reshape, 1.66 ms with this form; tests pin the plain path to 2e-6).
    """
    orig_dtype = x.dtype
    B = x.shape[0]
    C = x.shape[-1] // 4
    spatial = tuple(range(1, x.ndim - 1))
    bshape = (B,) + (1,) * len(spatial) + (4 * C,)
    mean, inv = gn_s2d_stats(x, groups, eps)
    out = (x.astype(jnp.float32) - mean.reshape(bshape)) * inv.reshape(bshape)
    out = out * jnp.tile(params["scale"], 4) + jnp.tile(params["bias"], 4)
    return out.astype(orig_dtype)


def gn_s2d_stats(x: jnp.ndarray, groups: int, eps: float = 1e-5):
    """(mean, rsqrt(var + eps)) of group_norm_s2d, as (B, 4C) f32.

    Factored out so the fused Pallas GN-apply kernel
    (ops/pallas/gn_apply.py) reuses the exact stat math.
    """
    B = x.shape[0]
    C = x.shape[-1] // 4
    gs = C // groups
    spatial = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)

    def pool_lanes(v):  # (B, 4C) per-lane -> per-group broadcast
        g = jnp.mean(v.reshape(B, 4, groups, gs), axis=(1, 3))
        return jnp.tile(jnp.repeat(g, gs, axis=1), (1, 4))

    # E[x^2]-mu^2 lets both moments come out of ONE read of the big
    # tensor (vs a second centered pass); the cancellation error is
    # ~1e-7 relative for post-conv activations (mu/sigma = O(1)) --
    # inside the 2e-6 pin against the plain path.
    m1 = jnp.mean(xf, axis=spatial)
    m2 = jnp.mean(jnp.square(xf), axis=spatial)
    mean = pool_lanes(m1)
    var = pool_lanes(m2) - jnp.square(mean)
    return mean, jax.lax.rsqrt(var + eps)


# Experimental (VERDICT r2 #6): route the resblock's GN-apply +
# LeakyReLU + residual tail through the fused Pallas kernel
# (ops/pallas/gn_apply.py). Toggled by scripts/profile_gn_apply.py for
# the in-situ A/B; measured verdict in docs/ROOFLINE.md.
PALLAS_GN_APPLY = False


def resnet_block_s2d(params, x: jnp.ndarray, dilation: int) -> jnp.ndarray:
    c4 = params["conv"]["w"].shape[-1] * 4
    out = conv2d_s2d(params["conv"], x, dilation)
    # Like every Pallas path: TPU at DEFAULT ambient matmul precision
    # only -- strict-parity modes must keep the exact XLA composition
    # (the kernel's apply differs by f32 fma ordering).
    if (PALLAS_GN_APPLY and jax.default_backend() == "tpu"
            and jax.config.jax_default_matmul_precision in (None, "default")):
        from ..ops.pallas.gn_apply import (
            gn_apply_residual_fused, gn_apply_residual_supported)
        if gn_apply_residual_supported(out):
            return gn_apply_residual_fused(params["gn"], out, x,
                                           (c4 // 4) // 8)
    out = group_norm_s2d(params["gn"], out, groups=(c4 // 4) // 8)
    out = leaky_relu(out)
    return out + x


@functools.lru_cache(maxsize=1)
def _up2x_s2d_kernel():
    """(3, 3, 1, 4) kernel: the 2x2 s2d packing of a bilinear 2x upsample.

    s2d(up(x))[i, j, (a, b)] = up(x)[2i+a, 2j+b]; with the half-pixel
    align_corners=False convention (ops/resize.py) row 2i+a samples
    source rows {i-1: 0.25, i: 0.75} (a=0) / {i: 0.75, i+1: 0.25} (a=1),
    separably in W. Applied VALID on an edge-replicated input: at the
    borders torch's negative-side clamp collapses both taps onto the
    edge row, which replication reproduces (0.25x + 0.75x = x up to one
    f32 rounding).
    """
    taps = {0: ((-1, 0.25), (0, 0.75)), 1: ((0, 0.75), (1, 0.25))}
    K = np.zeros((3, 3, 1, 4), np.float32)
    for a in range(2):
        for b in range(2):
            for s, ws in taps[a]:
                for t, wt in taps[b]:
                    K[s + 1, t + 1, 0, a * 2 + b] = ws * wt
    return K


def upsample2x_to_s2d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w) -> (B, h, w, 4): s2d packing of the bilinear 2x upsample.

    Equals ``space_to_depth(resize_bilinear(x, (2h, 2w))[..., None])`` up
    to f32 rounding, without materializing the full-res array.
    """
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="edge")[..., None]
    w = jnp.asarray(_up2x_s2d_kernel(), x.dtype)
    # HIGHEST precision: this replaces a resize of the precision-sensitive
    # idepth prior, which ops/resize.py pins to f32-exact contraction
    # (CLAUDE.md invariant) -- the bf16 MXU default would truncate it.
    return jax.lax.conv_general_dilated(
        xp, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)


def _refiner_delta_s2d(params, y: jnp.ndarray) -> jnp.ndarray:
    """Shared gn0 -> 6 resblocks -> conv_final pipeline (s2d layout)."""
    x = leaky_relu(group_norm_s2d(params["gn0"], y, 4))
    for i in range(6):
        x = resnet_block_s2d(params[f"res{i}"], x, DILATIONS[i])
    return conv2d_s2d(params["conv_final"], x)  # (B, Hs, Ws, 4)


def idepthmap_refiner_s2d_lowres(params, guidance: jnp.ndarray,
                                 prior_lowres: jnp.ndarray,
                                 compute_dtype=None,
                                 feats_s2d=None) -> jnp.ndarray:
    """IDepthmapRefiner fused with the 2x bilinear upsample of its prior.

    guidance: (B, H, W, Cg) (image[, features] as in idepthmap_refiner_s2d);
    prior_lowres: (B, H/2, W/2) -- the idepth prior BEFORE upsampling.
    Returns the refined full-res (B, H, W) idepthmap, equal (up to f32
    rounding) to ``idepthmap_refiner_s2d(params, guidance,
    resize_bilinear(prior_lowres, (H, W)))``.

    The upsampled prior is only ever consumed in s2d layout (conv0's
    idepth channel + the residual base, both at (H/2, W/2, 4)), so the
    full-res array never materializes -- the measured ~0.11 ms/frame of
    f32 relayout copies around the level-0 upsample (trace,
    docs/ROOFLINE.md) disappears from serving graphs, where the raw
    upsampled pyramid output is dead code.
    """
    dt = compute_dtype or prior_lowres.dtype
    pr4 = upsample2x_to_s2d(prior_lowres)            # f32 (B, H/2, W/2, 4)
    w = params["conv0"]["w"]
    Cimg = guidance.shape[-1]
    y = conv2d_s2d_packing(
        {"w": w[:, :, :Cimg], "b": params["conv0"]["b"]},
        guidance.astype(dt))
    if feats_s2d is not None:
        y = y + conv2d_s2d({"w": w[:, :, Cimg:-1]}, feats_s2d.astype(dt))
    y = y + conv2d_s2d({"w": w[:, :, -1:]}, pr4.astype(dt))
    delta = _refiner_delta_s2d(params, y)
    out = jax.nn.relu(pr4 + delta.astype(pr4.dtype))
    return depth_to_space(out)[..., 0]


def idepthmap_refiner_s2d(params, guidance: jnp.ndarray, idepthmap: jnp.ndarray,
                          compute_dtype=None, feats_s2d=None) -> jnp.ndarray:
    """S2D execution of IDepthmapRefiner; exact same outputs as the plain
    path (refiners.idepthmap_refiner). guidance: (B,H,W,Cg) with even H,W;
    idepthmap: (B,H,W). ``compute_dtype`` as in idepthmap_refiner.

    ``feats_s2d``: optionally, the feature part of the guidance ALREADY in
    s2d layout (B, H/2, W/2, 4*Cf) -- as produced by the s2d-chained
    feature frontend. The full guidance channel stack is then
    [guidance(Cg) | features(Cf) | idepth(1)] and conv0 is split by
    linearity: a packing conv over the original-layout channels plus a
    plain s2d conv over the feature channels (bias applied once) -- exact,
    and the feature pyramid never leaves s2d layout.
    """
    dt = compute_dtype or idepthmap.dtype
    if feats_s2d is None:
        x = jnp.concatenate(
            [guidance.astype(dt), idepthmap[..., None].astype(dt)], axis=-1)
        y = conv2d_s2d_packing(params["conv0"], x)
    else:
        Cimg = guidance.shape[-1]
        w = params["conv0"]["w"]   # (3, 3, Cimg + Cf + 1, 32)
        w_orig = jnp.concatenate([w[:, :, :Cimg], w[:, :, -1:]], axis=2)
        w_feat = w[:, :, Cimg:-1]
        x = jnp.concatenate(
            [guidance.astype(dt), idepthmap[..., None].astype(dt)], axis=-1)
        y = (conv2d_s2d_packing({"w": w_orig, "b": params["conv0"]["b"]}, x)
             + conv2d_s2d({"w": w_feat}, feats_s2d.astype(dt)))
    delta = depth_to_space(_refiner_delta_s2d(params, y))[..., 0]
    return jax.nn.relu(idepthmap + delta.astype(idepthmap.dtype))
