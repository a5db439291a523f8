"""Fused incremental feature-warp chain as a single Pallas TPU kernel.

The paper's core loop (IncrementalFastGeometryAwareFeatureNetwork,
multi_view_stereonet.py:279-290) refines hypothesis i's features from
hypothesis i-1's: a small homography warp of (N, 30, 40, 32) features
followed by the FeatureRefiner (conv 35->32, GroupNorm, LeakyReLU, one
residual block, conv 32->32; multi_view_stereonet.py:398-440). As a
``lax.scan`` this costs ~38 us per hypothesis on v5e -- almost entirely
XLA per-kernel dispatch, since every tensor is ~150 KB.

This kernel runs the WHOLE chain in VMEM: the Pallas grid is (N, D-1)
with the hypothesis axis innermost and sequential; the feature carry
lives in scratch across grid steps (seeded from feats0 at d == 0), so
hypothesis d's inputs (guidance image, warp coordinates) stream in
through block pipelining while features never touch HBM until their
output slot is written.

Everything is kept strictly 2-D (rows = pixels, lanes = channels) --
Mosaic-friendly, no relayouts. Pixels live on the zero-padded
(h4+2) x (w4+2) grid flattened row-major, so a conv tap (kh, kw) is a
*contiguous* row slice at offset (kh-1)*(w4+2) + (kw-1) of a buffer
with 43-row slack on each end; border pixels are re-zeroed with a mask
after every nonlinear stage (cheap VPU multiply), which restores the
conv's zero-padding invariant.

Per step:
  1. bilinear warp: ONE (pixels, pixels) matmul whose weight matrix is
     the product of two hat functions of the precomputed clamped source
     coordinates (the exact bilinear weights to <= 1 ulp), contracted at
     HIGHEST precision like the scan path's grid_sample_onehot; the
     padded grid's zero borders contribute zero weight by construction
     (coords are clamped to the valid interior);
  2. invalid samples zeroed via the precomputed validity plane;
  3. FeatureRefiner: three 3x3 convs as 9-tap contiguous-slice matmuls,
     GroupNorm statistics (f32 per-channel moments pooled with a 1/8
     group-averaging matrix -- models.layers.group_norm's scheme),
     LeakyReLU(0.2), residual adds.

Used in DEFAULT matmul precision only -- strict-parity mode keeps the
XLA scan, whose float-compare HIGHEST-precision sampling matches the
CPU goldens bit-for-bit. Differentiable via custom VJP (backward
recomputes through the XLA scan).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _leaky(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _chain_kernel(feats0_ref, image_ref, ix_ref, iy_ref, valid_ref,
                  w0i_ref, w0f_ref, b0_ref, g0_ref,
                  wr_ref, br_ref, gr_ref, wf_ref, bf_ref,
                  gpool_ref, bmask_ref,
                  out_ref,
                  fcarry, wimg, wfeat,
                  *, h4: int, w4: int, C: int, chunk: int, dtype):
    d = pl.program_id(1)
    PW = w4 + 2
    n_pad = (h4 + 2) * PW
    OFF = PW + 1            # tap-slice slack on each end of work buffers
    n_valid = float(h4 * w4)

    @pl.when(d == 0)
    def _seed():
        fcarry[...] = feats0_ref[0]
        # Zero the tap-slack rows once: border conv outputs then stay
        # finite (they are masked out, but inf/NaN garbage would still
        # poison the statistics sums).
        wimg[...] = jnp.zeros_like(wimg)
        wfeat[...] = jnp.zeros_like(wfeat)

    # ---- 1. bilinear warp of the carry (hat-product weight matmul) ----
    f2 = fcarry[...].astype(jnp.float32)         # (n_pad, C), zero borders
    src = jax.lax.broadcasted_iota(jnp.int32, (chunk, n_pad), 1)
    h_of = ((src // PW) - 1).astype(jnp.float32)
    w_of = ((src % PW) - 1).astype(jnp.float32)
    parts = []
    for c0 in range(0, n_pad, chunk):
        iy_c = iy_ref[0, 0, c0:c0 + chunk]       # (chunk, 1) clamped coords
        ix_c = ix_ref[0, 0, c0:c0 + chunk]
        W = (jax.nn.relu(1.0 - jnp.abs(h_of - iy_c))
             * jax.nn.relu(1.0 - jnp.abs(w_of - ix_c)))
        # HIGHEST like the scan path's grid_sample_onehot: warp
        # geometry stays f32-exact and interpolation error does not
        # compound in bf16 down the 11-step chain (CLAUDE.md precision
        # rule). Costs ~2.5% forward throughput vs a DEFAULT dot;
        # Precision.HIGH would halve that but its bf16_3x expansion
        # trips a jax closed_call lowering bug under pallas_call.
        parts.append(jax.lax.dot_general(
            W, f2, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32))
    warped = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)

    # ---- 2. zero invalid samples (borders have valid == 0) ------------
    warped = warped * valid_ref[0, 0]
    warped = warped.astype(dtype)

    # ---- 3. FeatureRefiner --------------------------------------------
    def conv9(buf_ref, taps_ref, extra=None):
        """9-tap conv over the padded grid; (n_pad, Cout) f32 outputs.

        One dot per tap: a single lane-concatenated (n_pad, 9*Cin)
        contraction would halve the MXU issue overhead, but Mosaic
        cannot concatenate vectors whose sublane offsets differ, and the
        tap offsets are inherently odd (+-1 row). Border outputs read
        the buffers' slack rows (zeros) -- callers mask them; interior
        outputs only ever read data rows."""
        acc = None
        for t, o in enumerate(OFF + (kh - 1) * PW + (kw - 1)
                              for kh in range(3) for kw in range(3)):
            ci = taps_ref.shape[0] // 9
            part = jax.lax.dot_general(
                buf_ref[o:o + n_pad].astype(jnp.float32),
                taps_ref[t * ci:(t + 1) * ci],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if extra is not None:
                ce = extra[1].shape[0] // 9
                part += jax.lax.dot_general(
                    extra[0][o:o + n_pad].astype(jnp.float32),
                    extra[1][t * ce:(t + 1) * ce],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        return acc

    def gn_lrelu_mask(acc, g_ref):
        """GroupNorm (pool matrix) + LeakyReLU + border re-zero; dtype.

        ``acc`` is masked first: conv border outputs are garbage (they
        read the slack rows) and must not enter the statistics."""
        acc = acc * bmask_ref[...]
        m1 = jnp.sum(acc, axis=0, keepdims=True) / n_valid       # (1, C)
        m2 = jnp.sum(jnp.square(acc), axis=0, keepdims=True) / n_valid
        gp = gpool_ref[...]
        # HIGHEST on the (1, C) pooling dots (negligible cost): bf16
        # truncation of O(1) moments can push e2 - mu^2 negative past
        # eps for low-variance groups -> NaN. Clamp as a backstop (the
        # f32 cancellation itself can be ~-1e-7).
        mu = jax.lax.dot_general(m1, gp, (((1,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
        e2 = jax.lax.dot_general(m2, gp, (((1,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
        var = jnp.maximum(e2 - jnp.square(mu), 0.0)
        rstd = jax.lax.rsqrt(var + 1e-5)
        out = (acc - mu) * rstd * g_ref[0:1] + g_ref[1:2]
        return (_leaky(out) * bmask_ref[...]).astype(dtype)

    wimg[OFF:OFF + n_pad] = image_ref[0, 0].astype(dtype)
    wfeat[OFF:OFF + n_pad] = warped
    h = conv9(wfeat, w0f_ref, extra=(wimg, w0i_ref)) + b0_ref[0:1]
    h = gn_lrelu_mask(h, g0_ref)

    wfeat[OFF:OFF + n_pad] = h
    r = conv9(wfeat, wr_ref) + br_ref[0:1]
    h = h + gn_lrelu_mask(r, gr_ref)

    wfeat[OFF:OFF + n_pad] = h
    delta = conv9(wfeat, wf_ref) + bf_ref[0:1]

    feats = ((warped.astype(jnp.float32) + delta)
             * bmask_ref[...]).astype(dtype)
    fcarry[...] = feats
    out_ref[0, 0] = feats


def _run_chain(feats0p, imagep, ixp, iyp, validp, packed, gpool, bmask,
               dims, dtype_name):
    h4, w4, C = dims
    dtype = jnp.dtype(dtype_name)
    N, n_pad, _ = feats0p.shape
    Dm1 = imagep.shape[1]
    chunk = n_pad
    # Keep the (chunk, n_pad) warp-weight temporary under ~3.6 MB --
    # fewer dot issues wins over smaller temporaries, but the compiler's
    # other stack temporaries must still fit the 16 MB VMEM scope.
    while chunk > 128 and chunk * n_pad * 4 > 3_600_000:
        chunk //= 2
    while n_pad % chunk:
        chunk += 1

    w0i, w0f, b0, g0, wr, br, gr, wf, bf = packed

    def idx_n(n, d):
        return (n, 0, 0)

    def idx_nd(n, d):
        return (n, d, 0, 0)

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda n, d, nd=a.ndim: (0,) * nd,
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, n_pad, C), idx_n, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_pad, 3), idx_nd, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_pad, 1), idx_nd, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_pad, 1), idx_nd, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_pad, 1), idx_nd, memory_space=pltpu.VMEM),
    ] + [const_spec(a) for a in (w0i, w0f, b0, g0, wr, br, gr, wf, bf,
                                 gpool, bmask)]
    out_spec = pl.BlockSpec((1, 1, n_pad, C), idx_nd,
                            memory_space=pltpu.VMEM)
    OFF = w4 + 3
    scratch = [
        pltpu.VMEM((n_pad, C), dtype),                # feature carry
        pltpu.VMEM((n_pad + 2 * OFF, 3), dtype),      # padded image buffer
        pltpu.VMEM((n_pad + 2 * OFF, C), dtype),      # padded feature buffer
    ]
    kernel = functools.partial(_chain_kernel, h4=h4, w4=w4, C=C,
                               chunk=chunk, dtype=dtype)
    return pl.pallas_call(
        kernel,
        grid=(N, Dm1),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((N, Dm1, n_pad, C), dtype),
        scratch_shapes=scratch,
    )(feats0p, imagep, ixp, iyp, validp, w0i, w0f, b0, g0, wr, br, gr,
      wf, bf, gpool, bmask)


def _pack_refiner(params, dtype):
    """FeatureRefiner params -> flattened tap-major conv matrices.

    Row order t*Cin + ci matches the kernel's lane-concatenated tap
    slices. Conv matrices stay f32 (the kernel's tap operands are f32;
    DEFAULT-precision dots truncate to bf16 on the MXU)."""
    del dtype
    def taps(w):
        kh, kw, ci, co = w.shape
        return w.astype(jnp.float32).reshape(kh * kw * ci, co)

    p = params
    w0 = p["conv0"]["w"]          # (3, 3, 3 + C, C)
    return (
        taps(w0[:, :, :3]), taps(w0[:, :, 3:]),
        p["conv0"]["b"].astype(jnp.float32)[None],
        jnp.stack([p["gn0"]["scale"], p["gn0"]["bias"]]).astype(jnp.float32),
        taps(p["res0"]["conv"]["w"]),
        p["res0"]["conv"]["b"].astype(jnp.float32)[None],
        jnp.stack([p["res0"]["gn"]["scale"],
                   p["res0"]["gn"]["bias"]]).astype(jnp.float32),
        taps(p["conv_final"]["w"]),
        p["conv_final"]["b"].astype(jnp.float32)[None],
    )


def incremental_chain_supported(h4: int, w4: int, C: int,
                                N: int = 1) -> bool:
    """Static shape check for the fused chain kernel.

    C is pinned to 32: the kernel's group-pooling matrix hardcodes the
    FeatureRefiner's GroupNorm layout (gn0 uses 4 groups, the resblock
    C//8 groups -- identical only at C == 32).

    The kernel serializes over N * (D-1) grid steps while the XLA scan
    batches each step's ops over N -- measured on v5e (30x40x32, D=12),
    the fused kernel wins up to N~6 (N=1: 0.20 vs 0.28 ms; N=4: 0.81 vs
    1.13; N=8: 1.74 vs 1.44), so larger batches keep the scan.

    A batch-tiled redesign (grid (N/T, D-1), samples stacked in the row
    axis with per-sample slack so conv-tap dots batch across the tile,
    per-sample GroupNorm via slice reductions) was built and measured in
    round 2 and LOST everywhere: the per-sample warp weights are
    T * n_pad^2 * 4 bytes of temporaries, which either OOM scoped vmem
    when unrolled (the Mosaic scheduler hoists all of them: 17-20 MB at
    T=2, >100 MB at T=8 even with CompilerParams(vmem_limit_bytes))
    or, moved into lax.fori_loop + scratch round trips, serialize away
    the ILP that makes this kernel fast (N=1: 0.48 vs scan 0.42 ms;
    N=2: 1.05 vs 0.76; N=4: 1.95 vs 1.30). The hat-weight construction
    is inherently per-sample O(n_pad^2) VPU work, so batching the convs
    cannot amortize it. Larger batches keep the scan.
    """
    return (h4 >= 2 and w4 >= 2 and C == 32
            and (h4 + 2) * (w4 + 2) <= 8192 and N <= 6)


def _pad_flat(a, h4, w4):
    """(..., h4, w4, c) -> zero-padded flat (..., (h4+2)*(w4+2), c)."""
    lead = a.shape[:-3]
    pad = [(0, 0)] * len(lead) + [(1, 1), (1, 1), (0, 0)]
    ap = jnp.pad(a, pad)
    return ap.reshape(*lead, (h4 + 2) * (w4 + 2), a.shape[-1])


def _chain_fwd_impl(refiner_params, feats0, image_volume, H_inc,
                    compute_dtype):
    """Fused chain forward. Mirrors the XLA scan in
    models.mvsnet.incremental_right_features step (3)."""
    from ..warp import homography_grid, _unnormalize_clamp

    N, h4, w4, C = feats0.shape
    Dm1 = H_inc.shape[1]
    grid = homography_grid(H_inc, h4, w4)           # (N, D-1, h4, w4, 2)
    gx, gy = grid[..., 0], grid[..., 1]
    valid = ((jnp.abs(gx) <= 1.0) & (jnp.abs(gy) <= 1.0)).astype(jnp.float32)
    ix = _unnormalize_clamp(gx, w4)
    iy = _unnormalize_clamp(gy, h4)

    dtype = jnp.dtype(compute_dtype or feats0.dtype)
    packed = _pack_refiner(refiner_params, dtype)
    gs = C // 4
    gpool = (jax.lax.broadcasted_iota(jnp.int32, (C, C), 0) // gs ==
             jax.lax.broadcasted_iota(jnp.int32, (C, C), 1) // gs
             ).astype(jnp.float32) / gs

    n_pad = (h4 + 2) * (w4 + 2)
    bmask = _pad_flat(jnp.ones((h4, w4, 1), jnp.float32), h4, w4)

    feats0p = _pad_flat(feats0.astype(dtype), h4, w4)
    imagep = _pad_flat(image_volume, h4, w4)
    ixp = _pad_flat(ix[..., None], h4, w4)
    iyp = _pad_flat(iy[..., None], h4, w4)
    validp = _pad_flat(valid[..., None], h4, w4)

    restp = _run_chain(feats0p, imagep, ixp, iyp, validp, packed, gpool,
                       bmask, (h4, w4, C), dtype.name)
    rest = restp.reshape(N, Dm1, h4 + 2, w4 + 2, C)[:, :, 1:-1, 1:-1]
    return jnp.concatenate([feats0.astype(dtype)[:, None], rest], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def incremental_chain_fused(refiner_params, feats0, image_volume, H_inc,
                            compute_dtype=None):
    """All D-1 incremental warp+refine steps as one Pallas kernel.

    refiner_params: FeatureRefiner param dict; feats0: (N, h4, w4, C)
    hypothesis-0 features; image_volume: (N, D-1, h4, w4, 3) warped
    right-image guidance for hypotheses 1..D-1; H_inc: (N, D-1, 3, 3)
    incremental homographies. Returns the (N, D, h4, w4, C) feature
    volume (hypothesis 0 = feats0). Reference semantics:
    multi_view_stereonet.py:279-293.
    """
    return _chain_fwd_impl(refiner_params, feats0, image_volume, H_inc,
                           compute_dtype)


def _chain_fwd(refiner_params, feats0, image_volume, H_inc, compute_dtype):
    out = _chain_fwd_impl(refiner_params, feats0, image_volume, H_inc,
                          compute_dtype)
    return out, (refiner_params, feats0, image_volume, H_inc)


def _chain_bwd(compute_dtype, res, g):
    # Backward recomputes through the XLA scan (exact same structure the
    # model uses on non-TPU backends).
    refiner_params, feats0, image_volume, H_inc = res

    def xla_chain(p, f0, imgs, H):
        from ...models.mvsnet import _incremental_scan
        rest = _incremental_scan(p, f0, imgs, H)
        return jnp.concatenate([f0[:, None], rest], axis=1)

    _, vjp = jax.vjp(xla_chain, refiner_params, feats0, image_volume, H_inc)
    return vjp(g)


incremental_chain_fused.defvjp(_chain_fwd, _chain_bwd)
