"""Band-limited bilinear homography warp as a Pallas TPU kernel.

The XLA gather that backs ``ops.warp.grid_sample`` costs ~7 ms for a
480x640x3 warp on v5e (gathers lower to scalar dynamic-slice loops). This
kernel exploits the structure of homography sampling grids: source
coordinates vary smoothly, so each (8-row x 128-col) output tile reads
from a small (K x Kx) source band. Per tile:

  1. DMA the band image[ybase:ybase+K, xbase:xbase+Kx, :] into VMEM
     (dynamic offsets via scalar prefetch);
  2. lane-rotate the sub-128 alignment slack away (the DMA base must be
     128-lane aligned; a tpu dynamic rotate by an ``xoff`` in [0, 128)
     or per-64-col-half rotates re-base the data) so the compute window
     narrows from BAND_KX (384) lanes to COMP_KX (256) or, with
     independent per-half rotates, HALF_KX (128) lanes;
  3. x-interpolation as one one-hot matmul on the MXU per (half-)tile:
     (TILE_R*cols, window) @ (window, K*C) -- the one-hot matrix carries
     the bilinear x-weights;
  4. y-interpolation as a K-way select-accumulate on the VPU.

Semantics match torch grid_sample(bilinear, border, align_corners=False)
exactly (coords are pre-clamped outside; the kernel is pure resampling).
Band bases are computed in XLA outside the kernel; dispatch is a
four-way ``lax.switch``, narrowest window first: narrow kernel (tile
span <= COMP_KX-1 after one rotate) -> full-band kernel (span <=
BAND_KX-1-slack) -> XLA gather fallback, so results are always correct.
The split-halves kernel (per-half x-span <= HALF_KX-1 after per-64-col
rotates) exists and is exact, but the in-situ A/B measured it LOSING
whole-forward (4.178 vs 3.835 ms at 480x640 b1: the per-half rotate +
dispatch work outweighs the 2x narrower matmul), so it is off by
default (``USE_SPLIT_HALVES``) and kept for re-measurement on future
hardware/layouts (scripts/profile_warp_insitu.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 16     # output rows per tile
TILE_C = 128    # output cols per tile
BAND_K = 32     # source rows in band (8-aligned base + slack + tile span)
BAND_KX = 384   # source cols in band (128-aligned base + slack)
COMP_KX = 256   # one-hot compute width after the slack rotate (see kernel)
HALF_KX = 128   # per-half compute width in split-halves mode (see kernel)

# Route eligible tiles to the split-halves (128-lane) kernel. Measured
# in situ 2026-08-18 (v5e, whole forward, interleaved loops): half 4.178
# vs narrow 3.835 vs wide 3.866 ms/frame -- the half path loses, narrow
# wins. Flag kept so the A/B can be re-run if layouts change.
USE_SPLIT_HALVES = False


def _onehot_x(ix, cols_shape, exact):
    """Bilinear x-weight matrix over the last-axis column index.

    ix: (..., cols) relative source x per output pixel; returns
    (..., cols_shape[-1]) one-hot interpolation weights (two nonzeros per
    row). Two constructions (measured on v5e, whole 480x640 warp):
    - "hat" relu(1 - |col - ix|): float-only VPU ops, 0.74 ms. The x1
      weight is 1-(1-wx), i.e. within 1 ulp of wx -- far below the bf16
      MXU truncation DEFAULT precision applies anyway.
    - float-compare selects: bit-identical weights to the XLA gather
      reference, 0.92 ms (int-compare selects lower much worse: 1.25 ms).
    exact="highest" promises bit-parity with the XLA path, so it takes
    the select construction; everything else takes the hat.
    """
    cols = jax.lax.broadcasted_iota(
        jnp.int32, cols_shape, len(cols_shape) - 1).astype(jnp.float32)
    if exact == "highest":
        x0f = jnp.floor(ix)[..., None]
        wx = ix[..., None] - x0f
        return (jnp.where(cols == x0f, 1.0 - wx, 0.0)
                + jnp.where(cols == x0f + 1.0, wx, 0.0))
    return jax.nn.relu(1.0 - jnp.abs(cols - ix[..., None]))


def _warp_kernel(ybase_ref, xbase_ref, xoff_ref, ix_ref, iy_ref, img_hbm,
                 out_ref, band, sem, *, C: int, exact: str, planar: bool,
                 comp_kx: int, split_halves: bool = False):
    # img_hbm is channels-first (B, C, H, W) so the band lands as
    # (C, BAND_K, BAND_KX) and every reshape below only merges/splits
    # leading dims (lane dim stays BAND_KX / C*K -- Mosaic-friendly).
    b = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    ntx = pl.num_programs(2)
    tid = (ty * ntx + tx)

    yb = pl.multiple_of(ybase_ref[b, tid], 8)
    xb = pl.multiple_of(xbase_ref[b, tid], 128)

    dma = pltpu.make_async_copy(
        img_hbm.at[b, :, pl.ds(yb, BAND_K), pl.ds(xb, BAND_KX)],
        band, sem)
    dma.start()

    # Sub-128 slack rotate: the DMA base xb is 128-lane aligned, so up to
    # 127 leading band lanes are alignment slack, not data. ``xoff``
    # (= floor(min ix in tile) - xb, in [0, 128)) re-bases the compute:
    # the band is lane-rotated left by xoff after the DMA and the one-hot
    # x-interpolation runs at ``comp_kx`` (256) instead of BAND_KX (384)
    # lanes -- 33% off both the Wx construction (VPU) and the
    # interpolation matmul (MXU). comp_kx == BAND_KX disables the rotate
    # (the wide fallback for tiles whose x-span exceeds COMP_KX - 1).
    #
    # ``split_halves`` goes further: the tile's two 64-col halves each get
    # their own rotate (xoff is (B, ntiles*2)), so the compute window
    # shrinks to HALF_KX=128 -- realistic homographies have ~64px
    # per-half spans, where the full-tile window sits right at the 128
    # boundary. Costs one extra band rotate per tile; halves the one-hot
    # construction and the interpolation matmul again.
    iy = iy_ref[0] - yb.astype(jnp.float32)
    iy = jnp.clip(iy, 0.0, BAND_K - 1.0)

    halfc = TILE_C // 2
    if split_halves:
        xo0 = xoff_ref[b, 2 * tid]
        xo1 = xoff_ref[b, 2 * tid + 1]
        ix0 = ix_ref[0][:, :halfc] - (xb + xo0).astype(jnp.float32)
        ix1 = ix_ref[0][:, halfc:] - (xb + xo1).astype(jnp.float32)
        ix0 = jnp.clip(ix0, 0.0, comp_kx - 1.0)
        ix1 = jnp.clip(ix1, 0.0, comp_kx - 1.0)
        Wx0 = _onehot_x(ix0, (TILE_R, halfc, comp_kx), exact)
        Wx1 = _onehot_x(ix1, (TILE_R, halfc, comp_kx), exact)
    else:
        xo = xoff_ref[b, tid] if comp_kx < BAND_KX else 0
        ix = ix_ref[0] - (xb + xo).astype(jnp.float32)   # (TILE_R, TILE_C)
        ix = jnp.clip(ix, 0.0, comp_kx - 1.0)
        Wx = _onehot_x(ix, (TILE_R, TILE_C, comp_kx),
                       exact).reshape(TILE_R * TILE_C, comp_kx)

    dma.wait()

    # Mosaic rejects Precision.HIGH ("Unsupported dot precision"), so
    # "high" promotes to HIGHEST here -- strictly more precise, and the
    # interpolation dots are a small share of the kernel.
    precision = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
    }[exact]

    # x-interp: (n, Kx) x (C*K, Kx)^T -> (n, C*K), lane index = c*K + k.
    # The f32 cast is free in DEFAULT mode (the MXU truncates to bf16
    # again) and keeps Mosaic off mixed-dtype dots for bf16 images.
    band2d = band[:].reshape(C * BAND_K, BAND_KX)

    def rotated(offset):
        # Lane-rotate the slack away (tpu dynamic rotate), then the first
        # comp_kx lanes carry every texel the (half-)tile can touch.
        r = pltpu.roll(band2d, (BAND_KX - offset) % BAND_KX, axis=1)
        return r[:, :comp_kx].astype(jnp.float32)

    if split_halves:
        xi_halves = []
        for Wxh, xoh in ((Wx0, xo0), (Wx1, xo1)):
            xih = jax.lax.dot_general(
                Wxh.reshape(TILE_R * halfc, comp_kx), rotated(xoh),
                (((1,), (1,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32)
            xi_halves.append(xih.reshape(TILE_R, halfc, C * BAND_K))
        xi3 = jnp.concatenate(xi_halves, axis=1)
    else:
        band2f = (rotated(xo) if comp_kx < BAND_KX
                  else band2d.astype(jnp.float32))
        xi = jax.lax.dot_general(
            Wx, band2f, (((1,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32)
        xi3 = xi.reshape(TILE_R, TILE_C, C * BAND_K)

    # y-interpolation weights along the c*K+k lane axis (k = lane % K),
    # same two constructions as Wx above.
    lanes = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C, C * BAND_K), 2)
    k_idx = jax.lax.rem(lanes, BAND_K).astype(jnp.float32)
    if exact == "highest":
        y0f = jnp.floor(iy)[..., None]
        wy3 = iy[..., None] - y0f
        Wy3 = (jnp.where(k_idx == y0f, 1.0 - wy3, 0.0)
               + jnp.where(k_idx == y0f + 1.0, wy3, 0.0))
    else:
        Wy3 = jax.nn.relu(1.0 - jnp.abs(k_idx - iy[..., None]))
    if planar:
        # Emit (C, TILE_R, TILE_C): per-channel K-lane reductions on the
        # VPU (bit-equal to the S matmul below -- S only ever adds
        # zeros), written straight into a (B, C, H, W) output. That is
        # the planar bitcast of the {2,1,0,3} NHWC layout XLA picks for
        # 3-channel conv inputs, so the full-res relayout copy after the
        # custom call disappears.
        prod3 = xi3 * Wy3                        # (TILE_R, TILE_C, C*K)
        for c in range(C):
            out_ref[0, c] = jnp.sum(
                prod3[..., c * BAND_K:(c + 1) * BAND_K], axis=-1
            ).astype(out_ref.dtype)
        return
    # Sum the K lanes of each channel with a 0/1 selection matmul.
    rows = jax.lax.broadcasted_iota(jnp.int32, (C * BAND_K, C), 0)
    cols_c = jax.lax.broadcasted_iota(jnp.int32, (C * BAND_K, C), 1)
    S = jnp.where(rows // BAND_K == cols_c, 1.0, 0.0)
    prod = (xi3 * Wy3).reshape(TILE_R * TILE_C, C * BAND_K)
    out = jax.lax.dot_general(
        prod, S, (((1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32)      # (n, C)
    out_ref[0] = out.reshape(TILE_R, TILE_C, C).astype(out_ref.dtype)


def pallas_warp_supported(image_shape, grid_shape) -> bool:
    """Cheap static check: shapes compatible with the tiled kernel."""
    B, H, W, C = image_shape
    Ho, Wo = grid_shape[-3], grid_shape[-2]  # grid is (..., Ho, Wo, 2)
    return (Ho % TILE_R == 0 and Wo % TILE_C == 0
            and H >= BAND_K and W >= BAND_KX)


@functools.partial(jax.jit, static_argnames=("exact", "planar", "out_dtype",
                                              "comp_kx", "split_halves"))
def _pallas_resample(image, ix, iy, ybase, xbase, xoff, exact="highest",
                     planar=False, out_dtype=None, comp_kx=BAND_KX,
                     split_halves=False):
    if exact is True:
        exact = "highest"
    elif exact is False:
        exact = "default"
    out_dtype = out_dtype or image.dtype
    B, H, W, C = image.shape
    Ho, Wo = ix.shape[1], ix.shape[2]
    nty, ntx = Ho // TILE_R, Wo // TILE_C

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # ybase, xbase, xoff
        grid=(B, nty, ntx),
        in_specs=[
            pl.BlockSpec((1, TILE_R, TILE_C),
                         lambda b, ty, tx, yb_, xb_, xo_: (b, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_R, TILE_C),
                         lambda b, ty, tx, yb_, xb_, xo_: (b, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # image stays in HBM
        ],
        out_specs=(
            pl.BlockSpec((1, C, TILE_R, TILE_C),
                         lambda b, ty, tx, yb_, xb_, xo_: (b, 0, ty, tx),
                         memory_space=pltpu.VMEM)
            if planar else
            pl.BlockSpec((1, TILE_R, TILE_C, C),
                         lambda b, ty, tx, yb_, xb_, xo_: (b, ty, tx, 0),
                         memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((C, BAND_K, BAND_KX), image.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )

    # Zero-pad so edge tiles' bands never clip against the image bounds
    # (padded texels are only ever multiplied by zero one-hot weights).
    image_chw = jnp.transpose(image, (0, 3, 1, 2))
    image_chw = jnp.pad(image_chw,
                        ((0, 0), (0, 0), (0, BAND_K), (0, BAND_KX)))
    kernel = functools.partial(_warp_kernel, C=C, exact=exact, planar=planar,
                               comp_kx=comp_kx, split_halves=split_halves)
    out_shape = (B, C, Ho, Wo) if planar else (B, Ho, Wo, C)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
    )(ybase, xbase, xoff, ix, iy, image_chw)


def _band_bases(ix, iy, H, W):
    """Per-tile band origins/offsets + band-fit predicates.

    Returns (ybase, xbase, xoff, xoff_half, fits, fits_narrow, fits_half):
      ybase/xbase: (8, 128)-aligned band origins, (B, ntiles) int32;
      xoff: sub-128 x slack (floor(xmin) - xbase, in [0, 128)) for the
        kernel's compute rotate, (B, ntiles);
      xoff_half: per-64-col-half rotate offsets (floor of each half's min
        x minus xbase), (B, ntiles*2), for split-halves mode;
      fits: every tile's span fits the full BAND_KX band;
      fits_narrow: every tile's span also fits the rotated COMP_KX
        compute window (narrow kernel valid);
      fits_half: every half-tile's span fits the rotated HALF_KX window
        AND the tile fits the band (split-halves kernel valid).
    """
    B, Ho, Wo = iy.shape
    nty, ntx = Ho // TILE_R, Wo // TILE_C
    halfc = TILE_C // 2
    iyt = iy.reshape(B, nty, TILE_R, ntx, TILE_C)
    ixh = ix.reshape(B, nty, TILE_R, ntx, 2, halfc)
    ymin = jnp.min(iyt, axis=(2, 4))
    ymax = jnp.max(iyt, axis=(2, 4))
    xmin_h = jnp.min(ixh, axis=(2, 5))   # (B, nty, ntx, 2)
    xmax_h = jnp.max(ixh, axis=(2, 5))
    xmin = jnp.min(xmin_h, axis=3)
    xmax = jnp.max(xmax_h, axis=3)
    # Band origins rounded down to the (8, 128) HBM tile alignment so the
    # dynamic DMA offsets are provably aligned for Mosaic.
    # The kernel's image copy is padded by (BAND_K, BAND_KX), so bases only
    # need a lower clip.
    ybase = jnp.maximum((jnp.floor(ymin).astype(jnp.int32) // 8) * 8, 0)
    xbase = jnp.maximum((jnp.floor(xmin).astype(jnp.int32) // 128) * 128, 0)
    xoff = jnp.clip(jnp.floor(xmin).astype(jnp.int32) - xbase, 0, 127)
    # Per-half rotate offsets can use the band's full headroom, but the
    # rotated window must not wrap past the band end (offset + HALF_KX <=
    # BAND_KX) -- guaranteed when fits holds and the half span fits.
    xoff_half = jnp.clip(
        jnp.floor(xmin_h).astype(jnp.int32) - xbase[..., None],
        0, BAND_KX - HALF_KX)
    yfit = jnp.all(ymax - ybase.astype(jnp.float32) <= BAND_K - 1.0001)
    fits = yfit & jnp.all(
        xmax - xbase.astype(jnp.float32) <= BAND_KX - 1.0001)
    fits_narrow = yfit & jnp.all(
        xmax - (xbase + xoff).astype(jnp.float32) <= COMP_KX - 1.0001)
    fits_half = fits & jnp.all(
        xmax_h - (xbase[..., None] + xoff_half).astype(jnp.float32)
        <= HALF_KX - 1.0001)
    return (ybase.reshape(B, -1), xbase.reshape(B, -1),
            xoff.reshape(B, -1), xoff_half.reshape(B, -1),
            fits, fits_narrow, fits_half)


def _resample_value(image, grid, exact, planar=False, out_dtype=None):
    """Band-kernel resampling with XLA-gather fallback (values only).

    With ``planar`` the custom call writes a (B, C, Ho, Wo) array and the
    NHWC result is returned as its transpose -- for XLA a layout bitcast,
    so the full-res relayout copy after the kernel disappears (the
    {2,1,0,3} planar-ish layout is what conv consumers of 3-channel
    images pick anyway).

    ``out_dtype``: output storage dtype. The kernel interpolates in f32
    either way and rounds once at the output write, so emitting bfloat16
    is free inside the kernel and halves the traffic of whatever relayout
    the consumer requires (vs a separate f32 copy+convert after).
    """
    from ..warp import grid_sample, _unnormalize_clamp

    B, H, W, C = image.shape
    out_dtype = out_dtype or image.dtype
    ix = _unnormalize_clamp(grid[..., 0], W)
    iy = _unnormalize_clamp(grid[..., 1], H)
    (ybase, xbase, xoff, xoff_half,
     fits, fits_narrow, fits_half) = _band_bases(ix, iy, H, W)

    def fast_half(_):
        return _pallas_resample(image, ix, iy, ybase, xbase, xoff_half,
                                exact=exact, planar=planar,
                                out_dtype=out_dtype, comp_kx=HALF_KX,
                                split_halves=True)

    def fast_narrow(_):
        return _pallas_resample(image, ix, iy, ybase, xbase, xoff,
                                exact=exact, planar=planar,
                                out_dtype=out_dtype, comp_kx=COMP_KX)

    def fast_wide(_):
        return _pallas_resample(image, ix, iy, ybase, xbase, xoff,
                                exact=exact, planar=planar,
                                out_dtype=out_dtype, comp_kx=BAND_KX)

    def slow(_):
        # grid_sample's f32 interpolation weights promote bf16 images to
        # f32; match the fast branch's output dtype for the cond.
        out = grid_sample(image, grid)[0].astype(out_dtype)
        return jnp.transpose(out, (0, 3, 1, 2)) if planar else out

    # Four-way span dispatch, narrowest compute window first; results
    # identical on every path. The split-halves branch is gated off by
    # default (USE_SPLIT_HALVES: measured slower in situ, see header).
    fits_half = fits_half & USE_SPLIT_HALVES
    idx = jnp.where(fits_half, 0,
                    jnp.where(fits_narrow, 1, jnp.where(fits, 2, 3)))
    out = jax.lax.switch(idx, [fast_half, fast_narrow, fast_wide, slow],
                         None)
    return jnp.transpose(out, (0, 2, 3, 1)) if planar else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _pallas_grid_sample(image, grid, exact="highest", planar=False,
                        out_dtype=None):
    return _resample_value(image, grid, exact, planar, out_dtype)


def _pallas_grid_sample_fwd(image, grid, exact, planar, out_dtype):
    return (_resample_value(image, grid, exact, planar, out_dtype),
            (image, grid))


def _pallas_grid_sample_bwd(exact, planar, out_dtype, res, g):
    # Bilinear border sampling is linear in the image; its exact transpose
    # (a scatter-add) comes from the XLA path's VJP. Only training paths
    # pay this -- the Pallas forward stays on the fast path.
    from ..warp import grid_sample

    image, grid = res
    _, vjp = jax.vjp(lambda im, gr: grid_sample(im, gr)[0], image, grid)
    return vjp(g.astype(image.dtype))


_pallas_grid_sample.defvjp(_pallas_grid_sample_fwd, _pallas_grid_sample_bwd)


def homography_warp_pallas(image, grid, exact="highest", planar=False,
                           out_dtype=None):
    """Drop-in replacement for ``ops.warp.grid_sample`` on homography grids.

    image: (B, H, W, C); grid: (B, Ho, Wo, 2) normalized coords.
    Returns (warped (B, Ho, Wo, C), invalid (B, Ho, Wo)).
    Falls back to the XLA gather when a tile's source span exceeds the
    band; differentiable via a custom VJP (XLA scatter transpose).
    ``planar``: emit the warped image through a (B, C, Ho, Wo) custom
    call (layout-friendly for 3-channel conv consumers; values equal).
    ``out_dtype``: output storage dtype (f32 interpolation, one rounding
    at the output write).
    """
    invalid = (jnp.abs(grid[..., 0]) > 1.0) | (jnp.abs(grid[..., 1]) > 1.0)
    return _pallas_grid_sample(image, grid, exact, planar, out_dtype), invalid
