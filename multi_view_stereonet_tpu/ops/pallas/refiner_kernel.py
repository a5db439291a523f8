"""Fused small-level IDepthmapRefiner as a single Pallas TPU kernel.

The idepthmap refiners at pyramid levels 4..2 (30x40 .. 120x160) spend
almost all their time on XLA per-kernel dispatch: 8 convs + GroupNorms at
~0.15-2.5 MB activations cost 0.39-0.52 ms each in situ on v5e while the
arithmetic is tens of microseconds (scripts/profile_ablate.py). Same
regime as the fused incremental chain (ops/pallas/incremental_chain.py):
fuse the whole module into one kernel so nothing touches HBM between the
input and the delta.

Layout: 2x2 space-to-depth (models/s2d.py), flattened row-major on a
zero-padded (hs + 2P) x (ws + 2P) grid with P = 4 s2d rows of padding --
enough for the largest transformed dilation (original dilation 8 -> s2d
dilation 4). Every conv is 9 tap-slice dots of (n_pad, 128) x (128, 128)
-- full MXU lanes (the whole point of s2d; a plain-layout kernel would
run 32-lane dots). GroupNorm pools per-lane moments with a (128, 128)
group matrix exactly like group_norm_s2d pools (parity x in-group
channels); border rows are masked out of the statistics and re-zeroed
after each nonlinearity, preserving the zero-padding invariant
(same scheme as the chain kernel).

Reference semantics: IDepthmapRefiner.forward
(/root/reference/multi_view_stereonet/multi_view_stereonet.py:442-484);
numerics match models.s2d.idepthmap_refiner_s2d (the XLA path) to
DEFAULT-precision tolerance. Used on TPU at DEFAULT matmul precision
only; differentiable via custom VJP (backward through the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.s2d import s2d_kernel, space_to_depth, depth_to_space

PAD = 4              # s2d padding rows/cols (covers s2d dilation <= 4)
DILATIONS = (1, 2, 4, 8, 1, 1)


def _leaky(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _refiner_kernel(x_ref, w0_ref, b0_ref, g0_ref,
                    wr0_ref, br0_ref, gr0_ref,
                    wr1_ref, br1_ref, gr1_ref,
                    wr2_ref, br2_ref, gr2_ref,
                    wr3_ref, br3_ref, gr3_ref,
                    wr4_ref, br4_ref, gr4_ref,
                    wr5_ref, br5_ref, gr5_ref,
                    wf_ref, bf_ref,
                    gpool_ref, bmask_ref,
                    out_ref,
                    wbuf_in, wbuf,
                    *, n_pad: int, pw: int, ci4: int, n_valid: float,
                    dils: tuple, dtype):
    OFF = PAD * pw + PAD     # max tap-slice reach on each end

    def conv9(buf, taps_ref, d2):
        """9-tap dilated conv over the padded grid; (n_pad, Cout) f32."""
        k = taps_ref.shape[0] // 9
        acc = None
        for t, o in enumerate(OFF + (kh - 1) * d2 * pw + (kw - 1) * d2
                              for kh in range(3) for kw in range(3)):
            part = jax.lax.dot_general(
                buf[o:o + n_pad].astype(jnp.float32),
                taps_ref[t * k:(t + 1) * k],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        return acc

    def gn_lrelu_mask(acc, g_ref):
        """GroupNorm (pool matmul) + LeakyReLU + border re-zero.

        acc is masked first: border conv outputs read slack rows and must
        not enter the statistics (chain-kernel scheme)."""
        acc = acc * bmask_ref[...]
        m1 = jnp.sum(acc, axis=0, keepdims=True) / n_valid      # (1, 128)
        m2 = jnp.sum(jnp.square(acc), axis=0, keepdims=True) / n_valid
        gp = gpool_ref[...]
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

    # Zero the slack rows once per program, then place the input.
    wbuf_in[...] = jnp.zeros_like(wbuf_in)
    wbuf[...] = jnp.zeros_like(wbuf)
    wbuf_in[OFF:OFF + n_pad] = x_ref[0]

    h = conv9(wbuf_in, w0_ref, 1) + b0_ref[0:1]
    h = gn_lrelu_mask(h, g0_ref)

    res = ((wr0_ref, br0_ref, gr0_ref), (wr1_ref, br1_ref, gr1_ref),
           (wr2_ref, br2_ref, gr2_ref), (wr3_ref, br3_ref, gr3_ref),
           (wr4_ref, br4_ref, gr4_ref), (wr5_ref, br5_ref, gr5_ref))
    for (wr, br, gr), d2 in zip(res, dils):
        wbuf[OFF:OFF + n_pad] = h
        r = conv9(wbuf, wr, d2) + br[0:1]
        h = (h.astype(jnp.float32)
             + gn_lrelu_mask(r, gr).astype(jnp.float32)).astype(dtype)

    wbuf[OFF:OFF + n_pad] = h
    delta = conv9(wbuf, wf_ref, 1) + bf_ref[0:1]
    out_ref[0] = (delta * bmask_ref[...]).astype(out_ref.dtype)


def _pack(params, guidance_channels: int):
    """IDepthmapRefiner params -> s2d tap-major matrices (all f32)."""
    def taps(w, dil):
        ws, d2 = s2d_kernel(w.astype(jnp.float32), dil)
        kh, kw, ci, co = ws.shape
        return ws.reshape(kh * kw * ci, co), d2

    def gn(p):
        return jnp.stack([jnp.tile(p["scale"], 4),
                          jnp.tile(p["bias"], 4)]).astype(jnp.float32)

    out = []
    w0, _ = taps(params["conv0"]["w"], 1)
    out += [w0, jnp.tile(params["conv0"]["b"], 4).astype(jnp.float32)[None],
            gn(params["gn0"])]
    dils = []
    for i in range(6):
        p = params[f"res{i}"]
        wr, d2 = taps(p["conv"]["w"], DILATIONS[i])
        dils.append(d2)
        out += [wr, jnp.tile(p["conv"]["b"], 4).astype(jnp.float32)[None],
                gn(p["gn"])]
    wf, _ = taps(params["conv_final"]["w"], 1)
    out += [wf, jnp.tile(params["conv_final"]["b"], 4).astype(
        jnp.float32)[None]]
    return out, tuple(dils)


def fused_refiner_supported(h: int, w: int, B: int = 1) -> bool:
    """Static gate: even dims, VMEM-sized grids, small batch.

    n_pad <= 2100 covers levels 4 and 3 (30x40 -> 644, 60x80 -> 1824).
    Level 2 (120x160 -> n_pad 5984) does NOT fit: its work buffers +
    resident weights + the unrolled tap-dot temporaries Mosaic keeps live
    need a measured 38.4 MB of scoped VMEM vs the 16 MB cap -- it stays
    on the XLA s2d path. B <= 8: the grid serializes over B while the
    XLA path batches; at the tiny shapes this kernel targets, per-program
    cost is dominated by the same fixed overheads XLA pays per op, so
    small batches still win.
    """
    hs, ws = h // 2, w // 2
    n_pad = (hs + 2 * PAD) * (ws + 2 * PAD)
    return (h % 2 == 0 and w % 2 == 0 and h >= 8 and w >= 8
            and n_pad <= 2100 and B <= 8)


def _fused_impl(params, guidance, idepthmap, compute_dtype):
    B, H, W, Cg = guidance.shape
    dtype = jnp.dtype(compute_dtype or idepthmap.dtype)
    ci = Cg + 1
    x = jnp.concatenate(
        [guidance.astype(dtype), idepthmap[..., None].astype(dtype)],
        axis=-1)
    xs = space_to_depth(x)                         # (B, hs, ws, 4*ci)
    hs, ws = xs.shape[1], xs.shape[2]
    xs = jnp.pad(xs, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    ph, pw = hs + 2 * PAD, ws + 2 * PAD
    n_pad = ph * pw
    xs = xs.reshape(B, n_pad, 4 * ci)

    packed, dils = _pack(params, Cg)

    gs4 = 32                                       # 4 parities x 8 channels
    lanes = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    lanes_t = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    gpool = ((lanes % 32) // 8 == (lanes_t % 32) // 8).astype(
        jnp.float32) / gs4

    interior = jnp.zeros((ph, pw, 1), jnp.float32)
    interior = interior.at[PAD:PAD + hs, PAD:PAD + ws].set(1.0)
    bmask = interior.reshape(n_pad, 1)
    n_valid = float(hs * ws)

    def xidx(b):
        return (b, 0, 0)

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda b, nd=a.ndim: (0,) * nd,
                            memory_space=pltpu.VMEM)

    in_specs = ([pl.BlockSpec((1, n_pad, 4 * ci), xidx,
                              memory_space=pltpu.VMEM)]
                + [const_spec(a) for a in packed]
                + [const_spec(gpool), const_spec(bmask)])
    out_spec = pl.BlockSpec((1, n_pad, 4), xidx, memory_space=pltpu.VMEM)

    OFF = PAD * pw + PAD
    scratch = [
        pltpu.VMEM((n_pad + 2 * OFF, 4 * ci), dtype),   # conv0 input
        pltpu.VMEM((n_pad + 2 * OFF, 128), dtype),      # resblock buffer
    ]
    kernel = functools.partial(
        _refiner_kernel, n_pad=n_pad, pw=pw, ci4=4 * ci,
        n_valid=n_valid, dils=dils, dtype=dtype)
    deltas = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_pad, 4), jnp.float32),
        scratch_shapes=scratch,
    )(xs, *packed, gpool, bmask)

    deltas = deltas.reshape(B, ph, pw, 4)[:, PAD:PAD + hs, PAD:PAD + ws]
    delta = depth_to_space(deltas)[..., 0]         # (B, H, W)
    return jax.nn.relu(idepthmap + delta.astype(idepthmap.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def idepthmap_refiner_fused(params, guidance, idepthmap, compute_dtype=None):
    """Whole IDepthmapRefiner as one Pallas kernel (small levels).

    params: idepthmap-refiner param dict; guidance: (B, H, W, Cg);
    idepthmap: (B, H, W) prior (already fx-scaled by the caller).
    Returns ReLU(idepthmap + delta), matching
    models.s2d.idepthmap_refiner_s2d.
    """
    return _fused_impl(params, guidance, idepthmap, compute_dtype)


def _fused_fwd(params, guidance, idepthmap, compute_dtype):
    out = _fused_impl(params, guidance, idepthmap, compute_dtype)
    return out, (params, guidance, idepthmap)


def _fused_bwd(compute_dtype, res, g):
    from ...models.s2d import idepthmap_refiner_s2d

    params, guidance, idepthmap = res
    _, vjp = jax.vjp(
        lambda p, gd, idp: idepthmap_refiner_s2d(
            p, gd, idp, compute_dtype=compute_dtype),
        params, guidance, idepthmap)
    return vjp(g)


idepthmap_refiner_fused.defvjp(_fused_fwd, _fused_bwd)
