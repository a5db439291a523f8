"""Fused GroupNorm-apply + LeakyReLU + residual-add Pallas kernel.

VERDICT r2 #6 experiment. At b8 XLA splits the s2d resblocks' GN-apply
and residual adds out of the conv fusions into standalone kLoop fusions
at a batch-in-sublanes layout ({3,0,2,1:T(8,128)}) running at ~20% of
HBM bandwidth -- 2 x ~0.9 ms of the 23.7 ms b8 step (docs/ROOFLINE.md
"b8-specific overheads"). This kernel fuses the whole elementwise tail
(normalize-apply, affine, LeakyReLU(0.2), bf16 round, residual add) into
one pass: 2 reads + 1 write of the big tensor, at the kernel's default
layout. The per-(B, 4C) statistics stay in XLA (they come out of ONE
read of the conv output, fused with the conv by XLA -- models/s2d.py
gn_s2d_stats).

The open question this experiment answers is whether the relayout copies
XLA must insert around the custom call (conv outputs sit at the
batch-in-sublanes layout the kernel can't consume) eat the fusion win --
the same trap that sank the Pallas GN-backward reduce
(scripts/profile_gn_bwd.py, docs/ROOFLINE.md "no-go"). Measured verdict
lives in docs/ROOFLINE.md; the flag stays off unless it wins.

Numerics match ``group_norm_s2d`` + ``leaky_relu`` + residual exactly up
to f32 fma ordering: apply in f32, round to the storage dtype, add the
residual at storage dtype (the XLA path's order). Differentiable via
custom VJP (backward through the XLA composition).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, res_ref, mean_ref, inv_ref, gamma_ref, beta_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    mean = mean_ref[...].reshape(1, 1, 1, -1)
    inv = inv_ref[...].reshape(1, 1, 1, -1)
    g = gamma_ref[...].reshape(1, 1, 1, -1)
    b = beta_ref[...].reshape(1, 1, 1, -1)
    y = (x - mean) * inv
    y = y * g + b
    # Match the XLA composition's rounding order exactly: group_norm_s2d
    # rounds its f32 apply to the storage dtype, THEN leaky_relu and the
    # residual add run at storage dtype. The sign test runs on the f32
    # value (Mosaic can't compare bf16); bit-equivalent: rounding
    # preserves sign, and the -0.0 disagreement region has
    # 0.2 * (-0.0) == -0.0 anyway.
    pos = y >= 0
    y = y.astype(o_ref.dtype)
    y = jnp.where(pos, y, jnp.asarray(0.2, o_ref.dtype) * y)
    o_ref[...] = y + res_ref[...]


def gn_apply_residual_supported(x: jnp.ndarray) -> bool:
    return (x.ndim == 4 and x.shape[-1] == 128
            and x.shape[2] % 16 == 0 and x.shape[1] % 2 == 0)


def _pick_hblk(H: int) -> int:
    for hblk in (32, 16, 8, 4, 2):
        if H % hblk == 0:
            return hblk
    return 1


def _fused_call(x, res, mean, inv, gamma, beta, interpret=False):
    B, H, W, C4 = x.shape
    hblk = _pick_hblk(H)
    big = lambda b, h: (b, h, 0, 0)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B, H // hblk),
        in_specs=[
            pl.BlockSpec((1, hblk, W, C4), big),
            pl.BlockSpec((1, hblk, W, C4), big),
            # (B, 1, C4) with a (1, 1, C4) block: Mosaic requires the
            # trailing two block dims to be (8k, 128k) or EQUAL to the
            # array dims -- (1, C4) matches the (1, C4) array tail.
            pl.BlockSpec((1, 1, C4), lambda b, h: (b, 0, 0)),
            pl.BlockSpec((1, 1, C4), lambda b, h: (b, 0, 0)),
            pl.BlockSpec((1, C4), lambda b, h: (0, 0)),
            pl.BlockSpec((1, C4), lambda b, h: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hblk, W, C4), big),
        interpret=interpret,
    )(x, res, mean[:, None, :], inv[:, None, :], gamma, beta)


def _xla_reference(gn_params, x, res, groups):
    from ...models.s2d import group_norm_s2d
    from ...models.layers import leaky_relu

    return leaky_relu(group_norm_s2d(gn_params, x, groups=groups)) + res


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gn_apply_residual_fused(gn_params, x, res, groups, interpret=False):
    """leaky_relu(group_norm_s2d(x)) + res as one fused elementwise pass.

    x, res: (B, H, W, 4C) with 4C == 128; gn_params: {"scale", "bias"}
    over the original C channels (tiled x4 like group_norm_s2d).
    """
    from ...models.s2d import gn_s2d_stats

    mean, inv = gn_s2d_stats(x, groups)
    c4 = x.shape[-1]
    gamma = jnp.tile(gn_params["scale"], 4).reshape(1, c4).astype(jnp.float32)
    beta = jnp.tile(gn_params["bias"], 4).reshape(1, c4).astype(jnp.float32)
    return _fused_call(x, res, mean, inv, gamma, beta, interpret=interpret)


def _fwd(gn_params, x, res, groups, interpret):
    out = gn_apply_residual_fused(gn_params, x, res, groups, interpret)
    return out, (gn_params, x, res)


def _bwd(groups, interpret, saved, g):
    gn_params, x, res = saved
    _, vjp = jax.vjp(lambda p, a, r: _xla_reference(p, a, r, groups),
                     gn_params, x, res)
    return vjp(g)


gn_apply_residual_fused.defvjp(_fwd, _bwd)
