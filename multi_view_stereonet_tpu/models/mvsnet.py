"""MultiViewStereoNet: coarse-to-fine multi-view stereo with incremental
viewpoint-compensated features.

TPU-first re-design of the reference top module
(multi_view_stereonet.py:237-300, 494-695):

- the comparison-view loop is *folded into the batch axis* (all views share
  weights and shapes), so the MXU sees batch B*V everywhere at level 4;
- the depth-hypothesis axis D is a real array axis; the plane-sweep warp
  samples all D hypotheses with one fused gather;
- the sequential incremental feature chain (hypothesis i depends on i-1,
  multi_view_stereonet.py:279-290) is a ``lax.scan`` with the shared
  FeatureRefiner weights closed over -- one compiled step instead of 11
  kernel-launch chains;
- masks/boolean logic use where-based selects (jit-safe, shape-static).

Numerics follow the reference exactly (order of warps, per-view baseline
renormalization, fx idepth-scaling around each refiner, softmin beta=1).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from ..geometry import (
    create_idepth_samples,
    create_plane_sweep_homographies,
    incremental_homographies,
    normalize_baseline,
)
from ..ops import plane_sweep_warp, homography_warp, resize_bilinear, upsample_mask
from ..ops.warp import homography_warp_auto
from .feature_network import (
    init_feature_network, feature_network, feature_network_s2d_chain,
    s2d_chain_supported,
)
from .refiners import (
    init_feature_refiner, feature_refiner,
    init_idepthmap_refiner, idepthmap_refiner,
)
from .cost_volume import (
    init_cost_volume_filter, cost_volume_filter, cost_volume_filter_s2d,
    extract_idepthmap,
)
from .s2d import idepthmap_refiner_s2d, idepthmap_refiner_s2d_lowres

NUM_LEVELS = 5
FEATURE_CHANNELS = 32


@dataclasses.dataclass(frozen=True)
class MultiViewStereoNetConfig:
    """Static forward configuration (compile-time constants under jit)."""
    num_idepth_samples: int = 12
    do_cost_volume_filter: bool = True
    do_refiners: Sequence[bool] = (True, True, True, True, True)
    num_levels: int = NUM_LEVELS
    # Run refiners in 2x2 space-to-depth layout (exact; ~5x faster on TPU
    # for 32-channel convs -- see models/s2d.py). Auto-falls-back to the
    # plain path at levels with odd spatial dims.
    use_s2d_refiners: bool = True
    # Compute the feature extractor's 32-channel stride-2 convs in
    # space-to-depth layout (exact; see models/s2d.py). Auto-falls-back
    # per conv at odd spatial dims. Off by default: since the left+right
    # extractions became one batched pass, XLA's direct stride-2 lowering
    # measures faster than the repack (4.61 vs 4.70 ms full forward, v5e).
    use_s2d_frontend: bool = False
    # Run the extractor's whole stride-2 front as an s2d CHAIN (each 5x5
    # stride-2 conv composed with the s2d pack of its output -- one 7x7
    # stride-4 conv then 4x4 stride-2 convs at 128 lanes, models/s2d.py),
    # with pyramid levels 1..3 staying in s2d layout all the way into the
    # refiners' guidance convs. Exact (f32 summation order only). Needs
    # use_s2d_refiners and H, W % 16 == 0; auto-falls-back otherwise.
    # In-situ A/B (v5e, b1, 480x640): 4.11 vs 4.46 ms -- the chain removes
    # XLA's space-to-batch halo copies around the direct stride-2 convs
    # (~0.43 ms of pure relayout in the trace) and runs every front conv
    # at full MXU lane width.
    use_s2d_chained_frontend: bool = True
    # Run the cost-volume filter with HW space-to-depth packed convs
    # (exact; 128-lane Conv3d). Auto-falls-back at odd level-4 dims.
    use_s2d_cost_filter: bool = True
    # Run the incremental warp+refine chain as one Pallas kernel
    # (ops/pallas/incremental_chain.py). TPU-only, default matmul
    # precision only; auto-falls-back to the lax.scan otherwise.
    # Off by default: two independent in-situ A/Bs (scripts/
    # profile_routing.py, v5e, b1) measured the scan 1.3-1.4% faster for
    # the whole forward (5.484 vs 5.560 ms; previous session 5.373 vs
    # 5.446) -- XLA's batched scan now edges out the serialized kernel
    # grid at V=1. The kernel remains available for configs where it
    # wins (it measured ahead at round 1's layout; keep re-measuring
    # after structural changes).
    use_fused_incremental: bool = False
    # Run the small-level idepthmap refiners (levels 4+3) as one
    # whole-module Pallas kernel (ops/pallas/refiner_kernel.py).
    # TPU-only, default matmul precision only, requires use_s2d_refiners;
    # auto-falls-back otherwise. Off by default: in situ the kernel LOSES
    # ~0.5 ms/frame (6.08 vs 5.54 ms, v5e b1, two runs) even though it
    # matches the XLA path standalone -- the pallas_call boundary stops
    # XLA fusing the guidance concat into conv0 and forces s2d relayout
    # materialization around the call, costing more than the dispatch it
    # saves. Kept as a measured capability (see its interpret-mode
    # parity tests).
    use_fused_small_refiners: bool = False
    # Conv/feature compute dtype ("float32" or "bfloat16"). Geometry, warp
    # grids, soft-argmin and idepth residual adds always stay float32; in
    # bfloat16 mode only feature extraction, cost filtering and refiner
    # conv pipelines run at reduced precision.
    compute_dtype: str = "float32"
    # Storage dtype for the idepthmap-refiner conv pipelines (the HBM-
    # bound bulk of the forward). "auto": bfloat16 when running on TPU at
    # DEFAULT matmul precision with no "refiners" stage override --
    # DEFAULT already truncates every conv input to bf16 there, so
    # storing the activations in bf16 only adds one output rounding per
    # conv while halving refiner HBM traffic; everywhere else (CPU,
    # "high"/"highest" parity modes) it follows compute_dtype, keeping
    # golden parity exact. "float32"/"bfloat16" force a dtype.
    refiner_dtype: str = "auto"
    # Storage dtype for the full-res min-idepth warp output and the
    # feature-extractor activations, same policy as ``refiner_dtype``:
    # "auto" = bfloat16 on TPU at DEFAULT matmul precision with no
    # "extractor"/"warp" stage override (the warp kernel interpolates in
    # f32 and rounds once at the output write -- the same rounding the
    # DEFAULT-precision consumer conv applies anyway -- halving the
    # full-res relayout copy after the kernel and the extractor's HBM
    # traffic); compute_dtype everywhere else (CPU/parity modes exact).
    frontend_dtype: str = "auto"
    # Fold each refined level's 2x bilinear prior upsample into the s2d
    # refiner (s2d.idepthmap_refiner_s2d_lowres): the upsampled prior is
    # consumed entirely in s2d layout, so in serving graphs (where the
    # raw upsampled pyramid entry is dead code) the full-res prior is
    # never materialized. Values equal the unfolded path up to f32
    # rounding of the bilinear weights; applies only where the level is
    # an exact 2x of the previous and the s2d refiner runs.
    # Off by default: in-situ A/B (v5e b1, 480x640) measured 3.96 vs
    # 3.89 ms -- splitting conv0 into three partial convs (image pack +
    # feats + folded prior) costs more than the ~0.11 ms of upsample
    # relayout it removes; XLA sums the partials as separate conv
    # kernels instead of one fused contraction.
    fold_prior_upsample: bool = False
    # Matmul/conv precision ladder (measured at 480x640/12 hyps, v5e,
    # round-2 graph):
    #   "default": bf16 MXU passes + bf16 activation storage -- 259 dm/s,
    #              end-metric abs_rel delta -0.05% vs f32-exact
    #              (bench.py re-measures every run);
    #   "high":    bf16_3x passes, f32 storage (no "auto" bf16);
    #   "highest": f32-exact multi-pass -- 69.5 dm/s, matches the CPU
    #              golden tests bit-for-bit.
    matmul_precision: str = "default"
    # Per-stage overrides of the ambient matmul precision: a tuple of
    # (stage, precision) pairs, stages in {"extractor", "chain", "cost",
    # "refiners", "warp"}. Lets a config pin only the accuracy-critical
    # stage(s) while the rest rides the fast bf16 MXU path -- e.g.
    # matmul_precision="default" + (("refiners", "high"),). An override
    # on "chain" (or a non-default ambient) routes the incremental chain
    # to the lax.scan (the Pallas kernel inherits ambient precision and
    # Mosaic rejects HIGH).
    stage_precision: tuple = ()
    # Run the left extraction and the min-idepth right extraction as ONE
    # batched feature-network call (B + B*V). Numerically identical to two
    # separate calls (everything is per-sample), but faster single-chip.
    # Set False on a (data, view) mesh: the concat mixes a P('data') array
    # with a P(('data','view')) one, which forces GSPMD into involuntary
    # full rematerialization of the activations.
    fold_extractor_batch: bool = True
    # Rematerialize the idepthmap refiners under grad (jax.checkpoint):
    # the full-res refiner activations dominate training memory (6
    # resblocks x 39 MB at level 0 per batch element); remat trades a
    # second refiner forward in the backward pass for that storage,
    # enabling larger per-chip batches. Values are unchanged.
    remat_refiners: bool = False


def init_mvsnet(key):
    """Initialize all parameters (~0.6 M, matching the reference layout)."""
    keys = jax.random.split(key, 9)
    params = {
        "feature_network": init_feature_network(keys[0], 3),
        "feature_refiner": init_feature_refiner(keys[1], FEATURE_CHANNELS),
        "volume_filter4": init_cost_volume_filter(keys[2], FEATURE_CHANNELS),
        "refiner4": init_idepthmap_refiner(keys[3], FEATURE_CHANNELS + 3),
        "refiner3": init_idepthmap_refiner(keys[4], FEATURE_CHANNELS + 3),
        "refiner2": init_idepthmap_refiner(keys[5], FEATURE_CHANNELS + 3),
        "refiner1": init_idepthmap_refiner(keys[6], FEATURE_CHANNELS + 3),
        "refiner0": init_idepthmap_refiner(keys[7], 3),
    }
    return params


def min_idepth_warp(T_right_in_left, K0, right_image0, idepth_samples,
                    warp_precision="highest", out_dtype=None):
    """Full-res right image warped by the min-idepth homography (:254-258).

    ``out_dtype``: storage dtype of the warped image (f32 interpolation,
    one rounding at the kernel's output write).
    """
    H_min = create_plane_sweep_homographies(T_right_in_left, K0,
                                            idepth_samples[:, :1])
    # NOTE: two attacks on the relayout copy after this warp were A/B'd
    # on v5e and both LOSE in situ: a bf16 INPUT image (halved band DMA)
    # costs +0.16 ms in standalone converts around the kernel, and planar
    # (B, C, H, W) kernel output (ops/pallas/warp_kernel.py planar=True)
    # costs +0.24 ms because the per-channel VPU lane-segment sums it
    # needs are slower than the MXU S-matmul plus the copy it removes.
    # What DOES win is a bf16 OUTPUT (out_dtype): the cast is free at the
    # kernel's output write and halves the consumer-side relayout.
    warped0, _ = homography_warp_auto(right_image0, H_min[:, 0],
                                      zero_invalid=True,
                                      precision=warp_precision,
                                      out_dtype=out_dtype)
    return warped0


def _incremental_scan(refiner_params, feats0, image_rest, H_inc):
    """The incremental chain as a lax.scan (reference order of ops).

    feats0: (N, h4, w4, C); image_rest: (N, D-1, h4, w4, 3);
    H_inc: (N, D-1, 3, 3). Returns (N, D-1, h4, w4, C).
    """
    def step(feats_prev, inputs):
        H_i, image_i = inputs
        warped, invalid = homography_warp(feats_prev, H_i)
        warped = jnp.where(invalid[..., None], jnp.zeros((), warped.dtype), warped)
        feats = feature_refiner(refiner_params,
                                image_i.astype(warped.dtype), warped)
        return feats, feats

    xs = (jnp.moveaxis(H_inc, 0, 1), jnp.moveaxis(image_rest, 0, 1))
    _, feats_rest = jax.lax.scan(step, feats0, xs)
    return jnp.moveaxis(feats_rest, 0, 1)


def incremental_right_features(params, T_right_in_left, K0, K4,
                               right_image0, right_image4, idepth_samples,
                               compute_dtype=jnp.float32,
                               warp_precision="highest",
                               use_s2d_frontend=False,
                               feats0=None,
                               use_fused_chain=True):
    """Incrementally-warped right feature volume (the paper's core trick).

    T_right_in_left: (N, 4, 4) unit-baseline poses (N = batch*views);
    K0/K4: (N, 4, 4) level-0/level-4 intrinsics;
    right_image0: (N, H0, W0, 3) full-res right image;
    right_image4: (N, h4, w4, 3) level-4 right image;
    idepth_samples: (N, D).

    Returns (feature volume (N, D, h4, w4, C), invalid mask (N, D, h4, w4)).

    Reference: IncrementalFastGeometryAwareFeatureNetwork.forward
    (multi_view_stereonet.py:247-300). The full feature extractor runs ONCE
    (on the min-idepth warp); hypotheses 1..D-1 reuse the previous
    hypothesis' features via a small incremental homography warp plus the
    FeatureRefiner. Interpolation error compounds down the chain by design
    (the reference re-interpolates previous outputs); the scan preserves
    that order of operations exactly.
    """
    D = idepth_samples.shape[1]

    # (1) Warp the full-res right image with the min-idepth homography and
    # run the full feature extractor once (:254-261). This is the largest
    # warp in the network -- routed to the Pallas band kernel on TPU.
    # ``feats0`` short-circuits this stage when the caller already computed
    # it (mvsnet_forward batches it with the left extraction -- same
    # weights, one MXU pass over batch B + B*V).
    if feats0 is None:
        warped0 = min_idepth_warp(T_right_in_left, K0, right_image0,
                                  idepth_samples, warp_precision)
        feats0 = feature_network(params["feature_network"],
                                 warped0.astype(compute_dtype),
                                 use_s2d=use_s2d_frontend)[-1]

    # (2) Warp the level-4 right image into the whole plane-sweep volume
    # (guidance for the refiner + the validity mask volume, :270-275).
    H_fam = create_plane_sweep_homographies(T_right_in_left, K4, idepth_samples)
    image_volume, mask_volume = plane_sweep_warp(right_image4, H_fam)

    # (3) Hypotheses 1..D-1: warp previous features by the incremental
    # homography, refine guided by that hypothesis' warped image (:279-290).
    # On TPU at default precision the whole chain runs as ONE Pallas
    # kernel (VMEM-resident carry; ops/pallas/incremental_chain.py) --
    # the lax.scan spends ~90% of its time on per-kernel dispatch at
    # these tiny (30x40x32) shapes. Strict-parity mode and other
    # backends keep the scan.
    H_inc = incremental_homographies(H_fam)  # (N, D-1, 3, 3)

    fused = use_fused_chain and warp_precision != "highest"
    if fused and jax.default_backend() == "tpu":
        from ..ops.pallas.incremental_chain import (
            incremental_chain_supported, incremental_chain_fused)
        h4, w4, C = feats0.shape[1], feats0.shape[2], feats0.shape[3]
        if incremental_chain_supported(h4, w4, C, N=feats0.shape[0]):
            feature_volume = incremental_chain_fused(
                params["feature_refiner"], feats0, image_volume[:, 1:],
                H_inc, compute_dtype)
        else:
            fused = False
    else:
        fused = False
    if not fused:
        feats_rest = _incremental_scan(params["feature_refiner"], feats0,
                                       image_volume[:, 1:], H_inc)
        feature_volume = jnp.concatenate(
            [feats0[:, None], feats_rest], axis=1)  # (N, D, h4, w4, C)

    # (4) Zero invalid voxels using the *global* sweep mask (:293-298).
    feature_volume = jnp.where(mask_volume[..., None],
                               jnp.zeros((), feature_volume.dtype),
                               feature_volume)
    return feature_volume, mask_volume


def _refine_level(params, name, guidance, idepth_prior, fx, use_s2d=False,
                  compute_dtype=jnp.float32, remat=False, use_fused=False,
                  feats_s2d=None, prior_lowres=None):
    """fx idepth-scaling trick around a refiner (:605-613 etc.)."""
    scale = fx[:, None, None]
    B, H, W = guidance.shape[0], guidance.shape[1], guidance.shape[2]
    if (prior_lowres is not None and use_s2d
            and prior_lowres.shape[1] * 2 == H
            and prior_lowres.shape[2] * 2 == W):
        # Fold the 2x bilinear prior upsample into the s2d refiner: the
        # upsampled prior is consumed (conv0 idepth channel + residual
        # base) entirely in s2d layout, so the full-res array never
        # materializes (s2d.idepthmap_refiner_s2d_lowres).
        refine = functools.partial(idepthmap_refiner_s2d_lowres,
                                   compute_dtype=compute_dtype,
                                   feats_s2d=feats_s2d)
        if remat:
            refine = jax.checkpoint(refine)
        scaled = refine(params[name], guidance, prior_lowres * scale)
        return scaled / scale
    if feats_s2d is not None:
        # s2d-chained frontend: the feature guidance arrives in s2d layout
        # and goes straight into the refiner's split conv0 (exact).
        refine = functools.partial(idepthmap_refiner_s2d,
                                   compute_dtype=compute_dtype,
                                   feats_s2d=feats_s2d)
        if remat:
            refine = jax.checkpoint(refine)
        scaled = refine(params[name], guidance, idepth_prior * scale)
        return scaled / scale
    if (use_fused and use_s2d and jax.default_backend() == "tpu"):
        from ..ops.pallas.refiner_kernel import (
            fused_refiner_supported, idepthmap_refiner_fused)
        if fused_refiner_supported(H, W, B):
            # Whole-module Pallas kernel for the dispatch-bound small
            # levels (ops/pallas/refiner_kernel.py); larger levels and
            # non-TPU backends keep the XLA s2d path.
            refine = functools.partial(idepthmap_refiner_fused,
                                       compute_dtype=compute_dtype)
            if remat:
                refine = jax.checkpoint(refine)
            scaled = refine(params[name], guidance, idepth_prior * scale)
            return scaled / scale
    refine = (idepthmap_refiner_s2d
              if use_s2d and H % 2 == 0 and W % 2 == 0
              else idepthmap_refiner)
    refine = functools.partial(refine, compute_dtype=compute_dtype)
    if remat:
        # Recompute this refiner's activations in the backward pass
        # instead of storing them (6 resblocks of (H, W)-scale
        # activations each) -- identical values, large-batch headroom.
        refine = jax.checkpoint(refine)
    scaled = refine(params[name], guidance, idepth_prior * scale)
    return scaled / scale


def mvsnet_forward(params, left_image_pyr, K_pyr, T_right_in_lefts,
                   right_image_pyrs, config: MultiViewStereoNetConfig):
    """Estimate the left inverse depthmap pyramid.

    left_image_pyr: list of (B, h, w, 3), levels 0 (full res) .. 4 (1/16);
    K_pyr: list of (B, 4, 4) per level;
    T_right_in_lefts: (B, V, 4, 4) right-camera poses (any baseline --
    renormalized per view internally, as in the reference :566-571);
    right_image_pyrs: list of (B, V, h, w, 3) per level.

    Returns dict of pyramids (level 0 first), mirroring the reference
    forward (multi_view_stereonet.py:538-695):
      left_idepthmap_pyr      : [(B, h, w)] refined estimates
      left_idepthmap_raw_pyr  : [(B, h, w)] pre-refiner priors (level-4
                                entry is the raw soft-argmin)
      left_idepthmap_mask_pyr : [(B, D, h, w)] validity masks
    """
    if config.matmul_precision != "default":
        with jax.default_matmul_precision(config.matmul_precision):
            return _forward_impl(params, left_image_pyr, K_pyr,
                                 T_right_in_lefts, right_image_pyrs, config)
    return _forward_impl(params, left_image_pyr, K_pyr, T_right_in_lefts,
                         right_image_pyrs, config)


def _forward_impl(params, left_image_pyr, K_pyr, T_right_in_lefts,
                  right_image_pyrs, config: MultiViewStereoNetConfig):
    import contextlib

    D = config.num_idepth_samples
    do_refiners = tuple(config.do_refiners)
    cdt = jnp.dtype(config.compute_dtype)
    stage_prec = dict(config.stage_precision)
    # Fused refiner kernel only at DEFAULT ambient precision (its dots
    # would ignore a "refiners" stage override / non-default ambient).
    fused_refiners = (config.use_fused_small_refiners
                      and config.matmul_precision == "default"
                      and stage_prec.get("refiners") is None)

    def prec(stage):
        p = stage_prec.get(stage)
        return (jax.default_matmul_precision(p) if p
                else contextlib.nullcontext())

    # Refiner storage dtype policy (see the config field's docstring).
    if config.refiner_dtype == "auto":
        rdt = (jnp.dtype(jnp.bfloat16)
               if (jax.default_backend() == "tpu"
                   and config.matmul_precision == "default"
                   and stage_prec.get("refiners") is None)
               else cdt)
    else:
        rdt = jnp.dtype(config.refiner_dtype)

    # Frontend (warp output + extractor activation) storage dtype.
    if config.frontend_dtype == "auto":
        fdt = (jnp.dtype(jnp.bfloat16)
               if (jax.default_backend() == "tpu"
                   and config.matmul_precision == "default"
                   and stage_prec.get("extractor") is None
                   and stage_prec.get("warp") is None)
               else cdt)
    else:
        fdt = jnp.dtype(config.frontend_dtype)

    B, V = T_right_in_lefts.shape[0], T_right_in_lefts.shape[1]
    h4, w4 = left_image_pyr[4].shape[1], left_image_pyr[4].shape[2]

    # ---- Level 4: per-view plane sweeps, folded into the batch axis ----
    T_bv = T_right_in_lefts.reshape(B * V, 4, 4)
    T_bv, baseline = normalize_baseline(T_bv)  # (B*V,), unit baselines
    K4_bv = jnp.repeat(K_pyr[4], V, axis=0)
    K0_bv = jnp.repeat(K_pyr[0], V, axis=0)
    right0_bv = right_image_pyrs[0].reshape((B * V,) + right_image_pyrs[0].shape[2:])
    right4_bv = right_image_pyrs[4].reshape((B * V,) + right_image_pyrs[4].shape[2:])

    idepth_samples = create_idepth_samples(T_bv, K4_bv, h4, w4, D)  # (B*V, D)

    # The warp kernel's matmul precision follows the model knob: with
    # default (bf16) convs an f32-exact warp buys nothing, so the big warp
    # runs single-pass too (HIGHEST restores bit-level warp exactness).
    warp_precision = ("highest" if config.matmul_precision == "highest"
                      else stage_prec.get("warp", "default"))

    # Left features (:552) and the min-idepth right features (:254-261)
    # come from the SAME weight-shared extractor on same-shape inputs --
    # run them as ONE batched call (B + B*V) instead of two sequential
    # passes: per-sample results are unchanged, per-pass overheads and
    # MXU underutilization are paid once.
    warped0 = min_idepth_warp(T_bv, K0_bv, right0_bv, idepth_samples,
                              warp_precision, out_dtype=fdt)
    H0, W0 = left_image_pyr[0].shape[1], left_image_pyr[0].shape[2]
    chained = (config.use_s2d_chained_frontend and config.use_s2d_refiners
               and s2d_chain_supported(H0, W0))

    def _extract(x):
        if chained:
            return feature_network_s2d_chain(params["feature_network"], x)
        return feature_network(params["feature_network"], x,
                               use_s2d=config.use_s2d_frontend)

    with prec("extractor"):
        if config.fold_extractor_batch:
            stacked = jnp.concatenate(
                [left_image_pyr[0].astype(fdt), warped0.astype(fdt)], axis=0)
            stacked_pyr = _extract(stacked)
            left_feature_pyr = [lvl[:B] for lvl in stacked_pyr]
            right_feats0 = stacked_pyr[-1][B:]  # (B*V, h4, w4, C)
        else:
            # Mesh-friendly path: the P('data') left batch and the
            # P(('data','view')) right batch never share an array.
            left_feature_pyr = _extract(left_image_pyr[0].astype(fdt))
            right_feats0 = _extract(warped0.astype(fdt))[-1]
    left_feats4 = left_feature_pyr[-1]  # (B, h4, w4, C)

    with prec("chain"):
        right_feat_vol, right_mask_vol = incremental_right_features(
            params, T_bv, K0_bv, K4_bv, right0_bv, right4_bv, idepth_samples,
            compute_dtype=cdt,
            warp_precision=warp_precision,
            use_s2d_frontend=config.use_s2d_frontend,
            feats0=right_feats0,
            # Fused chain only at DEFAULT ambient precision: its unpinned
            # conv dots inherit the ambient matmul precision, and Mosaic
            # rejects HIGH ("Unsupported dot precision"); "highest" keeps
            # the scan for CPU golden parity anyway.
            use_fused_chain=(config.use_fused_incremental
                            and config.matmul_precision == "default"
                            and stage_prec.get("chain") is None))

    # Cost volume: |left - right|, invalid voxels zeroed (:587-592).
    left_vol = jnp.repeat(left_feats4, V, axis=0)[:, None]  # (B*V, 1, h4, w4, C)
    cost = jnp.abs(left_vol - right_feat_vol)
    cost = jnp.where(right_mask_vol[..., None], jnp.zeros((), cost.dtype), cost)

    with prec("cost"):
        if config.do_cost_volume_filter:
            if config.use_s2d_cost_filter and h4 % 2 == 0 and w4 % 2 == 0:
                cost_volume = cost_volume_filter_s2d(params["volume_filter4"],
                                                     cost)
            else:
                cost_volume = cost_volume_filter(params["volume_filter4"], cost)
        else:
            cost_volume = jnp.sqrt(jnp.sum(jnp.square(
                cost.astype(jnp.float32)), axis=-1))

    # Soft-argmin always in float32 (idepth values are precision-sensitive).
    idepth4_raw = extract_idepthmap(
        cost_volume.astype(jnp.float32), idepth_samples)  # (B*V, h4, w4)

    # Un-normalize by per-view baseline, then average over views (:615-627).
    b_hw = baseline[:, None, None]
    if do_refiners[4]:
        # Concat at the refiner storage dtype: with a ("refiners", ...)
        # stage override rdt is f32 even though the extractor ran bf16 --
        # the image guidance must not be pre-rounded through bf16 then.
        guidance4 = jnp.concatenate(
            [left_image_pyr[4].astype(rdt), left_feats4.astype(rdt)],
            axis=-1)
        guidance4_bv = jnp.repeat(guidance4, V, axis=0)
        with prec("refiners"):
            idepth4 = _refine_level(params, "refiner4", guidance4_bv,
                                    idepth4_raw, K4_bv[:, 0, 0],
                                    config.use_s2d_refiners, rdt,
                                    remat=config.remat_refiners,
                                    use_fused=fused_refiners)
        idepth4_raw = idepth4_raw / b_hw
        idepth4 = idepth4 / b_hw
    else:
        # Reference quirk preserved: with refiner4 off, left_idepthmap4
        # *aliases* the raw tensor and both in-place divisions
        # (multi_view_stereonet.py:613,618-619) hit the same memory, so both
        # outputs end up divided by baseline^2.
        idepth4_raw = idepth4_raw / (b_hw * b_hw)
        idepth4 = idepth4_raw

    idepth4_raw = jnp.mean(idepth4_raw.reshape(B, V, h4, w4), axis=1)
    idepth4 = jnp.mean(idepth4.reshape(B, V, h4, w4), axis=1)
    mask4 = jnp.mean(
        right_mask_vol.reshape(B, V, D, h4, w4).astype(jnp.float32), axis=1) > 0.5

    # ---- Levels 3..0: upsample + guided refinement (:629-682) ----
    idepthmap_pyr = [None] * 5
    raw_pyr = [None] * 5
    mask_pyr = [None] * 5
    idepthmap_pyr[4] = idepth4
    raw_pyr[4] = idepth4_raw
    mask_pyr[4] = mask4

    prev_idepth, prev_mask = idepth4, mask4
    for lvl in range(3, -1, -1):
        out_size = (left_image_pyr[lvl].shape[1], left_image_pyr[lvl].shape[2])
        prior = resize_bilinear(prev_idepth, out_size)  # (B, h, w)
        # Mask volume upsampled with D as the channel axis.
        mask_lvl = jnp.moveaxis(
            upsample_mask(jnp.moveaxis(prev_mask, 1, -1), out_size), -1, 1)

        if do_refiners[lvl]:
            feats_s2d = None
            if lvl == 0:
                guidance = left_image_pyr[0].astype(cdt)
            elif chained:
                # s2d-chained frontend: pyramid levels 1..3 live in s2d
                # layout; the refiner's split conv0 consumes them directly.
                guidance = left_image_pyr[lvl].astype(cdt)
                feats_s2d = left_feature_pyr[lvl]
            else:
                guidance = jnp.concatenate(
                    [left_image_pyr[lvl].astype(cdt), left_feature_pyr[lvl]],
                    axis=-1)
            with prec("refiners"):
                idepth_lvl = _refine_level(
                    params, f"refiner{lvl}", guidance, prior,
                    K_pyr[lvl][:, 0, 0], config.use_s2d_refiners, rdt,
                    remat=config.remat_refiners, use_fused=fused_refiners,
                    feats_s2d=feats_s2d,
                    prior_lowres=(prev_idepth
                                  if config.fold_prior_upsample else None))
        else:
            idepth_lvl = prior

        idepthmap_pyr[lvl] = idepth_lvl
        raw_pyr[lvl] = prior
        mask_pyr[lvl] = mask_lvl
        prev_idepth, prev_mask = idepth_lvl, mask_lvl

    return {
        "left_idepthmap_pyr": idepthmap_pyr,
        "left_idepthmap_raw_pyr": raw_pyr,
        "left_idepthmap_mask_pyr": mask_pyr,
    }
