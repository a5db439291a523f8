"""Fronto-parallel plane-sweep homographies.

H_{l->r} = K_r (R_{l->r} + t_{l->r} n^T rho) K_l^{-1} with n = +z axis and
rho = inverse plane depth (derivation: reference image_predictor.py:400-461).

The depth-hypothesis axis is a real array axis here (no batch folding): the
reference "rebatches" hypotheses into the batch dim to get one CUDA launch
(multi_view_stereonet.py:180-192); under XLA a vectorized axis compiles to
the same fused code without the reshape gymnastics.
"""

from __future__ import annotations

import jax.numpy as jnp

from .transforms import mat3_inverse, se3_inverse


def get_fronto_parallel_homography(K_left: jnp.ndarray, K_right: jnp.ndarray,
                                   T_left_in_right: jnp.ndarray,
                                   idepth: jnp.ndarray) -> jnp.ndarray:
    """Homography mapping left pixels to right pixels for a fronto-parallel
    plane at inverse depth ``idepth`` (in the left frame).

    K_left, K_right: (..., 3, 3); T_left_in_right: (..., 4, 4);
    idepth: (...,). Returns (..., 3, 3).
    Reference: image_predictor.py:400-461.
    """
    R = T_left_in_right[..., :3, :3]
    t = T_left_in_right[..., :3, 3]

    t_rho = t * idepth[..., None]  # (..., 3)
    # t * n^T * rho with n = z axis: only the last column is nonzero.
    tnT = jnp.zeros(R.shape, dtype=R.dtype).at[..., :, 2].set(t_rho)

    H = R + tnT
    H = jnp.matmul(H, mat3_inverse(K_left), precision="highest")
    H = jnp.matmul(K_right, H, precision="highest")
    return H


def create_plane_sweep_homographies(T_right_in_left: jnp.ndarray, K: jnp.ndarray,
                                    idepth_samples: jnp.ndarray) -> jnp.ndarray:
    """Family of left->right homographies for a set of idepth hypotheses.

    T_right_in_left: (B, 4, 4); K: (B, 4, 4) (or (B, 3, 3));
    idepth_samples: (B, D). Returns (B, D, 3, 3).
    Reference: create_plane_sweep_homographies
    (multi_view_stereonet.py:167-194) -- without the batch-fold trick.
    """
    K3 = K[..., :3, :3]
    T_left_in_right = se3_inverse(T_right_in_left)

    # Broadcast over the hypothesis axis D.
    D = idepth_samples.shape[1]
    K3b = jnp.broadcast_to(K3[:, None], (K3.shape[0], D, 3, 3))
    Tb = jnp.broadcast_to(T_left_in_right[:, None], (K3.shape[0], D, 4, 4))
    return get_fronto_parallel_homography(K3b, K3b, Tb, idepth_samples)


def incremental_homographies(H_family: jnp.ndarray) -> jnp.ndarray:
    """Incremental warps between consecutive hypotheses.

    H_family: (B, D, 3, 3). Returns (B, D-1, 3, 3) with
    H_inc[i] = H[i]^-1 H[i+1] so that warping features already expressed at
    hypothesis i by H_inc[i] re-expresses them at hypothesis i+1.
    Reference: multi_view_stereonet.py:279-282 (computed per loop step there).
    """
    H_prev_inv = mat3_inverse(H_family[:, :-1])
    return jnp.matmul(H_prev_inv, H_family[:, 1:], precision="highest")
