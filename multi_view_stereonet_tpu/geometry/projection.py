"""Projective geometry: pixel grids, back-projection, projection, disparity.

JAX re-design of /root/reference/stereo/image_predictor.py (L1 layer).
All functions are shape-static and batched over a leading batch axis; the
pixel grid is generated on the fly (constant-folded under jit).

Pixel convention (shared with the reference, image_predictor.py:82-98):
grid_sample-normalized coordinates place (-1, -1) at the *top-left corner of
the top-left pixel* (not its center):

    x' = 2 (x + 0.5) / cols - 1
    y' = 2 (y + 0.5) / rows - 1
"""

from __future__ import annotations

import jax.numpy as jnp

from .transforms import se3_inverse, mat3_inverse


def pixel_grid(rows: int, cols: int, dtype=jnp.float32):
    """Homogeneous pixel coordinates.

    Returns (3, rows, cols) array with planes [x, y, 1].
    Reference equivalent: image_predictor.py:59-67 (meshgrid + ones).
    """
    y = jnp.arange(rows, dtype=dtype)[:, None]
    x = jnp.arange(cols, dtype=dtype)[None, :]
    xg = jnp.broadcast_to(x, (rows, cols))
    yg = jnp.broadcast_to(y, (rows, cols))
    ones = jnp.ones((rows, cols), dtype=dtype)
    return jnp.stack([xg, yg, ones], axis=0)


def normalize_pixel_coords(uv: jnp.ndarray, rows: int, cols: int) -> jnp.ndarray:
    """Convert pixel coords to grid_sample-normalized coords in [-1, 1].

    uv: (..., 2) with uv[..., 0] = x, uv[..., 1] = y.
    Reference: image_predictor.py:111-117 (+0.5, *2, /size, -1).
    """
    x = 2.0 * (uv[..., 0] + 0.5) / cols - 1.0
    y = 2.0 * (uv[..., 1] + 0.5) / rows - 1.0
    return jnp.stack([x, y], axis=-1)


def backproject_idepthmap(K: jnp.ndarray, idepthmap: jnp.ndarray, eps: float = 1e-6):
    """Back-project an inverse depthmap into a homogeneous point cloud.

    K: (B, 4, 4) or (B, 3, 3) intrinsics; idepthmap: (B, rows, cols).
    Returns points (B, 4, rows*cols) in xyzw.

    Matches DepthmapToPointCloud applied to 1/(idepth + eps)
    (image_predictor.py:36-73 with the depth conversion at :379,:557).
    """
    B, rows, cols = idepthmap.shape
    depth = 1.0 / (idepthmap + eps)
    Kinv3 = mat3_inverse(K[:, :3, :3])
    pix = pixel_grid(rows, cols, idepthmap.dtype).reshape(3, -1)
    rays = jnp.einsum("bij,jn->bin", Kinv3, pix, precision="highest")  # (B, 3, N)
    xyz = rays * depth.reshape(B, 1, -1)
    ones = jnp.ones((B, 1, rows * cols), dtype=idepthmap.dtype)
    return jnp.concatenate([xyz, ones], axis=1)


def project_points(K: jnp.ndarray, Tinv: jnp.ndarray, image_size, points: jnp.ndarray,
                   eps: float = 1e-7):
    """Project a homogeneous point cloud into a camera.

    K, Tinv: (B, 4, 4); points: (B, 4, N); image_size: (rows, cols).
    Returns grid_sample-normalized coords (B, rows, cols, 2).
    Reference: PointCloudToPixel (image_predictor.py:75-118).
    """
    rows, cols = image_size
    P = jnp.matmul(K, Tinv, precision="highest")[:, :3, :]
    cam = jnp.einsum("bij,bjn->bin", P, points, precision="highest")
    uv = cam[:, :2, :] / (cam[:, 2:3, :] + eps)
    uv = uv.reshape(uv.shape[0], 2, rows, cols)
    uv = jnp.moveaxis(uv, 1, -1)  # (B, rows, cols, 2)
    return normalize_pixel_coords(uv, rows, cols)


def disparity_to_idepth(K: jnp.ndarray, T_right_in_left: jnp.ndarray,
                        left_disparity: jnp.ndarray) -> jnp.ndarray:
    """General (non-rectified) disparity -> inverse depth.

    Solves, per pixel, the 1-D least squares along the epipolar line
    (direction pointing far -> near), masking degenerate epilines.
    K: (B, 4, 4); T_right_in_left: (B, 4, 4);
    left_disparity: (B, rows, cols). Returns (B, rows, cols).

    Reference: image_predictor.py:120-209 (same operation order, including
    the epiline normalization eps of 1e-6 and the far point at 1e2).
    """
    B, rows, cols = left_disparity.shape
    dtype = left_disparity.dtype
    N = rows * cols

    pix = pixel_grid(rows, cols, dtype).reshape(3, -1)  # (3, N)

    Kinv = mat3_inverse(K[:, :3, :3])
    T_left_in_right = se3_inverse(T_right_in_left)
    R_lr = T_left_in_right[:, :3, :3]

    KRKinv = jnp.matmul(K[:, :3, :3],
                        jnp.matmul(R_lr, Kinv, precision="highest"),
                        precision="highest")  # (B,3,3)
    KRKinv3 = KRKinv[:, 2, :]  # (B, 3)

    KT = jnp.matmul(K[:, :4, :4], T_left_in_right, precision="highest")
    Kt = KT[:, :3, 3]  # (B, 3)

    disp = left_disparity.reshape(B, N)

    # The K=3 contractions below are written as unrolled broadcast
    # arithmetic (same f32 product/accumulation order as a matmul row)
    # rather than einsums: at the tiny shapes this runs on (the level-4
    # grid), each einsum is a separate latency-bound kernel, while the
    # unrolled form lets XLA fuse the whole pixel computation into one.
    def _mat_pix(M, px, py, s=1.0):  # (B,3,3) x [px, py, s*ones] -> 3x(B,N)
        return tuple(
            (M[:, i, 0:1] * px + M[:, i, 1:2] * py) + M[:, i, 2:3] * s
            for i in range(3))

    px, py = pix[0], pix[1]  # (N,)

    # Pixels at infinite depth.
    inf0, inf1, inf2 = _mat_pix(KRKinv, px, py)
    pix_inf = jnp.stack([inf0 / inf2, inf1 / inf2], axis=1)  # (B,2,N)

    # Far point (depth 1e2) to orient the epipolar line far -> near.
    far0, far1, far2 = _mat_pix(KRKinv, px * 1e2, py * 1e2, 1e2)
    far0 = far0 + Kt[:, 0:1]
    far1 = far1 + Kt[:, 1:2]
    far2 = far2 + Kt[:, 2:3]
    pix_far = jnp.stack([far0 / far2, far1 / far2], axis=1)  # (B,2,N)

    epi_diff = pix_far - pix_inf  # (B,2,N)
    epi_norm = jnp.sqrt(jnp.sum(epi_diff**2, axis=1))  # (B,N)
    epiline = epi_diff / (epi_norm[:, None, :] + 1e-6)

    valid = epi_norm >= 1e-6  # degenerate-epiline mask (:184)

    w = (
        KRKinv3[:, 0:1] * pix[None, 0, :]
        + KRKinv3[:, 1:2] * pix[None, 1, :]
        + KRKinv3[:, 2:3]
    )  # (B,N)

    A0 = Kt[:, 0:1] - Kt[:, 2:3] * (pix_inf[:, 0, :] + disp * epiline[:, 0, :])
    A1 = Kt[:, 1:2] - Kt[:, 2:3] * (pix_inf[:, 1, :] + disp * epiline[:, 1, :])
    b0 = w * disp * epiline[:, 0, :]
    b1 = w * disp * epiline[:, 1, :]

    ATA = A0 * A0 + A1 * A1
    ATb = A0 * b0 + A1 * b1

    # Guard the 0/0 of a fully-degenerate LSQ (zero/near-zero baseline,
    # where float rounding can leave epi_norm just above the 1e-6 mask
    # threshold while ATA is exactly 0): the reference's
    # `(~mask) * (ATb/ATA)` propagates that NaN; here the mask must
    # actually kill it, so the denominator is made safe and masked on too
    # (tests/test_geometry_fuzz.py).
    safe = ATA > 0
    idepth = jnp.where(valid & safe, ATb / jnp.where(safe, ATA, 1.0), 0.0)
    return idepth.reshape(B, rows, cols)


def idepth_to_disparity(K: jnp.ndarray, T_right_in_left: jnp.ndarray,
                        left_idepthmap: jnp.ndarray) -> jnp.ndarray:
    """Inverse depth -> general disparity: ||u' - u_inf|| in the right image.

    K: (B,4,4); T_right_in_left: (B,4,4); left_idepthmap: (B, rows, cols).
    Reference: IDepthToDisparity (image_predictor.py:223-287).
    """
    B, rows, cols = left_idepthmap.shape
    dtype = left_idepthmap.dtype

    pix = pixel_grid(rows, cols, dtype).reshape(3, -1)
    Kinv = mat3_inverse(K[:, :3, :3])
    T_left_in_right = se3_inverse(T_right_in_left)
    R_lr = T_left_in_right[:, :3, :3]
    KRKinv = jnp.matmul(K[:, :3, :3],
                        jnp.matmul(R_lr, Kinv, precision="highest"),
                        precision="highest")

    pix_inf = jnp.einsum("bij,jn->bin", KRKinv, pix, precision="highest")
    pix_inf = pix_inf / pix_inf[:, 2:3, :]

    points = backproject_idepthmap(K, left_idepthmap)
    right_pts = jnp.einsum("bij,bjn->bin", T_left_in_right[:, :3, :], points, precision="highest")
    right_pix = jnp.einsum("bij,bjn->bin", K[:, :3, :3], right_pts, precision="highest")
    right_pix = right_pix.at[:, :2, :].divide(right_pix[:, 2:3, :])

    diff = right_pix[:, :2, :] - pix_inf[:, :2, :]
    disp = jnp.sqrt(jnp.sum(diff**2, axis=1))
    return disp.reshape(B, rows, cols)


def project_idepthmap(K: jnp.ndarray, T_right_in_left: jnp.ndarray,
                      left_idepthmap: jnp.ndarray, eps: float = 1e-6):
    """Project a left inverse depthmap into the right frame.

    Returns (right_pixels (B, rows, cols, 2) normalized,
             right_idepths (B, rows, cols),
             invalid mask (B, rows, cols) -- True = out of bounds).
    Reference: IDepthmapProjector (image_predictor.py:525-576).
    """
    B, rows, cols = left_idepthmap.shape
    T_left_in_right = se3_inverse(T_right_in_left)

    points = backproject_idepthmap(K, left_idepthmap, eps)
    right_pts = jnp.einsum("bij,bjn->bin", T_left_in_right[:, :3, :], points, precision="highest")
    right_idepths = (1.0 / (right_pts[:, 2, :] + eps)).reshape(B, rows, cols)

    right_pixels = project_points(K, T_left_in_right, (rows, cols), points)

    invalid = (jnp.abs(right_pixels[..., 0]) > 1.0) | (jnp.abs(right_pixels[..., 1]) > 1.0)
    return right_pixels, right_idepths, invalid


def rectified_disparity_to_depth(K: jnp.ndarray, T_right_in_left: jnp.ndarray,
                                 left_disparity: jnp.ndarray,
                                 eps: float = 1e-7) -> jnp.ndarray:
    """Rectified disparity -> depth: fx * ||t|| / disparity.

    K, T_right_in_left: (B, 4, 4); left_disparity: (B, rows, cols).
    Reference: image_predictor.py:18-34.
    """
    fx = K[:, 0, 0][:, None, None]
    t = T_right_in_left[:, :3, 3]
    baseline = jnp.sqrt(jnp.sum(t * t, axis=-1))[:, None, None]
    return fx * baseline / (left_disparity + eps)
