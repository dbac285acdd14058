"""Batched homography estimation and decomposition.

TPU-native replacement for OpenCV's ``find_homography_ext`` +
``decompose_homography_mat`` used by the reference homography estimator
(``/root/reference/homography-estimator/src/lib.rs:107-134``).

* DLT with Hartley normalization, weight-masked so RANSAC minimal fits and
  inlier refits share one code path;
* analytic SVD-based decomposition (Ma/Soatto "An Invitation to 3-D Vision",
  alg. 5.2 — the same math behind OpenCV's Malis-Vargas implementation),
  returning the two distinct (R, t, n) families; the pure-rotation degenerate
  case falls back to the orthogonal projection of the calibrated homography.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from ofps_tpu.ops.epipolar import hartley_normalization, homogeneous

_mm = partial(jnp.matmul, precision="highest")


def dlt_homography(x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted normalized DLT: H with x2 ~ H x1.  (N,2),(N,2),(N,) -> (3,3)."""
    t1 = hartley_normalization(x1, w)
    t2 = hartley_normalization(x2, w)
    p1 = homogeneous(x1) @ t1.T
    p2 = homogeneous(x2) @ t2.T
    u1, v1 = p1[..., 0], p1[..., 1]
    u2, v2 = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    rows_a = jnp.stack(
        [-u1, -v1, -o, z, z, z, u2 * u1, u2 * v1, u2], axis=-1
    )
    rows_b = jnp.stack(
        [z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1
    )
    rows = jnp.concatenate([rows_a * w[..., None], rows_b * w[..., None]], axis=0)
    ata = _mm(rows.T, rows)
    from ofps_tpu.ops.solve import smallest_eigvecs_inverse_iteration

    vecs = smallest_eigvecs_inverse_iteration(ata, 1)
    h = vecs[:, 0].reshape(3, 3)
    h = _mm(_mm(jnp.linalg.inv(t2), h), t1)
    # Normalize so h22 ~ 1 where possible (sign/scale canonicalization).
    scale = jnp.where(jnp.abs(h[2, 2]) > 1e-12, h[2, 2], jnp.linalg.norm(h))
    return h / scale


def homography_transfer_error(h: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray):
    """Squared forward transfer error ||x2 - proj(H x1)||^2, (..., N)."""
    p = jnp.einsum("...ij,nj->...ni", h, homogeneous(x1), precision="highest")
    z = p[..., 2]
    z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    proj = p[..., :2] / z[..., None]
    return jnp.sum((proj - x2) ** 2, axis=-1)


def decompose_homography(h: jnp.ndarray, k: jnp.ndarray):
    """Decompose H (screen-space) into candidate (R, t, n) with intrinsics K.

    Returns (rs (2, 3, 3), ts (2, 3), ns (2, 3)).  The +-(t, n) sign twins
    share R, and the reference only consumes R of the min-||t|| solution
    (homography-estimator/src/lib.rs:136-146), so two families suffice.
    """
    from ofps_tpu.ops.solve import eigh3x3, svd3x3

    hn = _mm(_mm(jnp.linalg.inv(k), h), k)
    # Scale so the middle singular value is 1.
    _, s, _ = svd3x3(hn)
    hn = hn / s[1]

    hth = _mm(hn.T, hn)
    lam, v = eigh3x3(hth)  # ascending: s3^2 <= s2^2=1 <= s1^2
    s3sq, _, s1sq = lam[0], lam[1], lam[2]
    v3, v2, v1 = v[:, 0], v[:, 1], v[:, 2]

    denom = jnp.maximum(s1sq - s3sq, 1e-12)
    a = jnp.sqrt(jnp.maximum(1.0 - s3sq, 0.0) / denom)
    b = jnp.sqrt(jnp.maximum(s1sq - 1.0, 0.0) / denom)
    u1 = a * v1 + b * v3
    u2 = a * v1 - b * v3

    def family(u):
        big_u = jnp.stack([v2, u, jnp.cross(v2, u)], axis=-1)
        hv2 = hn @ v2
        hu = hn @ u
        big_w = jnp.stack([hv2, hu, jnp.cross(hv2, hu)], axis=-1)
        r = _mm(big_w, big_u.T)
        n = jnp.cross(v2, u)
        t = (hn - r) @ n
        return r, t, n

    r1, t1, n1 = family(u1)
    r2, t2, n2 = family(u2)

    # Pure-rotation degenerate case: hn is (nearly) orthogonal already.
    degenerate = (s1sq - s3sq) < 1e-5
    uu, _, vvt = svd3x3(hn)
    d = jnp.linalg.det(_mm(uu, vvt))
    r_rot = _mm(uu * jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d])[None, :], vvt)
    zero_t = jnp.zeros(3, h.dtype)

    r1 = jnp.where(degenerate, r_rot, r1)
    t1 = jnp.where(degenerate, zero_t, t1)
    r2 = jnp.where(degenerate, r_rot, r2)
    t2 = jnp.where(degenerate, zero_t, t2)

    return (
        jnp.stack([r1, r2]),
        jnp.stack([t1, t2]),
        jnp.stack([n1, n2]),
    )
