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
    # precision="highest": TPU default matmul precision is bf16, which
    # quantizes the normalized point coordinates to ~3 digits and costs
    # whole tenths of a degree downstream.
    p1 = _mm(homogeneous(x1), t1.T)
    p2 = _mm(homogeneous(x2), t2.T)
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
    from ofps_tpu.ops.solve import inv3x3

    # inv3x3: jnp.linalg.inv's LU path is sequential while-loop code —
    # needlessly slow for the well-conditioned similarity transform.
    h = _mm(_mm(inv3x3(t2), h), t1)
    # Normalize so h22 ~ 1 where possible (sign/scale canonicalization).
    scale = jnp.where(jnp.abs(h[2, 2]) > 1e-12, h[2, 2], jnp.linalg.norm(h))
    return h / scale


def gn_refine_homography(
    h: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    w: jnp.ndarray,
    iters: int = 3,
) -> jnp.ndarray:
    """Gauss-Newton polish of H on weighted forward transfer error.

    The reference's OpenCV ``find_homography_ext`` refines the RANSAC/LMedS
    result with Levenberg-Marquardt on the inlier set; this is the batched
    fixed-iteration equivalent (8-parameter chart with h22 = 1, analytic
    Jacobian, Levenberg damping, step kept only when the weighted SSE
    improves).
    """
    from ofps_tpu.ops.solve import gauss_solve

    def sse(hm):
        return jnp.sum(homography_transfer_error(hm, x1, x2) * w)

    x1h = homogeneous(x1)  # (N, 3)

    def step(hm):
        scale = jnp.where(jnp.abs(hm[2, 2]) > 1e-12, hm[2, 2], 1.0)
        hm = hm / scale
        p = jnp.einsum("ij,nj->ni", hm, x1h, precision="highest")
        z = p[..., 2]
        z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
        proj = p[..., :2] / z[..., None]
        r = (proj - x2) * w[..., None]  # (N, 2) weighted residuals
        invz = 1.0 / z
        # Jacobian wrt theta = (h00..h02, h10..h12, h20, h21), h22 = 1.
        zero3 = jnp.zeros_like(x1h)
        j0 = jnp.concatenate(
            [
                x1h * invz[:, None],
                zero3,
                -p[..., 0:1] * x1h[:, :2] * (invz**2)[:, None],
            ],
            axis=-1,
        )  # (N, 8)
        j1 = jnp.concatenate(
            [
                zero3,
                x1h * invz[:, None],
                -p[..., 1:2] * x1h[:, :2] * (invz**2)[:, None],
            ],
            axis=-1,
        )
        jw = jnp.concatenate([j0 * w[..., None], j1 * w[..., None]], axis=0)
        rr = jnp.concatenate([r[:, 0], r[:, 1]], axis=0)
        jtj = _mm(jw.T, jw)
        # Levenberg damping keeps near-singular systems stable.
        jtj = jtj + 1e-8 * jnp.trace(jtj) / 8.0 * jnp.eye(8, dtype=jtj.dtype)
        jtr = jnp.einsum("ni,n->i", jw, rr, precision="highest")
        delta = gauss_solve(jtj, -jtr[:, None])[:, 0]
        upd = jnp.concatenate([delta, jnp.zeros(1, delta.dtype)]).reshape(3, 3)
        cand = hm + upd
        return jnp.where(sse(cand) < sse(hm), cand, hm)

    for _ in range(iters):
        h = step(h)
    return h


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
    from ofps_tpu.ops.solve import eigh3x3, inv3x3, svd3x3

    hn = _mm(_mm(inv3x3(k), h), k)
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
        hv2 = jnp.einsum("ij,j->i", hn, v2, precision="highest")
        hu = jnp.einsum("ij,j->i", hn, u, precision="highest")
        big_w = jnp.stack([hv2, hu, jnp.cross(hv2, hu)], axis=-1)
        r = _mm(big_w, big_u.T)
        n = jnp.cross(v2, u)
        t = jnp.einsum("ij,j->i", hn - r, n, precision="highest")
        return r, t, n

    r1, t1, n1 = family(u1)
    r2, t2, n2 = family(u2)

    # Pure-rotation degenerate case: hn is (nearly) orthogonal already.
    # Near the degeneracy the family formulas divide by s1^2 - s3^2 and
    # amplify f32 noise into ~degree-level rotation error, so the guard
    # band must sit well above f32 singular-value noise (~1e-6): 1e-4
    # still trips for genuine translations (||t||/d of a few percent gives
    # s1^2 - s3^2 in the 1e-2 range).
    #
    # The orthogonal projection itself uses NEWTON POLAR ITERATION
    # (X <- (X + X^-T)/2, quadratic convergence), NOT svd3x3: the analytic
    # eigh-based SVD degenerates on (near-)identity spectra — exactly the
    # regime this branch exists for.
    degenerate = (s1sq - s3sq) < 1e-4
    r_rot = hn
    for _ in range(4):
        det = (
            r_rot[0, 0] * (r_rot[1, 1] * r_rot[2, 2] - r_rot[1, 2] * r_rot[2, 1])
            - r_rot[0, 1] * (r_rot[1, 0] * r_rot[2, 2] - r_rot[1, 2] * r_rot[2, 0])
            + r_rot[0, 2] * (r_rot[1, 0] * r_rot[2, 1] - r_rot[1, 1] * r_rot[2, 0])
        )
        det = jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
        # Adjugate^T / det = inverse^T; (X + X^-T)/2.
        cof = jnp.stack([
            jnp.cross(r_rot[1], r_rot[2]),
            jnp.cross(r_rot[2], r_rot[0]),
            jnp.cross(r_rot[0], r_rot[1]),
        ])  # rows: cofactor rows -> inv(X)^T = cof / det
        r_rot = 0.5 * (r_rot + cof / det)
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
