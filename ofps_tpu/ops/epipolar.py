"""Batched epipolar geometry: fundamental/essential matrices, pose recovery.

TPU-native replacements for the reference's native solvers:

* libmv's 7/8-point robust fundamental (``libmv-rust/libmv-c.cpp:9-67``,
  consumed by ``libmv-estimator/src/lib.rs:16-44``),
* OpenCV's ``find_essential_mat_matrix``/``recover_pose_estimated``
  (``multiview-estimator/src/lib.rs:99-126``),
* libmv's ``motion_from_essential_and_correspondence``
  (``libmv-estimator/src/lib.rs:188-191``).

Everything here is fixed-shape, weight-masked, and vmappable so RANSAC runs
as a single batched XLA program instead of a sequential loop.

Conventions: image points are (N, 2) in [0,1] screen space with weights
(0/1 masks); the epipolar constraint is ``x2^T F x1 = 0`` for correspondences
x1 -> x2; E = [t]x R with X2 = R X1 + t.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_mm = partial(jnp.matmul, precision="highest")


def homogeneous(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)


def hartley_normalization(p: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Similarity transform T s.t. T*p has zero centroid, mean dist sqrt(2).

    ``p``: (N, 2); ``w``: (N,).  Returns (3, 3).
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    c = jnp.sum(p * w[..., None], axis=-2) / wsum
    d = jnp.linalg.norm(p - c, axis=-1)
    mean_d = jnp.sum(d * w) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(mean_d, 1e-12)
    z = jnp.zeros_like(s)
    o = jnp.ones_like(s)
    return jnp.stack(
        [
            jnp.stack([s, z, -s * c[..., 0]], -1),
            jnp.stack([z, s, -s * c[..., 1]], -1),
            jnp.stack([z, z, o], -1),
        ],
        axis=-2,
    )


def _normalize_pts(p, w):
    t = hartley_normalization(p, w)
    ph = homogeneous(p)
    pn = _mm(ph, jnp.swapaxes(t, -1, -2))
    return pn[..., :2], t


def _epipolar_rows(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Design-matrix rows for x2^T F x1 = 0 with F row-major flattened (N, 9)."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    one = jnp.ones_like(u1)
    return jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=-1
    )


def _smallest_eigvecs(ata: jnp.ndarray, k: int) -> jnp.ndarray:
    """k eigenvectors of a symmetric (9,9) matrix with smallest eigenvalues.

    Block inverse iteration: batched ``jnp.linalg.eigh`` on small matrices
    costs ~112 ms per 8192x(9,9) on TPU; this is ~2 ms at equal accuracy
    on the (near-)singular normal matrices the minimal fits produce.
    """
    from ofps_tpu.ops.solve import smallest_eigvecs_inverse_iteration

    return smallest_eigvecs_inverse_iteration(ata, k)


def eight_point_fundamental(
    x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray
) -> jnp.ndarray:
    """Weighted normalized 8-point fundamental matrix (rank-2 enforced)."""
    x1n, t1 = _normalize_pts(x1, w)
    x2n, t2 = _normalize_pts(x2, w)
    rows = _epipolar_rows(x1n, x2n) * w[..., None]
    ata = _mm(rows.T, rows)
    f = _smallest_eigvecs(ata, 1)[..., 0].reshape(3, 3)
    # Rank-2 projection (analytic 3x3 SVD — batched LAPACK-style SVD is
    # ~37 ms per 8192 on TPU).
    from ofps_tpu.ops.solve import svd3x3

    u, s, vt = svd3x3(f)
    f = _mm(u * s.at[2].set(0.0)[None, :], vt)
    # Denormalize: x2^T T2^T F T1 x1 = 0.
    f = _mm(_mm(t2.T, f), t1)
    norm = jnp.linalg.norm(f)
    return f / jnp.maximum(norm, 1e-20)


def _det3(m):
    return (
        m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
        - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
        + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0])
    )


def _cubic_roots_real(c0, c1, c2, c3):
    """Real roots of c3 x^3 + c2 x^2 + c1 x + c0 = 0.

    Returns (roots (3,), valid (3,) bool).  Degenerate (non-cubic) cases fall
    back to the single linear/quadratic root set.  Closed-form trig/Cardano,
    fully batch-friendly.
    """
    # Normalize to monic cubic; guard c3 ~ 0 by a tiny fallback (the RANSAC
    # scoring discards bad candidates anyway).
    c3_safe = jnp.where(jnp.abs(c3) > 1e-20, c3, 1e-20)
    a = c2 / c3_safe
    b = c1 / c3_safe
    c = c0 / c3_safe
    # Depressed cubic t^3 + p t + q with x = t - a/3.
    p = b - a * a / 3.0
    q = 2.0 * a**3 / 27.0 - a * b / 3.0 + c
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3

    # Three real roots (disc <= 0): trigonometric method.
    p_neg = jnp.minimum(p, -1e-20)
    m = 2.0 * jnp.sqrt(-p_neg / 3.0)
    acos_arg = jnp.clip(3.0 * q / (p_neg * m), -1.0, 1.0)
    theta = jnp.arccos(acos_arg) / 3.0
    k = jnp.arange(3, dtype=p.dtype)
    trig_roots = m * jnp.cos(theta - 2.0 * jnp.pi * k / 3.0) - a / 3.0

    # One real root (disc > 0): Cardano.
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    cbrt = lambda v: jnp.sign(v) * jnp.abs(v) ** (1.0 / 3.0)
    single = cbrt(-q / 2.0 + sq) + cbrt(-q / 2.0 - sq) - a / 3.0

    roots = jnp.where(disc <= 0.0, trig_roots, jnp.stack([single] * 3))
    valid = jnp.where(
        disc <= 0.0,
        jnp.ones(3, dtype=bool),
        jnp.array([True, False, False]),
    )
    return roots, valid


def seven_point_fundamental(x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray):
    """7-point fundamental: up to 3 candidate matrices.

    Returns (F (3, 3, 3), valid (3,)).  Parity target: libmv's 7-point solver
    behind ``fundamental_from_correspondences_7_point_robust``.
    """
    x1n, t1 = _normalize_pts(x1, w)
    x2n, t2 = _normalize_pts(x2, w)
    rows = _epipolar_rows(x1n, x2n) * w[..., None]
    ata = _mm(rows.T, rows)
    basis = _smallest_eigvecs(ata, 2)  # (9, 2)
    f1 = basis[:, 0].reshape(3, 3)
    f2 = basis[:, 1].reshape(3, 3)
    # det(f1 + lam f2) = c0 + c1 lam + c2 lam^2 + c3 lam^3
    c0 = _det3(f1)
    c3 = _det3(f2)
    dp = _det3(f1 + f2)
    dm = _det3(f1 - f2)
    c2 = (dp + dm) / 2.0 - c0
    c1 = (dp - dm) / 2.0 - c3
    lam, valid = _cubic_roots_real(c0, c1, c2, c3)
    fs = f1[None] + lam[:, None, None] * f2[None]
    fs = _mm(_mm(t2.T[None], fs), t1[None])
    norms = jnp.sqrt(jnp.sum(fs * fs, axis=(-2, -1)))
    fs = fs / jnp.maximum(norms, 1e-20)[:, None, None]
    return fs, valid


def sampson_error(f: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) squared error per correspondence.

    ``f``: (..., 3, 3); ``x1``/``x2``: (N, 2).  Returns (..., N).
    """
    h1 = homogeneous(x1)  # (N, 3)
    h2 = homogeneous(x2)
    fx1 = jnp.einsum("...ij,nj->...ni", f, h1, precision="highest")
    ftx2 = jnp.einsum("...ji,nj->...ni", f, h2, precision="highest")
    num = jnp.einsum("ni,...ni->...n", h2, fx1, precision="highest") ** 2
    den = (
        fx1[..., 0] ** 2 + fx1[..., 1] ** 2 + ftx2[..., 0] ** 2 + ftx2[..., 1] ** 2
    )
    return num / jnp.maximum(den, 1e-20)


def essential_from_fundamental(f: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """E = K^T F K (camera.rs:184-187)."""
    return _mm(_mm(jnp.swapaxes(k, -1, -2), f), k)


def project_to_essential(e: jnp.ndarray) -> jnp.ndarray:
    """Closest true essential matrix: equal nonzero singular values."""
    from ofps_tpu.ops.solve import svd3x3

    u, s, vt = svd3x3(e)
    sm = (s[..., 0] + s[..., 1]) / 2.0
    s_new = jnp.stack([sm, sm, jnp.zeros_like(sm)], axis=-1)
    return _mm(u * s_new[..., None, :], vt)


def decompose_essential(e: jnp.ndarray):
    """Four (R, t) candidates from an essential matrix.

    Returns (rs (..., 4, 3, 3), ts (..., 4, 3)).
    """
    from ofps_tpu.ops.solve import svd3x3

    u, _, vt = svd3x3(e)
    # Make proper rotations.
    du = jnp.sign(jnp.linalg.det(u))
    dv = jnp.sign(jnp.linalg.det(vt))
    u = u * du[..., None, None]
    vt = vt * dv[..., None, None]
    w = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], e.dtype)
    r1 = _mm(_mm(u, w), vt)
    r2 = _mm(_mm(u, w.T), vt)
    t = u[..., :, 2]
    rs = jnp.stack([r1, r1, r2, r2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return rs, ts


def triangulate_depths(r: jnp.ndarray, t: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray):
    """Midpoint-free linear triangulation depths for normalized rays.

    ``x1``/``x2``: (..., 2) normalized camera coords. Returns (z1, z2): depth
    of the point in camera 1 and camera 2 frames, for X2 = R X1 + t.
    Solves the two-ray least-squares system for (z1, z2) directly:
    ``z2 * d2 = z1 * R d1 + t`` with d = (x, y, 1).
    """
    d1 = homogeneous(x1)
    d2 = homogeneous(x2)
    rd1 = jnp.einsum("...ij,...j->...i", r, d1, precision="highest")
    # Least squares over [R d1, -d2] [z1, z2]^T = -t
    a11 = jnp.sum(rd1 * rd1, axis=-1)
    a12 = -jnp.sum(rd1 * d2, axis=-1)
    a22 = jnp.sum(d2 * d2, axis=-1)
    b1 = -jnp.sum(rd1 * t, axis=-1)
    b2 = jnp.sum(d2 * t, axis=-1)
    det = a11 * a22 - a12 * a12
    det = jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    z1 = (b1 * a22 - a12 * b2) / det
    z2 = (a11 * b2 - a12 * b1) / det
    return z1, z2


def recover_pose_from_essential(
    e: jnp.ndarray,
    x1n: jnp.ndarray,
    x2n: jnp.ndarray,
    w: jnp.ndarray,
):
    """Cheirality-based (R, t) selection (OpenCV recoverPose parity).

    ``x1n``/``x2n``: (N, 2) normalized camera coordinates; ``w``: (N,) weights.
    Returns (r (3,3), t (3,), support (scalar)).
    """
    rs, ts = decompose_essential(e)  # (4,3,3), (4,3)

    def support(r, t):
        z1, z2 = triangulate_depths(r, t, x1n, x2n)
        good = (z1 > 0) & (z2 > 0)
        return jnp.sum(good * w)

    sup = jax.vmap(support)(rs, ts)
    # Tie-break (exactly-degenerate fields, e.g. zero motion, tie all four
    # candidates): prefer the smaller rotation.  The bonus is < 1, below the
    # smallest possible genuine support difference, so it never overrides
    # the cheirality vote.
    tr = jnp.trace(rs, axis1=-2, axis2=-1)  # cos(angle) = (tr - 1) / 2
    score = sup + 0.2 * (tr + 1.0) / 4.0
    best = jnp.argmax(score)
    return rs[best], ts[best], sup[best]


def _rodrigues(omega: jnp.ndarray) -> jnp.ndarray:
    """R = exp([omega]x) for (..., 3) rotation vectors.

    Formulated as ``I + A(th)[w]x + B(th)[w]x^2`` with Taylor-guarded
    A = sin(th)/th, B = (1-cos th)/th^2 so the function is DIFFERENTIABLE
    at omega = 0 (the Gauss-Newton linearization point): a normalize-the-
    axis formulation with a where(th>0, R, I) guard has a zero forward-mode
    tangent at 0 — the selected constant branch kills the rotation Jacobian
    and GN silently never updates R.
    """
    th2 = jnp.sum(omega * omega, axis=-1, keepdims=True)
    small = th2 < 1e-12
    # Evaluate trig on a value that is safe in BOTH branches; the Taylor
    # side is what gets selected (and differentiated) near zero.
    th2s = jnp.where(small, jnp.ones_like(th2), th2)
    th = jnp.sqrt(th2s)
    a = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2s)
    wx, wy, wz = omega[..., 0], omega[..., 1], omega[..., 2]
    z = jnp.zeros_like(wx)
    wcross = jnp.stack(
        [
            jnp.stack([z, -wz, wy], -1),
            jnp.stack([wz, z, -wx], -1),
            jnp.stack([-wy, wx, z], -1),
        ],
        axis=-2,
    )
    eye = jnp.eye(3, dtype=omega.dtype)
    return (
        eye + a[..., None] * wcross + b[..., None] * _mm(wcross, wcross)
    )


def _cross_mat(t: jnp.ndarray) -> jnp.ndarray:
    z = jnp.zeros_like(t[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -t[..., 2], t[..., 1]], -1),
            jnp.stack([t[..., 2], z, -t[..., 0]], -1),
            jnp.stack([-t[..., 1], t[..., 0], z], -1),
        ],
        axis=-2,
    )


def refine_pose_sampson(
    r0: jnp.ndarray,
    t0: jnp.ndarray,
    x1n: jnp.ndarray,
    x2n: jnp.ndarray,
    w: jnp.ndarray,
    iters: int = 3,
):
    """Gauss-Newton polish of (R, t) minimizing weighted Sampson error of
    E = [t]x R over normalized correspondences.

    The fundamental-matrix pipeline estimates 8 DOF (7 for F + scale) where
    the motion has only 5 — on noisy (quarter-pel codec) correspondences the
    extra DOF soak up noise that then leaks into the recovered rotation.
    This re-projects the estimate onto the 5-DOF manifold: parameters are a
    rotation vector (left-applied to R) and 2 coefficients over a basis
    orthogonal to t (direction-only translation); each iteration linearizes
    the SIGNED Sampson residual with forward-mode autodiff and solves the
    5x5 normal equations.  An update is kept only while it strictly reduces
    the weighted SSE, so exactly-degenerate data (pure rotation: t
    unobservable, residuals already ~0) is a no-op — the same acceptance
    convention as robust_fit's LO refit.

    ``x1n``/``x2n``: (N, 2) normalized camera coords; ``w``: (N,) weights.
    No reference counterpart: libmv keeps the raw F-derived pose
    (libmv-c.cpp:69-101); this is the TPU build's accuracy addition.
    """
    h1 = homogeneous(x1n)
    h2 = homogeneous(x2n)
    tn = t0 / jnp.maximum(jnp.linalg.norm(t0), 1e-20)
    # Orthonormal basis of t's tangent plane (pick the least-aligned axis).
    a = jnp.where(
        jnp.abs(tn[0]) < 0.9,
        jnp.array([1.0, 0.0, 0.0], t0.dtype),
        jnp.array([0.0, 1.0, 0.0], t0.dtype),
    )
    b1 = jnp.cross(tn, a)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-20)
    b2 = jnp.cross(tn, b1)

    def signed_residual(p, r, t):
        rr = _mm(_rodrigues(p[:3]), r)
        tt = t + p[3] * b1 + p[4] * b2
        e = _mm(_cross_mat(tt), rr)
        fx1 = jnp.einsum("ij,nj->ni", e, h1, precision="highest")
        ftx2 = jnp.einsum("ji,nj->ni", e, h2, precision="highest")
        num = jnp.einsum("ni,ni->n", h2, fx1, precision="highest")
        den = (
            fx1[..., 0] ** 2
            + fx1[..., 1] ** 2
            + ftx2[..., 0] ** 2
            + ftx2[..., 1] ** 2
        )
        return num * jax.lax.rsqrt(jnp.maximum(den, 1e-20))

    def sse(r, t):
        res = signed_residual(jnp.zeros(5, r.dtype), r, t)
        return jnp.sum(w * res * res)

    r, t = r0, tn
    best = sse(r, t)
    for _ in range(iters):
        res = signed_residual(jnp.zeros(5, r.dtype), r, t)
        jac = jax.jacfwd(signed_residual)(jnp.zeros(5, r.dtype), r, t)
        jw = jac * w[:, None]
        g = _mm(jw.T, jac)  # (5, 5)
        g = g + (1e-8 * jnp.trace(g) + 1e-20) * jnp.eye(5, dtype=g.dtype)
        rhs = -_mm(jw.T, res[:, None])[:, 0]
        from ofps_tpu.ops.solve import gauss_solve

        step = gauss_solve(g, rhs[:, None])[:, 0]
        r_new = _mm(_rodrigues(step[:3]), r)
        t_new = t + step[3] * b1 + step[4] * b2
        t_new = t_new / jnp.maximum(jnp.linalg.norm(t_new), 1e-20)
        new = sse(r_new, t_new)
        good = (new < best) & jnp.all(jnp.isfinite(step))
        r = jnp.where(good, r_new, r)
        t = jnp.where(good, t_new, t)
        best = jnp.where(good, new, best)
    return r, t * jnp.linalg.norm(t0)


def rotation_only_fallback(
    r: jnp.ndarray,
    x1n: jnp.ndarray,
    x2n: jnp.ndarray,
    w: jnp.ndarray,
    ratio: float = 0.5,
    iters: int = 6,
):
    """Rotation-only (weighted Kabsch) fallback for epipolar-degenerate data.

    Pure/near-pure rotation is DEGENERATE for fundamental/essential
    estimation (H^T E antisymmetric has a 3-dim solution family): the
    robustly-fitted epipolar pose can land anywhere in that family, which
    is why the reference's epipolar estimators are its least accurate on
    the rotation clips (docs/statistics/err_av.csv).  Recovery: fit the
    rotation-only model — weighted Kabsch on the bearing vectors, with the
    orthogonal projection done by Newton polar iteration (the analytic
    eigh/svd3x3 are unreliable on the near-repeated spectra this produces)
    — and take it IFF it explains the correspondences decisively better
    (``ratio``) than the epipolar rotation: real translation leaves
    parallax the rotation-only model cannot absorb, so the gate stays
    epipolar there.

    ``x1n, x2n``: (N, 2) NORMALIZED (K^-1) coordinates; ``w``: (N,) inlier
    weights; ``r``: the epipolar rotation candidate.  Returns ``(r', used)``.
    """
    d1 = homogeneous(x1n)
    d1 = d1 / jnp.linalg.norm(d1, axis=-1, keepdims=True)
    d2 = homogeneous(x2n)
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    c = jnp.einsum("ni,nj,n->ij", d2, d1, w, precision="highest")
    rk = c
    for _ in range(iters):
        det = jnp.linalg.det(rk)
        det = jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
        cof = jnp.stack(
            [
                jnp.cross(rk[1], rk[2]),
                jnp.cross(rk[2], rk[0]),
                jnp.cross(rk[0], rk[1]),
            ]
        )
        rk = 0.5 * (rk + cof / det)

    def resid(rm):
        pred = jnp.einsum("ij,nj->ni", rm, d1, precision="highest")
        return jnp.sum(jnp.sum(jnp.cross(d2, pred) ** 2, axis=-1) * w)

    use_k = (resid(rk) <= ratio * resid(r)) & (jnp.linalg.det(rk) > 0.0)
    return jnp.where(use_k, rk, r), use_k


def motion_from_essential_and_correspondence(
    e: jnp.ndarray, k: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray
):
    """(R, t) from E using a single correspondence's cheirality.

    Parity: libmv ``motion_from_essential_and_correspondence``
    (libmv-rust/libmv-c.cpp:69-101 surface).  ``x1``/``x2``: (2,) screen pts.
    """
    from ofps_tpu.ops.solve import inv3x3

    kinv = inv3x3(k)
    h1 = _mm(kinv, homogeneous(x1))
    h2 = _mm(kinv, homogeneous(x2))
    x1n = h1[:2] / h1[2]
    x2n = h2[:2] / h2[2]
    return recover_pose_from_essential(
        e, x1n[None], x2n[None], jnp.ones((1,), e.dtype)
    )
