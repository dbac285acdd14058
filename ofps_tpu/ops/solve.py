"""Small batched linear-algebra helpers shared by the estimators.

These replace the reference's nalgebra LU solves (e.g.
``almeida-estimator/src/lib.rs:181-183``, ``ofps/src/utils.rs:82-88``) with
closed-form Cramer solves that vmap cleanly and return zeros on singular
systems (matching nalgebra's ``solve(...).unwrap_or_default()`` pattern).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def det3(a: jnp.ndarray) -> jnp.ndarray:
    """Determinant of (..., 3, 3)."""
    return (
        a[..., 0, 0] * (a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1])
        - a[..., 0, 1] * (a[..., 1, 0] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 0])
        + a[..., 0, 2] * (a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0])
    )


def solve3x3(a: jnp.ndarray, b: jnp.ndarray, fallback: float = 0.0) -> jnp.ndarray:
    """Solve ``a @ x = b`` for (..., 3, 3) and (..., 3) via Cramer's rule.

    Singular systems return ``fallback`` (reference behavior: zero model).
    """
    d = det3(a)
    cols = []
    for i in range(3):
        cols.append(det3(a.at[..., :, i].set(b)))
    x = jnp.stack(cols, axis=-1)
    safe = jnp.abs(d) > 1e-30
    return jnp.where(
        safe[..., None], x / jnp.where(safe, d, 1.0)[..., None], fallback
    )


def gauss_solve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched unpivoted Gauss-Jordan solve: (..., n, n) @ x = (..., n, k).

    For the SPD / diagonally-regularized systems the estimators build
    (normal equations), unpivoted elimination is stable — and fully
    vectorizes over the batch: 13x faster than ``jnp.linalg.solve``'s
    LAPACK-style path on TPU for 8192 x (9, 9).
    """
    n = a.shape[-1]
    aug = jnp.concatenate([a, b], axis=-1)
    for k in range(n):
        piv = aug[..., k : k + 1, :] / aug[..., k : k + 1, k : k + 1]
        aug = aug - aug[..., :, k : k + 1] * piv
        aug = aug.at[..., k, :].set(piv[..., 0, :])
    return aug[..., n:]


def gauss_solve_pivoted(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched Gauss-Jordan with partial pivoting: (..., n, n) @ x = (..., n, k).

    For GENERAL (non-SPD) systems where :func:`gauss_solve`'s unpivoted
    elimination can hit a near-zero leading pivot (the 5-point solver's
    constraint-matrix elimination).  Pivot selection and row swaps are
    one-hot masked updates — no gathers — so it vmaps cleanly over
    hypothesis batches.  Singular systems yield non-finite entries for the
    caller to gate (matching the solver's candidate-validity convention).
    """
    n = a.shape[-1]
    aug = jnp.concatenate([a, b], axis=-1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    for k in range(n):
        col = jnp.abs(aug[..., :, k])
        col = jnp.where(rows >= k, col, -1.0)
        p = jnp.argmax(col, axis=-1)  # (...,)
        onehot_p = (rows == p[..., None]).astype(aug.dtype)  # (..., n)
        onehot_k = (rows == k).astype(aug.dtype)
        pivot_row = jnp.sum(onehot_p[..., None] * aug, axis=-2)
        delta = (pivot_row - aug[..., k, :])[..., None, :]
        aug = aug + onehot_k[..., None] * delta - onehot_p[..., None] * delta
        piv = aug[..., k, k]
        safe = jnp.where(jnp.abs(piv) > 1e-30, piv, 1e-30)
        factor = jnp.where(rows != k, aug[..., :, k] / safe[..., None], 0.0)
        aug = aug - factor[..., None] * aug[..., k, None, :]
    diag = jnp.stack([aug[..., i, i] for i in range(n)], axis=-1)
    return aug[..., :, n:] / diag[..., None]


def gauss_inverse(a: jnp.ndarray) -> jnp.ndarray:
    """Batched unpivoted Gauss-Jordan inverse of (..., n, n).

    Same elimination as :func:`gauss_solve` with an identity RHS.  One
    n-step elimination buys an explicit inverse that turns every LATER
    solve against the same matrix into a single matmul — that is what
    keeps :func:`smallest_eigvecs_inverse_iteration`'s sequential kernel
    chain short on TPU (tiny sequential fusions are launch-bound there).
    """
    n = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    return gauss_solve(a, eye)


def inv3x3(a: jnp.ndarray, fallback: float = 0.0) -> jnp.ndarray:
    """Analytic (adjugate/det) inverse of (..., 3, 3).

    ``jnp.linalg.inv`` lowers to LU + triangular solves — sequential
    while-loop code that costs far more than this one fused elementwise
    formula for the well-conditioned 3x3s the geometry layers invert
    (intrinsics, Hartley similarity transforms).  Singular input returns
    ``fallback`` (matching :func:`solve3x3` semantics).
    """
    cof = jnp.stack(
        [
            jnp.cross(a[..., 1, :], a[..., 2, :]),
            jnp.cross(a[..., 2, :], a[..., 0, :]),
            jnp.cross(a[..., 0, :], a[..., 1, :]),
        ],
        axis=-1,
    )  # columns: inv(A) * det
    det = jnp.sum(a[..., 0, :] * cof[..., :, 0], axis=-1)
    safe = jnp.abs(det) > 1e-30
    return jnp.where(
        safe[..., None, None],
        cof / jnp.where(safe, det, 1.0)[..., None, None],
        fallback,
    )


def smallest_eigvecs_inverse_iteration(
    ata: jnp.ndarray, k: int = 1, iters: int = 3, eps_rel: float = 1e-7
) -> jnp.ndarray:
    """k eigenvectors of symmetric PSD (..., n, n) with smallest eigenvalues.

    Block inverse iteration with Gram-Schmidt orthogonalization — replaces
    ``jnp.linalg.eigh`` whose batched small-matrix path costs ~112 ms per
    8192 x (9, 9) on TPU (vs ~2 ms here).  For RANSAC minimal fits the
    target eigenvalues are (near-)zero with a healthy gap, so 2-3
    iterations converge; MORE iterations amplify f32 noise once converged
    (iters=5 sent the libmv chain 100x off) — keep 3.  Returns
    (..., n, k), columns orthonormal.
    """
    n = ata.shape[-1]
    tr = jnp.trace(ata, axis1=-2, axis2=-1)[..., None, None]
    shifted = ata + (eps_rel * tr / n + 1e-30) * jnp.eye(n, dtype=ata.dtype)
    # Deterministic, generic start block.
    v0 = jnp.eye(n, k, dtype=ata.dtype) + 0.01 * jnp.arange(
        1.0, n * k + 1.0, dtype=ata.dtype
    ).reshape(n, k)
    v = jnp.broadcast_to(v0, ata.shape[:-2] + (n, k))
    # ONE explicit Gauss-Jordan inverse, then each iteration is a single
    # matmul: the per-iteration elimination this replaces was an n-step
    # sequential chain of tiny fusions — launch-bound on TPU, ~3x the
    # kernel count for the same arithmetic (round-4 homography-stage
    # bisection: the batched minimal DLTs spent ~600 us/frame here).
    inv = gauss_inverse(shifted)
    for _ in range(iters):
        v = jnp.einsum(
            "...ij,...jk->...ik", inv, v, precision="highest"
        )
        # Gram-Schmidt (k is 1 or 2 in practice).
        cols = []
        for j in range(k):
            c = v[..., :, j]
            for cprev in cols:
                c = c - jnp.sum(c * cprev, axis=-1, keepdims=True) * cprev
            c = c / jnp.maximum(
                jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-30
            )
            cols.append(c)
        v = jnp.stack(cols, axis=-1)
    return v


def eigh3x3(a: jnp.ndarray):
    """Analytic symmetric 3x3 eigendecomposition (ascending eigenvalues).

    Closed-form (Cardano) eigenvalues + cross-product eigenvectors — pure
    elementwise math, vs ~28 ms per 8192 batch for ``jnp.linalg.eigh``.
    Returns (vals (..., 3), vecs (..., 3, 3)) with ``vecs[..., :, i]`` the
    i-th eigenvector.
    """
    q = jnp.trace(a, axis1=-2, axis2=-1) / 3.0
    b = a - q[..., None, None] * jnp.eye(3, dtype=a.dtype)
    p2 = jnp.sum(b * b, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detb = det3(b)
    r = detb / jnp.maximum(2.0 * p**3, 1e-30)
    phi = jnp.arccos(jnp.clip(r, -1.0, 1.0)) / 3.0
    two_pi_3 = 2.0943951023931953
    e0 = q + 2.0 * p * jnp.cos(phi + two_pi_3)  # smallest
    e2 = q + 2.0 * p * jnp.cos(phi)  # largest
    e1 = 3.0 * q - e0 - e2
    vals = jnp.stack([e0, e1, e2], axis=-1)

    def eigvec(lam, other1, other2):
        # (A - o1 I)(A - o2 I) columns span the lam eigenspace.
        m = _matmul(
            a - other1[..., None, None] * jnp.eye(3, dtype=a.dtype),
            a - other2[..., None, None] * jnp.eye(3, dtype=a.dtype),
        )
        # Pick the largest column for robustness.
        norms = jnp.sum(m * m, axis=-2)
        best = jnp.argmax(norms, axis=-1)
        v = jnp.take_along_axis(
            m, best[..., None, None].repeat(3, axis=-2), axis=-1
        )[..., 0]
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        # Degenerate (repeated eigenvalue): fall back to an axis vector.
        fallback = jnp.zeros_like(v).at[..., 0].set(1.0)
        return jnp.where(n > 1e-20, v / jnp.maximum(n, 1e-30), fallback)

    v0 = eigvec(e0, e1, e2)
    v2 = eigvec(e2, e0, e1)
    # Orthogonalize v2 against v0 and complete the triad.
    v2 = v2 - jnp.sum(v2 * v0, axis=-1, keepdims=True) * v0
    n2 = jnp.linalg.norm(v2, axis=-1, keepdims=True)
    alt = jnp.cross(v0, jnp.broadcast_to(jnp.eye(3, dtype=a.dtype)[0], v0.shape))
    alt_n = jnp.linalg.norm(alt, axis=-1, keepdims=True)
    alt2 = jnp.cross(v0, jnp.broadcast_to(jnp.eye(3, dtype=a.dtype)[1], v0.shape))
    alt = jnp.where(alt_n > 0.1, alt / jnp.maximum(alt_n, 1e-30),
                    alt2 / jnp.maximum(jnp.linalg.norm(alt2, axis=-1, keepdims=True), 1e-30))
    v2 = jnp.where(n2 > 1e-10, v2 / jnp.maximum(n2, 1e-30), alt)
    v1 = jnp.cross(v2, v0)
    return vals, jnp.stack([v0, v1, v2], axis=-1)


def _matmul(a, b):
    return jnp.einsum("...ij,...jk->...ik", a, b, precision="highest")


def svd3x3(m: jnp.ndarray):
    """Analytic SVD of (..., 3, 3): returns (u, s, vt), s descending.

    Built on :func:`eigh3x3` of ``MᵀM``; the left factor comes from
    ``M V / s`` with a cross-product completion for (near-)zero singular
    values — exact for the rank-2/rank-3 matrices the epipolar pipeline
    produces.

    LIMITATION: like any analytic eigh, the eigenvector directions are
    unreliable when the spectrum is (near-)fully repeated — e.g. M close
    to a rotation, where MᵀM ~ I.  Epipolar consumers never hit that
    (essential/fundamental spectra keep a zero singular value with a
    healthy gap); for orthogonal PROJECTION of a near-rotation use Newton
    polar iteration instead (see
    ``ops.homography.decompose_homography``'s degenerate branch, which
    was numerically garbage when built on this SVD).
    """
    ata = _matmul(jnp.swapaxes(m, -1, -2), m)
    vals, vecs = eigh3x3(ata)
    # Descending singular values.
    s = jnp.sqrt(jnp.maximum(vals[..., ::-1], 0.0))
    v = vecs[..., ::-1]  # columns reordered to match
    mv = _matmul(m, v)
    u0 = mv[..., :, 0] / jnp.maximum(s[..., 0:1], 1e-30)
    u1 = mv[..., :, 1] / jnp.maximum(s[..., 1:2], 1e-30)
    # Orthonormalize u1 against u0; u2 completes the right-handed triad.
    u0 = u0 / jnp.maximum(jnp.linalg.norm(u0, axis=-1, keepdims=True), 1e-30)
    u1 = u1 - jnp.sum(u1 * u0, axis=-1, keepdims=True) * u0
    u1 = u1 / jnp.maximum(jnp.linalg.norm(u1, axis=-1, keepdims=True), 1e-30)
    u2 = jnp.cross(u0, u1)
    # Sign of u2 so that M ~ U S Vᵀ holds for full-rank M (s2 > 0).
    mv2 = mv[..., :, 2]
    sgn = jnp.where(jnp.sum(mv2 * u2, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    u2s = u2 * sgn
    use_m = (s[..., 2:3] > 1e-12 * jnp.maximum(s[..., 0:1], 1e-30))
    u2 = jnp.where(use_m, u2s, u2)
    u = jnp.stack([u0, u1, u2], axis=-1)
    return u, s, jnp.swapaxes(v, -1, -2)


def solve2x2(a: jnp.ndarray, b: jnp.ndarray, fallback: float = 0.0) -> jnp.ndarray:
    d = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    x0 = b[..., 0] * a[..., 1, 1] - a[..., 0, 1] * b[..., 1]
    x1 = a[..., 0, 0] * b[..., 1] - b[..., 0] * a[..., 1, 0]
    safe = jnp.abs(d) > 1e-30
    return jnp.where(
        safe[..., None],
        jnp.stack([x0, x1], -1) / jnp.where(safe, d, 1.0)[..., None],
        fallback,
    )
