"""Nistér 5-point minimal essential-matrix solver, TPU-batchable.

Parity target: the reference multiview estimator calls OpenCV's
``find_essential_mat`` which uses Nistér's 5-point solver
(``/root/reference/multiview-estimator/src/lib.rs:66-110``).  OpenCV's
implementation builds Nistér's Gauss-Jordan tableau symbolically and runs a
sequential root finder — neither maps to TPU.  This is a from-scratch
**hidden-variable resultant** formulation in which every step is dense
batched linear algebra with static shapes:

1. The 4-dim null space of the 5x9 epipolar design matrix gives
   ``E(x, y, z) = x E1 + y E2 + z E3 + E4`` (scale fixed on the E4 axis).
2. The 10 cubic constraints (``det E = 0`` and the trace constraint
   ``2 E Eᵀ E - tr(E Eᵀ) E = 0``) are polynomials in (x, y) of total degree
   3 once z is fixed — exactly 10 bivariate monomials.  Their coefficients
   are extracted **numerically**: evaluate the constraint vector at 10
   fixed (x, y) probe points and multiply by a precomputed inverse monomial
   matrix (no symbolic expansion at all).
3. A nontrivial (x, y) solution requires ``det M(z) = 0`` where M(z) is the
   10x10 coefficient matrix: a degree-10 polynomial in z (Nistér's).  Its
   coefficients come from **determinant interpolation** at 11 Chebyshev
   nodes (batched Gauss elimination with partial pivoting, no LAPACK).
4. Real roots via sign changes of the homogenized polynomial on a tan-angle
   grid + fixed-count bisection, then Newton polish directly on
   ``det M(z)`` (kills the interpolation conditioning error).
5. For each root, (x, y) is the null vector of M(z*) (inverse iteration),
   read off the linear monomials.

Everything vmaps over RANSAC hypotheses; up to 10 candidate E per sample,
matching :func:`ofps_tpu.ops.robust.robust_fit`'s multi-model convention.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ofps_tpu.ops.epipolar import _epipolar_rows, project_to_essential
from ofps_tpu.ops.solve import (
    gauss_solve,
    smallest_eigvecs_inverse_iteration,
)

_mm = partial(jnp.matmul, precision="highest")

# Bivariate monomial basis for fixed z: B10(x, y).
# Order: [x^3, x^2 y, x y^2, y^3, x^2, x y, y^2, x, y, 1]
_IDX_X, _IDX_Y, _IDX_1 = 7, 8, 9


def _monomials10(x, y):
    return np.stack(
        [x**3, x**2 * y, x * y**2, y**3, x**2, x * y, y**2, x, y, np.ones_like(x)],
        axis=0,
    )


def _probe_points():
    """10 (x, y) probe points with a well-conditioned monomial matrix."""
    ang = np.arange(10) * (2.0 * np.pi / 10.0) + 0.35
    rad = np.where(np.arange(10) % 2 == 0, 0.75, 1.35)
    return rad * np.cos(ang), rad * np.sin(ang)


_PX, _PY = _probe_points()
# c_j(x_i, y_i) = (M @ Vt)[j, i] with Vt[k, i] = B10_k(x_i, y_i)
# => M = C @ inv(Vt).  Precomputed in float64 (cond ~ 60).
# Host (numpy) constants: module import must not dispatch device ops.
_VT_INV = np.asarray(np.linalg.inv(_monomials10(_PX, _PY)), np.float32)
_PXJ = np.asarray(_PX, np.float32)
_PYJ = np.asarray(_PY, np.float32)

# --- homogeneous (tan-angle) interpolation of the degree-10 det polynomial.
#
# det M(z) restricted to z = tan(θ) and homogenized, P(θ) = cos¹⁰θ·det M(tanθ),
# is a π-periodic trig polynomial spanned EXACTLY by the 11 even harmonics
# {1, cos2θ, sin2θ, ..., cos10θ, sin10θ}.  Sampling at 11 equispaced θ over
# one period makes the interpolation DFT-like (condition ~1, float64-checked
# below) and P evaluable STABLY at any θ — including the |z| >> 1 roots where
# a z-domain Vandermonde interpolant extrapolates catastrophically.  That
# stability is what lets Newton polish run on the interpolant itself instead
# of re-evaluating batched 10x10 determinants per iteration (the determinant
# tensors were ~half the 5-point solver's wall time).
_TH = ((2.0 * np.arange(11) + 1.0) / 22.0 - 0.5) * np.pi  # open (-π/2, π/2)


def _trig_basis_np(theta):
    cols = [np.ones_like(theta)]
    for h in (2, 4, 6, 8, 10):
        cols += [np.cos(h * theta), np.sin(h * theta)]
    return np.stack(cols, axis=-1)  # (..., 11)


_TRIG_INV = np.asarray(np.linalg.inv(_trig_basis_np(_TH)), np.float32)
_TAN_N = np.asarray(np.tan(_TH), np.float32)
# Determinants are taken of cos²θ·M(tanθ): the cos² keeps the edge-node
# entries bounded (no f32 pivot-product overflow at |z| ~ 14), and
# det(cos²M) = cos²⁰·det M, so P = det(cos²M)/cos¹⁰.
_COS2_N = np.asarray(np.cos(_TH) ** 2, np.float32)
_COS10_N = np.asarray(np.cos(_TH) ** 10, np.float32)

_N_GRID = 512  # tan-angle sign-scan resolution
_GRID_TH = np.linspace(
    -np.pi / 2 * 0.999, np.pi / 2 * 0.999, _N_GRID
)
_GRID_B = np.asarray(_trig_basis_np(_GRID_TH), np.float32)  # (G, 11)
_GRID_THJ = np.asarray(_GRID_TH, np.float32)
_HADAMARD4 = np.asarray(
    0.5
    * np.array(
        [[1, 1, 1, 1], [1, -1, 1, -1], [1, 1, -1, -1], [1, -1, -1, 1]],
        np.float64,
    ),
    np.float32,
)
_MAX_ROOTS = 10
_EXTRA_SEEDS = 4


def _constraints(e):
    """The 10 cubic scalar constraints of an essential matrix, batched.

    ``e``: (..., 3, 3).  Returns (..., 10): [det; flat(2 E Eᵀ E − tr(E Eᵀ) E)].
    """
    det = (
        e[..., 0, 0] * (e[..., 1, 1] * e[..., 2, 2] - e[..., 1, 2] * e[..., 2, 1])
        - e[..., 0, 1] * (e[..., 1, 0] * e[..., 2, 2] - e[..., 1, 2] * e[..., 2, 0])
        + e[..., 0, 2] * (e[..., 1, 0] * e[..., 2, 1] - e[..., 1, 1] * e[..., 2, 0])
    )
    eet = _mm(e, jnp.swapaxes(e, -1, -2))
    tr = eet[..., 0, 0] + eet[..., 1, 1] + eet[..., 2, 2]
    m = 2.0 * _mm(eet, e) - tr[..., None, None] * e
    return jnp.concatenate(
        [det[..., None], m.reshape(m.shape[:-2] + (9,))], axis=-1
    )


def _coeff_matrix(basis, z):
    """M(z): (..., 10, 10) coefficients over B10(x, y) for fixed z.

    ``basis``: (..., 4, 3, 3) null-space matrices [E1, E2, E3, E4];
    ``z``: (...,) the hidden variable.
    """
    e1, e2, e3, e4 = (basis[..., k, :, :] for k in range(4))
    c = e3 * z[..., None, None] + e4  # (..., 3, 3)
    # Evaluate constraints at the 10 probe points: E = x E1 + y E2 + C.
    e = (
        _PXJ[:, None, None] * e1[..., None, :, :]
        + _PYJ[:, None, None] * e2[..., None, :, :]
        + c[..., None, :, :]
    )  # (..., 10pts, 3, 3)
    cons = _constraints(e)  # (..., 10pts, 10cons)
    return _mm(jnp.swapaxes(cons, -1, -2), _VT_INV)


def _det10(m):
    """Determinant of (..., n, n) by Gauss elimination w/ partial pivoting.

    Vectorized: pivot selection and row swaps are one-hot masked updates (no
    gathers), so it vmaps cleanly over hypothesis x node batches.
    """
    n = m.shape[-1]
    batch = m.shape[:-2]
    det = jnp.ones(batch, m.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    for k in range(n):
        col = jnp.abs(m[..., :, k])
        col = jnp.where(rows >= k, col, -1.0)
        p = jnp.argmax(col, axis=-1)  # (...,)
        onehot_p = (rows == p[..., None]).astype(m.dtype)  # (..., n)
        onehot_k = (rows == k).astype(m.dtype)
        pivot_row = jnp.sum(onehot_p[..., None] * m, axis=-2)  # (..., n)
        k_row = m[..., k, :]
        # Swap rows k and p (no-op when p == k).
        m = (
            m
            + onehot_k[..., None] * (pivot_row - k_row)[..., None, :]
            - onehot_p[..., None] * (pivot_row - k_row)[..., None, :]
        )
        det = det * jnp.where(p == k, 1.0, -1.0)
        piv = m[..., k, k]
        det = det * piv
        safe = jnp.where(jnp.abs(piv) > 1e-30, piv, 1e-30)
        factor = jnp.where(rows > k, m[..., :, k] / safe[..., None], 0.0)
        m = m - factor[..., None] * m[..., k, None, :]
    return det


def _trig_eval(coefs, theta, want_grad=False):
    """P(θ) (and optionally dP/dθ) in the even-harmonic basis.

    ``coefs``: (..., 11) over [1, cos2θ, sin2θ, ..., cos10θ, sin10θ];
    ``theta``: (..., R) sharing the leading batch dims.  Harmonics come
    from the double-angle recurrence — ~4 muls each, no transcendental
    beyond the first cos/sin pair.
    """
    c2 = jnp.cos(2.0 * theta)
    s2 = jnp.sin(2.0 * theta)
    acc = jnp.broadcast_to(coefs[..., 0, None], theta.shape)
    grad = jnp.zeros_like(theta) if want_grad else None
    ck, sk = c2, s2
    for i in range(1, 6):
        ac = coefs[..., 2 * i - 1, None]
        as_ = coefs[..., 2 * i, None]
        acc = acc + ac * ck + as_ * sk
        if want_grad:
            grad = grad + 2.0 * i * (as_ * ck - ac * sk)
        if i < 5:
            ck, sk = ck * c2 - sk * s2, sk * c2 + ck * s2
    if want_grad:
        return acc, grad
    return acc


def five_point_essential(x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray):
    """Up to 10 essential-matrix candidates from a (weighted) 5-point sample.

    ``x1``/``x2``: (N, 2) normalized camera coordinates; ``w``: (N,) 0/1
    weights (the minimal sample uses the 5 highest-weight rows implicitly —
    callers pass exactly-5 gathered samples from
    :func:`ofps_tpu.ops.robust.robust_fit`).

    Returns ``(es (28, 3, 3), valid (28,) bool)``: up to 10 bracketed
    roots plus 4 tangent-root candidates per chart, two charts.
    """
    rows = _epipolar_rows(x1, x2) * w[..., None]  # (N, 9)
    ata = _mm(rows.T, rows)
    nullb = smallest_eigvecs_inverse_iteration(ata, k=4, iters=4)  # (9, 4)
    basis = jnp.swapaxes(nullb, -1, -2).reshape(4, 3, 3)  # [E1..E4]

    # The w=1 chart degenerates when the true solution has a tiny E4
    # coordinate (x, y, z blow up); solve a second chart with the basis
    # mixed by a fixed orthogonal 4x4 (Hadamard/2) whose degeneracy set is
    # disjoint, and pool the candidates.  Both charts run as ONE batched
    # _solve_chart call: the per-chart op chain is tiny sequential fusions
    # (launch-bound on TPU), so stacking halves the kernel count for the
    # same arithmetic.
    charts = jnp.stack(
        [basis, _mm(_HADAMARD4, basis.reshape(4, 9)).reshape(4, 3, 3)]
    )  # (2, 4, 3, 3)
    es, valid = _solve_chart(charts)
    nroots = es.shape[-3]
    return (
        es.reshape((2 * nroots, 3, 3)),
        valid.reshape((2 * nroots,)),
    )


def _solve_chart(basis):
    """All essential candidates per chart of the null space, batched.

    ``basis``: (..., 4, 3, 3) — any leading batch dims (the caller stacks
    the two charts; robust_fit's vmap adds the hypothesis dim).  Returns
    ``(es (..., R, 3, 3), valid (..., R))`` with R = _MAX_ROOTS +
    _EXTRA_SEEDS.
    """
    batch = basis.shape[:-3]
    bb = basis[..., None, :, :, :]  # broadcast slot for the z/node axis

    # --- P(θ) = cos¹⁰θ·det M(tanθ) by trig interpolation (see constants) --
    zn = jnp.broadcast_to(_TAN_N, batch + (11,))
    mz = _coeff_matrix(bb, zn) * _COS2_N[:, None, None]
    p = _det10(mz) / _COS10_N  # (..., 11)
    scale = jnp.maximum(jnp.max(jnp.abs(p), axis=-1), 1e-30)[..., None]
    coefs = jnp.einsum(
        "ij,...j->...i", _TRIG_INV, p / scale, precision="highest"
    )  # (..., 11)

    # --- real roots: sign scan over θ + bisection on P --------------------
    pv = jnp.einsum(
        "gk,...k->...g", _GRID_B, coefs, precision="highest"
    )  # (..., G)
    sgn = jnp.sign(pv)
    change = (sgn[..., :-1] * sgn[..., 1:]) < 0.0  # (..., G-1)
    # Up to _MAX_ROOTS bracketed intervals, earliest first.
    score = change.astype(jnp.float32) * 2.0 - jnp.arange(
        _N_GRID - 1, dtype=jnp.float32
    ) / _N_GRID
    _, idx = jax.lax.top_k(score, _MAX_ROOTS)  # (..., R0)
    bracketed = jnp.take_along_axis(change, idx, axis=-1)
    grid_th = jnp.asarray(_GRID_THJ)
    lo = grid_th[idx]
    hi = grid_th[idx + 1]
    flo = _trig_eval(coefs, lo)
    for _ in range(20):
        mid = 0.5 * (lo + hi)
        fmid = _trig_eval(coefs, mid)
        same = jnp.sign(fmid) == jnp.sign(flo)
        lo = jnp.where(same, mid, lo)
        flo = jnp.where(same, fmid, flo)
        hi = jnp.where(same, hi, mid)
    th = 0.5 * (lo + hi)  # (..., R0)

    # Tangent (double) roots produce NO sign change: seed extra candidates
    # at the deepest local minima of |P| and let Newton + the residual gate
    # below sort the real ones from the fakes.
    absp = jnp.abs(pv)
    locmin = (absp[..., 1:-1] <= absp[..., :-2]) & (
        absp[..., 1:-1] <= absp[..., 2:]
    )
    mscore = jnp.where(locmin, -absp[..., 1:-1], -jnp.inf)
    _, midx = jax.lax.top_k(mscore, _EXTRA_SEEDS)
    th = jnp.concatenate([th, grid_th[midx + 1]], axis=-1)
    bracketed = jnp.concatenate(
        [bracketed, jnp.ones(batch + (_EXTRA_SEEDS,), bool)], axis=-1
    )

    # Newton polish on P itself with its analytic derivative — pure
    # elementwise work.  (The previous design re-evaluated batched 10x10
    # determinants per iteration to cancel the z-Vandermonde interpolant's
    # extrapolation error; the trig interpolant is well-conditioned over
    # the WHOLE circle, so polishing on it is both stable and ~300x
    # cheaper.  HBM measurement: the determinant Newton was 14.4 of the
    # solver's 29 ms.)
    for _ in range(3):
        f0, fp = _trig_eval(coefs, th, want_grad=True)
        step = f0 / jnp.where(jnp.abs(fp) > 1e-20, fp, 1e-20)
        th = th - jnp.clip(step, -0.02, 0.02)

    # Residual gate: genuine roots have |P(θ)| ~ 0 after polishing.
    valid = bracketed & (jnp.abs(_trig_eval(coefs, th)) < 1e-3)
    z = jnp.tan(th)

    # --- (x, y) from the null vector of M(z*) ----------------------------
    # cos²-scaled M (same null space, bounded entries at |z| >> 1); fixing
    # the trailing "1"-monomial coordinate to 1 turns the rank-9 null-vector
    # problem into a 10x9 least squares, solved via its 9x9 normal
    # equations — one Gauss solve instead of a 10x10 inverse iteration.
    # The fixed chart degenerates exactly where the old v[_IDX_1]-divide
    # did (true null vector with tiny "1" component -> the OTHER basis
    # chart covers it); non-finite solves are gated below.
    cs2 = (jnp.cos(th) ** 2)[..., None, None]
    mzs = _coeff_matrix(bb, z) * cs2  # (..., R, 10, 10)
    a9 = mzs[..., :, :_IDX_1]  # (..., R, 10, 9)
    b9 = -mzs[..., :, _IDX_1]  # (..., R, 10)
    ata = _mm(jnp.swapaxes(a9, -1, -2), a9)
    tr = jnp.trace(ata, axis1=-2, axis2=-1)[..., None, None]
    ata = ata + (1e-10 * tr) * jnp.eye(9, dtype=ata.dtype)
    atb = jnp.einsum("...ij,...i->...j", a9, b9, precision="highest")
    v9 = gauss_solve(ata, atb[..., None])[..., 0]  # (..., R, 9)
    x = v9[..., _IDX_X]
    y = v9[..., _IDX_Y]
    ok_denom = jnp.all(jnp.isfinite(v9), axis=-1) & (
        jnp.maximum(jnp.abs(x), jnp.abs(y)) < 1e6
    )

    e1, e2, e3, e4 = (basis[..., k, None, :, :] for k in range(4))
    es = (
        x[..., None, None] * e1
        + y[..., None, None] * e2
        + z[..., None, None] * e3
        + e4
    )
    es = project_to_essential(es)
    norm = jnp.sqrt(jnp.sum(es * es, axis=(-2, -1)))
    es = es / jnp.maximum(norm, 1e-20)[..., None, None]
    valid = valid & ok_denom & jnp.all(jnp.isfinite(es), axis=(-2, -1))
    return es, valid
