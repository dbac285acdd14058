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
   ``2 E Eᵀ E - tr(E Eᵀ) E = 0``) are polynomials in (x, y, z) of total
   degree 3 — exactly 20 trivariate monomials.  Their coefficient matrix C
   (10 x 20) is extracted **numerically**: evaluate the constraint vector
   at 20 fixed (x, y, z) probe points and multiply by a precomputed inverse
   monomial matrix (cond 10.5, float64-precomputed; no symbolic expansion).
3. Nistér's elimination, batched: Gauss-Jordan with partial pivoting
   expresses the 10 leading monomials (the x/y-degree >= 2 ones) over the
   trailing 10 ([x, y, 1] x z-powers).  Differencing the ``x²z/x²``,
   ``y²z/y²`` and ``xyz/xy`` row pairs against z times each other yields a
   **3x3 polynomial matrix B(z)** (degrees <= 4) with ``B(z)·[x, y, 1]ᵀ=0``
   — so ``det B(z) = 0`` is the same degree-10 polynomial as the hidden-
   variable resultant ``det M(z)``, at 3x3-determinant cost instead of the
   former 11-node batched 10x10 Gauss eliminations (which dominated the
   whole estimator: 892 of the stage's HBM-traffic MB in the r4 profile).
4. ``P(θ) = cos¹⁰θ · det B(tanθ)`` sampled at 11 equispaced tan-angle nodes
   gives the even-harmonic trig interpolant; real roots via sign changes on
   a θ grid + fixed-count bisection + Newton polish on the interpolant.
5. For each root, (x, y) solves the 3x2 system ``B(z*)[:, :2]·[x, y] =
   -B(z*)[:, 2]`` by its 2x2 normal equations (was: 10x9 least squares).

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
    det3,
    gauss_solve_pivoted,
    smallest_eigvecs_inverse_iteration,
)

_mm = partial(jnp.matmul, precision="highest")

# Trivariate monomial basis of total degree <= 3 (20 monomials), split as
# Nistér's elimination needs it:
#   eliminated (first 10): x^3, y^3, x^2 y, x y^2, x^2 z, x^2, y^2 z, y^2,
#                          x y z, x y
#   kept (last 10):        x z^2, x z, x, y z^2, y z, y, z^3, z^2, z, 1
# The kept block factors as [x, y, 1] x {z-powers}, which is what lets the
# reduced rows assemble into the 3x3 polynomial matrix B(z).


def _monomials20(x, y, z):
    one = np.ones_like(x)
    return np.stack(
        [
            x**3, y**3, x**2 * y, x * y**2, x**2 * z, x**2, y**2 * z,
            y**2, x * y * z, x * y,
            x * z**2, x * z, x, y * z**2, y * z, y, z**3, z**2, z, one,
        ],
        axis=0,
    )  # (20, npts)


# 20 (x, y, z) probe points found by random search + local refinement
# (float64, fixed seed offline): cond(V20) = 10.5, so the numeric
# coefficient extraction loses ~1 f32 digit.  Host (numpy) constants:
# module import must not dispatch device ops.
_P20 = np.array(
    [
        [-0.32762963, 0.80959387, 0.58612268, 0.36886925, -0.52225745,
         1.55036472, 0.60530217, -0.74912229, 0.64348662, -0.06436296,
         -0.20600484, 1.03263808, -0.80564053, -0.95859189, -1.08927787,
         -1.29945443, -0.05803361, 0.94307901, -0.83606385, -0.07729247],
        [-1.29930121, -0.85250692, 1.37247137, 0.57841958, 1.06650513,
         -0.77947526, 1.05330674, 1.27162516, -0.70786724, -0.44475738,
         -0.50372016, 0.07134761, 0.59043603, -1.39250342, 0.1881813,
         -0.68484683, 0.47519423, -0.17462412, 0.41217525, -0.62379822],
        [-0.12656579, -0.48921231, 1.14796693, 0.82383632, 0.85405468,
         -0.36732824, 0.10478399, -0.74018601, 0.96931083, 1.34876192,
         0.39251301, -0.39815935, -0.25767543, 0.85929289, 0.70142349,
         -0.12976881, -0.91062743, -1.41849298, -1.24034761, -1.02775763],
    ],
    np.float64,
)
_V20_INV = np.asarray(np.linalg.inv(_monomials20(*_P20)), np.float32)
_P20XJ = np.asarray(_P20[0], np.float32)
_P20YJ = np.asarray(_P20[1], np.float32)
_P20ZJ = np.asarray(_P20[2], np.float32)

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
# B(z)'s entries (degree <= 4 in z) are evaluated at the nodes in
# HOMOGENIZED form: B̃ᵢⱼ(θ) = cos⁴θ·Bᵢⱼ(tanθ) = Σₖ bₖ sinᵏθ cos⁴⁻ᵏθ — the
# monomial weights below keep the edge-node entries bounded (no f32 blowup
# at |z| ~ 14).  det B̃ = cos¹²·det B, so P = cos¹⁰·det B = det B̃ / cos².
_SC4_N = np.asarray(
    np.stack(
        [np.sin(_TH) ** k * np.cos(_TH) ** (4 - k) for k in range(5)],
        axis=-1,
    ),
    np.float32,
)  # (11 nodes, 5 z-coefs)
_COS2_N = np.asarray(np.cos(_TH) ** 2, np.float32)

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


def _reduced_bpoly(basis):
    """B(z) coefficients (..., 3, 3, 5) from Nistér's elimination, batched.

    ``basis``: (..., 4, 3, 3).  Steps 2-3 of the module docstring: numeric
    C extraction at the 20 probe points, pivoted Gauss-Jordan of the
    leading 10x10 block, row-pair differencing into the 3x3 polynomial
    matrix.  Degenerate eliminations (singular leading block) produce
    non-finite coefficients for the caller's validity gates — the OTHER
    null-space chart covers those samples.
    """
    e1, e2, e3, e4 = (basis[..., k, :, :] for k in range(4))
    e = (
        _P20XJ[:, None, None] * e1[..., None, :, :]
        + _P20YJ[:, None, None] * e2[..., None, :, :]
        + _P20ZJ[:, None, None] * e3[..., None, :, :]
        + e4[..., None, :, :]
    )  # (..., 20pts, 3, 3)
    cons = _constraints(e)  # (..., 20pts, 10cons)
    c = _mm(jnp.swapaxes(cons, -1, -2), _V20_INV)  # (..., 10, 20)
    t = gauss_solve_pivoted(c[..., :10], c[..., 10:])  # (..., 10, 10)
    # Row pairs (x²z, x²), (y²z, y²), (xyz, xy): eq(m·z) − z·eq(m) cancels
    # the eliminated monomial, leaving cᵢ(z) = tₐᵢ − z·t_bᵢ over the kept
    # block ([x, y, 1] x z-powers).
    ta = t[..., 4:10:2, :]  # (..., 3, 10)
    tb = t[..., 5:10:2, :]
    zero = jnp.zeros_like(ta[..., 0])

    def zcol(i0):  # kept-monomial triplet [m z², m z, m] -> degree-3 poly
        return jnp.stack(
            [
                ta[..., i0 + 2],
                ta[..., i0 + 1] - tb[..., i0 + 2],
                ta[..., i0] - tb[..., i0 + 1],
                -tb[..., i0],
                zero,
            ],
            axis=-1,
        )

    colx, coly = zcol(0), zcol(3)
    col1 = jnp.stack(  # kept quadruplet [z³, z², z, 1] -> degree-4 poly
        [
            ta[..., 9],
            ta[..., 8] - tb[..., 9],
            ta[..., 7] - tb[..., 8],
            ta[..., 6] - tb[..., 7],
            -tb[..., 6],
        ],
        axis=-1,
    )
    bp = jnp.stack([colx, coly, col1], axis=-2)  # (..., 3row, 3col, 5)
    # Global normalization: det B scales by a z-independent constant (the
    # polynomial is only used up to scale; the (x, y) solve is invariant)
    # and ill-conditioned eliminations stay in f32 range.
    mag = jnp.max(jnp.abs(bp), axis=(-3, -2, -1), keepdims=True)
    return bp / jnp.maximum(mag, 1e-30)


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

    # --- P(θ) = cos¹⁰θ·det B(tanθ) by trig interpolation (see constants) --
    bp = _reduced_bpoly(basis)  # (..., 3, 3, 5)
    bt = jnp.einsum("...ijk,nk->...nij", bp, _SC4_N, precision="highest")
    p = det3(bt) / _COS2_N  # (..., 11)
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

    # --- (x, y) from B(z*)·[x, y, 1]ᵀ = 0 ---------------------------------
    # Homogenized entries B̃ = cos⁴θ·B(tanθ) (bounded at |z| >> 1; a global
    # row scale cancels in the solve); the fixed "1" coordinate turns the
    # rank-2 null-vector problem into a 3x2 least squares, solved by its
    # 2x2 normal equations in closed form.  The fixed chart degenerates
    # when the true null vector has a tiny "1" component — the OTHER basis
    # chart covers it; non-finite solves are gated below.
    s, cth = jnp.sin(th), jnp.cos(th)
    sc = jnp.stack(
        [s**k * cth ** (4 - k) for k in range(5)], axis=-1
    )  # (..., R, 5)
    b3 = jnp.einsum(
        "...ijk,...rk->...rij", bp, sc, precision="highest"
    )  # (..., R, 3, 3)
    a2 = b3[..., :, :2]
    b2 = -b3[..., :, 2]
    g = _mm(jnp.swapaxes(a2, -1, -2), a2)  # (..., R, 2, 2)
    tr2 = (g[..., 0, 0] + g[..., 1, 1])[..., None, None]
    g = g + (1e-10 * tr2) * jnp.eye(2, dtype=g.dtype)
    gb = jnp.einsum("...ij,...i->...j", a2, b2, precision="highest")
    d2 = g[..., 0, 0] * g[..., 1, 1] - g[..., 0, 1] * g[..., 1, 0]
    d2s = jnp.where(jnp.abs(d2) > 1e-30, d2, 1e-30)
    x = (g[..., 1, 1] * gb[..., 0] - g[..., 0, 1] * gb[..., 1]) / d2s
    y = (g[..., 0, 0] * gb[..., 1] - g[..., 1, 0] * gb[..., 0]) / d2s
    ok_denom = (
        jnp.isfinite(x)
        & jnp.isfinite(y)
        & (jnp.maximum(jnp.abs(x), jnp.abs(y)) < 1e6)
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
