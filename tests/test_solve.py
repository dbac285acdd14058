"""Batched small-matrix numerics tests (vs numpy/LAPACK oracles).

These kernels replace jnp.linalg's batched eigh/svd/solve, whose
small-matrix paths are pathologically slow on TPU (CLAUDE.md perf lore).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ofps_tpu.ops.solve import (
    eigh3x3,
    gauss_solve,
    smallest_eigvecs_inverse_iteration,
    solve3x3,
    svd3x3,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_gauss_solve(rng):
    a = rng.normal(size=(64, 9, 9)).astype(np.float32)
    a = a @ a.transpose(0, 2, 1) + 0.1 * np.eye(9, dtype=np.float32)
    b = rng.normal(size=(64, 9, 2)).astype(np.float32)
    x = np.asarray(gauss_solve(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(a @ x, b, atol=2e-4)


def test_inverse_iteration_nullspaces(rng):
    # k=1 on 8-row systems (1-D nullspace: the 8-point/DLT minimal fits).
    rows = rng.normal(size=(64, 8, 9)).astype(np.float32)
    ata = rows.transpose(0, 2, 1) @ rows
    v = np.asarray(smallest_eigvecs_inverse_iteration(jnp.asarray(ata), k=1))
    _, ref = np.linalg.eigh(ata)
    dots = np.abs(np.sum(v[..., 0] * ref[..., 0], axis=-1))
    assert dots.min() > 0.9999

    # k=2 on 7-row systems (2-D nullspace: the 7-point fundamental).
    rows7 = rng.normal(size=(64, 7, 9)).astype(np.float32)
    ata7 = rows7.transpose(0, 2, 1) @ rows7
    v2 = np.asarray(smallest_eigvecs_inverse_iteration(jnp.asarray(ata7), k=2))
    _, rv = np.linalg.eigh(ata7)
    proj = np.einsum("bik,bij->bkj", rv[..., :2], v2)
    sv = np.linalg.svd(proj, compute_uv=False)
    assert sv.min() > 0.9999  # computed pair spans the true nullspace
    # Orthonormal columns.
    gram = np.einsum("bik,bij->bkj", v2, v2)
    np.testing.assert_allclose(
        gram, np.broadcast_to(np.eye(2), gram.shape), atol=1e-4
    )


def test_eigh3x3(rng):
    m = rng.normal(size=(128, 3, 3)).astype(np.float32)
    sym = m @ m.transpose(0, 2, 1)
    vals, vecs = (np.asarray(x) for x in eigh3x3(jnp.asarray(sym)))
    rvals, _ = np.linalg.eigh(sym)
    np.testing.assert_allclose(vals, rvals, rtol=2e-5, atol=2e-5)
    recon = vecs @ (vals[..., None] * np.swapaxes(vecs, -1, -2))
    np.testing.assert_allclose(recon, sym, atol=2e-4 * np.abs(sym).max())


def test_svd3x3_full_and_rank2(rng):
    m = rng.normal(size=(128, 3, 3)).astype(np.float32)
    u, s, vt = (np.asarray(x) for x in svd3x3(jnp.asarray(m)))
    np.testing.assert_allclose(u @ (s[..., None] * vt), m, atol=5e-4)
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), u.shape)
    np.testing.assert_allclose(u @ np.swapaxes(u, -1, -2), eye, atol=1e-5)
    assert np.all(np.diff(s, axis=-1) <= 1e-6)  # descending

    # Rank-2 (essential-matrix-shaped) inputs.
    m2 = u @ (np.array([1.0, 0.7, 0.0], np.float32)[None, :, None] * vt)
    u2, s2, vt2 = (np.asarray(x) for x in svd3x3(jnp.asarray(m2)))
    np.testing.assert_allclose(u2 @ (s2[..., None] * vt2), m2, atol=5e-4)
    assert np.all(s2[..., 2] < 1e-3)


def test_solve3x3_singular_fallback():
    a = jnp.zeros((3, 3))
    b = jnp.ones((3,))
    np.testing.assert_allclose(np.asarray(solve3x3(a, b, fallback=0.0)), 0.0)


def test_gauss_inverse(rng):
    from ofps_tpu.ops.solve import gauss_inverse

    a = rng.normal(size=(64, 9, 9)).astype(np.float32)
    a = a @ a.transpose(0, 2, 1) + 0.1 * np.eye(9, dtype=np.float32)
    inv = np.asarray(gauss_inverse(jnp.asarray(a)))
    eye = np.broadcast_to(np.eye(9, dtype=np.float32), a.shape)
    np.testing.assert_allclose(inv @ a, eye, atol=2e-3)


def test_inv3x3_matches_numpy_and_falls_back(rng):
    from ofps_tpu.ops.solve import inv3x3

    a = rng.normal(size=(128, 3, 3)).astype(np.float32)
    a = a + np.sign(np.linalg.det(a))[:, None, None] * np.eye(
        3, dtype=np.float32
    )
    inv = np.asarray(inv3x3(jnp.asarray(a)))
    np.testing.assert_allclose(inv, np.linalg.inv(a), rtol=2e-3, atol=2e-4)
    # Singular input -> fallback, not inf/nan.
    np.testing.assert_allclose(
        np.asarray(inv3x3(jnp.zeros((3, 3)), fallback=0.0)), 0.0
    )


def test_five_point_trig_interpolation_exact():
    """The even-harmonic node system reproduces P(θ) exactly for a known
    degree-10 homogeneous form (the interpolation identity behind the
    5-point root finder)."""
    from ofps_tpu.ops.five_point import (
        _TH,
        _TRIG_INV,
        _trig_basis_np,
    )

    rng = np.random.default_rng(3)
    a = rng.normal(size=11)  # coefficients over s^i c^(10-i)

    def p_of(theta):
        s, c = np.sin(theta), np.cos(theta)
        return sum(a[i] * s**i * c ** (10 - i) for i in range(11))

    vals = p_of(_TH)
    coefs = _TRIG_INV.astype(np.float64) @ vals
    probe = np.linspace(-np.pi / 2, np.pi / 2, 257)
    recon = _trig_basis_np(probe) @ coefs
    np.testing.assert_allclose(recon, p_of(probe), rtol=2e-4, atol=2e-5)
    # Conditioning of the node system stays DFT-class.
    assert np.linalg.cond(_trig_basis_np(_TH)) < 10.0
