"""Quaternion convention tests (nalgebra-compatible)."""

import numpy as np
import jax.numpy as jnp

from ofps_tpu.core import quat


def _euler_matrix(r, p, y):
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return rz @ ry @ rx


def test_from_euler_matches_rz_ry_rx():
    for r, p, y in [(0.1, -0.2, 0.3), (1.0, 0.5, -0.7), (0, 0, 0)]:
        q = quat.from_euler(r, p, y)
        m = np.asarray(quat.to_matrix3(q))
        assert np.allclose(m, _euler_matrix(r, p, y), atol=1e-6)


def test_euler_roundtrip():
    for r, p, y in [(0.1, -0.2, 0.3), (-0.5, 0.4, 1.2)]:
        q = quat.from_euler(r, p, y)
        rr, pp, yy = quat.to_euler(q)
        assert abs(float(rr) - r) < 1e-5
        assert abs(float(pp) - p) < 1e-5
        assert abs(float(yy) - y) < 1e-5


def test_mul_compose():
    qa = quat.from_euler(0.2, 0.0, 0.0)
    qb = quat.from_euler(0.0, 0.3, 0.0)
    m = np.asarray(quat.to_matrix3(quat.mul(qa, qb)))
    ma = np.asarray(quat.to_matrix3(qa))
    mb = np.asarray(quat.to_matrix3(qb))
    assert np.allclose(m, ma @ mb, atol=1e-6)


def test_inverse():
    q = quat.from_euler(0.3, -0.4, 0.5)
    qi = quat.inverse(q)
    ident = np.asarray(quat.mul(q, qi))
    assert np.allclose(ident, [1, 0, 0, 0], atol=1e-6)


def test_angle_to():
    qa = quat.from_euler(0.0, 0.0, 0.0)
    qb = quat.from_euler(0.25, 0.0, 0.0)
    assert abs(float(quat.angle_to(qa, qb)) - 0.25) < 1e-5


def test_from_matrix_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        r, p, y = rng.uniform(-np.pi * 0.9, np.pi * 0.9, 3)
        q = quat.from_euler(r, p, y)
        m = quat.to_matrix3(q)
        q2 = quat.from_matrix3(m)
        # Same rotation up to sign.
        d = min(
            np.linalg.norm(np.asarray(q) - np.asarray(q2)),
            np.linalg.norm(np.asarray(q) + np.asarray(q2)),
        )
        assert d < 1e-5


def test_rotate_vec_matches_matrix():
    q = quat.from_euler(0.3, 0.2, -0.6)
    v = jnp.array([0.3, -0.5, 0.8])
    out = np.asarray(quat.rotate_vec(q, v))
    assert np.allclose(out, np.asarray(quat.to_matrix3(q)) @ np.asarray(v), atol=1e-6)
