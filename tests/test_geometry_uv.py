"""Plane-layout (SoA) geometry vs the oracle-gated AoS camera ops.

The estimator hot loops (ofps_tpu/estimators/almeida.py) run on u/v planes
for TPU lane utilization; these tests pin the plane math to the AoS
StandardCamera implementations, which are themselves oracle-gated at 2e-6
in tests/test_oracle_parity.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ofps_tpu.core import quat
from ofps_tpu.core.camera import StandardCamera
from ofps_tpu.ops.geometry_uv import (
    delta_planes,
    point_angle_planes,
    qconj,
    qmat,
    qmul,
    solve3_planes,
)
from ofps_tpu.ops.solve import solve3x3


def _points(n=257, seed=0):
    rng = np.random.default_rng(seed)
    p = rng.uniform(0.05, 0.95, (n, 2)).astype(np.float32)
    return jnp.asarray(p)


def test_rotate_planes_matches_camera_delta():
    cam = StandardCamera.create(16 / 9, 90.0)
    pos = _points()
    q = quat.from_euler(0.03, -0.06, 0.11)
    ref = cam.delta(pos, quat.to_matrix4(q))
    r9 = tuple(quat.to_matrix3(q).reshape(9))
    du, dv = delta_planes(cam, pos[:, 0], pos[:, 1], r9)
    got = jnp.stack([du, dv], axis=-1)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-6


def test_rotate_planes_batched_rotations():
    cam = StandardCamera.create(1.0, 75.0)
    pos = _points(64)
    qs = jax.vmap(quat.from_euler)(
        jnp.linspace(-0.1, 0.1, 5), jnp.linspace(0.05, -0.05, 5), jnp.zeros(5)
    )
    ref = jax.vmap(lambda qq: cam.delta(pos, quat.to_matrix4(qq)))(qs)
    r9 = tuple(c[:, None] for c in (
        quat.to_matrix3(qs).reshape(5, 9).T
    ))  # each (5, 1)
    du, dv = delta_planes(cam, pos[:, 0], pos[:, 1], r9)
    got = jnp.stack([du, dv], axis=-1)  # (5, 64, 2)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-6


def test_point_angle_planes_matches():
    cam = StandardCamera.create(16 / 9, 110.0)
    pos = _points(100, seed=3)
    ref = cam.point_angle(pos)
    au, av = point_angle_planes(cam, pos[:, 0], pos[:, 1])
    got = jnp.stack([au, av], axis=-1)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-6


def test_quat_planes_match_quat_ops():
    a = quat.from_euler(0.1, 0.2, -0.3)
    b = quat.from_euler(-0.05, 0.12, 0.4)
    got = jnp.stack(qmul(tuple(a), tuple(b)))
    np.testing.assert_allclose(got, quat.mul(a, b), atol=1e-7)
    np.testing.assert_allclose(
        jnp.stack(qconj(tuple(a))), quat.conj(a), atol=1e-7
    )
    np.testing.assert_allclose(
        jnp.stack(qmat(tuple(a))).reshape(3, 3),
        quat.to_matrix3(a),
        atol=1e-7,
    )


def test_solve3_planes_matches_solve3x3():
    rng = np.random.default_rng(5)
    m = rng.normal(size=(3, 3)).astype(np.float32)
    a = m @ m.T + 0.1 * np.eye(3, dtype=np.float32)  # SPD
    b = rng.normal(size=3).astype(np.float32)
    ref = solve3x3(jnp.asarray(a), jnp.asarray(b))
    got = jnp.stack(
        solve3_planes(
            (a[0, 0], a[0, 1], a[0, 2], a[1, 1], a[1, 2], a[2, 2]),
            tuple(b),
        )
    )
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)
    # Singular fallback parity.
    sing = jnp.stack(
        solve3_planes((1.0, 1.0, 1.0, 1.0, 1.0, 1.0), (1.0, 1.0, 1.0))
    )
    np.testing.assert_array_equal(np.asarray(sing), np.zeros(3))
