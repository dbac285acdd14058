"""Camera model tests.

Mirrors the reference's doctest and behavioral invariants
(/root/reference/ofps/src/camera.rs).
"""

import jax.numpy as jnp
import numpy as np

from ofps_tpu.core import quat
from ofps_tpu.core.camera import ROTATE_VIEW, StandardCamera, look_at_rh


def test_point_angle_doctest():
    # camera.rs:139-149: 90 deg FOV, point at (1.0, 0.5) -> 45 deg horizontal.
    cam = StandardCamera.create(1.0, 90.0)
    ang = cam.point_angle(jnp.array([1.0, 0.5]))
    assert abs(float(jnp.rad2deg(ang[0])) - 45.0) < 0.01
    assert abs(float(jnp.rad2deg(ang[1]))) < 0.01


def test_fov_roundtrip():
    cam = StandardCamera.create(1.0, 90.0)
    fx, fy = cam.fov()
    assert abs(float(fx) - 90.0) < 1e-3
    assert abs(float(fy) - 90.0) < 1e-3


def test_intrinsics_values():
    cam = StandardCamera.create(2.0, 90.0)
    k = np.asarray(cam.intrinsics())
    fy = 0.5 / np.tan(np.deg2rad(90.0) / 2)
    assert np.allclose(k, [[fy / 2.0, 0, 0.5], [0, fy, 0.5], [0, 0, 1]], atol=1e-6)


def test_project_unproject_roundtrip():
    cam = StandardCamera.create(1.0, 90.0)
    view = ROTATE_VIEW
    pts = jnp.array([[0.5, 0.5], [0.25, 0.75], [0.9, 0.1], [0.0, 1.0]])
    world = cam.unproject(pts, view)  # V is its own inverse/transpose
    back = cam.project(world, view)
    assert np.allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_rotate_identity_is_noop():
    cam = StandardCamera.create(1.0, 90.0)
    pts = jnp.array([[0.5, 0.5], [0.3, 0.8]])
    out = cam.rotate(pts, jnp.eye(4))
    assert np.allclose(np.asarray(out), np.asarray(pts), atol=1e-5)


def test_delta_small_rotation_direction():
    # A small yaw rotation should move the center point horizontally.
    cam = StandardCamera.create(1.0, 90.0)
    eps = np.deg2rad(0.1)
    rot = quat.to_matrix4(quat.from_euler(0.0, 0.0, eps))
    d = np.asarray(cam.delta(jnp.array([0.5, 0.5]), rot))
    assert abs(d[0]) > 1e-5
    assert abs(d[1]) < abs(d[0]) * 1e-2


def test_rotate_view_matrix_involutive():
    v = np.asarray(ROTATE_VIEW)
    assert np.allclose(v @ v, np.eye(4))
    assert np.allclose(v, v.T)


def test_look_at_rh_matches_fixed_view():
    # The almeida test fixture's view (eye at origin, -Y forward, +Z up)
    # must equal the fixed ROTATE_VIEW matrix (camera.rs:89-96).
    m = look_at_rh(
        jnp.zeros(3), jnp.array([0.0, -1.0, 0.0]), jnp.array([0.0, 0.0, 1.0])
    )
    assert np.allclose(np.asarray(m), np.asarray(ROTATE_VIEW), atol=1e-6)


def test_essential_symmetry():
    cam = StandardCamera.create(1.0, 90.0)
    f = jnp.arange(9.0).reshape(3, 3)
    e = np.asarray(cam.essential(f))
    k = np.asarray(cam.intrinsics())
    assert np.allclose(e, k.T @ np.asarray(f) @ k, atol=1e-6)
