"""Homography / multiview / libmv estimator accuracy tests.

The reference versions of these tests are smoke-only (no assertions, e.g.
homography-estimator/src/lib.rs:213-258); we gate at 10% relative rotation
error like the almeida suite, which all three estimators meet on the clean
synthetic fixture.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofps_tpu.core import quat
from ofps_tpu.core.camera import StandardCamera
from ofps_tpu.core.motion import SparseFlow
from ofps_tpu.estimators.base import available_estimators, create_estimator
from synthetic import ANGLE_COMBOS, calc_view, euler_deg, get_grid, synthetic_field


def _rotation_suite(estimator, rots, tol_frac=0.1, seed=0):
    cam = StandardCamera.create(1.0, 90.0)
    grid = get_grid(50, 50, cam, skip_edges=True)
    fn = jax.jit(estimator.estimate)
    key = jax.random.PRNGKey(seed)
    for rot in rots:
        for combo in ANGLE_COMBOS:
            q = euler_deg(*[c * rot for c in combo])
            flow = synthetic_field(cam, q, grid=grid)
            key, sub = jax.random.split(key)
            r, _, _ = fn(estimator.init(), flow, cam, sub)
            err = float(jnp.rad2deg(quat.angle_to(q, r)))
            assert err < tol_frac * rot + 1e-4, f"rot={rot} {combo}: {err}"


def test_all_estimators_registered():
    assert available_estimators() == ["almeida", "homography", "libmv", "multiview"]


def test_homography_rotation_ransac():
    _rotation_suite(create_estimator("homography"), (0.1, 1.0, 10.0))


def test_homography_rotation_lmeds():
    _rotation_suite(create_estimator("homography", use_ransac=False), (1.0,))


def test_multiview_rotation():
    _rotation_suite(create_estimator("multiview"), (0.5, 1.0, 5.0))


def test_libmv_rotation_8pt():
    _rotation_suite(create_estimator("libmv", algo_points=8), (1.0,))


def test_libmv_rotation_7pt():
    _rotation_suite(create_estimator("libmv", algo_points=7), (1.0,))


def test_homography_with_outliers():
    # 20% corrupted vectors: RANSAC must still recover the rotation.
    cam = StandardCamera.create(1.0, 90.0)
    grid = get_grid(50, 50, cam, skip_edges=True)
    q = euler_deg(1.0, 0.5, -0.8)
    flow = synthetic_field(cam, q, grid=grid)
    rng = np.random.default_rng(0)
    motion = np.array(flow.motion)
    n = motion.shape[0]
    bad = rng.choice(n, n // 5, replace=False)
    motion[bad] += rng.uniform(-0.2, 0.2, (len(bad), 2)).astype(np.float32)
    flow = SparseFlow(flow.pos, jnp.asarray(motion), flow.mask)
    est = create_estimator("homography")
    r, _, _ = est.estimate((), flow, cam, jax.random.PRNGKey(3))
    err = float(jnp.rad2deg(quat.angle_to(q, r)))
    assert err < 0.15, err


def _translation_fixture(cam, p0, p1, pts):
    v1 = calc_view(quat.identity(), jnp.asarray(p0, jnp.float32))
    v2 = calc_view(quat.identity(), jnp.asarray(p1, jnp.float32))
    a = np.asarray(cam.project(pts, v1))
    b = np.asarray(cam.project(pts, v2))
    keep = (np.abs(a - 0.5).max(1) < 0.5) & (np.abs(b - 0.5).max(1) < 0.5)
    return SparseFlow.from_arrays(a[keep], (b - a)[keep], capacity=1600)


def test_libmv_translation_scale_chain():
    # L-shaped trajectory: +x 0.1, +z 0.05, +x 0.05. The chained scale must
    # keep magnitudes consistent (1.0, ~0.5, ~0.5 in first-step units) and
    # directions must match the world axes (lib.rs:211-279 semantics).
    cam = StandardCamera.create(1.0, 90.0)
    rng = np.random.default_rng(0)
    grid = np.asarray(get_grid(40, 40, cam))
    scales = rng.uniform(0.3, 1.0, (len(grid), 1)).astype(np.float32)
    pts = jnp.asarray(grid * scales)

    est = create_estimator("libmv", algo_points=8)
    fn = jax.jit(est.estimate)
    positions = [(0, 0, 0), (0.1, 0, 0), (0.1, 0, 0.05), (0.15, 0, 0.05)]
    expected = [
        (np.array([1.0, 0, 0]), 1.0),
        (np.array([0, 0, 1.0]), 0.5),
        (np.array([1.0, 0, 0]), 0.5),
    ]
    state = est.init()
    key = jax.random.PRNGKey(7)
    for i, (edir, emag) in enumerate(expected):
        flow = _translation_fixture(cam, positions[i], positions[i + 1], pts)
        key, sub = jax.random.split(key)
        r, t, state = fn(state, flow, cam, sub)
        t = np.asarray(t)
        mag = np.linalg.norm(t)
        assert abs(mag - emag) < 0.05 * emag + 0.02, (i, t)
        assert t @ edir > 0.95 * mag, (i, t)
        # Rotation stays near identity on a pure-translation path.
        assert float(jnp.rad2deg(quat.angle(r))) < 0.1


def test_multiview_wraparound_guard():
    # The >90 deg fix must leave small rotations untouched.
    cam = StandardCamera.create(1.0, 90.0)
    q = euler_deg(2.0, 0.0, 0.0)
    flow = synthetic_field(cam, q, grid=get_grid(30, 30, cam, skip_edges=True))
    est = create_estimator("multiview")
    r, _, _ = est.estimate((), flow, cam, jax.random.PRNGKey(1))
    assert float(jnp.rad2deg(quat.angle(r))) < 45.0


def test_move_magnitude_hint():
    """estimator.rs:18-23 Option<f32> hint: every estimator accepts it; libmv
    scales its emitted translation to the hinted magnitude."""
    cam = StandardCamera.create(1.0, 90.0)
    rng = np.random.default_rng(1)
    grid = np.asarray(get_grid(40, 40, cam))
    scales = rng.uniform(0.3, 1.0, (len(grid), 1)).astype(np.float32)
    pts = jnp.asarray(grid * scales)
    flow = _translation_fixture(cam, (0, 0, 0), (0.1, 0, 0), pts)
    key = jax.random.PRNGKey(11)

    # API surface: all estimators accept the keyword (reference: ignored
    # by almeida/homography/multiview, their lib.rs `_: Option<f32>`).
    for name in available_estimators():
        est = create_estimator(name)
        est.estimate(est.init(), flow, cam, key, move_magnitude=2.5)

    est = create_estimator("libmv", algo_points=8)
    _, t_hint, _ = jax.jit(est.estimate)(
        est.init(), flow, cam, key, move_magnitude=jnp.float32(2.5)
    )
    mag = float(np.linalg.norm(np.asarray(t_hint)))
    assert abs(mag - 2.5) < 0.01, mag
    # Direction unchanged vs the unhinted estimate.
    _, t_plain, _ = jax.jit(est.estimate)(est.init(), flow, cam, key)
    cos = float(
        np.dot(np.asarray(t_hint), np.asarray(t_plain))
        / (mag * np.linalg.norm(np.asarray(t_plain)))
    )
    assert cos > 0.999, cos

    # motion_step passes the hint through and integrates the scaled t.
    rot, pos, _ = est.motion_step(
        est.init(), flow, cam, key, quat.identity(),
        jnp.zeros(3), move_magnitude=jnp.float32(2.5),
    )
    assert abs(float(jnp.linalg.norm(pos)) - 2.5) < 0.01
