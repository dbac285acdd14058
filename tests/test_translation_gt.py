"""End-to-end translation (position) accuracy gates for the libmv chain.

The reference CARRIES ground-truth positions (GT schema ``pos_x..z``,
ofps-suite/src/app/tracking/mod.rs:111-123) and libmv is its only estimator
emitting translation (libmv-estimator/src/lib.rs:213-279), but nothing in
the reference ever SCORES position error.  These tests close that gap for
the TPU build: the full jitted estimate -> motion_step integration loop runs
over a synthetic 3-D camera path and the integrated trajectory is gated
against ground truth with :func:`ofps_tpu.apps.gt.calc_pos_err` —
scale-aligned (monocular translation is observable up to one global scale;
the chain's job, via ``triangulate_scale`` utils.rs:47-89, is to keep that
scale CONSISTENT across frames).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ofps_tpu.apps import gt as gtmod
from ofps_tpu.core import quat
from ofps_tpu.core.camera import StandardCamera
from ofps_tpu.core.motion import SparseFlow
from ofps_tpu.estimators.base import create_estimator
from synthetic import calc_view, euler_deg, get_grid


@pytest.fixture(scope="module")
def cam():
    return StandardCamera.create(1.0, 90.0)


@pytest.fixture(scope="module")
def cloud(cam):
    """Non-planar 3-D point cloud (epipolar translation needs parallax)."""
    rng = np.random.default_rng(0)
    g = np.asarray(get_grid(40, 40, cam))
    return jnp.asarray(
        g * rng.uniform(0.3, 1.0, (len(g), 1)).astype(np.float32)
    )


def _flow_between(cam, cloud, q0, p0, q1, p1, capacity=1600):
    v1 = calc_view(q0, jnp.asarray(p0, jnp.float32))
    v2 = calc_view(q1, jnp.asarray(p1, jnp.float32))
    a = np.asarray(cam.project(cloud, v1))
    b = np.asarray(cam.project(cloud, v2))
    keep = (np.abs(a - 0.5).max(1) < 0.5) & (np.abs(b - 0.5).max(1) < 0.5)
    return SparseFlow.from_arrays(a[keep], (b - a)[keep], capacity=capacity)


def _run_path(cam, cloud, quats, positions, algo_points=8):
    """estimate + motion_step over the path; returns integrated (rots, poss)."""
    est = create_estimator("libmv", algo_points=algo_points)
    fn = jax.jit(est.estimate)
    state = est.init()
    key = jax.random.PRNGKey(7)
    r_acc = quat.identity()
    p_acc = jnp.zeros(3, jnp.float32)
    rots, poss = [], []
    for i in range(len(positions) - 1):
        flow = _flow_between(
            cam, cloud, quats[i], positions[i], quats[i + 1], positions[i + 1]
        )
        key, sub = jax.random.split(key)
        r, t, state = fn(state, flow, cam, sub)
        # motion_step (estimator.rs:38-53): pos += rot * tr; rot = r * rot.
        p_acc = p_acc + quat.rotate_vec(r_acc, t)
        r_acc = quat.mul(r, r_acc)
        rots.append(np.asarray(r_acc))
        poss.append(np.asarray(p_acc))
    return rots, poss


def _truth_rows(quats, positions):
    p0 = np.asarray(positions[0], np.float64)
    return [
        gtmod.GroundTruthRow(
            frame=i,
            fov_x=90.0,
            fov_y=90.0,
            rot=np.asarray(quats[i], np.float64),
            pos=np.asarray(positions[i], np.float64) - p0,
        )
        for i in range(1, len(positions))
    ]


def test_translation_pure_path_position_error(cam, cloud):
    """Varied-direction translation path: scale-aligned ATE under 10% of
    the path length and per-frame direction error under ~11 degrees."""
    positions = [
        (0.0, 0.0, 0.0),
        (0.10, 0.0, 0.0),
        (0.20, 0.0, 0.05),
        (0.25, 0.05, 0.10),
        (0.25, 0.10, 0.15),
    ]
    quats = [quat.identity()] * len(positions)
    _, poss = _run_path(cam, cloud, quats, positions)
    truth = _truth_rows(quats, positions)
    ate, stats = gtmod.calc_pos_err(truth, poss)
    path_len = sum(
        float(np.linalg.norm(np.subtract(b, a)))
        for a, b in zip(positions, positions[1:])
    )
    assert ate < 0.10 * path_len, (ate, path_len)
    dirs = [s.error_dir for s in stats]
    assert float(np.mean(dirs)) < np.deg2rad(11.0), np.rad2deg(dirs)


def test_translation_with_rotation_position_error(cam, cloud):
    """Combined rotation + translation: the chain must keep scale through
    rotating frames (chained t23 passes through quat rotation)."""
    deltas = [euler_deg(0.0, 0.4, 0.0), euler_deg(0.0, 0.4, 0.2),
              euler_deg(0.2, 0.0, 0.4)]
    quats = [quat.identity()]
    for d in deltas:
        quats.append(quat.mul(quats[-1], d))
    positions = [
        (0.0, 0.0, 0.0),
        (0.08, 0.0, 0.0),
        (0.16, 0.0, 0.04),
        (0.20, 0.04, 0.08),
    ]
    rots, poss = _run_path(cam, cloud, quats, positions)
    truth = _truth_rows(quats, positions)
    ate, stats = gtmod.calc_pos_err(truth, poss)
    path_len = sum(
        float(np.linalg.norm(np.subtract(b, a)))
        for a, b in zip(positions, positions[1:])
    )
    assert ate < 0.15 * path_len, (ate, path_len)


def test_pos_err_scale_invariance():
    """calc_pos_err must be invariant to the chain's arbitrary global scale
    and report zero error on a perfect (scaled) trajectory."""
    truth = [
        gtmod.GroundTruthRow(
            frame=i, fov_x=90.0, fov_y=90.0,
            rot=np.array([1.0, 0, 0, 0]),
            pos=np.array([0.1 * i, 0.05 * i, 0.0]),
        )
        for i in range(1, 5)
    ]
    est = [7.0 * r.pos for r in truth]  # perfect, scaled by 7
    ate, stats = gtmod.calc_pos_err(truth, est)
    assert ate < 1e-9, ate
    assert all(s.error_dir < 1e-6 for s in stats)
    # Degenerate: no translation estimated at all -> ATE = RMS |gt|.
    zeros = [np.zeros(3) for _ in truth]
    ate0, _ = gtmod.calc_pos_err(truth, zeros)
    want = float(np.sqrt(np.mean([r.pos @ r.pos for r in truth])))
    assert abs(ate0 - want) < 1e-9
