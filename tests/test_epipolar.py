"""Epipolar-geometry op tests: 8/7-point F, E decomposition, pose recovery."""

import numpy as np
import jax.numpy as jnp

from ofps_tpu.core import quat
from ofps_tpu.ops.epipolar import (
    decompose_essential,
    eight_point_fundamental,
    essential_from_fundamental,
    motion_from_essential_and_correspondence,
    project_to_essential,
    recover_pose_from_essential,
    sampson_error,
    seven_point_fundamental,
    triangulate_depths,
)

FX, FY = 0.5, 0.5


def _k():
    return np.array([[FX, 0, 0.5], [0, FY, 0.5], [0, 0, 1]], np.float32)


def _scene(n=60, seed=0, rot=(0.02, -0.01, 0.03), t=(0.2, 0.1, 0.05)):
    """Two-view scene: X in cam1, cam2 at X2 = R X1 + t; pinhole projection."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (n, 1))
    y = rng.uniform(-1, 1, (n, 1))
    z = rng.uniform(2, 6, (n, 1))
    pts = np.concatenate([x * z, y * z, z], axis=1).astype(np.float32)
    r = np.asarray(quat.to_matrix3(quat.from_euler(*rot)))
    t = np.asarray(t, np.float32)
    pts2 = pts @ r.T + t
    k = _k()

    def proj(p):
        uv = p[:, :2] / p[:, 2:3]
        return (uv * [FX, FY] + 0.5).astype(np.float32)

    return proj(pts), proj(pts2), r, t, k


def test_eight_point_epipolar_constraint():
    x1, x2, r, t, k = _scene()
    w = jnp.ones(len(x1))
    f = eight_point_fundamental(jnp.asarray(x1), jnp.asarray(x2), w)
    err = np.asarray(sampson_error(f, jnp.asarray(x1), jnp.asarray(x2)))
    assert err.max() < 1e-8, err.max()


def test_eight_point_respects_weights():
    x1, x2, *_ = _scene()
    # Corrupt half the points but zero their weights.
    x1c = x1.copy()
    x1c[30:] += 0.3
    w = jnp.asarray((np.arange(len(x1)) < 30).astype(np.float32))
    f = eight_point_fundamental(jnp.asarray(x1c), jnp.asarray(x2), w)
    err = np.asarray(sampson_error(f, jnp.asarray(x1), jnp.asarray(x2)))[:30]
    assert err.max() < 1e-7


def test_seven_point_candidates():
    x1, x2, *_ = _scene(n=7, seed=3)
    w = jnp.ones(7)
    fs, valid = seven_point_fundamental(jnp.asarray(x1), jnp.asarray(x2), w)
    assert fs.shape == (3, 3, 3)
    errs = np.asarray(sampson_error(fs, jnp.asarray(x1), jnp.asarray(x2)))
    v = np.asarray(valid)
    # At least one valid candidate interpolates the 7 points.
    best = min(errs[i].max() for i in range(3) if v[i])
    assert best < 1e-8, errs


def test_essential_recover_pose():
    x1, x2, r_true, t_true, k = _scene(rot=(0.05, 0.02, -0.04), t=(0.3, 0.0, 0.1))
    w = jnp.ones(len(x1))
    f = eight_point_fundamental(jnp.asarray(x1), jnp.asarray(x2), w)
    e = project_to_essential(essential_from_fundamental(f, jnp.asarray(k)))
    kinv = np.linalg.inv(k)
    h1 = np.concatenate([x1, np.ones((len(x1), 1), np.float32)], 1) @ kinv.T
    h2 = np.concatenate([x2, np.ones((len(x2), 1), np.float32)], 1) @ kinv.T
    x1n = jnp.asarray(h1[:, :2] / h1[:, 2:3])
    x2n = jnp.asarray(h2[:, :2] / h2[:, 2:3])
    r, t, sup = recover_pose_from_essential(e, x1n, x2n, w)
    assert int(sup) >= len(x1) * 0.95
    # Rotation within 0.2 deg, translation direction within a few degrees.
    dr = np.asarray(quat.angle_to(quat.from_matrix3(jnp.asarray(r_true)), quat.from_matrix3(r)))
    assert np.rad2deg(dr) < 0.2, np.rad2deg(dr)
    tn = np.asarray(t) / np.linalg.norm(np.asarray(t))
    te = t_true / np.linalg.norm(t_true)
    assert abs(abs(tn @ te) - 1.0) < 1e-3


def test_decompose_essential_shapes():
    x1, x2, r_true, t_true, k = _scene()
    f = eight_point_fundamental(jnp.asarray(x1), jnp.asarray(x2), jnp.ones(len(x1)))
    e = project_to_essential(essential_from_fundamental(f, jnp.asarray(k)))
    rs, ts = decompose_essential(e)
    assert rs.shape == (4, 3, 3) and ts.shape == (4, 3)
    dets = np.asarray(jnp.linalg.det(rs))
    assert np.allclose(dets, 1.0, atol=1e-4)


def test_triangulate_depths_sign():
    x1, x2, r, t, k = _scene(n=20)
    kinv = np.linalg.inv(k)
    h1 = np.concatenate([x1, np.ones((20, 1), np.float32)], 1) @ kinv.T
    h2 = np.concatenate([x2, np.ones((20, 1), np.float32)], 1) @ kinv.T
    z1, z2 = triangulate_depths(
        jnp.asarray(r), jnp.asarray(t),
        jnp.asarray(h1[:, :2] / h1[:, 2:3]), jnp.asarray(h2[:, :2] / h2[:, 2:3]),
    )
    assert (np.asarray(z1) > 0).all()
    assert (np.asarray(z2) > 0).all()
    # Depths roughly match the generating z range [2, 6].
    assert 1.5 < np.asarray(z1).mean() < 6.5


def test_motion_from_essential_and_correspondence():
    x1, x2, r_true, t_true, k = _scene(rot=(0.0, 0.03, 0.0), t=(0.2, 0.0, 0.0))
    f = eight_point_fundamental(jnp.asarray(x1), jnp.asarray(x2), jnp.ones(len(x1)))
    e = project_to_essential(essential_from_fundamental(f, jnp.asarray(k)))
    r, t, sup = motion_from_essential_and_correspondence(
        e, jnp.asarray(k), jnp.asarray(x1[0]), jnp.asarray(x2[0])
    )
    dr = np.asarray(quat.angle_to(quat.from_matrix3(jnp.asarray(r_true)), quat.from_matrix3(r)))
    assert np.rad2deg(dr) < 0.3


def test_decompose_homography_exact_rotation_under_jit():
    """Regression: a near-exact rotation homography (fully repeated
    singular spectrum) must decompose to that rotation under jit — the
    svd3x3-based orthogonal projection silently produced garbage here."""
    import jax

    from ofps_tpu.core import quat
    from ofps_tpu.core.camera import StandardCamera
    from ofps_tpu.ops.homography import decompose_homography

    cam = StandardCamera.create(1.0, 90.0)
    k = cam.intrinsics()
    kinv = jnp.linalg.inv(k)
    for angles in [(0.0, 1.0, 0.0), (0.5, -0.3, 0.2), (0.0, 0.0, 0.0)]:
        q = quat.from_euler(*[np.deg2rad(a) for a in angles])
        r_true = quat.to_matrix4(q)[:3, :3]
        h = k @ r_true @ kinv  # exact rotation homography (screen space)
        rs, ts, _ = jax.jit(decompose_homography)(h, k)
        errs = [
            float(jnp.rad2deg(quat.angle_to(q, quat.from_matrix3(rs[i]))))
            for i in range(2)
        ]
        assert min(errs) < 2e-3, (angles, errs)
        assert float(jnp.linalg.norm(ts[0])) < 1e-3
