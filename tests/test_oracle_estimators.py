"""Oracle-parity gates for the homography / multiview / libmv estimators.

Round 2 gated only almeida/camera/densifier against reference-equivalent
oracles; the other three estimators were gated against synthetic GT alone.
These tests close that gap using ``tests/oracles/cv_oracle.py`` — the SAME
OpenCV backend the reference links (homography-estimator/src/lib.rs:121-157,
multiview-estimator/src/lib.rs:113-148) plus faithful ports of the Rust glue
and libmv's pose recovery / PrevMotion scale chain
(libmv-estimator/src/lib.rs:165-282).

Parity stance per estimator:

* homography — full parity: ours vs oracle within a small fraction of the
  rotation on the reference's own rotation fixture.
* libmv — full parity on rotation AND on the chained translation scale.
* multiview — parity up to two DOCUMENTED reference defects: (a) its euler
  axis swap omits the sign flips its sibling estimators apply
  (lib.rs:133-134 vs homography lib.rs:152-154), inverting the pitch sense;
  (b) on rotation-dominant fields the essential matrix is degenerate and
  OpenCV's recoverPose returns a 180-degree-twisted solution that the
  reference's angle+pi band-aid (lib.rs:139-145) does not actually untwist.
  Our estimator fixes both (convention.py remap; Kabsch pure-rotation
  fallback), so the gate compares against the corrected-swap oracle on
  well-posed fixtures and asserts we BEAT the raw oracle on the degenerate
  ones.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ofps_tpu.core import quat
from ofps_tpu.core.camera import StandardCamera
from ofps_tpu.estimators.base import create_estimator
from oracles.reference_oracle import CameraOracle
from synthetic import calc_view, euler_deg, get_grid, synthetic_field

cv2 = pytest.importorskip("cv2")

from oracles.cv_oracle import (  # noqa: E402  (needs cv2)
    HomographyOracle,
    LibmvOracle,
    MultiviewOracle,
    triangulate_scale,
)


@pytest.fixture(scope="module")
def cam():
    return StandardCamera.create(1.0, 90.0)


@pytest.fixture(scope="module")
def cam_oracle():
    return CameraOracle(1.0, 90.0)


@pytest.fixture(scope="module")
def grid(cam):
    return get_grid(50, 50, cam, skip_edges=True)


def entries_of(flow):
    pos = np.asarray(flow.pos)
    mot = np.asarray(flow.motion)
    m = np.asarray(flow.mask) > 0
    return list(zip(pos[m], mot[m]))


def qdiff_deg(qa, qb) -> float:
    qa = jnp.asarray(np.asarray(qa, np.float32))
    qb = jnp.asarray(np.asarray(qb, np.float32))
    return float(np.rad2deg(np.asarray(quat.angle_to(qa, qb))))


def run_ours(est, flow, cam, seed=7):
    r, t, _ = jax.jit(est.estimate)(
        est.init(), flow, cam, jax.random.PRNGKey(seed)
    )
    return np.asarray(r), np.asarray(t)


ROT_COMBOS = [
    (1.0, 0.0, 0.0),
    (0.0, 1.0, 0.0),
    (0.0, 0.0, 1.0),
    (1.0, 1.0, 0.0),
    (1.0, 0.0, 1.0),
    (0.0, 1.0, 1.0),
    (1.0, 1.0, 1.0),
]


@pytest.mark.parametrize("use_ransac", [True, False])
def test_homography_oracle_parity(cam, cam_oracle, grid, use_ransac):
    est = create_estimator("homography", use_ransac=use_ransac)
    for combo in ROT_COMBOS:
        q = euler_deg(*combo)
        flow = synthetic_field(cam, q, grid=grid)
        q_ours, _ = run_ours(est, flow, cam)
        q_oracle, _ = HomographyOracle(use_ransac=use_ransac).estimate(
            entries_of(flow), cam_oracle
        )
        d = qdiff_deg(q_ours, q_oracle)
        assert d < 0.05, f"{combo}: ours vs oracle {d:.4f} deg"


def test_libmv_oracle_rotation_parity(cam, cam_oracle, grid):
    for pts in (7, 8):
        est = create_estimator("libmv", algo_points=pts)
        for combo in ROT_COMBOS:
            q = euler_deg(*combo)
            flow = synthetic_field(cam, q, grid=grid)
            q_ours, _ = run_ours(est, flow, cam)
            oracle = LibmvOracle(algo_points=pts)
            q_oracle, _ = oracle.estimate(entries_of(flow), cam_oracle)
            d = qdiff_deg(q_ours, q_oracle)
            assert d < 0.1, f"{pts}pt {combo}: ours vs oracle {d:.4f} deg"


def _translation_flow(cam, p0, p1, pts, capacity=1600):
    from ofps_tpu.core.motion import SparseFlow

    v1 = calc_view(quat.identity(), jnp.asarray(p0, jnp.float32))
    v2 = calc_view(quat.identity(), jnp.asarray(p1, jnp.float32))
    a = np.asarray(cam.project(pts, v1))
    b = np.asarray(cam.project(pts, v2))
    keep = (np.abs(a - 0.5).max(1) < 0.5) & (np.abs(b - 0.5).max(1) < 0.5)
    return SparseFlow.from_arrays(a[keep], (b - a)[keep], capacity=capacity)


def test_libmv_oracle_scale_chain_parity(cam, cam_oracle):
    """The PrevMotion translation-scale chain (lib.rs:211-279): oracle and
    TPU estimator must agree on chained |t| and direction over an L-path."""
    rng = np.random.default_rng(0)
    g = np.asarray(get_grid(40, 40, cam))
    pts = jnp.asarray(g * rng.uniform(0.3, 1.0, (len(g), 1)).astype(np.float32))
    positions = [(0, 0, 0), (0.1, 0, 0), (0.1, 0, 0.05), (0.15, 0, 0.05)]

    est = create_estimator("libmv", algo_points=8)
    fn = jax.jit(est.estimate)
    oracle = LibmvOracle(algo_points=8)
    state = est.init()
    key = jax.random.PRNGKey(7)
    for i in range(3):
        flow = _translation_flow(cam, positions[i], positions[i + 1], pts)
        key, sub = jax.random.split(key)
        _, t_ours, state = fn(state, flow, cam, sub)
        _, t_raw = oracle.estimate(entries_of(flow), cam_oracle)
        # The oracle emits in the SOLVER (screen-space pinhole) frame as the
        # reference does; our estimator emits world-frame camera motion.
        # With the fixture's view (forward=-Y, up=+Z) the solver->world
        # vector map is (x, y, z) -> (-x, -z, y), under which the
        # reference's negated output equals ours identically (see
        # estimators/libmv.py::_remap_vec).
        t_oracle = np.array(
            [-t_raw[0], -t_raw[2], t_raw[1]], np.float32
        )
        m_ours = float(np.linalg.norm(np.asarray(t_ours)))
        m_oracle = float(np.linalg.norm(t_oracle))
        assert abs(m_ours - m_oracle) < 0.1 * max(m_oracle, 0.1), (
            i, m_ours, m_oracle,
        )
        if m_ours > 0.01 and m_oracle > 0.01:
            cosang = float(
                np.asarray(t_ours) @ t_oracle / (m_ours * m_oracle)
            )
            assert cosang > 0.98, (i, t_ours, t_oracle)


def test_multiview_oracle_parity_well_posed(cam, cam_oracle, grid):
    """Fixtures where the essential matrix is non-degenerate enough for the
    reference chain to behave: compare against the corrected-swap oracle."""
    est = create_estimator("multiview")
    for combo in [(0.0, 1.0, 0.0), (0.0, 0.0, 1.0), (1.0, 0.0, 1.0),
                  (1.0, 1.0, 1.0)]:
        q = euler_deg(*combo)
        flow = synthetic_field(cam, q, grid=grid)
        q_ours, _ = run_ours(est, flow, cam)
        q_oracle, _ = MultiviewOracle(corrected_swap=True).estimate(
            entries_of(flow), cam_oracle
        )
        d = qdiff_deg(q_ours, q_oracle)
        assert d < 0.15, f"{combo}: ours vs corrected oracle {d:.4f} deg"


def test_multiview_documented_divergences(cam, cam_oracle, grid):
    """Pin the two reference defects our estimator deliberately fixes."""
    # (a) swap-sign defect: raw oracle inverts pitch; corrected does not.
    q = euler_deg(0.0, 1.0, 0.0)
    flow = synthetic_field(cam, q, grid=grid)
    ent = entries_of(flow)
    q_raw, _ = MultiviewOracle().estimate(ent, cam_oracle)
    q_fix, _ = MultiviewOracle(corrected_swap=True).estimate(ent, cam_oracle)
    assert qdiff_deg(q, q_raw) > 1.5  # reference: ~2 deg off on 1 deg pitch
    assert qdiff_deg(q, q_fix) < 0.1

    # (b) degenerate-branch defect: on a roll-dominant field the reference
    # band-aid leaves ~100% error; ours stays accurate.
    q = euler_deg(1.0, 1.0, 0.0)
    flow = synthetic_field(cam, q, grid=grid)
    q_raw, _ = MultiviewOracle(corrected_swap=True).estimate(
        entries_of(flow), cam_oracle
    )
    est = create_estimator("multiview")
    q_ours, _ = run_ours(est, flow, cam)
    assert qdiff_deg(q, q_raw) > 0.5  # reference-equivalent chain fails
    assert qdiff_deg(q, q_ours) < 0.15  # ours does not


def test_triangulate_scale_oracle_matches_ours():
    """utils.rs triangulate_scale: our jitted version vs the numpy port on
    random triangles (incl. the parallel degenerate case -> 1.0)."""
    from ofps_tpu.estimators.libmv import (
        triangulate_scale as triangulate_scale_jax,
    )

    rng = np.random.default_rng(3)
    for _ in range(50):
        ab = rng.normal(size=3).astype(np.float32)
        bc = rng.normal(size=3).astype(np.float32)
        ac = rng.normal(size=3).astype(np.float32)
        ours = float(triangulate_scale_jax(
            jnp.asarray(ab), jnp.asarray(bc), jnp.asarray(ac)
        ))
        ref = triangulate_scale(ab, bc, ac)
        assert abs(ours - ref) < 1e-3 * max(1.0, abs(ref)), (ours, ref)
    # Parallel case returns 1.0 (utils.rs:89-90 unwrap_or).
    ab = np.array([0.0, 1.0, 1.0], np.float32)
    ours = float(triangulate_scale_jax(
        jnp.asarray(ab), jnp.asarray([0.0, 1.0, -1.0]),
        jnp.asarray([0.0, 2.0, -2.0]),
    ))
    assert abs(ours - 1.0) < 1e-3
