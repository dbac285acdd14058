"""Numeric-parity gates vs sequential oracles ported from the reference.

BASELINE.md / BASELINE.json north star: "<1e-3 mean EPE deviation vs the
Rust almeida-estimator reference on the synthetic GT samples".  The oracles
in ``tests/oracles/reference_oracle.py`` are faithful sequential numpy
ports of the Rust sources; these tests run oracle and ofps_tpu side by side
on the sample rotation schedule and FAIL when numerics drift.

EPE here is the mean screen-space endpoint deviation between the motion
field predicted by our estimate and by the oracle's estimate (both via the
reference's own camera delta), in [0,1] screen units.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofps_tpu.core import quat
from ofps_tpu.core.camera import StandardCamera
from ofps_tpu.core.motion import Densifier, SparseFlow
from ofps_tpu.estimators.almeida import solve_ypr_ransac, solve_ypr_weighted
from oracles.reference_oracle import (
    CameraOracle,
    DensifierOracle,
    quat_to_mat4,
    solve_ypr_given as oracle_solve_given,
    solve_ypr_ransac as oracle_solve_ransac,
)
from synthetic import euler_deg, get_grid, synthetic_field

# The sample GT schedule of samples/make_samples.py (synthetic_rot.mvec).
ROT_SCHEDULE = (
    [(0.0, 0.0, 0.1 * k) for k in range(1, 5)]
    + [(0.05, 0.1, 0.4)] * 3
    + [(0.0, -0.1, -0.2)] * 3
)


def _epe_between(cam_o: CameraOracle, q_ours, q_oracle, grid):
    """Mean endpoint deviation of the two predicted rotation fields."""
    m_ours = quat_to_mat4(np.asarray(q_ours, np.float32))
    m_orac = quat_to_mat4(np.asarray(q_oracle, np.float32))
    devs = [
        np.linalg.norm(cam_o.delta(p, m_ours) - cam_o.delta(p, m_orac))
        for p in grid
    ]
    return float(np.mean(devs))


@pytest.fixture(scope="module")
def fixture():
    cam = StandardCamera.create(1.0, 90.0)
    cam_o = CameraOracle(1.0, 90.0)
    # 3D fixture grid (for synthetic fields) + the 2D screen grid used for
    # camera parity and EPE evaluation.
    grid3 = get_grid(20, 20, cam, skip_edges=True)
    screen = np.array(
        [[x / 20, y / 20] for x in range(2, 19) for y in range(2, 19)],
        np.float32,
    )
    return cam, cam_o, grid3, screen


def test_camera_oracle_matches_ofps_tpu(fixture):
    cam, cam_o, _, screen = fixture
    rot = np.asarray(quat.to_matrix4(euler_deg(1.0, -2.0, 0.5)), np.float32)
    ours = np.asarray(jax.vmap(lambda p: cam.delta(p, jnp.asarray(rot)))(
        jnp.asarray(screen)
    ))
    oracle = np.stack([cam_o.delta(p, rot) for p in screen])
    assert np.abs(ours - oracle).max() < 2e-6
    pa_ours = np.asarray(cam.point_angle(jnp.asarray(screen)))
    pa_orac = np.stack([cam_o.point_angle(p) for p in screen])
    assert np.abs(pa_ours - pa_orac).max() < 1e-6


def test_almeida_lsq_epe_parity(fixture):
    """Direct LSQ path (use_ransac=False) vs oracle: <1e-3 mean EPE."""
    cam, cam_o, grid3, screen = fixture
    worst = 0.0
    for r, p, y in ROT_SCHEDULE:
        q_gt = euler_deg(r, p, y)
        flow = synthetic_field(cam, q_gt, grid=grid3)
        ours = solve_ypr_weighted(cam, flow.pos, flow.motion, flow.mask)
        mask = np.asarray(flow.mask) > 0.5
        entries = list(
            zip(np.asarray(flow.pos)[mask], np.asarray(flow.motion)[mask])
        )
        oracle_q = oracle_solve_given(entries, cam_o)
        epe = _epe_between(cam_o, ours, oracle_q, screen)
        worst = max(worst, epe)
        # Rotation deviation gate as well (degrees).
        dq = float(
            jnp.rad2deg(quat.angle_to(jnp.asarray(np.asarray(oracle_q)), ours))
        )
        assert dq < 5e-3, (r, p, y, dq)
    assert worst < 1e-3, worst


def test_almeida_ransac_epe_parity(fixture):
    """RANSAC path vs oracle RANSAC on clean data: <1e-3 mean EPE.

    Sampling differs (vmapped Gumbel batch vs sequential choose_multiple),
    so parity is on the CONVERGED estimate, which on an outlier-free field
    is the all-inlier refit for both.
    """
    cam, cam_o, grid3, screen = fixture
    rng = np.random.default_rng(0)
    worst = 0.0
    for r, p, y in [(0.4, 0.0, 0.0), (0.05, 0.1, 0.4), (0.0, -0.1, -0.2)]:
        q_gt = euler_deg(r, p, y)
        flow = synthetic_field(cam, q_gt, grid=grid3)
        ours = solve_ypr_ransac(
            jax.random.PRNGKey(1), cam, flow, 64, 0.05, 1000
        )
        mask = np.asarray(flow.mask) > 0.5
        entries = list(
            zip(np.asarray(flow.pos)[mask], np.asarray(flow.motion)[mask])
        )
        oracle_q = oracle_solve_ransac(entries, cam_o, 20, 0.05, 1000, rng)
        epe = _epe_between(cam_o, ours, oracle_q, screen)
        worst = max(worst, epe)
    assert worst < 1e-3, worst


def test_holefill_matches_priority_queue_oracle():
    """Parallel Jacobi fill vs the reference's sequential priority fill.

    The fill ORDER differs by design (TPU parallelism), so exact equality is
    not expected; the gate is a small mean deviation relative to the source
    motion magnitude on a sparse random fixture, plus exact agreement on
    already-filled cells.
    """
    rng = np.random.default_rng(7)
    w, h = 12, 9
    n = 14
    pos = rng.uniform(0, 1, (n, 2)).astype(np.float32)

    # Smooth underlying field (what real sparse flows look like): the fill is
    # order-dependent, so on uncorrelated random motions the two algorithms
    # legitimately diverge; on smooth fields they must agree closely.
    def true_field(p):
        return np.stack(
            [0.3 + 0.5 * p[..., 0] - 0.2 * p[..., 1],
             -0.1 + 0.4 * np.sin(2.0 * p[..., 0]) * p[..., 1]],
            axis=-1,
        ).astype(np.float32)

    mot = true_field(pos)

    oracle = DensifierOracle(w, h)
    for p, m in zip(pos, mot):
        oracle.add_vector(p, m)
    pre_counts = oracle.counts.copy()
    oracle.interpolate_empty_cells()
    ref_field = oracle.field()

    flow = SparseFlow.from_arrays(pos, mot)
    d = Densifier.zeros(w, h).add_flow(flow).interpolate_empty_cells()
    ours = np.asarray(d.finalize())

    filled_mask = (pre_counts > 0.1).reshape(h, w)
    # Source cells must agree exactly (same scatter-mean semantics).
    assert np.abs(ours[filled_mask] - ref_field[filled_mask]).max() < 1e-5
    # Interpolated cells: mean deviation well under the motion scale
    # (parity-color sub-rounds track the sequential order; the residual is
    # the reference's index-order tie-breaking, which no parallel schedule
    # can reproduce exactly on an extreme-sparsity fixture).
    dev = np.linalg.norm(ours - ref_field, axis=-1)
    scale = float(np.abs(mot).mean())
    assert dev[~filled_mask].mean() < 0.08 * scale, (
        dev[~filled_mask].mean(),
        scale,
    )
    # Quality parity: our fill approximates the true smooth field at least
    # as well as the sequential reference fill (30% slack).
    gx, gy = np.meshgrid(np.arange(w) / w, np.arange(h) / h)
    gt = true_field(np.stack([gx, gy], axis=-1))
    err_ours = np.linalg.norm(ours - gt, axis=-1)[~filled_mask].mean()
    err_ref = np.linalg.norm(ref_field - gt, axis=-1)[~filled_mask].mean()
    assert err_ours <= err_ref * 1.3 + 1e-4, (err_ours, err_ref)


def test_holefill_oracle_epe_realistic_density():
    """Few-percent EPE gate vs the sequential oracle at realistic decoder
    density (~25-50% of cells sourced, the codec-MV / cv-decoder regime) on
    a smooth field — tight enough to catch any fill-semantics drift."""
    def true_field(p):
        return np.stack(
            [0.3 + 0.5 * p[..., 0] - 0.2 * p[..., 1],
             -0.1 + 0.4 * np.sin(2.0 * p[..., 0]) * p[..., 1]],
            axis=-1,
        ).astype(np.float32)

    w, h = 16, 12
    for frac, seed in ((0.5, 0), (0.5, 1), (0.25, 0), (0.25, 2)):
        rng = np.random.default_rng(seed)
        cells = rng.permutation(w * h)[: int(frac * w * h)]
        pos = np.stack(
            [(cells % w) / (w - 1), (cells // w) / (h - 1)], -1
        ).astype(np.float32)
        mot = true_field(pos)

        oracle = DensifierOracle(w, h)
        for p, m in zip(pos, mot):
            oracle.add_vector(p, m)
        pre = oracle.counts.copy()
        oracle.interpolate_empty_cells()
        ref_field = oracle.field()

        d = (
            Densifier.zeros(w, h)
            .add_flow(SparseFlow.from_arrays(pos, mot))
            .interpolate_empty_cells()
        )
        ours = np.asarray(d.finalize())
        holes = ~(pre > 0.1).reshape(h, w)
        dev = np.linalg.norm(ours - ref_field, axis=-1)[holes].mean()
        scale = float(np.abs(mot).mean())
        assert dev < 0.055 * scale, (frac, seed, dev, scale)
