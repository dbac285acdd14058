"""Fundamental-matrix camera motion estimator ("libmv" equivalent).

Behavioral spec: ``/root/reference/libmv-estimator/src/lib.rs`` — robust 7- or
8-point fundamental matrix (libmv's C++ solver surface,
``libmv-rust/libmv-c.cpp:9-67``), essential via K^T F K, (R, t) from the
essential matrix using a single correspondence's cheirality, and a
**translation-scale chain**: flows are chained across three views through a
spatial index of previous-frame endpoints, a second fundamental solve on the
chained field gives the 1->3 translation direction, and
``triangulate_scale`` (ofps/src/utils.rs:47-89) keeps a globally consistent
translation magnitude.  The only estimator emitting nonzero translation.

TPU-first redesign: the BTreeMap spatial index becomes a fixed-size raster
grid (one entry per cell, 5x5-neighborhood nearest lookup under the same
+-0.05 box metric), so the whole stateful step — including the chain update —
is one jittable fixed-shape function whose state threads through scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ofps_tpu.core import quat
from ofps_tpu.core.camera import StandardCamera
from ofps_tpu.core.motion import SparseFlow
from ofps_tpu.estimators.base import EstimatorInstance, register
from ofps_tpu.estimators.convention import remap_solver_rotation
from ofps_tpu.ops.epipolar import (
    eight_point_fundamental,
    essential_from_fundamental,
    motion_from_essential_and_correspondence,
    sampson_error,
    seven_point_fundamental,
)
from ofps_tpu.ops.robust import ransac_budget, robust_fit
from ofps_tpu.ops.solve import solve3x3

GRID = 40  # spatial-index resolution; cell size 0.025 covers the 0.05 range
_RANGE = 0.05  # reference nearest-entry search box (lib.rs:224)


class LibmvParams(NamedTuple):
    """Properties parity with lib.rs:118-132 (+ hypothesis batch size)."""

    outlier_proba: float = 0.7
    max_error: float = 0.0001
    algo_points: int = 7
    num_hypotheses: int = 512
    desired_confidence: float = 0.999
    eval_cap: int = 2048
    # Progressive hypothesis scoring (ops/robust.py): pre-score all 1536
    # candidate F on 128 points, full eval_cap only for the finalists.
    prescore_cap: int = 128
    finalists: int = 32
    # LMedS-sigma floor on the RANSAC cut (see ops.robust.robust_fit):
    # max_error=1e-4 screen units assumes pixel-accurate points; codec MVs
    # sit ~an order above that, where fixed-cut consensus counting breaks.
    adaptive_threshold: bool = True
    # LO-refit weighting (ops.robust.robust_fit refit_weight): IRLS Cauchy
    # weights on the wide adaptive cut (see the matrix-experiment numbers in
    # the field's commit) vs the plain binary inlier mask.
    refit_weight: str = "binary"
    lo_iters: int = 2
    # Gauss-Newton pose polish on the inlier set in ESSENTIAL space
    # (ops.epipolar.refine_pose_sampson): re-projects the 8-DOF F-pipeline
    # estimate onto the 5-DOF motion manifold, where codec-MV noise cannot
    # leak into rotation through the extra DOF.  Measured on the av matrix
    # cells (CPU, r5): clip0 0.0271 -> 0.0197, clip1 0.0195 -> 0.0106,
    # clip5 0.0665 -> 0.0620 deg/frame; exact-data (gt-mv) floor improves
    # too (0.0033 -> 0.0013) because acceptance requires strict SSE
    # reduction, so the degenerate no-op rule is preserved.
    gn_polish: bool = True
    gn_iters: int = 3
    # Rotation-only (Kabsch) fallback on the PRIMARY solve
    # (ops.epipolar.rotation_only_fallback, shared with multiview): pure
    # rotation is degenerate for F — the robustly-fitted pose can land
    # anywhere in a 3-dim solution family, and on the av matrix's pure-
    # rotation clips libmv-7pt intermittently emitted ~identity (per-frame
    # error == the GT angle, clips 2/6 at 0.13-0.15 deg/frame avg).  The
    # decisively-better gate keeps real-translation data on the epipolar
    # pose (translation output unchanged: t comes from the epipolar solve
    # either way, as in the reference).
    rotation_fallback: bool = True


class PrevMotion(NamedTuple):
    """Spatial index of the previous chained flow, keyed by endpoint cell."""

    pos: jnp.ndarray  # (G, G, 2) start position of the stored entry
    motion: jnp.ndarray  # (G, G, 2)
    valid: jnp.ndarray  # (G, G) float 0/1
    rot: jnp.ndarray  # (4,) accumulated rotation since the chain started
    tr: jnp.ndarray  # (3,) scaled translation when the chain started
    has: jnp.ndarray  # () float 0/1 — Option<PrevMotion> discriminant

    @classmethod
    def empty(cls) -> "PrevMotion":
        return cls(
            pos=jnp.zeros((GRID, GRID, 2), jnp.float32),
            motion=jnp.zeros((GRID, GRID, 2), jnp.float32),
            valid=jnp.zeros((GRID, GRID), jnp.float32),
            rot=quat.identity(),
            tr=jnp.zeros(3, jnp.float32),
            has=jnp.zeros((), jnp.float32),
        )


def rasterize_prev(pos: jnp.ndarray, motion: jnp.ndarray, w: jnp.ndarray):
    """Scatter entries into the endpoint-keyed grid (PrevMotion::set_mv).

    DIVERGENCE DECISION (kept, round 4): when several entries land in one
    cell, the reference's BTreeMap keeps the entry whose noisy-float KEY
    sorts last among equal cells (lib.rs:75-83 insert overwrites), i.e. an
    arbitrary-but-deterministic pick; this scatter keeps the LAST entry in
    raster order — a different arbitrary-but-deterministic pick of the same
    class.  Both feed ``find_nearest``'s +-0.05 box query, whose L1-nearest
    winner is insensitive to which same-cell entry survived (cell size
    0.025 << box 0.05); the oracle scale-chain parity test
    (tests/test_oracle_estimators.py::test_libmv_oracle_scale_chain_parity)
    passes against the reference port either way.
    """
    ep = pos + motion
    cx = jnp.clip((ep[..., 0] * GRID).astype(jnp.int32), 0, GRID - 1)
    cy = jnp.clip((ep[..., 1] * GRID).astype(jnp.int32), 0, GRID - 1)
    idx = cy * GRID + cx
    # Invalid entries all collide on a dump cell; mask them out afterwards.
    idx = jnp.where(w > 0.5, idx, 0)
    gp = jnp.zeros((GRID * GRID, 2), jnp.float32).at[idx].set(pos, mode="drop")
    gm = jnp.zeros((GRID * GRID, 2), jnp.float32).at[idx].set(motion, mode="drop")
    gv = jnp.zeros((GRID * GRID,), jnp.float32).at[idx].max(w)
    # Entries with weight 0 may have clobbered cell 0; rebuild it from any
    # valid entry mapping there.
    valid0 = jnp.any((idx == 0) & (w > 0.5))
    first0 = jnp.argmax((idx == 0) & (w > 0.5))
    gp = gp.at[0].set(jnp.where(valid0, pos[first0], 0.0))
    gm = gm.at[0].set(jnp.where(valid0, motion[first0], 0.0))
    gv = gv.at[0].set(jnp.where(valid0, 1.0, 0.0))
    return gp.reshape(GRID, GRID, 2), gm.reshape(GRID, GRID, 2), gv.reshape(GRID, GRID)


def find_nearest(prev: PrevMotion, query: jnp.ndarray, w: jnp.ndarray):
    """Nearest stored entry (by endpoint, L1) within the +-0.05 box.

    ``query``: (N, 2) current start positions. Returns (pos, motion, found).
    Parity: PrevMotion::find_nearest_entry (lib.rs:85-107).

    TPU shape (round 5): the naive per-offset lookup is 25 dynamic gathers
    of N rows each — 25N scalar-core row fetches, 4.6 ms/frame of the
    serving step at N=12,600 (scripts/profile_libmv.py).  The index table
    is tiny (40x40), so instead pre-assemble, per CELL, all 25 clamped
    neighbor records as one 128-lane row (25 x [px, py, mx, my, v] = 125
    floats, padded to 128): 25 static edge-clamped shifts of the (G, G, 5)
    grid — trivial VPU work — then ONE aligned row gather per query and a
    fully vectorized 25-candidate masked min.  The candidate scan order
    (dy-major, dx-minor) and the strict-< tie rule survive via argmin's
    first-minimum semantics.
    """
    cx = jnp.clip((query[..., 0] * GRID).astype(jnp.int32), 0, GRID - 1)
    cy = jnp.clip((query[..., 1] * GRID).astype(jnp.int32), 0, GRID - 1)

    rec = jnp.concatenate(
        [prev.pos, prev.motion, prev.valid[..., None]], axis=-1
    )  # (G, G, 5)

    def shift(dy: int, dx: int):
        # rec[clip(y+dy), clip(x+dx)] == edge-padded slice (static offsets).
        padded = jnp.pad(rec, ((2, 2), (2, 2), (0, 0)), mode="edge")
        return padded[2 + dy : 2 + dy + GRID, 2 + dx : 2 + dx + GRID]

    table = jnp.stack(
        [shift(dy, dx) for dy in range(-2, 3) for dx in range(-2, 3)],
        axis=2,
    ).reshape(GRID * GRID, 125)
    table = jnp.pad(table, ((0, 0), (0, 3)))  # one 128-lane row per cell

    rows = table[cy * GRID + cx]  # (N, 128): the single gather
    cand = rows[..., :125].reshape(*query.shape[:-1], 25, 5)
    p = cand[..., 0:2]
    m = cand[..., 2:4]
    v = cand[..., 4] > 0.5
    d = jnp.abs(query[..., None, :] - (p + m))
    inbox = (d[..., 0] < _RANGE) & (d[..., 1] < _RANGE) & v
    l1 = jnp.where(inbox, d[..., 0] + d[..., 1], 1e9)
    am = jnp.argmin(l1, axis=-1)  # first minimum == loop's strict-< winner
    sel = (
        jnp.arange(25, dtype=am.dtype) == am[..., None]
    ).astype(jnp.float32)
    found = jnp.any(inbox, axis=-1)
    # Zero the not-found rows like the loop's untouched init (weight-0
    # chain points must stay exactly zero, not candidate-0's record).
    fz = found[..., None].astype(jnp.float32)
    best_pos = jnp.einsum("...c,...ck->...k", sel, p, precision="highest") * fz
    best_mot = jnp.einsum("...c,...ck->...k", sel, m, precision="highest") * fz
    return best_pos, best_mot, found & (w > 0.5)


def triangulate_scale(ab: jnp.ndarray, bc: jnp.ndarray, ac: jnp.ndarray):
    """Scale factor for bc consistent with ab (ofps/src/utils.rs:47-89).

    Solves [-bc, ac, bc x ac] x = ab; returns x[0], or 1.0 when the system is
    singular (parallel lines).
    """
    cross = jnp.cross(bc, ac)
    lhs = jnp.stack([-bc, ac, cross], axis=-1)
    x = solve3x3(lhs, ab, fallback=jnp.nan)
    return jnp.where(jnp.isnan(x[..., 0]), 1.0, x[..., 0])


def _remap_vec(v: jnp.ndarray) -> jnp.ndarray:
    """Translation solver->codebase axis remap: (x,y,z) -> (x, z, -y).

    Differs in sign from the rotation-axis remap because translations are
    polar vectors while rotation axes are pseudovectors under the improper
    axis swap (calibrated on +X/+Y/+Z camera-translation fixtures).
    """
    return jnp.stack([v[..., 0], v[..., 2], -v[..., 1]], axis=-1)


def _robust_fundamental(
    key, params: LibmvParams, x1, x2, w, max_error=None, dense=False
):
    if max_error is None:
        max_error = params.max_error
    if params.algo_points == 7:
        minimal, k = seven_point_fundamental, 7
    else:
        def minimal(a, b, ww):
            return eight_point_fundamental(a, b, ww)[None], jnp.ones((1,), bool)

        k = 8
    return robust_fit(
        key,
        x1,
        x2,
        w,
        minimal_fit=minimal,
        sample_size=k,
        error_fn=sampson_error,
        # libmv sizes its loop from outlier_prob (libmv-c.h:8-35): the
        # 0.7 default at k=7/8 needs more iterations than the static
        # ceiling, which therefore binds — but LOWERING outlier_proba now
        # measurably shrinks the batch (e.g. 0.3 @ 7pt -> 84 hypotheses).
        num_hypotheses=ransac_budget(
            params.desired_confidence,
            params.outlier_proba,
            k,
            params.num_hypotheses,
        ),
        threshold=max_error,
        use_lmeds=False,
        eval_cap=params.eval_cap,
        adaptive_threshold=params.adaptive_threshold,
        prescore_cap=params.prescore_cap,
        finalists=params.finalists,
        # LO refit: libmv's robust 7-point keeps the raw minimal-sample F
        # (libmv-c.cpp:9-38); a least-squares refit over the consensus set
        # strictly improves it, so the TPU build adds one.
        refit_fn=eight_point_fundamental,
        refit_weight=params.refit_weight,
        lo_iters=params.lo_iters,
        dense=dense,
    )


def _pose_from_field(
    key, params, camera, pos, motion, w, max_error=None, dense=False,
    rot_fallback=False,
):
    """Fundamental -> essential -> (R, t, ok) on a (possibly chained) field.

    ``rot_fallback`` enables the Kabsch rotation-only recovery for
    epipolar-degenerate (pure-rotation) data — the PRIMARY solve only: the
    chained solve exists to supply a translation direction, which the
    rotation-only model has nothing to say about.
    """
    x1 = pos
    x2 = pos + motion
    res = _robust_fundamental(
        key, params, x1, x2, w, max_error=max_error, dense=dense
    )
    k = camera.intrinsics()
    e = essential_from_fundamental(res.model, k)
    first = jnp.argmax(res.inliers)
    r, t, sup = motion_from_essential_and_correspondence(e, k, x1[first], x2[first])
    if params.gn_polish or rot_fallback:
        from ofps_tpu.ops.epipolar import homogeneous
        from ofps_tpu.ops.solve import inv3x3

        kinv = inv3x3(k)
        h1 = jnp.einsum("ij,nj->ni", kinv, homogeneous(x1),
                        precision="highest")
        h2 = jnp.einsum("ij,nj->ni", kinv, homogeneous(x2),
                        precision="highest")
        x1n = h1[:, :2] / h1[:, 2:]
        x2n = h2[:, :2] / h2[:, 2:]
    if params.gn_polish:
        from ofps_tpu.ops.epipolar import refine_pose_sampson

        r, t = refine_pose_sampson(
            r, t, x1n, x2n, res.inliers * w, iters=params.gn_iters
        )
    if rot_fallback:
        from ofps_tpu.ops.epipolar import rotation_only_fallback

        r, _ = rotation_only_fallback(r, x1n, x2n, res.inliers * w)
    ok = (jnp.sum(res.inliers) >= 3.0) & (sup > 0)
    return r, t, res, ok


def estimate_libmv(
    key, params: LibmvParams, state: PrevMotion, flow: SparseFlow, camera,
    move_magnitude=None, max_error=None, dense=False,
):
    """``move_magnitude`` is the estimator.rs:18-23 translation-magnitude
    hint: when supplied (may be a traced scalar), the emitted translation —
    and the chain anchor ``tr`` that future ``triangulate_scale`` calls are
    measured against — use the hinted magnitude instead of the chained one.
    """
    k1, k2 = jax.random.split(key)
    pos, motion, w = flow.pos, flow.motion, flow.mask

    # ``dense`` applies only to this primary solve (serving's all-valid grid
    # field); the chained view-1 -> view-3 field below has a real
    # found-dependent mask, so its solve keeps the runtime subset machinery.
    r_mat, t_raw, res, _ok = _pose_from_field(
        k1, params, camera, pos, motion, w, max_error=max_error, dense=dense,
        rot_fallback=params.rotation_fallback,
    )
    q = remap_solver_rotation(quat.from_matrix3(r_mat))

    tm = jnp.linalg.norm(t_raw)
    has_t = tm > 1e-6
    # Solver-frame -> codebase-frame translation: same component remap as the
    # rotation axes ((x,y,z) -> (-x,-z,y)); calibrated so that a camera moving
    # +X/+Y/+Z in the synthetic fixture yields t along +X/+Y/+Z.
    t_world = _remap_vec(t_raw)
    t_unit = jnp.where(has_t, t_world / jnp.maximum(tm, 1e-20), t_world)

    # ---- translation-scale chain (lib.rs:211-279) ----
    # Chain current MVs through the previous endpoint index.
    ne_pos, ne_mot, found = find_nearest(state, pos, w)
    ch_pos = ne_pos
    ch_mot = ne_mot + motion
    ch_w = found.astype(jnp.float32)

    new_grid = rasterize_prev(ch_pos, ch_mot, ch_w)
    chained_rot = quat.mul(q, state.rot)

    # Secondary solve on the chained (view-1 -> view-3) field.
    cp = new_grid[0].reshape(-1, 2)
    cm = new_grid[1].reshape(-1, 2)
    cw = new_grid[2].reshape(-1)
    r13, t13_raw, _res13, _ok13 = _pose_from_field(
        k2, params, camera, cp, cm, cw, max_error=max_error
    )
    t13 = _remap_vec(t13_raw)

    t23 = quat.rotate_vec(chained_rot, t_unit)
    scale = triangulate_scale(state.tr, t23, t13)

    # State transitions mirroring the reference's Option dance:
    had_prev = state.has > 0.5
    use_chain = had_prev & has_t
    sf = jnp.where(
        had_prev,
        jnp.where(has_t, scale, 0.0),
        jnp.where(has_t, 1.0, 0.0),
    )

    # When a chain step completes (or starts), prev resets to the current
    # field; when tm == 0 with an existing chain, the chained grid persists.
    cur_grid = rasterize_prev(pos, motion, w)
    reset_rot = q
    reset_tr = t_unit * jnp.where(use_chain, scale, 1.0)

    if move_magnitude is not None:
        mm = jnp.asarray(move_magnitude, jnp.float32)
        sf = jnp.where(has_t, mm, 0.0)
        reset_tr = t_unit * jnp.where(has_t, mm, 1.0)

    new_state = PrevMotion(
        pos=jnp.where((use_chain | ~had_prev), cur_grid[0], new_grid[0]),
        motion=jnp.where((use_chain | ~had_prev), cur_grid[1], new_grid[1]),
        valid=jnp.where((use_chain | ~had_prev), cur_grid[2], new_grid[2]),
        rot=jnp.where(use_chain | ~had_prev, reset_rot, chained_rot),
        tr=jnp.where(use_chain | ~had_prev, reset_tr, state.tr),
        has=jnp.maximum(state.has, has_t.astype(jnp.float32)),
    )

    return q, t_unit * sf, new_state


@register("libmv")
def make_libmv(**kwargs) -> EstimatorInstance:
    params = LibmvParams(**kwargs)

    def estimate(
        state: PrevMotion, flow: SparseFlow, camera: StandardCamera, key=None,
        move_magnitude=None, props=None, dense=False,
    ):
        if key is None:
            key = jax.random.PRNGKey(0)
        rot, tr, new_state = estimate_libmv(
            key, params, state, flow, camera, move_magnitude=move_magnitude,
            max_error=(props or {}).get("max_error"), dense=dense,
        )
        # Degenerate input guard (reference returns Err; we hold the pose).
        ok = (jnp.sum(flow.mask) >= params.algo_points) & jnp.all(
            jnp.isfinite(rot)
        ) & jnp.all(jnp.isfinite(tr))
        rot = jnp.where(ok, rot, quat.identity())
        tr = jnp.where(ok, tr, jnp.zeros(3, jnp.float32))
        new_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_state, state
        )
        return rot, tr, new_state

    return EstimatorInstance(
        name="libmv",
        params=params,
        init=PrevMotion.empty,
        estimate=estimate,
        dyn_defaults=lambda: {"max_error": jnp.float32(params.max_error)},
    )
