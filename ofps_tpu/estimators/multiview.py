"""Essential-matrix camera rotation estimator ("multiview").

Behavioral spec: ``/root/reference/multiview-estimator/src/lib.rs`` — robust
essential matrix over the flow correspondences (OpenCV
``find_essential_mat_matrix`` with RANSAC/LMedS), pose recovery by cheirality
(``recover_pose_estimated``), axis remap, and the >90-degree wraparound fix
(lib.rs:137-145).

TPU-first: minimal fits are normalized 8-point solves projected onto the
essential manifold, vmapped as a hypothesis batch; pose recovery triangulates
all inliers in parallel for the cheirality vote.  (Nister's polynomial
5-point solver is a planned upgrade; the 8-point-on-E minimal solver uses the
same robust driver and scoring.)
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
    homogeneous,
    project_to_essential,
    recover_pose_from_essential,
    sampson_error,
)
from ofps_tpu.ops.five_point import five_point_essential
from ofps_tpu.ops.robust import ransac_budget, robust_fit


class MultiviewParams(NamedTuple):
    """Properties parity with lib.rs:23-37 (+ hypothesis batch size).

    ``num_hypotheses`` is the CEILING on the vmapped hypothesis batch; the
    actual count is the RANSAC bound derived from ``desired_confidence`` at
    the ``outlier_proba`` prior (lib.rs confidence 0.999 via OpenCV's
    adaptive loop).  ``use_five_point=True`` matches the reference's Nistér
    solver; False falls back to the 8-point-on-E minimal fit.
    """

    desired_confidence: float = 0.999
    max_error: float = 0.0001
    use_ransac: bool = True
    num_hypotheses: int = 512
    outlier_proba: float = 0.5
    use_five_point: bool = True
    eval_cap: int = 2048
    # Progressive hypothesis scoring (ops/robust.py): the Sampson sweep
    # over (hyps x 28 candidate E) x eval_cap points is the stage's
    # dominant HBM traffic; pre-score on 128 points, re-score finalists.
    prescore_cap: int = 128
    finalists: int = 32
    # Rotation-only (Kabsch) fallback for the epipolar-degenerate
    # near-pure-rotation regime; see estimate_essential_rotation.
    rotation_fallback: bool = True
    # Raise the RANSAC cut to the data's LMedS-sigma noise floor when the
    # configured max_error sits below it (codec MVs are quarter-pel on
    # macroblocks — far noisier than the pixel-accurate points OpenCV's
    # default assumes).  No-op on data whose noise fits under max_error.
    adaptive_threshold: bool = True
    # Gauss-Newton (R, t) polish on the inlier set
    # (ops.epipolar.refine_pose_sampson): the final refit above is an
    # 8-DOF fundamental projected onto E; the polish optimizes on the
    # 5-DOF motion manifold directly (strict-SSE-improvement acceptance,
    # so degenerate pure-rotation data is a no-op).
    gn_polish: bool = True
    gn_iters: int = 3


def _normalized_coords(camera: StandardCamera, p: jnp.ndarray) -> jnp.ndarray:
    from ofps_tpu.ops.solve import inv3x3

    kinv = inv3x3(camera.intrinsics())
    # precision="highest": TPU default matmul is bf16 — fatal for the
    # normalized coordinates every epipolar solve consumes.
    h = jnp.einsum(
        "...j,ij->...i", homogeneous(p), kinv, precision="highest"
    )
    return h[..., :2] / h[..., 2:3]


def estimate_essential_rotation(
    key, params: MultiviewParams, flow: SparseFlow, camera: StandardCamera,
    max_error=None, dense=False,
):
    w = flow.mask
    x1 = _normalized_coords(camera, flow.pos)
    x2 = _normalized_coords(camera, flow.pos + flow.motion)
    if max_error is None:
        max_error = params.max_error

    # OpenCV divides the pixel threshold by the focal length for normalized
    # coordinates; our K is in [0,1]-screen units.
    k = camera.intrinsics()
    focal = (k[0, 0] + k[1, 1]) * 0.5
    thr = max_error / focal

    if params.use_five_point:
        minimal, k = five_point_essential, 5
    else:
        def minimal(x1s, x2s, ws):
            f = eight_point_fundamental(x1s, x2s, ws)
            e = project_to_essential(f)
            return e[None], jnp.ones((1,), dtype=bool)

        k = 8

    res = robust_fit(
        key,
        x1,
        x2,
        w,
        minimal_fit=minimal,
        sample_size=k,
        error_fn=sampson_error,
        num_hypotheses=ransac_budget(
            params.desired_confidence,
            params.outlier_proba,
            k,
            params.num_hypotheses,
        ),
        threshold=thr,
        use_lmeds=not params.use_ransac,
        eval_cap=params.eval_cap,
        adaptive_threshold=params.adaptive_threshold,
        prescore_cap=params.prescore_cap,
        finalists=params.finalists,
        dense=dense,
        refit_fn=lambda a, b, ww: project_to_essential(
            eight_point_fundamental(a, b, ww)
        ),
    )
    # Refit on inliers, then recover pose with a parallel cheirality vote.
    e = project_to_essential(eight_point_fundamental(x1, x2, res.inliers))
    r, t, _ = recover_pose_from_essential(e, x1, x2, res.inliers)
    if params.gn_polish:
        from ofps_tpu.ops.epipolar import refine_pose_sampson

        r, t = refine_pose_sampson(
            r, t, x1, x2, res.inliers, iters=params.gn_iters
        )

    if params.rotation_fallback:
        # Pure/near-pure rotation is DEGENERATE for essential estimation;
        # see ops.epipolar.rotation_only_fallback (shared with libmv).
        from ofps_tpu.ops.epipolar import rotation_only_fallback

        r, _ = rotation_only_fallback(r, x1, x2, res.inliers)

    # Axis remap to the codebase convention (lib.rs:130-134 intent).  Our
    # recovered R uses the x2 ~ f(x1) convention shared with the homography
    # path, so the same calibrated component swap applies (validated against
    # the almeida-consistent synthetic fixture).
    q = remap_solver_rotation(quat.from_matrix3(r))

    # >90 deg wraparound fix (lib.rs:139-145).
    axis, ang = quat.axis_angle(q)
    new_ang = jnp.mod(ang + jnp.pi, 2.0 * jnp.pi)
    q_fixed = quat.from_axis_angle(axis, new_ang)
    q = jnp.where(ang > jnp.pi / 2.0, q_fixed, q)
    return q


@register("multiview")
def make_multiview(**kwargs) -> EstimatorInstance:
    params = MultiviewParams(**kwargs)

    def estimate(
        state, flow: SparseFlow, camera: StandardCamera, key=None,
        move_magnitude=None,  # accepted, unused: multiview lib.rs:118
        props=None, dense=False,
    ):
        if key is None:
            key = jax.random.PRNGKey(0)
        rot = estimate_essential_rotation(
            key, params, flow, camera,
            max_error=(props or {}).get("max_error"),
            dense=dense,
        )
        ok = jnp.sum(flow.mask) >= 8
        rot = jnp.where(ok & jnp.all(jnp.isfinite(rot)), rot, quat.identity())
        return rot, jnp.zeros(3, dtype=jnp.float32), state

    return EstimatorInstance(
        name="multiview",
        params=params,
        init=lambda: (),
        estimate=estimate,
        dyn_defaults=lambda: {"max_error": jnp.float32(params.max_error)},
    )
