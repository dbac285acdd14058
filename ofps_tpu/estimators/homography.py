"""Homography-based camera rotation estimator.

Behavioral spec: ``/root/reference/homography-estimator/src/lib.rs`` —
find a robust homography over the flow correspondences (RANSAC or LMedS),
decompose it with the camera intrinsics, take the rotation of the minimum
translation-norm solution, and remap axes to the codebase convention
(lib.rs:148-155).

TPU-first: the OpenCV hypothesis loop becomes a vmapped batch of 4-point DLT
fits scored in parallel (:mod:`ofps_tpu.ops.robust`), with a weighted DLT
refit on the winning inlier set instead of LM polish.
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
from ofps_tpu.ops.epipolar import homogeneous
from ofps_tpu.ops.homography import (
    decompose_homography,
    dlt_homography,
    gn_refine_homography,
    homography_transfer_error,
)
from ofps_tpu.ops.robust import ransac_budget, robust_fit


class HomographyParams(NamedTuple):
    """Properties parity with lib.rs:23-41 (+ hypothesis batch size)."""

    desired_confidence: float = 0.997
    max_error: float = 0.001
    max_iters: int = 2000
    use_ransac: bool = True
    num_hypotheses: int = 512
    outlier_proba: float = 0.5
    eval_cap: int = 2048
    # LMedS-sigma floor on the RANSAC cut for noisy (codec-MV) fields; see
    # ops.robust.robust_fit.  No-op when the data noise fits under max_error.
    adaptive_threshold: bool = True
    # Progressive scoring (see ops.robust): besides the transfer-error sweep
    # itself, the adaptive-threshold masked median (a 31-round bit loop over
    # every hypothesis x eval point, VPU-serialized) moves to the 128-point
    # presubset — the dominant saving for this estimator's small model cost.
    prescore_cap: int = 128
    finalists: int = 32


def estimate_homography_rotation(
    key, params: HomographyParams, flow: SparseFlow, camera: StandardCamera,
    max_error=None, dense=False,
):
    p1, w = flow.pos, flow.mask
    p2 = flow.pos + flow.motion
    if max_error is None:
        max_error = params.max_error

    def minimal(x1s, x2s, ws):
        h = dlt_homography(x1s, x2s, ws)
        return h[None], jnp.ones((1,), dtype=bool)

    res = robust_fit(
        key,
        p1,
        p2,
        w,
        minimal_fit=minimal,
        sample_size=4,
        error_fn=homography_transfer_error,
        num_hypotheses=ransac_budget(
            params.desired_confidence,
            params.outlier_proba,
            4,
            min(params.num_hypotheses, params.max_iters),
        ),
        threshold=max_error,
        use_lmeds=not params.use_ransac,
        eval_cap=params.eval_cap,
        adaptive_threshold=params.adaptive_threshold,
        refit_fn=dlt_homography,
        prescore_cap=params.prescore_cap,
        finalists=params.finalists,
        dense=dense,
    )
    # Weighted refit on the winning inlier set + Gauss-Newton polish on the
    # transfer error (OpenCV refines with LM here).
    h = dlt_homography(p1, p2, res.inliers)
    h = gn_refine_homography(h, p1, p2, res.inliers)

    # Sign disambiguation before decomposition: require x2n . (Hn x1n) > 0
    # on the consensus set (positive-depth convention).
    from ofps_tpu.ops.solve import inv3x3

    k = camera.intrinsics()
    kinv = inv3x3(k)
    # Compute (K^-1 h2) . (K^-1 H h1) per point.
    kinv_h = jnp.matmul(kinv, h, precision="highest")
    a = jnp.einsum("ij,nj->ni", kinv_h, homogeneous(p1), precision="highest")
    b = jnp.einsum("ij,nj->ni", kinv, homogeneous(p2), precision="highest")
    sign = jnp.sign(jnp.sum(jnp.sum(a * b, axis=-1) * res.inliers))
    h = h * jnp.where(sign == 0, 1.0, sign)

    rs, ts, _ = decompose_homography(h, k)
    tnorm = jnp.sum(ts * ts, axis=-1)
    best = jnp.argmin(tnorm)
    r = rs[best]

    # Axis remap to the codebase convention (lib.rs:148-155 intent).  Our
    # decomposition returns R with x2 ~ (R + t n^T) x1 directly, which lands
    # one inverse away from OpenCV's output, so the calibrated remap is the
    # (w,x,y,z) -> (w,-x,-z,y) component swap on the raw quaternion
    # (exact form of the reference's euler swap; validated against the
    # almeida-consistent synthetic fixture).
    return remap_solver_rotation(quat.from_matrix3(r))


@register("homography")
def make_homography(**kwargs) -> EstimatorInstance:
    params = HomographyParams(**kwargs)

    def estimate(
        state, flow: SparseFlow, camera: StandardCamera, key=None,
        move_magnitude=None,  # accepted, unused: homography lib.rs:126
        props=None, dense=False,
    ):
        if key is None:
            key = jax.random.PRNGKey(0)
        rot = estimate_homography_rotation(
            key, params, flow, camera,
            max_error=(props or {}).get("max_error"),
            dense=dense,
        )
        # Degenerate input guard: fewer valid points than a minimal sample.
        ok = jnp.sum(flow.mask) >= 4
        rot = jnp.where(ok & jnp.all(jnp.isfinite(rot)), rot, quat.identity())
        return rot, jnp.zeros(3, dtype=jnp.float32), state

    return EstimatorInstance(
        name="homography",
        params=params,
        init=lambda: (),
        estimate=estimate,
        dyn_defaults=lambda: {"max_error": jnp.float32(params.max_error)},
    )
