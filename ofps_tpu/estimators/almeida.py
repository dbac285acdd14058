"""Almeida camera-rotation estimator (iterative least squares + RANSAC).

Behavioral spec: ``/root/reference/almeida-estimator/src/lib.rs`` — a modified
implementation of Almeida et al., "Robust Estimation of Camera Motion Using
Optical Flow Models".  Rotation-only output.

TPU-first redesign
------------------
* The per-point motion prototypes (roll/pitch/yaw screen-space derivatives,
  lib.rs:30-47) are **loop-invariant**: they are computed once per call, not
  per LSQ iteration, and are pre-scaled by ``1/EPS`` so the 3x3 normal
  equations stay well-conditioned in f32 (raw reference values underflow for
  tiny sample counts).
* The sequential RANSAC loop (lib.rs:202-251) becomes a **vmapped hypothesis
  batch**: all ``num_iters`` minimal 3-point fits, their 1000-sample inlier
  evaluations, and the argmax-selection run as one fused XLA program, then a
  single weighted refit on the winning inlier set.
* Data-dependent inlier sets become fixed-shape weight vectors (mask-weighted
  normal equations), so the whole estimator jits with static shapes and can be
  vmapped again across streams.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ofps_tpu.core import quat
from ofps_tpu.core.camera import StandardCamera
from ofps_tpu.core.motion import SparseFlow
from ofps_tpu.estimators.base import EstimatorInstance, register
from ofps_tpu.ops.geometry_uv import (
    delta_planes,
    point_angle_planes,
    qconj,
    qident_like,
    qmat,
    qmul,
    solve3_planes,
)
from ofps_tpu.ops.robust import sample_indices, uniform_cap_weights

# lib.rs:17-18
EPS = 0.001 * math.pi / 180.0
ALPHA = 0.5
_LSQ_ITERS = math.ceil(15.0 / ALPHA)  # 30


class AlmeidaParams(NamedTuple):
    """Properties parity with lib.rs:80-98."""

    use_ransac: bool = True
    num_iters: int = 200
    inlier_angle_deg: float = 0.05
    ransac_samples: int = 1000


def motion_prototypes(camera: StandardCamera, pos: jnp.ndarray):
    """Unit-angle roll/pitch/yaw screen derivatives at each point.

    Matches MotionModel for StandardCamera (lib.rs:30-47), divided by EPS.
    Note the reference's axis quirk: "roll" rotates about +y, "pitch" about
    +x, "yaw" about -z (different camera axes than nalgebra RPY).
    """
    roll = camera.delta(pos, quat.to_matrix4(quat.from_euler(0.0, EPS, 0.0))) / EPS
    pitch = camera.delta(pos, quat.to_matrix4(quat.from_euler(EPS, 0.0, 0.0))) / EPS
    yaw = camera.delta(pos, quat.to_matrix4(quat.from_euler(0.0, 0.0, -EPS))) / EPS
    return roll, pitch, yaw


def _proto_mats():
    """The three constant EPS-rotation matrices as 9-tuples of scalars."""
    return tuple(
        tuple(m.reshape(9))
        for m in (
            quat.to_matrix3(quat.from_euler(0.0, EPS, 0.0)),
            quat.to_matrix3(quat.from_euler(EPS, 0.0, 0.0)),
            quat.to_matrix3(quat.from_euler(0.0, 0.0, -EPS)),
        )
    )


def _solve_ypr_planes(camera, px, py, mu, mv, w, reduce_axis):
    """Iterative LSQ rotation solve (lib.rs:123-200) on u/v planes.

    ``px, py, mu, mv, w`` are position/motion/weight planes; the point axis
    is ``reduce_axis`` and any remaining axes are batch (so minimal-sample
    fits run as (3, H) planes with H on the TPU lane axis — no vmap, no
    lane padding).  Returns a (w, x, y, z) plane tuple.
    """
    protos = []
    for m in _proto_mats():
        du, dv = delta_planes(camera, px, py, m)
        protos.append((du / EPS, dv / EPS))

    def wsum(x):
        return jnp.sum(w * x, axis=reduce_axis)

    # Weighted Gram matrix of the prototypes is loop-invariant.
    (p1u, p1v), (p2u, p2v), (p3u, p3v) = protos
    a = (
        wsum(p1u * p1u + p1v * p1v),
        wsum(p1u * p2u + p1v * p2v),
        wsum(p1u * p3u + p1v * p3v),
        wsum(p2u * p2u + p2v * p2v),
        wsum(p2u * p3u + p2v * p3v),
        wsum(p3u * p3u + p3v * p3v),
    )

    def body(i, rotation):
        alpha = 1.0 if i == _LSQ_ITERS - 1 else ALPHA
        du, dv = delta_planes(camera, px, py, qmat(rotation))
        vu = mu - du
        vv = mv - dv
        b = (
            wsum(p1u * vu + p1v * vv),
            wsum(p2u * vu + p2v * vv),
            wsum(p3u * vu + p3v * vv),
        )
        m1, m2, m3 = solve3_planes(a, b)
        m1, m2, m3 = m1 * alpha, m2 * alpha, m3 * alpha
        # Apply in YRP order (lib.rs:187-195): from_euler with two zero
        # angles collapses to single-axis half-angle quats.
        z = jnp.zeros_like(m1)
        roll = (jnp.cos(m1 * 0.5), z, jnp.sin(m1 * 0.5), z)
        pitch = (jnp.cos(m2 * 0.5), jnp.sin(m2 * 0.5), z, z)
        yaw = (jnp.cos(m3 * 0.5), z, z, -jnp.sin(m3 * 0.5))
        rot = qmul(pitch, qmul(roll, yaw))
        return qmul(rotation, rot)

    # UNROLLED (round 4): the loop body is a handful of tiny fusions on
    # (3, H)/(S,) planes, so the while-loop's per-iteration overhead was
    # most of the stage cost; a static 30-step unroll lets XLA fuse across
    # iterations (identical math — alpha's last-step switch is static).
    rotation = qident_like(a[0])
    for i in range(_LSQ_ITERS):
        rotation = body(i, rotation)
    # We estimated how points rotate, not how the camera rotates (lib.rs:199).
    return qconj(rotation)


def solve_ypr_weighted(
    camera: StandardCamera,
    pos: jnp.ndarray,
    motion: jnp.ndarray,
    weights: jnp.ndarray,
) -> jnp.ndarray:
    """Iterative LSQ rotation solve (lib.rs:123-200), arbitrary point weights.

    ``pos``/``motion``: (N, 2); ``weights``: (N,).  Returns a unit quaternion.
    """
    q = _solve_ypr_planes(
        camera,
        pos[..., 0],
        pos[..., 1],
        motion[..., 0],
        motion[..., 1],
        weights,
        reduce_axis=-1,
    )
    return jnp.stack(q, axis=-1)


# Sampling and eval-cap helpers live in ops.robust (shared with the
# epipolar estimators); re-exported here for backwards compatibility.


def solve_ypr_ransac(
    key,
    camera: StandardCamera,
    flow: SparseFlow,
    num_iters: int,
    inlier_angle_deg: float,
    num_samples: int,
    dense: bool = False,
) -> jnp.ndarray:
    """Batched RANSAC (lib.rs:202-251): all hypotheses evaluated in parallel.

    TPU twist on the reference's 1000-random-sample inlier check: every
    hypothesis is scored on a shared masked subset (the first
    ``num_samples`` valid-weighted points), NOT on per-hypothesis gathered
    subsets — H x S dynamic gathers lower to the scalar core and dominated
    the estimator; masked dense evaluation is pure VPU work.
    """
    pos, motion, mask = flow.pos, flow.motion, flow.mask
    n = pos.shape[0]
    num_samples = min(num_samples, n)
    # May be a traced scalar (runtime-mutable property).
    target = jnp.deg2rad(jnp.asarray(inlier_angle_deg, jnp.float32))
    k_fit, _ = jax.random.split(key)

    # Minimal 3-point fits as (3, H) planes: H rides the lane axis.
    # dense=True (serving's all-valid grid fields): the draws and the eval
    # subset below become compile-time constants with bit-identical
    # selections (ops.robust.dense_eval_indices) — the cumsum+searchsorted
    # binary searches otherwise serialize on the TPU scalar core.
    fit_idx = sample_indices(k_fit, mask, num_iters, 3, dense=dense)  # (H, 3)
    fpx = pos[fit_idx, 0].T  # (3, H)
    fpy = pos[fit_idx, 1].T
    fmu = motion[fit_idx, 0].T
    fmv = motion[fit_idx, 1].T
    fw = mask[fit_idx].T
    fits = _solve_ypr_planes(camera, fpx, fpy, fmu, fmv, fw, reduce_axis=0)
    # (w, x, y, z) planes, each (H,)

    # Shared eval subset, GATHERED once (not masked dense): per-hypothesis
    # evaluation tensors shrink from (H, N, 2) to (H, S, 2) — at the 1080p
    # grid (N=12600, S=1000) that is ~12x less HBM traffic for identical
    # scoring (the same subset, so the same counts and winner).
    n_eval = min(num_samples, n)
    if dense and n_eval < n:
        from ofps_tpu.ops.robust import dense_eval_indices

        eidx, w_e = dense_eval_indices(n, n_eval)
    else:
        ev_w = uniform_cap_weights(mask, num_samples)
        # Compact the subset to the front via searchsorted on its cumulative
        # count (same trick as robust_fit's eval_cap): identical subset to
        # the rank-sort top_k this replaces, at log(N) gathers instead of a
        # full (N,) sort.  Past-the-end queries clamp; weight zeroed.
        cw = jnp.cumsum((ev_w > 0.5).astype(jnp.int32))
        eidx = jnp.minimum(
            jnp.searchsorted(
                cw, jnp.arange(1, n_eval + 1, dtype=jnp.int32), side="left"
            ),
            n - 1,
        ).astype(jnp.int32)
        w_e = jnp.where(jnp.arange(n_eval) < cw[-1], ev_w[eidx], 0.0)
    pxe, pye = pos[eidx, 0], pos[eidx, 1]  # (S,)
    mue, mve = motion[eidx, 0], motion[eidx, 1]

    # Score all hypotheses at once on (H, S) planes: rotation components are
    # (H, 1) columns broadcast against the (S,) point planes.
    rinv = qmat(qconj(fits))
    rcols = tuple(c[:, None] for c in rinv)  # each (H, 1)
    du, dv = delta_planes(camera, pxe, pye, rcols)  # (H, S)
    vu = mue - du
    vv = mve - dv
    au, av = point_angle_planes(camera, pxe + du, pye + dv)
    err2 = (vu * jnp.cos(au)) ** 2 + (vv * jnp.cos(av)) ** 2
    inliers = (err2 <= target * target) & (w_e > 0.5)  # (H, S)
    counts = jnp.sum(inliers, axis=-1)
    best = jnp.argmax(counts)

    # Final refit on the winning inlier set (lib.rs:246-250).  The reference
    # refits on inliers drawn FROM the num_samples evaluation subset, so the
    # refit runs on the gathered (S,) planes directly — zero-weight points
    # outside the subset contribute exactly 0 to every weighted sum.
    best_w = inliers[best].astype(jnp.float32)  # (S,)
    refit = _solve_ypr_planes(
        camera, pxe, pye, mue, mve, best_w, reduce_axis=-1
    )
    refit = jnp.stack(refit, axis=-1)
    return jnp.where(counts[best] >= 3, refit, quat.identity())


@register("almeida")
def make_almeida(**kwargs) -> EstimatorInstance:
    params = AlmeidaParams(**kwargs)

    def estimate(
        state, flow: SparseFlow, camera: StandardCamera, key=None,
        move_magnitude=None,  # accepted, unused: almeida lib.rs:105
        props=None, dense=False,
    ):
        inlier_deg = (props or {}).get(
            "inlier_angle_deg", params.inlier_angle_deg
        )
        if params.use_ransac:
            if key is None:
                key = jax.random.PRNGKey(0)
            rot = solve_ypr_ransac(
                key,
                camera,
                flow,
                params.num_iters,
                inlier_deg,
                params.ransac_samples,
                dense=dense,
            )
        else:
            rot = solve_ypr_weighted(camera, flow.pos, flow.motion, flow.mask)
        return rot, jnp.zeros(3, dtype=jnp.float32), state

    return EstimatorInstance(
        name="almeida",
        params=params,
        init=lambda: (),
        estimate=estimate,
        dyn_defaults=lambda: {
            "inlier_angle_deg": jnp.float32(params.inlier_angle_deg)
        },
    )
