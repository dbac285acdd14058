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
from ofps_tpu.ops.robust import uniform_cap_weights
from ofps_tpu.ops.solve import solve3x3

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


def solve_ypr_weighted(
    camera: StandardCamera,
    pos: jnp.ndarray,
    motion: jnp.ndarray,
    weights: jnp.ndarray,
) -> jnp.ndarray:
    """Iterative LSQ rotation solve (lib.rs:123-200), arbitrary point weights.

    ``pos``/``motion``: (N, 2); ``weights``: (N,).  Returns a unit quaternion.
    """
    protos = motion_prototypes(camera, pos)  # each (N, 2), unit-angle scale
    p = jnp.stack(protos, axis=-2)  # (N, 3, 2)

    # Weighted Gram matrix of the prototypes is loop-invariant.
    a = jnp.einsum("nik,njk,n->ij", p, p, weights, precision="highest")

    def body(i, rotation):
        alpha = jnp.where(i == _LSQ_ITERS - 1, 1.0, ALPHA)
        rotm = quat.to_matrix4(rotation)
        delta = camera.delta(pos, rotm)
        v0 = motion - delta
        b = jnp.einsum("nik,nk,n->i", p, v0, weights, precision="highest")
        model = solve3x3(a, b) * alpha
        # Apply in YRP order (lib.rs:187-195).
        roll = quat.from_euler(0.0, model[0], 0.0)
        pitch = quat.from_euler(model[1], 0.0, 0.0)
        yaw = quat.from_euler(0.0, 0.0, -model[2])
        rot = quat.mul(pitch, quat.mul(roll, yaw))
        return quat.mul(rotation, rot)

    rotation = jax.lax.fori_loop(0, _LSQ_ITERS, body, quat.identity())
    # We estimated how points rotate, not how the camera rotates (lib.rs:199).
    return quat.inverse(rotation)


def _sample_indices(key, mask: jnp.ndarray, shape_rows: int, k: int):
    """Per-row sampling of k valid indices without replacement (Gumbel top-k)."""
    n = mask.shape[0]
    u = jax.random.uniform(key, (shape_rows, n))
    scores = u + (mask - 1.0) * 1e9  # invalid entries sink to the bottom
    _, idx = jax.lax.top_k(scores, k)
    return idx  # (shape_rows, k)


# uniform_cap_weights moved to ops.robust (shared with the epipolar
# estimators' eval_cap); re-exported here for backwards compatibility.


def solve_ypr_ransac(
    key,
    camera: StandardCamera,
    flow: SparseFlow,
    num_iters: int,
    inlier_angle_deg: float,
    num_samples: int,
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
    target = math.radians(inlier_angle_deg)
    k_fit, _ = jax.random.split(key)

    # Minimal 3-point fits, one per hypothesis (small gather: H x 3).
    fit_idx = _sample_indices(k_fit, mask, num_iters, 3)  # (H, 3)
    fit_pos = pos[fit_idx]  # (H, 3, 2)
    fit_mot = motion[fit_idx]
    fit_w = mask[fit_idx]

    fits = jax.vmap(lambda p_, m_, w_: solve_ypr_weighted(camera, p_, m_, w_))(
        fit_pos, fit_mot, fit_w
    )  # (H, 4)

    # Shared eval subset, GATHERED once (not masked dense): per-hypothesis
    # evaluation tensors shrink from (H, N, 2) to (H, S, 2) — at the 1080p
    # grid (N=12600, S=1000) that is ~12x less HBM traffic for identical
    # scoring (the same subset, so the same counts and winner).
    ev_w = uniform_cap_weights(mask, num_samples)
    n_eval = min(num_samples, n)
    rank = ev_w * 2.0 - jnp.arange(n, dtype=jnp.float32) / n
    _, eidx = jax.lax.top_k(rank, n_eval)
    pos_e, mot_e, w_e = pos[eidx], motion[eidx], ev_w[eidx]

    def eval_one(fit_q):
        mat = quat.to_matrix4(quat.inverse(fit_q))
        delta = camera.delta(pos_e, mat)
        sample_pt = pos_e + delta
        vec = mot_e - delta
        ang = camera.point_angle(sample_pt)
        cosang = jnp.cos(ang)
        err2 = jnp.sum((vec * cosang) ** 2, axis=-1)
        return (err2 <= target * target) & (w_e > 0.5)

    inliers = jax.vmap(eval_one)(fits)  # (H, S) bool
    counts = jnp.sum(inliers, axis=-1)
    best = jnp.argmax(counts)

    # Final refit on the winning inlier set (lib.rs:246-250), scattered
    # back to the full index space.
    best_w = jnp.zeros((n,), jnp.float32).at[eidx].set(
        inliers[best].astype(jnp.float32)
    )
    refit = solve_ypr_weighted(camera, pos, motion, best_w)
    return jnp.where(counts[best] >= 3, refit, quat.identity())


@register("almeida")
def make_almeida(**kwargs) -> EstimatorInstance:
    params = AlmeidaParams(**kwargs)

    def estimate(state, flow: SparseFlow, camera: StandardCamera, key=None):
        if params.use_ransac:
            if key is None:
                key = jax.random.PRNGKey(0)
            rot = solve_ypr_ransac(
                key,
                camera,
                flow,
                params.num_iters,
                params.inlier_angle_deg,
                params.ransac_samples,
            )
        else:
            rot = solve_ypr_weighted(camera, flow.pos, flow.motion, flow.mask)
        return rot, jnp.zeros(3, dtype=jnp.float32), state

    return EstimatorInstance(
        name="almeida", params=params, init=lambda: (), estimate=estimate
    )
