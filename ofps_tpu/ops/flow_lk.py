"""Robust dense pyramidal Lucas-Kanade optical flow (the "RLOF-class" path).

The reference cv-decoder exposes TWO dense-flow algorithms behind a
``use_rlof`` property: Farneback and RLOF (robust local optical flow)
(``/root/reference/cv-decoder/src/lib.rs:45,169-186``).  This module is the
second algorithm for the TPU rebuild: a gradient-based robust local
least-squares flow, complementing the SAD block matcher in
:mod:`ofps_tpu.ops.flow_pyramid`.

TPU-first shape: instead of OpenCV's sparse seed points + gathers +
edge-aware interpolation, the local LK system is solved densely at EVERY
pixel — structure tensor and mismatch vectors are box-filtered elementwise
maps (pure VPU work, no gathers), and the per-pixel 2x2 solve is closed
form.  Robustness (the R in RLOF) comes from Geman-McClure reweighting of
the residual inside the local sums, iterated per pyramid level.

Shares the pyramid/warp machinery and the FlowParams warm-start contract
with the block matcher, so the cv decoder can switch algorithms with one
property.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ofps_tpu.ops.flow_pyramid import _warp, effective_levels
from ofps_tpu.ops.image import box_filter, build_pyramid, resize_bilinear_matmul


class LKParams(NamedTuple):
    levels: int = 6
    win: int = 7  # local aggregation window (RLOF supportRegion analog)
    iters: int = 3  # LK iterations per pyramid level
    min_level_size: int = 16
    # Geman-McClure scale (gray levels): residuals >> sigma lose influence.
    sigma: float = 12.0
    max_step: float = 1.0  # per-iteration displacement clamp (px)
    eps: float = 1e-4  # structure-tensor regularizer
    # Warm-start guard: race the coarsest level's warm init against a zero
    # init and keep the per-pixel SAD winner (see dense_flow_lk).
    guarded_warm: bool = True


def _gradients(img: jnp.ndarray):
    """Central-difference gradients with edge replication."""
    right = jnp.concatenate([img[..., :, 1:], img[..., :, -1:]], axis=-1)
    left = jnp.concatenate([img[..., :, :1], img[..., :, :-1]], axis=-1)
    down = jnp.concatenate([img[..., 1:, :], img[..., -1:, :]], axis=-2)
    up = jnp.concatenate([img[..., :1, :], img[..., :-1, :]], axis=-2)
    return 0.5 * (right - left), 0.5 * (down - up)


def _lk_level(i1, i2, u, v, p: LKParams, allow_pallas: bool):
    """``p.iters`` robust LK updates of (u, v) at one pyramid level."""
    sig2 = p.sigma * p.sigma
    for _ in range(p.iters):
        warped = _warp(i2, jnp.stack([u, v], axis=-1), allow_pallas)
        ix, iy = _gradients(warped)
        it = warped - i1
        # Geman-McClure influence: w = sigma^2 / (sigma^2 + r^2).
        rw = sig2 / (sig2 + it * it)
        gxx = box_filter(ix * ix * rw, p.win)
        gxy = box_filter(ix * iy * rw, p.win)
        gyy = box_filter(iy * iy * rw, p.win)
        bx = box_filter(ix * it * rw, p.win)
        by = box_filter(iy * it * rw, p.win)
        tr = gxx + gyy
        det = gxx * gyy - gxy * gxy + p.eps * tr * tr + 1e-20
        du = -(gyy * bx - gxy * by) / det
        dv = -(gxx * by - gxy * bx) / det
        du = jnp.clip(du, -p.max_step, p.max_step)
        dv = jnp.clip(dv, -p.max_step, p.max_step)
        u = u + du
        v = v + dv
    return u, v


def dense_flow_lk(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    params: LKParams = LKParams(),
    init_flow: Optional[jnp.ndarray] = None,
):
    """Dense robust-LK flow i1 -> i2 in pixel units.

    Same contract as :func:`ofps_tpu.ops.flow_pyramid.dense_flow`:
    (..., H, W) float32 in, (..., H, W, 2) float32 out, optional full-res
    ``init_flow`` warm start.
    """
    # Reuse the block matcher's pyramid-depth rule.
    class _Shim(NamedTuple):
        levels: int
        min_level_size: int

    levels = effective_levels(
        _Shim(params.levels, params.min_level_size),
        i1.shape[-2],
        i1.shape[-1],
    )
    pyr1 = build_pyramid(i1, levels)
    pyr2 = build_pyramid(i2, levels)
    allow_pallas = jax.default_backend() == "tpu"

    u = v = None
    if init_flow is not None:
        h, w = pyr1[-1].shape[-2], pyr1[-1].shape[-1]
        scale = h / i1.shape[-2]
        u = resize_bilinear_matmul(init_flow[..., 0], h, w) * scale
        v = resize_bilinear_matmul(init_flow[..., 1], h, w) * scale

    for lvl in range(levels - 1, -1, -1):
        a, b = pyr1[lvl], pyr2[lvl]
        h, w = a.shape[-2], a.shape[-1]
        if u is None:
            u = jnp.zeros(a.shape, jnp.float32)
            v = jnp.zeros(a.shape, jnp.float32)
        elif u.shape[-2] != h or u.shape[-1] != w:
            u = resize_bilinear_matmul(u, h, w) * 2.0
            v = resize_bilinear_matmul(v, h, w) * 2.0
        if lvl == levels - 1 and init_flow is not None and params.guarded_warm:
            # Warm-start guard (same rationale as the block matcher's
            # _coarse_guard): LK is a LOCAL linearization, so a warm init
            # wrong by more than the aggregation window converges to the
            # wrong minimum and the error feeds back frame over frame
            # (measured on the eval clips: warm-carried plain-almeida error
            # 0.155 deg vs 0.013 cold on the always-moving clip).  Solve the
            # coarsest level from BOTH inits and keep the per-pixel winner
            # by aggregated warp residual, so the cold solution always
            # competes and the feedback loop cannot lock in.
            u_w, v_w = _lk_level(a, b, u, v, params, allow_pallas)
            u_0, v_0 = _lk_level(
                a, b, jnp.zeros_like(u), jnp.zeros_like(v), params,
                allow_pallas,
            )

            def sad(uu, vv):
                warped = _warp(b, jnp.stack([uu, vv], axis=-1), allow_pallas)
                return box_filter(jnp.abs(a - warped), params.win)

            better = sad(u_w, v_w) <= sad(u_0, v_0)
            u = jnp.where(better, u_w, u_0)
            v = jnp.where(better, v_w, v_0)
        else:
            u, v = _lk_level(a, b, u, v, params, allow_pallas)

    return jnp.stack([u, v], axis=-1)
