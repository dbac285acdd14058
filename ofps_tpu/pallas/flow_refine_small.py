"""Whole-image Pallas refine kernel for SMALL pyramid levels.

The blocked kernel in :mod:`ofps_tpu.pallas.flow_refine` earns its keep on
big images; at the coarse pyramid levels (<= ~80k pixels) its XLA-side prep
(pads, block means, scalar prefetch) costs more than the refine itself, and
the pure-XLA path pays per-op launch overhead for the wide coarse search
(169 candidates x ~12 ops each ~= a thousand tiny kernels, ~0.15 ms/frame
at 1080p's 33x60 + 67x120 levels).  This kernel does ONE launch per batch
element with the whole level resident in VMEM: triangle-tap warp, the full
SAD candidate sweep, two-phase argmin and subpixel parabola — the same math
as ``ops.flow_pyramid._level_refine`` (cost scaling aside, which argmin and
the parabola ratio are invariant to).

Approximation (same as the blocked kernel's block-mean residual clamp): the
warp residual is clamped to +-RES_SMALL pixels.  Coarse levels see
warm-start/upsampled flows of at most a few pixels, so the clamp is
inactive in practice; the wide integer search handles the rest.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ofps_tpu.ops.flow_pyramid import _TIE_EPS

RES_SMALL = 7  # max |warp residual| handled exactly (pixels)
_BIG = 1e10


def _tri(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def _small_kernel(
    i1_ref,
    i2_ref,
    u_ref,
    v_ref,
    ou_ref,
    ov_ref,
    *,
    h,
    w,
    hp,
    wp,
    r,
    s,
    guard=False,
    median=False,
):
    i1 = i1_ref[0].astype(jnp.float32)
    i2 = i2_ref[0].astype(jnp.float32)
    u = u_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    pad = RES_SMALL + r + s  # warp taps + halo the sweep needs
    # i2 extended by edge replication to (hp + 2*pad, wp + 2*pad) via
    # concat of clamped slices (Mosaic-friendly, static shapes).
    def extend(a, top, bottom, left, right):
        rows = [a[:1]] * top + [a] + [a[-1:]] * bottom
        a = jnp.concatenate(rows, axis=0) if (top or bottom) else a
        cols = [a[:, :1]] * left + [a] + [a[:, -1:]] * right
        return jnp.concatenate(cols, axis=1) if (left or right) else a

    ext = extend(i2, pad, pad, pad, pad)
    span = 2 * RES_SMALL + 1
    hs = r + s

    def warp(uf, vf):
        """Separable triangle-tap warp of ext by (uf, vf), +-RES_SMALL."""
        vv = jnp.clip(vf, -RES_SMALL, RES_SMALL) + RES_SMALL
        c = jnp.zeros((hp + 2 * hs, wp + 2 * pad), jnp.float32)
        vv_e = extend(vv, hs, hs, pad, pad)
        for i in range(span):
            sl = ext[i : i + hp + 2 * hs, :]
            c = c + _tri(vv_e - i) * sl
        uu_e = extend(
            jnp.clip(uf, -RES_SMALL, RES_SMALL) + RES_SMALL, hs, hs, hs, hs
        )
        warped = jnp.zeros((hp + 2 * hs, wp + 2 * hs), jnp.float32)
        for j in range(span):
            sl = c[:, j : j + wp + 2 * hs]
            warped = warped + _tri(uu_e - j) * sl
        return warped

    # Candidate sweep (same structure as the blocked kernel).
    ys = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    row_pen = {
        dy: jnp.where((ys + dy < 0) | (ys + dy > h - 1), _BIG, 0.0)
        for dy in range(-s, s + 1)
    }
    col_pen = {
        dx: jnp.where((xs + dx < 0) | (xs + dx > w - 1), _BIG, 0.0)
        for dx in range(-s, s + 1)
    }
    # Padding rows/cols (hp > h) must never win either.
    pad_pen = jnp.where((ys > h - 1) | (xs > w - 1), _BIG, 0.0)

    i1e = extend(i1, r, r, r, r)

    def tree_box(a, span_, axis, out_len):
        def sl(x, off, ln):
            return x[off : off + ln, :] if axis == 0 else x[:, off : off + ln]

        covered, acc = 1, a
        while covered * 2 <= span_:
            ln = acc.shape[axis] - covered
            acc = sl(acc, 0, ln) + sl(acc, covered, ln)
            covered *= 2
        if covered < span_:
            acc = sl(acc, 0, out_len) + sl(a, span_ - 1, out_len)
        return sl(acc, 0, out_len)

    side = 2 * s + 1

    def sweep(warped, uf, vf):
        """Full argmin + subpixel refine around init (uf, vf).

        Returns (ou, ov, best_c) — the refined flow and the winning
        aggregated SAD cost (for the warm-vs-zero guard selection).
        """
        rows = []
        for dy in range(-s, s + 1):
            clist = []
            for dx in range(-s, s + 1):
                wsh = warped[
                    hs + dy - r : hs + dy + hp + r,
                    hs + dx - r : hs + dx + wp + r,
                ]
                diff = jnp.abs(i1e - wsh)
                acc = tree_box(diff, 2 * r + 1, 0, hp)
                cost = tree_box(acc, 2 * r + 1, 1, wp)
                # Displacement prior (ops.flow_pyramid._TIE_EPS): resolves
                # the exact cost plateaus of edge-replicated borders toward
                # the smaller shift.  Box-SUM scale -> x win^2.
                tie = _TIE_EPS * (2 * r + 1) ** 2 * (abs(dx) + abs(dy))
                clist.append(cost + row_pen[dy] + col_pen[dx] + pad_pen + tie)
            rmin = clist[0]
            rbx = jnp.full((hp, wp), -s, jnp.int32)
            for k in range(1, side):
                take = clist[k] < rmin
                rmin = jnp.where(take, clist[k], rmin)
                rbx = jnp.where(take, k - s, rbx)
            rows.append((rmin, rbx, clist))

        best_c, bx, _ = rows[0]
        by = jnp.full((hp, wp), -s, jnp.int32)
        for k in range(1, side):
            rmin, rbx, _ = rows[k]
            take = rmin < best_c
            best_c = jnp.where(take, rmin, best_c)
            bx = jnp.where(take, rbx, bx)
            by = jnp.where(take, k - s, by)

        def select_at(ix, clist):
            val = clist[0]
            for k in range(1, side):
                val = jnp.where(ix == k - s, clist[k], val)
            return val

        bxm = jnp.maximum(bx - 1, -s)
        bxp = jnp.minimum(bx + 1, s)
        bym = jnp.maximum(by - 1, -s)
        byp = jnp.minimum(by + 1, s)
        row_at_bx = [select_at(bx, rows[k][2]) for k in range(side)]
        c0 = select_at(by, row_at_bx)
        cym = select_at(bym, row_at_bx)
        cyp = select_at(byp, row_at_bx)
        cxm = select_at(by, [select_at(bxm, rows[k][2]) for k in range(side)])
        cxp = select_at(by, [select_at(bxp, rows[k][2]) for k in range(side)])

        def parabola(cm, cc, cp, at_edge):
            denom = cm - 2.0 * cc + cp
            off = jnp.where(
                jnp.abs(denom) > 1e-12,
                0.5 * (cm - cp) / jnp.maximum(jnp.abs(denom), 1e-12)
                * jnp.sign(denom),
                0.0,
            )
            return jnp.where(at_edge, 0.0, jnp.clip(off, -0.5, 0.5))

        sub_x = parabola(cxm, c0, cxp, jnp.abs(bx) == s)
        sub_y = parabola(cym, c0, cyp, jnp.abs(by) == s)
        return (
            uf + bx.astype(jnp.float32) + sub_x,
            vf + by.astype(jnp.float32) + sub_y,
            best_c,
        )

    def median3x3_padded(plane):
        """3x3 median with 'nearest' edge semantics on the (hp, wp) plane.

        The pad region (rows >= h, cols >= w) holds init-flow values, not
        the refined edge values, so it is first overwritten with true edge
        replication (two selects) — then the exchange network over shifted
        slices is exactly ops.image.median3x3 on the real (h, w) region.
        """
        if hp > h:
            plane = jnp.where(ys > h - 1, plane[h - 1 : h, :], plane)
        if wp > w:
            plane = jnp.where(xs > w - 1, plane[:, w - 1 : w], plane)
        e = extend(plane, 1, 1, 1, 1)
        p = [
            e[dy : dy + hp, dx : dx + wp]
            for dy in range(3)
            for dx in range(3)
        ]

        def ex(i, j):
            a = jnp.minimum(p[i], p[j])
            b = jnp.maximum(p[i], p[j])
            p[i], p[j] = a, b

        # Median-of-9 exchange network (Smith, Graphics Gems) — the same
        # network as ops.image.median3x3.
        for i, j in (
            (1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2), (4, 5),
            (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4), (2, 5), (4, 7),
            (4, 2), (6, 4), (4, 2),
        ):
            ex(i, j)
        return p[4]

    ou, ov, best_c = sweep(warp(u, v), u, v)
    if guard:
        # Warm-start guard fused into the launch: refine from a ZERO init
        # too (its "warp" is just the unwarped plane — a slice of ext) and
        # keep the per-pixel winner by aggregated SAD, so the temporal
        # feedback loop cannot lock onto a runaway warm field (see
        # ops.flow_pyramid FlowParams.guarded_warm).  The separate
        # two-solve + warp + box-filter guard cost ~18% of the whole
        # 1080p dense-flow budget; in-kernel it reuses i1e/ext and adds
        # only a second VPU sweep on a level that is launch-bound anyway.
        warped0 = ext[
            pad - hs : pad + hp + hs, pad - hs : pad + wp + hs
        ]
        zero = jnp.zeros((hp, wp), jnp.float32)
        ou0, ov0, best_c0 = sweep(warped0, zero, zero)
        better = best_c <= best_c0  # prefer warm on ties (matches
        # ops.flow_pyramid._coarse_guard's `<=`)
        ou = jnp.where(better, ou, ou0)
        ov = jnp.where(better, ov, ov0)

    if median:
        # Inter-level median fused into the launch (FlowParams.median_levels)
        # — the standalone XLA passes on these tiny levels were launch-bound.
        ou = median3x3_padded(ou)
        ov = median3x3_padded(ov)

    ou_ref[0] = ou
    ov_ref[0] = ov


def flow_refine_small_uv(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    search: int,
    win: int,
    interpret: bool = False,
    guard_zero_init: bool = False,
    median_out: bool = False,
):
    """One-launch whole-image refine for small levels.

    ``i1``/``i2``/``u``/``v``: (..., H, W); returns updated f32 ``(u, v)``.
    ``guard_zero_init=True`` additionally refines from a zero init inside
    the same launch and keeps the per-pixel aggregated-SAD winner (the
    FlowParams.guarded_warm coarse-level guard, fused).
    ``median_out=True`` applies the inter-level 3x3 median
    (FlowParams.median_levels) to the refined flow inside the launch,
    matching ``ops.image.median3x3`` on the real (H, W) region exactly.
    """
    r = win // 2
    h, w = i1.shape[-2], i1.shape[-1]
    batch = i1.shape[:-2]
    hp = h + ((-h) % 8)
    wp = w + ((-w) % 128)

    def prep(x, dtype):
        pads = [(0, 0)] * (x.ndim - 2) + [(0, hp - h), (0, wp - w)]
        x = jnp.pad(x, pads, mode="edge") if (hp > h or wp > w) else x
        return x.astype(dtype).reshape((-1, hp, wp))

    i1p = prep(i1, jnp.bfloat16)
    i2p = prep(i2, jnp.bfloat16)
    us = prep(u, jnp.float32)
    vs = prep(v, jnp.float32)
    nb = i1p.shape[0]

    kernel = functools.partial(
        _small_kernel, h=h, w=w, hp=hp, wp=wp, r=r, s=search,
        guard=guard_zero_init, median=median_out,
    )
    spec = pl.BlockSpec((1, hp, wp), lambda b: (b, 0, 0))
    fn = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((nb, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((nb, hp, wp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    ou, ov = fn(i1p, i2p, us, vs)
    shape = batch + (h, w)
    return ou[:, :h, :w].reshape(shape), ov[:, :h, :w].reshape(shape)
