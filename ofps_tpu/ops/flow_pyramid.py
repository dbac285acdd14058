"""Dense optical flow: coarse-to-fine pyramid block matching.

The on-device replacement for the reference cv-decoder's OpenCV
Farneback/RLOF dense flow (``/root/reference/cv-decoder/src/lib.rs:156-237``)
— the BASELINE.json north-star kernel ("coarse-to-fine per-pixel block
matching over image pyramids").

TPU-first design: at each pyramid level, a cost volume over all
(2R+1)^2 integer displacement candidates is built from *statically shifted*
images (pure VPU work, fuses into one XLA program), box-filtered for local
aggregation, reduced by argmin, and refined to subpixel precision with a
1-D parabola fit per axis.  Large motions come from the pyramid, not the
search radius, so every level is gather-free except the single bilinear warp
that applies the upsampled parent flow.

Everything batches over leading dims and jits with static shapes.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ofps_tpu.ops.image import (
    box_filter,
    build_pyramid,
    shift2d,
    upsample2_flow,
    warp_bilinear,
)

_BIG = 1e10


def _warp(img: jnp.ndarray, flow: jnp.ndarray, allow_pallas: bool = True) -> jnp.ndarray:
    """Backend-dispatching warp: Pallas kernel on TPU, XLA gather elsewhere.

    Pads to the Pallas block grid (edge mode) and slices back.
    ``allow_pallas=False`` forces the XLA gather (required under a spatially
    sharded mesh — Pallas kernels don't partition over the width axis).
    """
    bh, bw = 32, 128
    h, w = img.shape[-2], img.shape[-1]
    if (
        not allow_pallas
        or jax.default_backend() != "tpu"
        or h + ((-h) % bh) < bh + 24
    ):
        return warp_bilinear(img, flow)
    from ofps_tpu.pallas.warp import warp_bilinear_tpu

    ph = (-h) % bh
    pw = (-w) % bw
    if ph or pw:
        pad_img = [(0, 0)] * (img.ndim - 2) + [(0, ph), (0, pw)]
        pad_flow = [(0, 0)] * (flow.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
        img = jnp.pad(img, pad_img, mode="edge")
        flow = jnp.pad(flow, pad_flow, mode="edge")
    out = warp_bilinear_tpu(img, flow, bh=bh, bw=bw)
    return out[..., :h, :w]


class FlowParams(NamedTuple):
    # 6 levels at 1080p puts the wide coarse search on a 33x60 image (half
    # the cost of 5-level 67x120) and doubles the large-motion range.
    levels: int = 6
    # Mid-level search radius: 1 (9 candidates) measures within noise of 2
    # (25 candidates) on the shift/rotation suites — the pyramid, not the
    # radius, carries large motions — at ~2.8x less candidate work.
    search: int = 1
    win: int = 5  # aggregation window (cv-decoder winsize, lib.rs:160)
    coarse_search: int = 6  # wider search at the coarsest level (large motion)
    min_level_size: int = 16  # clamp pyramid depth so levels stay meaningful
    fine_search: int = 1  # radius at the finest level (parent residual < 1px)
    cost_dtype: Any = jnp.bfloat16  # |diff| operand dtype (HBM halving);
    # SAD aggregation always accumulates f32 (argmin-stability)
    # Fused Pallas kernel path: None = auto (TPU backend only).  Must be
    # False when the step runs under a spatially-sharded ('space') mesh —
    # pallas_call has no SPMD partitioning rule for the width axis, so only
    # the XLA path shards; StreamPipeline sets this automatically.
    fused: Optional[bool] = None
    # Smallest pyramid level (pixels) handled by the fused Pallas kernel;
    # below this the per-block grid overhead beats the XLA path's HBM cost.
    fuse_min_pixels: int = 30_000
    # Output dtype of the FUSED path's finest level.  bf16 halves the
    # dominant HBM write (17.7 MB/frame of f32 u+v at 1080p); quantization
    # at |flow|<8 px is <0.03 px — an order below the block matcher's own
    # ~0.1 px subpixel accuracy.  The packed dense_flow() API casts back to
    # f32; dense_flow_warm() hands the bf16 planes straight to consumers.
    flow_dtype: Any = jnp.bfloat16
    # Fused-path fast selection for warm-started search=1 levels: 5-cost
    # axis-separable refinement instead of the 9-cost 2-D argmin (~25%
    # whole-pipeline speedup; subpixel accuracy on diagonal residuals is
    # gated by tests against the full path).
    axis_sep: bool = True


def effective_levels(params: FlowParams, h: int, w: int) -> int:
    levels = 1
    size = min(h, w)
    while levels < params.levels and size // 2 >= params.min_level_size:
        size //= 2
        levels += 1
    return levels


def _level_refine(i1, warped, search: int, win: int, cost_dtype=jnp.bfloat16):
    """Residual displacement for one level: cost sweep + argmin + subpixel.

    Bandwidth-lean formulation: the (2R+1)^2 candidate costs are *never
    stacked into an (..., S) volume*.  Pass A keeps a running (min cost,
    argmin) pair across the unrolled candidate sweep; pass B re-selects the
    five parabola neighbors by indicator accumulation over the same sweep.
    XLA CSEs the candidate costs between passes, so the volume lives as S
    small per-candidate buffers (bf16 by default) instead of a stacked f32
    volume read 6+ times — this alone took the 1080p kernel from 115 to
    several hundred fps/chip.
    """
    shifts = [(dx, dy) for dy in range(-search, search + 1)
              for dx in range(-search, search + 1)]
    h, w = i1.shape[-2], i1.shape[-1]
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    def cand_cost(dx, dy):
        # The pixel SUBTRACT stays f32 (bf16 operands at ~2^7 magnitude
        # quantize to ±0.5 gray levels — fatal on low-contrast scenes); the
        # small |diff| values may round to cost_dtype (bf16: ~0.4% relative),
        # and the 25-tap SAD aggregation always accumulates in f32 so sums
        # of ~6e3 magnitude can't flip argmin between near-tied candidates.
        diff = jnp.abs(i1 - shift2d(warped, dx, dy, fill=0.0))
        c = box_filter(diff.astype(cost_dtype).astype(jnp.float32), win)
        # Penalize out-of-image samples so borders prefer small shifts.
        oob = (
            (xs + dx < 0) | (xs + dx > w - 1) | (ys + dy < 0) | (ys + dy > h - 1)
        )
        return jnp.where(oob, _BIG, c)

    # Two-phase selection (same structure as the Pallas kernel): per-dy row
    # (min, argmin) first, then a reduction across rows, then parabola
    # neighbors re-selected from the per-row candidate lists.  The previous
    # flat indicator sweep issued 5 selects per candidate (845 ops at
    # search=6) — pure launch overhead at the small coarse levels.
    side = 2 * search + 1

    def select_at(ix, clist):
        val = clist[0]
        for k in range(1, side):
            val = jnp.where(ix == k - search, clist[k], val)
        return val

    rows = []
    for dy in range(-search, search + 1):
        clist = [cand_cost(dx, dy) for dx in range(-search, search + 1)]
        rmin = clist[0]
        rbx = jnp.full(clist[0].shape, -search, jnp.int32)
        for k in range(1, side):
            take = clist[k] < rmin
            rmin = jnp.where(take, clist[k], rmin)
            rbx = jnp.where(take, k - search, rbx)
        rows.append((rmin, rbx, clist))

    best_c, bx, _ = rows[0]
    by = jnp.full(best_c.shape, -search, jnp.int32)
    for k in range(1, side):
        rmin, rbx, _ = rows[k]
        take = rmin < best_c
        best_c = jnp.where(take, rmin, best_c)
        bx = jnp.where(take, rbx, bx)
        by = jnp.where(take, k - search, by)

    bxm = jnp.maximum(bx - 1, -search)
    bxp = jnp.minimum(bx + 1, search)
    bym = jnp.maximum(by - 1, -search)
    byp = jnp.minimum(by + 1, search)

    row_at_bx = [select_at(bx, rows[k][2]) for k in range(side)]
    c0 = select_at(by, row_at_bx)
    cym = select_at(bym, row_at_bx)
    cyp = select_at(byp, row_at_bx)
    cxm = select_at(by, [select_at(bxm, rows[k][2]) for k in range(side)])
    cxp = select_at(by, [select_at(bxp, rows[k][2]) for k in range(side)])

    def parabola(cm, cc, cp, at_edge):
        denom = cm - 2.0 * cc + cp
        off = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (cm - cp) / jnp.maximum(jnp.abs(denom), 1e-12) * jnp.sign(denom), 0.0)
        off = jnp.clip(off, -0.5, 0.5)
        return jnp.where(at_edge, 0.0, off)

    sub_x = parabola(cxm, c0, cxp, jnp.abs(bx) == search)
    sub_y = parabola(cym, c0, cyp, jnp.abs(by) == search)

    return jnp.stack(
        [bx.astype(jnp.float32) + sub_x, by.astype(jnp.float32) + sub_y], axis=-1
    )


def _dense_flow_impl(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    params: FlowParams,
    init_uv=None,
):
    """Shared pyramid loop: returns (u, v, warm) with warm the level-1 flow.

    ``init_uv``: optional (u, v) warm-start pair at ANY resolution (it is
    resized to the coarsest level); bf16 accepted.  ``warm`` is the refined
    half-resolution flow — carrying it between frames gives the
    OPTFLOW_USE_INITIAL_FLOW warm start without a full-resolution
    read-back (the coarsest level can't see fine detail anyway).
    """
    levels = effective_levels(params, i1.shape[-2], i1.shape[-1])
    pyr1 = build_pyramid(i1, levels)
    pyr2 = build_pyramid(i2, levels)
    on_tpu = (
        params.fused
        if params.fused is not None
        else jax.default_backend() == "tpu"
    )

    def level_search(lvl):
        if lvl == levels - 1:
            return params.coarse_search
        if lvl == 0 and levels > 1:
            return params.fine_search
        return params.search

    warm_out = None
    if on_tpu:
        # Fused-kernel path: flow carried as split (u, v) components — the
        # trailing-dim-2 layout forces relayouts between pallas calls — and
        # in bfloat16 between pyramid levels (halves the carry DMA bytes;
        # at |flow| < 64 px the bf16 step is < 0.4% of a pixel, far below
        # the ~0.1 px subpixel precision).  The finest level emits f32.
        from ofps_tpu.ops.image import resize_bilinear_matmul
        from ofps_tpu.pallas.flow_refine import flow_refine_uv

        u = v = None
        if init_uv is not None:
            u0, v0 = init_uv
            h, w = pyr1[-1].shape[-2], pyr1[-1].shape[-1]
            scale = h / u0.shape[-2]
            u = resize_bilinear_matmul(u0.astype(jnp.float32), h, w) * scale
            v = resize_bilinear_matmul(v0.astype(jnp.float32), h, w) * scale

        for lvl in range(levels - 1, -1, -1):
            a, b = pyr1[lvl], pyr2[lvl]
            h, w = a.shape[-2], a.shape[-1]
            search = level_search(lvl)
            fused = h * w >= params.fuse_min_pixels
            if u is None:
                shp = a.shape[:-2] + (
                    ((h + 1) // 2, (w + 1) // 2) if fused else (h, w)
                )
                u = jnp.zeros(shp, jnp.float32)
                v = jnp.zeros(shp, jnp.float32)
            coarse = u.shape[-2] != h or u.shape[-1] != w
            out_dtype = jnp.bfloat16 if lvl > 0 else params.flow_dtype
            if fused:
                # Coarse flow feeds the kernel directly: the 2x upsample
                # happens in VMEM (no standalone upsample pass).
                u, v = flow_refine_uv(
                    a, b, u, v, search, params.win, coarse_flow=coarse,
                    out_dtype=out_dtype, axis_sep=params.axis_sep,
                )
            else:
                if coarse:
                    u = resize_bilinear_matmul(u.astype(jnp.float32), h, w) * 2.0
                    v = resize_bilinear_matmul(v.astype(jnp.float32), h, w) * 2.0
                # Small levels: one whole-image-in-VMEM kernel launch beats
                # the ~10^3 tiny XLA ops of the wide coarse search.
                from ofps_tpu.pallas.flow_refine_small import (
                    flow_refine_small_uv,
                )

                u, v = flow_refine_small_uv(
                    a, b, u.astype(jnp.float32), v.astype(jnp.float32),
                    search, params.win,
                )
            if lvl == 1 or levels == 1:
                warm_out = (u, v)
        return u, v, warm_out

    flow = None
    if init_uv is not None:
        # Downsample the warm-start flow to the coarsest level.
        u0, v0 = init_uv
        h, w = pyr1[-1].shape[-2], pyr1[-1].shape[-1]
        scale = h / u0.shape[-2]
        init_flow = jnp.stack(
            [u0.astype(jnp.float32), v0.astype(jnp.float32)], axis=-1
        )
        flow = (
            jax.image.resize(
                init_flow, init_flow.shape[:-3] + (h, w, 2), method="bilinear"
            )
            * scale
        )

    for lvl in range(levels - 1, -1, -1):
        a, b = pyr1[lvl], pyr2[lvl]
        h, w = a.shape[-2], a.shape[-1]
        search = level_search(lvl)
        if flow is None:
            flow = jnp.zeros(a.shape + (2,), jnp.float32)
        elif flow.shape[-3] != h or flow.shape[-2] != w:
            flow = upsample2_flow(flow, h, w)
        warped = _warp(b, flow, allow_pallas=on_tpu)
        flow = flow + _level_refine(a, warped, search, params.win, params.cost_dtype)
        if lvl == 1 or levels == 1:
            warm_out = (flow[..., 0], flow[..., 1])

    return flow[..., 0], flow[..., 1], warm_out


def dense_flow(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    params: FlowParams = FlowParams(),
    init_flow: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dense flow i1 -> i2 in pixel units, packed layout.

    ``i1``/``i2``: (..., H, W) float32 grayscale.  Returns (..., H, W, 2).
    ``init_flow`` enables the warm start the reference gets from
    OPTFLOW_USE_INITIAL_FLOW (cv-decoder lib.rs:162-166).
    """
    init_uv = None
    if init_flow is not None:
        init_uv = (init_flow[..., 0], init_flow[..., 1])
    u, v, _ = _dense_flow_impl(i1, i2, params, init_uv)
    return jnp.stack(
        [u.astype(jnp.float32), v.astype(jnp.float32)], axis=-1
    )


def dense_flow_warm(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    params: FlowParams = FlowParams(),
    warm=None,
):
    """Streaming-oriented dense flow with a cheap warm-start carry.

    Returns ``((u, v), warm_next)``: full-resolution split flow components
    plus the refined half-resolution flow to pass as ``warm`` on the next
    frame.  The split/bf16 carry avoids the full-res packed-layout
    round-trips of ``dense_flow(init_flow=...)`` (the trailing-dim-2 stack
    and the full-res re-read cost ~0.3 ms/frame at 1080p).
    """
    u, v, warm_next = _dense_flow_impl(i1, i2, params, warm)
    return (u, v), warm_next


def flow_to_normalized(flow: jnp.ndarray) -> jnp.ndarray:
    """Pixel-unit flow -> [0,1]-normalized units (decoder.rs convention)."""
    h, w = flow.shape[-3], flow.shape[-2]
    return flow / jnp.asarray([w, h], dtype=flow.dtype)
