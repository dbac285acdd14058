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

from typing import Any, NamedTuple, Optional, Tuple

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
# Per-pixel-of-shift displacement prior, in box-MEAN cost units (the Pallas
# kernels carry the same prior scaled by win^2 — their costs are box sums).
_TIE_EPS = 1e-3


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
    # Border handling: block matching has no valid correspondence in the
    # band where content leaves/enters the frame, producing a ~4% gross-
    # outlier tail (tens of px) hugging the frame edge that poisons the
    # non-robust consumers (plain-LSQ almeida).  The band's interior-nearest
    # flow replaces it ("replicate"); None = auto margin from the coarse
    # level's matching footprint, 0 disables.
    border_margin: Optional[int] = None
    # Median-filter the flow between pyramid levels (the standard block-
    # matching post-filter; OpenCV's pyramidal matchers do the same):
    # isolated wide-search mismatches at the coarse levels otherwise
    # propagate down as gross outliers the +-1px fine refines cannot
    # recover.  Applied at levels >= 2 (the finer refines are +-1px and
    # cannot create new gross outliers), so the cost rides the cheap
    # quarter-resolution-and-below levels.
    median_levels: bool = True
    # Warm-start guard: solve the coarsest level from BOTH the warm init
    # and a zero init and keep the per-pixel SAD winner, so the temporal
    # feedback loop cannot lock onto a runaway warm field (see
    # _coarse_guard).  Costs one extra coarse solve + two tiny SADs; False
    # disables (perf bisection / cold-start-only embedders).
    guarded_warm: bool = True
    # Run the fused Pallas kernels in INTERPRET mode (pallas_call
    # interpret=True).  Testing-only: with ``fused=True`` this executes the
    # REAL kernel path on the CPU mesh — e.g. inside a spatially-sharded
    # shard_map (tests/test_spatial_shard.py), the composition a single
    # real chip cannot exercise.  Never set on the TPU serving path.
    interpret: bool = False


def auto_margin(params: FlowParams, levels: int, h: int, w: int) -> int:
    """Edge-band width to replicate over: the coarse level's matching
    footprint (half window + 1) upsampled to full resolution, capped at an
    eighth of the frame."""
    if params.border_margin is not None:
        m = params.border_margin
    else:
        m = (params.win // 2 + 1) * 2 ** max(levels - 2, 0)
    return max(0, min(m, (h - 1) // 8, (w - 1) // 8))


def border_margin_px(params: FlowParams, h: int, w: int) -> int:
    """Public helper: the invalid edge-band width (px) of a (h, w) flow.

    Consumers of the raw ``dense_flow_warm`` planes must neutralize this
    band themselves — cheapest at grid resolution
    (:func:`ofps_tpu.core.motion.grid_downsample_uv` ``border_px=``), which
    costs nothing at full resolution; ``dense_flow`` instead folds a
    full-resolution replicate into its output cast.
    """
    return auto_margin(params, effective_levels(params, h, w), h, w)


def _replicate_border_uv(u, v, m: int):
    """Overwrite the outer ``m``-pixel band with the nearest interior value."""
    if m <= 0:
        return u, v
    pad = [(0, 0)] * (u.ndim - 2) + [(m, m), (m, m)]

    def fix(x):
        return jnp.pad(x[..., m:-m, m:-m], pad, mode="edge")

    return fix(u), fix(v)


def effective_levels(params: FlowParams, h: int, w: int) -> int:
    levels = 1
    size = min(h, w)
    while levels < params.levels and size // 2 >= params.min_level_size:
        size //= 2
        levels += 1
    return levels


class FrameCache(NamedTuple):
    """Precomputed per-frame planes, reusable when the frame becomes the
    PREVIOUS frame of the next flow step.

    In a streaming pipeline frame t's ``i1`` is frame t-1's ``i2``: the
    pyramid and the fused kernel's padded bf16 planes of a frame are pure
    functions of that frame, so carrying them across steps makes the whole
    i1 side of :func:`dense_flow_warm` free — at 1080p that is a full
    pyramid build plus one padded-plane HBM pass per fused level
    (~40% of the level-0 kernel's wall time was these XLA pre-passes +
    DMA; see the stage=0 bisection in scripts/perf_lab.py).

    ``pyr``: f32 pyramid, finest first (``pyr[0]`` IS the frame).
    ``pads``: bf16 :func:`ofps_tpu.pallas.flow_refine.pad_image_kernel_layout`
    planes for the fused inter-levels (fine-to-coarse order; empty on
    XLA-path backends).
    """

    pyr: Tuple[jnp.ndarray, ...]
    pads: Tuple[jnp.ndarray, ...]


def _cached_pad_levels(params: FlowParams, h: int, w: int):
    """Static list of pyramid levels whose padded plane is carried.

    Fused levels only, excluding the coarsest (its ``coarse_flow`` mode —
    and hence its block shape — depends on whether a warm start is given,
    so it pads internally; at 1080p it is served by the small whole-image
    kernel anyway).
    """
    levels = effective_levels(params, h, w)
    out = []
    hh, ww = h, w
    for lvl in range(levels):
        if hh * ww >= params.fuse_min_pixels and lvl != levels - 1:
            out.append(lvl)
        hh, ww = hh // 2, ww // 2
    return out


def frame_cache(img: jnp.ndarray, params: FlowParams = FlowParams()) -> FrameCache:
    """Build the :class:`FrameCache` of a frame (see there).

    ``img``: (..., H, W) float32 grayscale.  The fused-level padded planes
    are built only when the fused Pallas path would run (TPU backend or
    ``params.fused=True``).
    """
    h, w = img.shape[-2], img.shape[-1]
    levels = effective_levels(params, h, w)
    pyr = build_pyramid(img, levels)
    on_tpu = (
        params.fused
        if params.fused is not None
        else jax.default_backend() == "tpu"
    )
    pads = ()
    if on_tpu:
        from ofps_tpu.pallas.flow_refine import (
            pad_image_kernel_layout,
            pick_blocks,
        )

        pads = tuple(
            pad_image_kernel_layout(
                pyr[lvl], *pick_blocks(*pyr[lvl].shape[-2:], coarse_flow=True)
            )
            for lvl in _cached_pad_levels(params, h, w)
        )
    return FrameCache(pyr=tuple(pyr), pads=pads)


def _level_refine(
    i1, warped, search: int, win: int, cost_dtype=jnp.bfloat16,
    axis_sep: bool = False,
):
    """Residual displacement for one level: cost sweep + argmin + subpixel.

    ``axis_sep=True`` (requires ``search == 1``) evaluates only the 5-cost
    cross and refines each axis independently — the SAME selection the fused
    Pallas kernel runs on warm-started levels (pallas/flow_refine.py
    ``axis_refine``), so the XLA path (CPU tests, spatially-sharded meshes)
    and the single-chip kernel path compute one algorithm and stay within
    bf16-carry noise of each other (gated by
    tests/test_flow.py::test_xla_axis_sep_matches_kernel_math and the
    fused-vs-XLA pipeline parity test).

    Bandwidth-lean formulation: the (2R+1)^2 candidate costs are *never
    stacked into an (..., S) volume*.  Pass A carries a running (min cost,
    flat argmin) pair across a `lax.fori_loop` candidate sweep; pass B
    re-selects the five parabola neighbors by indicator accumulation over a
    second sweep.  The loop matters for COMPILE time, not run time: the
    previous Python-unrolled sweep emitted ~70 ops per candidate (20k-line
    HLO at search=6), which LLVM on XLA:CPU chewed for 13 *minutes*; the
    rolled form compiles in seconds and computes the identical argmin
    (same scan order, same strict-< tie-breaking).  This path only serves
    backends without the fused Pallas kernel (CPU tests, spatially-sharded
    meshes); the TPU hot path is pallas/flow_refine.py.
    """
    side = 2 * search + 1
    n_cand = side * side
    h, w = i1.shape[-2], i1.shape[-1]
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    pads = [(0, 0)] * (warped.ndim - 2) + [(search, search), (search, search)]
    # EDGE padding, not zeros: with zero fill, candidates whose window taps
    # cross the border compare i1 against 0 (~full-scale diff), an
    # asymmetric bias that locks border pixels onto large inward shifts at
    # the wide coarse level (observed: 6.6% gross outliers up to
    # coarse_search * 2^(levels-1) px hugging the frame edge).  The Pallas
    # kernels edge-extend i2 for exactly this reason; the center-pixel OOB
    # penalty below is what keeps borders preferring small shifts.
    wpad = jnp.pad(warped, pads, mode="edge")

    def cand_cost(s):
        # Flat candidate index s -> (dx, dy), row-major with dy outer (the
        # same order as the Pallas kernel's sweep).
        dy = s // side - search
        dx = s % side - search
        # out[..., y, x] = warped[..., y + dy, x + dx] (zero fill), as a
        # dynamic slice of the padded plane so the loop body is shift-free.
        start = (0,) * (warped.ndim - 2) + (search + dy, search + dx)
        shifted = jax.lax.dynamic_slice(wpad, start, warped.shape)
        # The pixel SUBTRACT stays f32 (bf16 operands at ~2^7 magnitude
        # quantize to ±0.5 gray levels — fatal on low-contrast scenes); the
        # small |diff| values may round to cost_dtype (bf16: ~0.4% relative),
        # and the 25-tap SAD aggregation always accumulates in f32 so sums
        # of ~6e3 magnitude can't flip argmin between near-tied candidates.
        diff = jnp.abs(i1 - shifted)
        c = box_filter(diff.astype(cost_dtype).astype(jnp.float32), win)
        # Penalize out-of-image samples so borders prefer small shifts.
        oob = (
            (xs + dx < 0) | (xs + dx > w - 1) | (ys + dy < 0) | (ys + dy > h - 1)
        )
        # Tiny displacement prior (same in the Pallas kernels): edge-
        # replicated content makes candidate costs EXACTLY tie on border
        # plateaus, and strict-< tie-breaking would drift toward the first-
        # scanned (most negative) shift; 1e-3/px is far below any genuine
        # cost gap and resolves every plateau toward the smaller shift.
        tie = _TIE_EPS * (jnp.abs(dx) + jnp.abs(dy)).astype(jnp.float32)
        return jnp.where(oob, _BIG, c + tie)

    if axis_sep:
        # 5-cost cross, per-axis selection — kernel-exact math (the flat
        # indices of the cross in the row-major dy-outer order at side=3).
        assert search == 1, "axis_sep is a search=1 fast path"
        cym, cxm, c00, cxp, cyp = (cand_cost(s) for s in (1, 3, 4, 5, 7))

        def axis_refine(cm, cc, cp):
            bi = jnp.where(
                cm < cc,
                jnp.where(cm <= cp, -1, 1),
                jnp.where(cp < cc, 1, 0),
            )
            denom = cm - 2.0 * cc + cp
            off = jnp.where(
                jnp.abs(denom) > 1e-12,
                0.5 * (cm - cp) / jnp.maximum(jnp.abs(denom), 1e-12)
                * jnp.sign(denom),
                0.0,
            )
            off = jnp.clip(off, -0.5, 0.5)
            # Parabola only at the interior minimum; boundary winners move
            # the full integer step (same edge rule as the 2-D path).
            return bi.astype(jnp.float32) + jnp.where(bi == 0, off, 0.0)

        return jnp.stack(
            [axis_refine(cxm, c00, cxp), axis_refine(cym, c00, cyp)], axis=-1
        )

    best_c = cand_cost(0)
    # Derive from best_c (not a fresh constant) so the carry keeps best_c's
    # varying manual axes under shard_map (scan-vma typing rule).
    best_s = (best_c * 0).astype(jnp.int32)

    def pass_a(s, carry):
        bc, bs = carry
        c = cand_cost(s)
        take = c < bc
        return jnp.where(take, c, bc), jnp.where(take, s, bs)

    best_c, best_s = jax.lax.fori_loop(1, n_cand, pass_a, (best_c, best_s))
    bx = best_s % side - search
    by = best_s // side - search

    # Flat indices of the clamped parabola neighbors (edge -> center, same
    # as the previous clamped selects; parabola() zeroes edge offsets).
    sxm = best_s - jnp.where(bx > -search, 1, 0)
    sxp = best_s + jnp.where(bx < search, 1, 0)
    sym = best_s - jnp.where(by > -search, side, 0)
    syp = best_s + jnp.where(by < search, side, 0)

    def pass_b(s, acc):
        c = cand_cost(s)
        return tuple(
            jnp.where(s == idx, c, a)
            for idx, a in zip((best_s, sxm, sxp, sym, syp), acc)
        )

    zero = jnp.zeros_like(best_c)
    c0, cxm, cxp, cym, cyp = jax.lax.fori_loop(
        0, n_cand, pass_b, (zero,) * 5
    )

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
    prev_cache: Optional[FrameCache] = None,
    want_cache: bool = False,
    grid_plan=None,
):
    """Shared pyramid loop: returns (u, v, warm, cache) with warm the
    level-1 flow and cache the :class:`FrameCache` of ``i2`` (``None``
    unless ``want_cache``).

    ``init_uv``: optional (u, v) warm-start pair at ANY resolution (it is
    resized to the coarsest level); bf16 accepted.  ``warm`` is the refined
    half-resolution flow — carrying it between frames gives the
    OPTFLOW_USE_INITIAL_FLOW warm start without a full-resolution
    read-back (the coarsest level can't see fine detail anyway).

    ``prev_cache``: optional :class:`FrameCache` built from ``i1`` (i.e.
    the previous step's ``i2`` cache) — skips the i1 pyramid build and the
    fused levels' i1 pad passes; ``i1`` is then only consulted for shape.
    """
    h0, w0 = i1.shape[-2], i1.shape[-1]
    levels = effective_levels(params, h0, w0)
    if prev_cache is not None:
        pyr1 = list(prev_cache.pyr)
        assert len(pyr1) == levels
    else:
        pyr1 = build_pyramid(i1, levels)
    pyr2 = build_pyramid(i2, levels)
    on_tpu = (
        params.fused
        if params.fused is not None
        else jax.default_backend() == "tpu"
    )
    pad_levels = _cached_pad_levels(params, h0, w0) if on_tpu else []
    pad_idx = {lvl: i for i, lvl in enumerate(pad_levels)}
    cur_pads: dict = {}

    def level_pads(lvl, a_prev, b_cur, h, w):
        """(i1_pad, i2_pad) for a cached fused level; builds + records the
        current frame's plane, reuses the previous frame's when given."""
        from ofps_tpu.pallas.flow_refine import (
            pad_image_kernel_layout,
            pick_blocks,
        )

        bh, bw = pick_blocks(h, w, coarse_flow=True)
        i2_pad = pad_image_kernel_layout(b_cur, bh, bw)
        cur_pads[lvl] = i2_pad
        i1_pad = None
        if prev_cache is not None and prev_cache.pads:
            i1_pad = prev_cache.pads[pad_idx[lvl]]
        return i1_pad, i2_pad

    def level_search(lvl):
        if lvl == levels - 1:
            return params.coarse_search
        if lvl == 0 and levels > 1:
            return params.fine_search
        return params.search

    # Temporal warm-start stability: the coarse search spans warm +-
    # coarse_search, so a warm value beyond the search radius can push the
    # TRUE (near-zero) offset out of the window entirely — wrong regions
    # then random-walk at coarse-step scale and grow without bound across
    # frames (observed: |u|max 10 -> 105 px over 9 frames).  Two defenses:
    # (1) clamp the warm init to coarse_search - 1 coarse px so the zero-
    # motion candidate stays inside every window, and (2) a GUARDED warm
    # start — the coarsest level (a few thousand pixels) is solved from
    # both the warm init and a zero init, and the winner is selected
    # per-pixel by aggregated SAD, so the cold solution always competes and
    # the feedback loop cannot lock in.  Farneback tolerates
    # OPTFLOW_USE_INITIAL_FLOW without this because its solve is
    # least-squares on polynomial expansions, not a local search.
    _warm_clamp = float(params.coarse_search - 1)

    def _coarse_guard(a, b, u_w, v_w, u_0, v_0):
        from ofps_tpu.ops.image import box_filter

        def sad(uu, vv):
            f = jnp.stack(
                [uu.astype(jnp.float32), vv.astype(jnp.float32)], axis=-1
            )
            return box_filter(
                jnp.abs(a - _warp(b, f, allow_pallas=False)), params.win
            )

        better = sad(u_w, v_w) <= sad(u_0, v_0)
        return (
            jnp.where(better, u_w, u_0.astype(u_w.dtype)),
            jnp.where(better, v_w, v_0.astype(v_w.dtype)),
        )

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
            u = jnp.clip(u, -_warm_clamp, _warm_clamp)
            v = jnp.clip(v, -_warm_clamp, _warm_clamp)

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
            # Inter-level median (FlowParams.median_levels): fused into the
            # small-kernel launch; a standalone XLA pass only after the big
            # blocked kernel (lvl 2 at 1080p).
            want_med = params.median_levels and lvl >= 2
            if fused and coarse and lvl in pad_idx:
                i1_pad_l, i2_pad_l = level_pads(lvl, a, b, h, w)
            else:
                i1_pad_l = i2_pad_l = None

            # In-kernel grid densify at the finest level (serving path):
            # the full-res (u, v) store + re-read exists only to feed the
            # grid scatter-mean, a ~16 MB/frame HBM round-trip at 1080p.
            _gp = grid_plan if (lvl == 0 and levels > 1 and fused) else None

            def refine_one(ui, vi, _a=a, _b=b, _s=search, _f=fused, _c=coarse,
                           _h=h, _w=w, _dt=out_dtype, _med=want_med,
                           _p1=i1_pad_l, _p2=i2_pad_l, _gp=_gp):
                if _f:
                    # Coarse flow feeds the kernel directly: the 2x upsample
                    # happens in VMEM (no standalone upsample pass).
                    return flow_refine_uv(
                        _a, _b, ui, vi, _s, params.win, coarse_flow=_c,
                        out_dtype=_dt, axis_sep=params.axis_sep,
                        i1_pad=_p1, i2_pad=_p2,
                        interpret=params.interpret,
                        grid_plan=_gp,
                    )
                if _c:
                    ui = resize_bilinear_matmul(ui.astype(jnp.float32), _h, _w) * 2.0
                    vi = resize_bilinear_matmul(vi.astype(jnp.float32), _h, _w) * 2.0
                # Small levels: one whole-image-in-VMEM kernel launch beats
                # the ~10^3 tiny XLA ops of the wide coarse search.
                from ofps_tpu.pallas.flow_refine_small import (
                    flow_refine_small_uv,
                )

                return flow_refine_small_uv(
                    _a, _b, ui.astype(jnp.float32), vi.astype(jnp.float32),
                    _s, params.win, median_out=_med,
                    interpret=params.interpret,
                )

            if lvl == levels - 1 and init_uv is not None and params.guarded_warm:
                if not fused and not coarse:
                    # Small-kernel coarsest level: the guard is FUSED into
                    # the launch (zero-init sweep + per-pixel SAD winner in
                    # VMEM) — the two-solve + warp + box-filter formulation
                    # below cost ~18% of the whole 1080p flow budget.
                    from ofps_tpu.pallas.flow_refine_small import (
                        flow_refine_small_uv,
                    )

                    u, v = flow_refine_small_uv(
                        a, b, u.astype(jnp.float32), v.astype(jnp.float32),
                        search, params.win, guard_zero_init=True,
                        median_out=want_med, interpret=params.interpret,
                    )
                else:
                    u_w, v_w = refine_one(u, v, _med=False)
                    u_0, v_0 = refine_one(
                        jnp.zeros_like(u), jnp.zeros_like(v), _med=False
                    )
                    u, v = _coarse_guard(a, b, u_w, v_w, u_0, v_0)
                    if want_med and not fused:
                        from ofps_tpu.ops.image import median3x3

                        u, v = median3x3(u), median3x3(v)
            else:
                u, v = refine_one(u, v)
            if want_med and fused:
                from ofps_tpu.ops.image import median3x3

                u, v = median3x3(u), median3x3(v)
            if lvl == 1 or levels == 1:
                warm_out = (u, v)
        # NOTE: the outer auto_margin() band has no valid correspondence
        # (content enters/leaves the frame); callers neutralize it —
        # dense_flow() replicates at full res fused with its output cast,
        # the serving path replicates at grid res (both ~free), keeping an
        # extra full-res HBM pass (~0.3 ms at 1080p) off this hot path.
        cache = None
        if want_cache:
            cache = FrameCache(
                pyr=tuple(pyr2),
                pads=tuple(cur_pads[lvl] for lvl in pad_levels),
            )
        return u, v, warm_out, cache

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
        flow = jnp.clip(flow, -_warm_clamp, _warm_clamp)

    for lvl in range(levels - 1, -1, -1):
        a, b = pyr1[lvl], pyr2[lvl]
        h, w = a.shape[-2], a.shape[-1]
        search = level_search(lvl)
        if flow is None:
            flow = jnp.zeros(a.shape + (2,), jnp.float32)
        elif flow.shape[-3] != h or flow.shape[-2] != w:
            flow = upsample2_flow(flow, h, w)
        if lvl == levels - 1 and init_uv is not None and params.guarded_warm:
            # Guarded warm start (see _coarse_guard above).
            f_w = flow + _level_refine(
                a, _warp(b, flow, allow_pallas=on_tpu), search, params.win,
                params.cost_dtype,
            )
            f_0 = _level_refine(a, b, search, params.win, params.cost_dtype)
            u_g, v_g = _coarse_guard(
                a, b, f_w[..., 0], f_w[..., 1], f_0[..., 0], f_0[..., 1]
            )
            flow = jnp.stack([u_g, v_g], axis=-1)
        else:
            warped = _warp(b, flow, allow_pallas=on_tpu)
            # Mirror the fused path's routing exactly: axis-separable
            # selection at the warm big levels (the ones flow_refine_uv
            # serves), full 2-D argmin at the small/coarse levels (the ones
            # flow_refine_small serves) — one algorithm on both backends.
            flow = flow + _level_refine(
                a, warped, search, params.win, params.cost_dtype,
                axis_sep=(
                    params.axis_sep
                    and search == 1
                    and h * w >= params.fuse_min_pixels
                ),
            )
        if params.median_levels and lvl >= 2:
            from ofps_tpu.ops.image import median3x3

            flow = jnp.stack(
                [median3x3(flow[..., 0]), median3x3(flow[..., 1])], axis=-1
            )
        if lvl == 1 or levels == 1:
            warm_out = (flow[..., 0], flow[..., 1])

    # Border band left in place — see the fused-path note above.
    cache = FrameCache(pyr=tuple(pyr2), pads=()) if want_cache else None
    return flow[..., 0], flow[..., 1], warm_out, cache


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
    u, v, _, _ = _dense_flow_impl(i1, i2, params, init_uv)
    # The outer band has no valid correspondence (auto_margin); replicate
    # the interior-nearest flow over it, fused with the f32 output cast.
    u, v = _replicate_border_uv(
        u.astype(jnp.float32),
        v.astype(jnp.float32),
        auto_margin(params, effective_levels(params, *u.shape[-2:]),
                    *u.shape[-2:]),
    )
    return jnp.stack([u, v], axis=-1)


def dense_flow_warm(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    params: FlowParams = FlowParams(),
    warm=None,
    prev_cache: Optional[FrameCache] = None,
    want_cache: bool = False,
    grid_plan=None,
):
    """Streaming-oriented dense flow with a cheap warm-start carry.

    Returns ``((u, v), warm_next)``: full-resolution split flow components
    plus the refined half-resolution flow to pass as ``warm`` on the next
    frame.  The split/bf16 carry avoids the full-res packed-layout
    round-trips of ``dense_flow(init_flow=...)`` (the trailing-dim-2 stack
    and the full-res re-read cost ~0.3 ms/frame at 1080p).

    ``prev_cache`` / ``want_cache``: thread a :class:`FrameCache` across
    steps (``want_cache=True`` appends it to the return tuple) so the i1
    pyramid + fused-level pad passes are computed once per frame instead
    of twice; :func:`dense_flow_stream` packages this pattern.

    ``grid_plan`` (``pallas.flow_refine.build_grid_plan``): when the fused
    TPU path serves the finest level, (u, v) come back as the plan's
    (gh, gw) grid-densify SUMS instead of full resolution — the serving
    pipeline's only consumer — skipping the full-res store + re-read.
    Callers detect application by the returned shape (the XLA path and
    non-full-width levels ignore the plan).
    """
    u, v, warm_next, cache = _dense_flow_impl(
        i1, i2, params, warm, prev_cache, want_cache, grid_plan=grid_plan
    )
    if want_cache:
        return (u, v), warm_next, cache
    return (u, v), warm_next


class FlowStreamCarry(NamedTuple):
    """Carry of :func:`dense_flow_stream`: warm (u, v) + previous frame."""

    warm: Tuple[jnp.ndarray, jnp.ndarray]
    cache: FrameCache


def dense_flow_stream(
    frame: jnp.ndarray,
    params: FlowParams = FlowParams(),
    carry: Optional[FlowStreamCarry] = None,
):
    """One-frame-in streaming dense flow (the video-pipeline pattern).

    Returns ``((u, v), carry_next)`` where the flow is between the
    PREVIOUS frame and ``frame`` (zeros on the first call).  Compared to
    chaining :func:`dense_flow_warm` on (prev, cur) pairs, the carry keeps
    the previous frame's pyramid and fused-kernel padded planes, so each
    step pays the frame-side preprocessing once (~0.25 ms/frame of HBM
    passes at 1080p).  Flow values are identical to the unchained form —
    the cached planes are pure functions of the previous frame.
    """
    if carry is None:
        cache = frame_cache(frame, params)
        h, w = frame.shape[-2], frame.shape[-1]
        if effective_levels(params, h, w) > 1:
            wh, ww = (h + 1) // 2, (w + 1) // 2
        else:
            wh, ww = h, w
        warm0 = (
            jnp.zeros(frame.shape[:-2] + (wh, ww), jnp.float32),
            jnp.zeros(frame.shape[:-2] + (wh, ww), jnp.float32),
        )
        zero = jnp.zeros(frame.shape, params.flow_dtype)
        return (zero, zero), FlowStreamCarry(warm=warm0, cache=cache)
    (u, v), warm, cache = dense_flow_warm(
        carry.cache.pyr[0],
        frame,
        params,
        warm=carry.warm,
        prev_cache=carry.cache,
        want_cache=True,
    )
    warm = tuple(x.astype(jnp.float32) for x in warm)
    return (u, v), FlowStreamCarry(warm=warm, cache=cache)


def flow_to_normalized(flow: jnp.ndarray) -> jnp.ndarray:
    """Pixel-unit flow -> [0,1]-normalized units (decoder.rs convention)."""
    h, w = flow.shape[-3], flow.shape[-2]
    return flow / jnp.asarray([w, h], dtype=flow.dtype)
