"""Fused Pallas TPU kernel: one pyramid-level flow refinement in VMEM.

Replaces three HBM-bound XLA passes of the coarse-to-fine loop —
bilinear warp, candidate cost sweep, argmin + subpixel — with ONE kernel
that keeps every intermediate (warped tile, per-candidate costs) in VMEM:

* per-block **mean flow offsets are scalar-prefetched** (computed by a tiny
  XLA pooling pass), so every block's source DMAs are known ahead of time
  and **double-buffered across grid steps** — block k+1's i1/i2 tiles stream
  in while block k computes (the naive wait-per-block version ran 37 ms per
  8x1080p batch, pure DMA latency; pipelined it is ~3 ms);
* the **i2 tile** DMA uses 8-aligned dynamic rows and 128-aligned dynamic
  columns; an iota-comparison **one-hot matmul on the MXU** collapses the
  column-alignment slack (gather-free dynamic shift, as in
  :mod:`ofps_tpu.pallas.warp`);
* the block is **warped in VMEM** by separable triangle-weight residual
  taps, extended by ``r + s`` halo pixels so box-filtered costs are exact
  except for the flow's edge extension at block seams;
* all ``(2s+1)^2`` candidate costs stay in VMEM: running (min, argmin)
  sweep, then indicator-selected parabola neighbors for the subpixel fit —
  the same math as ``ops.flow_pyramid._level_refine`` (f32 costs).

The batch grid dimension is marked ``parallel`` (megacore splits streams
across TensorCores); the DMA chain restarts at each stream's first block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ofps_tpu.ops.flow_pyramid import _TIE_EPS

RES = 7  # max per-pixel warp residual from the block-mean flow (pixels)
_PAD = RES + 1
_COL_PAD = 128  # left/right padding; absorbs block-mean column offsets
_ROW_PAD = 72  # top/bottom padding of i2; absorbs block-mean row offsets
_BIG = 1e10


def _tri(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def _edge_extend(a, top, bottom, left, right):
    """Edge-replicate a 2-D VMEM tile (concat of slices — Mosaic-friendly)."""
    if top or bottom:
        rows = [a[:1]] * top + [a] + [a[-1:]] * bottom
        a = jnp.concatenate(rows, axis=0) if len(rows) > 1 else a
    if left or right:
        cols = [a[:, :1]] * left + [a] + [a[:, -1:]] * right
        a = jnp.concatenate(cols, axis=1) if len(cols) > 1 else a
    return a


def _refine_kernel(
    mu_ref,  # scalar-prefetch: (nb, GH*GW) int32 block-mean u
    mv_ref,  # scalar-prefetch: (nb, GH*GW) int32 block-mean v
    i1_hbm,
    i2_hbm,
    u_ref,
    v_ref,
    *refs,  # [syt_ref, sxg_ref,] outputs (ou/ov or gu/gv), scratch
    bh,
    bw,
    r,
    s,
    gw_blocks,
    gh_blocks,
    h2p,
    w2p,
    himg,
    wimg,
    t2h,
    t2w,
    up=False,
    wcp=0,
    hcp=0,
    tch=0,
    tcw=0,
    img_dtype=jnp.float32,
    out_dtype=jnp.float32,
    uv_dtype=jnp.float32,
    axis_sep=False,
    i1_row_off=0,  # static row offset of the i1 tile DMA (i2-layout input)
    stage=99,  # debug: truncate the kernel after stage N (perf bisection)
    grid_fused=False,  # emit per-block grid-densify partials INSTEAD of u,v
):
    if grid_fused:
        syt_ref, sxg_ref, ou_ref, ov_ref, *scratch = refs
    else:
        ou_ref, ov_ref, *scratch = refs
    s1, sem1, s2, sem2, *up_scratch = scratch

    b = pl.program_id(0)
    bi = pl.program_id(1)
    bj = pl.program_id(2)
    t = bi * gw_blocks + bj
    nblocks = gh_blocks * gw_blocks

    def emit(uf, vf):
        """Final write: full-res (u, v), or their grid-densify partials.

        Grid mode replaces the (bh, bw) full-res store with the block's
        contribution to the scatter-mean grid (core.motion grid plan):
        gu = Syᵀ_block · u · Sx — two small MXU matmuls (~6 MMAC vs the
        16 MB/frame HBM round-trip of store-then-densify at 1080p).  bf16
        matmul inputs: the u cast is the SAME quantization the stored-bf16
        + XLA-densify path applies; the (K, bw) row-partial cast adds a
        second ~0.4%-relative rounding that averages out over a cell's
        ~13 column groups (<0.01 px on the cell mean, measured).
        """
        if not grid_fused:
            ou_ref[0] = uf.astype(out_dtype)
            ov_ref[0] = vf.astype(out_dtype)
            return
        syt = syt_ref[0]  # (K, bh) bf16 — this block row's Syᵀ slice
        ru = jnp.dot(
            syt, uf.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
        rv = jnp.dot(
            syt, vf.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
        ou_ref[0] = jnp.dot(
            ru.astype(jnp.bfloat16), sxg_ref[...],
            preferred_element_type=jnp.float32,
        )
        ov_ref[0] = jnp.dot(
            rv.astype(jnp.bfloat16), sxg_ref[...],
            preferred_element_type=jnp.float32,
        )

    hs = r + s
    t1h = bh + 16
    t1w = bw + 2 * _COL_PAD
    if up:
        scu, scv, semc = up_scratch

    def i2_base(tt):
        """(base_row, base_col) of block tt's i2 DMA, from prefetched means.

        Means arrive as TWO flat (nb, nblocks) operands: a trailing dim of 2
        would be lane-padded to 128 in SMEM and blow the 1 MB budget, and the
        interleaving stack+reshape itself cost ~30 ms on sub-tile arrays.
        """
        ii = tt // gw_blocks
        jj = tt % gw_blocks
        mu = mu_ref[b, tt]
        mv = mv_ref[b, tt]
        top = ii * bh + _ROW_PAD
        left = jj * bw + _COL_PAD
        want_row = jnp.clip(top + mv - (_PAD + hs), 0, h2p - t2h)
        base_row = pl.multiple_of((want_row // 8) * 8, 8)
        want_col = jnp.clip(left + mu - (_PAD + hs), 0, w2p - t2w)
        base_col = pl.multiple_of((want_col // 128) * 128, 128)
        return base_row, base_col

    def coarse_base(tt):
        """Aligned DMA origin for the coarse-flow tiles (up mode)."""
        ii = tt // gw_blocks
        jj = tt % gw_blocks
        row = ii * (bh // 2)  # top pad 8 cancels the -8 halo start
        want_col = jj * (bw // 2) + _COL_PAD - 16
        col = jnp.clip((want_col // 128) * 128, 0, wcp - tcw)
        return row, pl.multiple_of(col, 128)

    def all_dmas(tt, slot):
        ii = tt // gw_blocks
        jj = tt % gw_blocks
        out = [
            pltpu.make_async_copy(
                i1_hbm.at[
                    b, pl.ds(ii * bh + i1_row_off, t1h), pl.ds(jj * bw, t1w)
                ],
                s1.at[slot],
                sem1.at[slot],
            )
        ]
        base_row, base_col = i2_base(tt)
        out.append(
            pltpu.make_async_copy(
                i2_hbm.at[b, pl.ds(base_row, t2h), pl.ds(base_col, t2w)],
                s2.at[slot],
                sem2.at[slot],
            )
        )
        if up:
            crow, ccol = coarse_base(tt)
            out.append(
                pltpu.make_async_copy(
                    u_ref.at[b, pl.ds(crow, tch), pl.ds(ccol, tcw)],
                    scu.at[slot],
                    semc.at[slot, 0],
                )
            )
            out.append(
                pltpu.make_async_copy(
                    v_ref.at[b, pl.ds(crow, tch), pl.ds(ccol, tcw)],
                    scv.at[slot],
                    semc.at[slot, 1],
                )
            )
        return out

    def start_dmas(tt, slot):
        for d in all_dmas(tt, slot):
            d.start()

    def wait_dmas(tt, slot):
        for d in all_dmas(tt, slot):
            d.wait()

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        start_dmas(t, slot)

    @pl.when(t + 1 < nblocks)
    def _():
        start_dmas(t + 1, 1 - slot)

    wait_dmas(t, slot)

    if stage <= 0:  # DMA wait only (touch every tile so none is DCE'd)
        # (bf16 scalar extracts don't lower on Mosaic — reduce row slices.)
        probe = s1[slot, 8 : 8 + bh, _COL_PAD : _COL_PAD + bw].astype(
            jnp.float32
        ) * 1e-30 + jnp.sum(s2[slot, :1, :].astype(jnp.float32)) * 1e-30
        if up:
            probe = probe + jnp.sum(
                scu[slot, :1, :].astype(jnp.float32)
                + scv[slot, :1, :].astype(jnp.float32)
            ) * 1e-30
        else:
            probe = probe + jnp.sum(
                u_ref[0, :1, :].astype(jnp.float32)
                + v_ref[0, :1, :].astype(jnp.float32)
            ) * 1e-30
        ou_ref[0] = probe.astype(out_dtype)
        ov_ref[0] = probe.astype(out_dtype)
        return

    if not up:
        u = u_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
    base_row, base_col = i2_base(t)
    block_top = bi * bh + _ROW_PAD
    block_left = bj * bw + _COL_PAD
    dy0 = (block_top - base_row).astype(jnp.float32)
    dx0 = (block_left - base_col).astype(jnp.float32)

    ew = bw + 2 * hs
    eh = bh + 2 * hs
    ncol = ew + 2 * _PAD

    if up:
        # In-kernel 2x bilinear upsample of the coarse-flow tiles: banded
        # interpolation matrices built from iotas (the dynamic column offset
        # absorbs the 128-alignment slack), applied column-first on the MXU.
        # Kills the standalone XLA upsample pass AND the fine-flow reads.
        crow, ccol = coarse_base(t)
        delta = (bj * (bw // 2) + _COL_PAD - ccol).astype(jnp.float32)
        a_i = jax.lax.broadcasted_iota(jnp.int32, (tcw, ew), 0).astype(
            jnp.float32
        )
        p_i = jax.lax.broadcasted_iota(jnp.int32, (tcw, ew), 1).astype(
            jnp.float32
        )
        cmat = _tri(a_i - (0.5 * (p_i - hs) - 0.25 + delta)).astype(uv_dtype)
        q_i = jax.lax.broadcasted_iota(jnp.int32, (eh, tch), 0).astype(
            jnp.float32
        )
        a2_i = jax.lax.broadcasted_iota(jnp.int32, (eh, tch), 1).astype(
            jnp.float32
        )
        rmat = _tri(a2_i - (0.5 * (q_i - hs) - 0.25 + 8.0)).astype(uv_dtype)

        def upsample(sc):
            tmp = jnp.dot(sc[slot], cmat, preferred_element_type=jnp.float32)
            return 2.0 * jnp.dot(rmat, tmp, preferred_element_type=jnp.float32)

        u_ext = upsample(scu)  # (eh, ew)
        v_full = upsample(scv)
        u = u_ext[hs : hs + bh, hs : hs + bw]
        v = v_full[hs : hs + bh, hs : hs + bw]
        v_ext = _edge_extend(v_full, 0, 0, _PAD, _PAD)  # (eh, ncol)
        if stage <= 1:  # DMA + upsample only
            ou_ref[0] = (u).astype(out_dtype)
            ov_ref[0] = (v).astype(out_dtype)
            return
    else:
        # Flow extended to the halo by edge replication (exact inside the
        # block; the approximation at block seams is bounded by the
        # box-filter radius).
        u_ext = _edge_extend(u, hs, hs, hs, hs)  # (eh, ew)
        v_ext = _edge_extend(v, hs, hs, hs + _PAD, hs + _PAD)  # (eh, ncol)

    # Collapse the 128-aligned column slack with a one-hot MXU matmul:
    # tile2[y, c] = s2[y, col_shift + c]; column c is block-frame image
    # x = c - hs - _PAD.  (pltpu.roll with a *dynamic* shift lowers to a
    # per-offset select chain and was ~6x slower than this matmul.)
    col_shift = jnp.round(dx0).astype(jnp.int32) - (_PAD + hs)
    col_src = jax.lax.broadcasted_iota(jnp.int32, (t2w, ncol), 0)
    col_dst = jax.lax.broadcasted_iota(jnp.int32, (t2w, ncol), 1)
    # bf16 matmul inputs (one-hot matrix is exact in bf16; pixel values lose
    # <0.5/255) with f32 accumulation: ~8x MXU rate vs f32 — this matmul was
    # ~4.6us of each block's ~20us.
    shift_mat = (col_src == col_dst + col_shift).astype(jnp.bfloat16)
    tile2 = jnp.dot(
        s2[slot], shift_mat, preferred_element_type=jnp.float32
    ).astype(img_dtype)

    if stage <= 2:  # + column-shift matmul
        ou_ref[0] = (u + tile2[:bh, :bw] * 1e-30).astype(out_dtype)
        ov_ref[0] = (v).astype(out_dtype)
        return

    # ---- warp in VMEM: separable triangle taps ---------------------------
    # Image-path math runs in img_dtype.  (bf16 measured *slower* on v5e:
    # the VPU has 32-bit lanes, so bf16 only halves DMA bytes while adding
    # conversion ops; f32 stays the default.)
    vv = jnp.clip(dy0 - hs + v_ext, 0.0, float(t2h - eh - 1))
    c = jnp.zeros((eh, ncol), img_dtype)
    for i in range(t2h - eh):
        c = c + _tri(vv - i).astype(img_dtype) * tile2[i : i + eh, :]

    uu = jnp.clip(_PAD + u_ext, 0.0, float(ncol - ew - 1))
    warped = jnp.zeros((eh, ew), img_dtype)
    for j in range(ncol - ew):
        warped = warped + _tri(uu - j).astype(img_dtype) * c[:, j : j + ew]

    if stage <= 3:  # + warp
        ou_ref[0] = (u + warped[hs : hs + bh, hs : hs + bw].astype(jnp.float32) * 1e-30).astype(out_dtype)
        ov_ref[0] = (v).astype(out_dtype)
        return

    # i1 with r halo: static in-tile offsets (rows: 8 - r; cols: 128 - r).
    i1t = s1[
        slot, 8 - r : 8 - r + bh + 2 * r, _COL_PAD - r : _COL_PAD - r + bw + 2 * r
    ].astype(img_dtype)

    # ---- candidate cost sweep (math of _level_refine) --------------------
    # Border penalties factor into per-dy row masks and per-dx column masks
    # (computed once per block, not 8 iota ops per candidate): the combined
    # where costs 2 ops per candidate.  Costs are NOT scaled by the box area:
    # argmin and the parabola offset (a ratio) are scale-invariant.
    ys = bi * bh + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
    xs = bj * bw + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
    row_pen = {
        dy: jnp.where((ys + dy < 0) | (ys + dy > himg - 1), _BIG, 0.0)
        for dy in range(-s, s + 1)
    }
    col_pen = {
        dx: jnp.where((xs + dx < 0) | (xs + dx > wimg - 1), _BIG, 0.0)
        for dx in range(-s, s + 1)
    }
    side = 2 * s + 1

    def _tree_box(a, span, axis, out_len):
        """Sum of ``span`` consecutive slices along ``axis`` in O(log) adds.

        Doubling tree: s1 = a + shift1(a) covers 2 taps, s2 = s1 + shift2(s1)
        covers 4, ... then one remainder add.  5-tap box sums drop from 5
        shifted adds to 3 — the cost sweep is pure VPU work and this is its
        dominant op count.
        """
        def sl(x, off, ln):
            if axis == 0:
                return x[off : off + ln, :]
            return x[:, off : off + ln]

        covered = 1
        acc = a
        while covered * 2 <= span:
            ln = acc.shape[axis] - covered
            acc = sl(acc, 0, ln) + sl(acc, covered, ln)
            covered *= 2
        if covered < span:
            acc = sl(acc, 0, out_len) + sl(a, span - 1, out_len)
        return sl(acc, 0, out_len)

    if axis_sep:
        # Warm-started levels (|parent residual| < 1 px): evaluate only the
        # 5-cost cross (dx axis at dy=0, dy axis at dx=0) and refine each
        # axis independently — 5/9 of the SAD work and a 1-D selection.
        # Diagonal integer residuals still resolve (each axis improves
        # independently); only their subpixel term degrades slightly —
        # gated on the TPU parity/accuracy checks.
        assert s == 1, "axis_sep is a search=1 fast path"
        pairs = [(0, -1), (-1, 0), (0, 0), (1, 0), (0, 1)]
    else:
        pairs = [(dx, dy) for dy in range(-s, s + 1) for dx in range(-s, s + 1)]

    costs = []
    for dx, dy in pairs:
        wsh = warped[
            hs + dy - r : hs + dy + bh + r, hs + dx - r : hs + dx + bw + r
        ]
        diff = jnp.abs(i1t - wsh)
        acc = _tree_box(diff, 2 * r + 1, 0, bh)
        cost = _tree_box(acc, 2 * r + 1, 1, bw)
        # Back to f32 before the penalty adds: Mosaic cannot relayout
        # masks between 16-bit (bf16 compare) and 32-bit operand widths.
        # The displacement prior (box-SUM scale) resolves edge-replication
        # cost plateaus toward the smaller shift.
        tie = _TIE_EPS * (2 * r + 1) ** 2 * (abs(dx) + abs(dy))
        cost = cost.astype(jnp.float32) + (row_pen[dy] + col_pen[dx] + tie)
        costs.append(cost)

    if stage <= 4:  # + candidate costs
        acc0 = costs[0]
        for cc in costs[1:]:
            acc0 = acc0 + cc
        ou_ref[0] = (u + acc0 * 1e-30).astype(out_dtype)
        ov_ref[0] = (v).astype(out_dtype)
        return

    if axis_sep:
        cxm, cym0, c00, cyp0 = costs[1], costs[0], costs[2], costs[4]
        cxp = costs[3]

        def axis_refine(cm, cc, cp):
            bi = jnp.where(cm < cc, jnp.where(cm <= cp, -1, 1),
                           jnp.where(cp < cc, 1, 0))
            denom = cm - 2.0 * cc + cp
            off = jnp.where(
                jnp.abs(denom) > 1e-12,
                0.5 * (cm - cp) / jnp.maximum(jnp.abs(denom), 1e-12)
                * jnp.sign(denom),
                0.0,
            )
            off = jnp.clip(off, -0.5, 0.5)
            # Parabola only valid at the interior minimum (bi == 0);
            # boundary winners move the full integer step (no neighbor
            # beyond the 3-tap window — same edge rule as the 2-D path).
            return bi.astype(jnp.float32) + jnp.where(bi == 0, off, 0.0)

        emit(u + axis_refine(cxm, c00, cxp), v + axis_refine(cym0, c00, cyp0))
        return

    # Two-phase argmin + parabola-neighbor extraction: per-dy row reductions
    # first, then a reduction across rows — ~3x fewer select ops than the
    # flat 45-indicator sweep (that stage alone was ~3 ms per 16x1080p).
    # (bx, by) are tracked directly: vectorized integer div/mod has no TPU
    # lane support.
    side = 2 * s + 1

    def select_at(ix, clist):
        """clist[ix + s] per pixel via a where chain (TPU-friendly)."""
        val = clist[0]
        for k in range(1, side):
            val = jnp.where(ix == k - s, clist[k], val)
        return val

    rows = []
    for dy_i in range(side):
        clist = costs[dy_i * side : (dy_i + 1) * side]
        rmin = clist[0]
        rbx = jnp.full((bh, bw), -s, jnp.int32)
        for k in range(1, side):
            take = clist[k] < rmin
            rmin = jnp.where(take, clist[k], rmin)
            rbx = jnp.where(take, k - s, rbx)
        rows.append((rmin, rbx, clist))

    best_c, bx, _ = rows[0]
    by = jnp.full((bh, bw), -s, jnp.int32)
    for k in range(1, side):
        rmin, rbx, _ = rows[k]
        take = rmin < best_c
        best_c = jnp.where(take, rmin, best_c)
        bx = jnp.where(take, rbx, bx)
        by = jnp.where(take, k - s, by)

    bxm = jnp.maximum(bx - 1, -s)
    bxp = jnp.minimum(bx + 1, s)
    bym = jnp.maximum(by - 1, -s)
    byp = jnp.minimum(by + 1, s)

    # Row costs at the winning bx (and its x-neighbors for the winning row).
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
            0.5
            * (cm - cp)
            / jnp.maximum(jnp.abs(denom), 1e-12)
            * jnp.sign(denom),
            0.0,
        )
        off = jnp.clip(off, -0.5, 0.5)
        return jnp.where(at_edge, 0.0, off)

    sub_x = parabola(cxm, c0, cxp, jnp.abs(bx) == s)
    sub_y = parabola(cym, c0, cyp, jnp.abs(by) == s)

    emit(u + bx.astype(jnp.float32) + sub_x, v + by.astype(jnp.float32) + sub_y)


def _pick_block(n: int, candidates) -> int:
    """Largest block whose padding stays within ~10% of n.

    Bigger blocks amortize per-block grid/DMA overhead (the dominant cost at
    small block sizes), so padding waste up to 10% is the better trade.
    """
    budget = max(8, n // 10)
    for c in candidates:  # candidates ordered large -> small
        if (-n) % c <= budget:
            return c
    return candidates[-1]


def pick_blocks(h: int, w: int, coarse_flow: bool = False):
    """Deterministic (bh, bw) choice for a level — shared by the kernel
    launch and by :func:`pad_image_kernel_layout` so a padded plane built
    for frame t's i2 is byte-compatible as frame t+1's i1."""
    bh = _pick_block(h, (128, 64, 32, 16, 8))
    # FULL-WIDTH blocks when they fit VMEM: the i1/i2 tiles carry
    # 2*_COL_PAD + alignment slack of padding per block row, so fewer,
    # wider blocks cut DMA bytes (1080p L0: 871 -> 664 us/frame at
    # bw=1920 vs 768) and per-block grid overhead.  2176 columns keeps
    # the double-buffered tiles + candidate costs comfortably inside
    # the 64 MB budget; wider images fall back to tiling.
    full = w + ((-w) % 128)
    if full <= 2176:
        bw = full
    else:
        bw = _pick_block(w, (768, 640, 512, 384, 256, 128))
    if coarse_flow:
        bh = max(bh, 16)  # bh // 2 must stay 8-row aligned for coarse DMAs
    return bh, bw


def pad_image_kernel_layout(img: jnp.ndarray, bh: int, bw: int) -> jnp.ndarray:
    """Pad an (..., H, W) image into the kernel's wide i2 layout, bf16.

    Rows get ``_ROW_PAD`` of edge padding top+bottom (absorbs block-mean
    flow offsets), columns ``_COL_PAD`` left + 128-aligned right.  The i1
    tile reads the SAME layout at a static ``_ROW_PAD - 8`` row offset, so
    one padded plane serves as frame t's i2 and frame t+1's i1 — in a
    streaming pipeline the pad pass (a full HBM read+write of the frame)
    happens once per frame instead of twice.
    """
    h, w = img.shape[-2], img.shape[-1]
    ph = (-h) % bh
    pw = (-w) % bw
    x = img.astype(jnp.bfloat16)
    if ph or pw:
        pads = [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)]
        x = jnp.pad(x, pads, mode="edge")
    hp, wp = h + ph, w + pw
    x = x.reshape((-1, hp, wp))
    w2p = wp + 2 * _COL_PAD
    w2p += (-w2p) % 128
    return jnp.pad(
        x,
        [(0, 0), (_ROW_PAD, _ROW_PAD), (_COL_PAD, w2p - wp - _COL_PAD)],
        mode="edge",
    )


def build_grid_plan(
    h: int, w: int, gh: int, gw: int, border_px: int = 0,
    coarse_flow: bool = True,
):
    """Static plan for the in-kernel grid densify (serving pipeline L0).

    Precomputes per-block-row transposed Syᵀ slices (each L0 block of ``bh``
    image rows touches only ~``bh/cell_h + 1`` grid rows), the full Sx, and
    the assembly matrix that sums the per-block partials into the (gh, gw)
    grid.  Returns None when the level is not full-width-blocked (the fused
    densify needs one block column so Sx rides whole in VMEM) — callers
    fall back to the store-then-densify path.

    The masked scatter matrices and counts come from
    :func:`ofps_tpu.core.motion.grid_scatter_plan_np`, so the fused result
    is the same cell partition as :func:`grid_downsample_uv` by
    construction (parity-gated in tests/test_grid_fused.py).
    """
    import numpy as np

    from ofps_tpu.core.motion import grid_scatter_plan_np

    bh, bw = pick_blocks(h, w, coarse_flow)
    wp = w + ((-w) % bw)
    if wp != bw:
        return None
    hp = h + ((-h) % bh)
    gh_blocks = hp // bh
    sy, sx, counts, idx_y, idx_x = grid_scatter_plan_np(
        h, w, gh, gw, border_px
    )
    sy_pad = np.zeros((hp, gh), np.float32)
    sy_pad[:h] = sy
    sx_pad = np.zeros((wp, gw), np.float32)
    sx_pad[:w] = sx
    los = []
    for i in range(gh_blocks):
        sub = sy_pad[i * bh : (i + 1) * bh]
        nz = np.nonzero(sub.sum(axis=0) > 0)[0]
        los.append(int(nz.min()) if nz.size else 0)
    k = max(
        (int(np.nonzero(sy_pad[i * bh : (i + 1) * bh].sum(axis=0) > 0)[0].max())
         + 1 - lo) if np.any(sy_pad[i * bh : (i + 1) * bh]) else 1
        for i, lo in enumerate(los)
    )
    k = -(-max(k, 8) // 8) * 8  # sublane-aligned partial rows
    syt = np.zeros((gh_blocks, k, bh), np.float32)
    asm = np.zeros((gh, gh_blocks * k), np.float32)
    for i, lo in enumerate(los):
        lo = max(0, min(lo, gh - k)) if gh >= k else 0
        kk = min(k, gh - lo)
        syt[i, :kk] = sy_pad[i * bh : (i + 1) * bh, lo : lo + kk].T
        asm[lo : lo + kk, i * k : i * k + kk] = np.eye(kk, dtype=np.float32)
    return {
        "syt": syt, "sx": sx_pad, "asm": asm, "counts": counts,
        "idx_y": idx_y, "idx_x": idx_x, "gh": gh, "gw": gw,
        "bh": bh, "bw": bw, "k": k,
    }


def flow_refine_uv(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    search: int,
    win: int,
    bh: int = 0,
    bw: int = 0,
    interpret: bool = False,
    coarse_flow: bool = False,
    img_dtype=jnp.float32,
    out_dtype=jnp.float32,
    axis_sep: bool = False,
    i1_pad: jnp.ndarray | None = None,
    i2_pad: jnp.ndarray | None = None,
    stage: int = 99,
    grid_plan=None,
):
    """Fused warp + refine of one pyramid level on split flow components.

    ``i1``/``i2``: (..., H, W) float32.  ``u``/``v``: same resolution, or
    HALF resolution with ``coarse_flow=True`` — then the kernel performs the
    2x bilinear upsample in VMEM (banded-matmul interpolation), eliminating
    the inter-level upsample pass entirely.  Returns updated full-resolution
    ``(u, v)``.  The split representation avoids the trailing-dim-2
    stack/split relayouts that dominated the packed-flow wrapper.  Pads H/W
    up to block multiples internally (edge mode) and slices back.

    ``i1_pad`` / ``i2_pad``: optional pre-padded bf16 planes in the layout
    of :func:`pad_image_kernel_layout` (must have been built with the same
    (bh, bw) — :func:`pick_blocks`).  A streaming caller passes frame t-1's
    ``i2_pad`` as frame t's ``i1_pad``, skipping the full-frame pad pass
    (HBM read+write) and the f32->bf16 convert for the i1 side entirely.
    When ``i1_pad`` is given, ``i1`` is only consulted for shape/dtype.
    """
    r = win // 2
    h, w = i1.shape[-2], i1.shape[-1]
    abh, abw = pick_blocks(h, w, coarse_flow)
    bh = bh or abh
    bw = bw or abw
    ph = (-h) % bh
    pw = (-w) % bw
    batch = i1.shape[:-2]
    nb = 1
    for d in batch:
        nb *= int(d)

    def pad2(x):
        pads = [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)]
        return jnp.pad(x, pads, mode="edge") if (ph or pw) else x

    hp, wp = h + ph, w + pw
    gh_blocks = hp // bh
    gw_blocks = wp // bw

    def block_mean(x, wh, ww):
        # f32 accumulation even for bf16 carries (sums of ~1e3 values).
        return jax.lax.reduce_window(
            x.astype(jnp.float32), 0.0, jax.lax.add, (1, wh, ww), (1, wh, ww), "VALID"
        ) * (1.0 / (wh * ww))

    if coarse_flow:
        # u, v arrive at HALF resolution; the kernel upsamples per block.
        hc, wc = hp // 2, wp // 2
        phc = hc - u.shape[-2]
        pwc = wc - u.shape[-1]
        assert phc >= 0 and pwc >= 0, (u.shape, (hc, wc))

        def padc(x):
            pads = [(0, 0)] * (x.ndim - 2) + [(0, phc), (0, pwc)]
            return (
                jnp.pad(x, pads, mode="edge") if (phc or pwc) else x
            ).reshape((-1, hc, wc))

        us = padc(u)
        vs = padc(v)
        # Block means from the coarse arrays (quarter-cost), x2 value scale.
        means_u = (
            jnp.round(2.0 * block_mean(us, bh // 2, bw // 2))
            .astype(jnp.int32)
            .reshape(nb, -1)
        )
        means_v = (
            jnp.round(2.0 * block_mean(vs, bh // 2, bw // 2))
            .astype(jnp.int32)
            .reshape(nb, -1)
        )
        # DMA padding: 8 rows top/bottom, 128 cols left + align right.
        wcp = wc + 2 * _COL_PAD
        wcp += (-wcp) % 128
        us = jnp.pad(us, [(0, 0), (8, 8), (_COL_PAD, wcp - wc - _COL_PAD)])
        vs = jnp.pad(vs, [(0, 0), (8, 8), (_COL_PAD, wcp - wc - _COL_PAD)])
        hcp = hc + 16
        tch = bh // 2 + 16
        tcw = bw // 2 + 176
        tcw += (-tcw) % 128
    else:
        us = pad2(u).reshape((-1, hp, wp))
        vs = pad2(v).reshape((-1, hp, wp))
        # Per-block rounded mean flow, prefetched for DMA addresses.
        means_u = (
            jnp.round(block_mean(us, bh, bw)).astype(jnp.int32).reshape(nb, -1)
        )
        means_v = (
            jnp.round(block_mean(vs, bh, bw)).astype(jnp.int32).reshape(nb, -1)
        )
        wcp = hcp = tch = tcw = 0

    w2p = wp + 2 * _COL_PAD
    w2p += (-w2p) % 128
    h2p = hp + 2 * _ROW_PAD

    # Images stored bf16 in HBM: halves the tile-DMA bytes; all in-kernel
    # math upcasts to img_dtype (pixel quantization <0.5/255).
    if i1_pad is not None:
        # Pre-padded wide (i2) layout from the previous frame: the i1 tile
        # reads at a static _ROW_PAD - 8 row offset instead of a fresh
        # 8-row-pad plane.
        i1pad = i1_pad
        i1_row_off = _ROW_PAD - 8
        assert i1pad.shape == (nb, h2p, w2p), (i1pad.shape, (nb, h2p, w2p))
    else:
        # i1: 8 rows / 128 cols of edge padding so static block DMAs stay
        # aligned and in bounds; right pad to a 128 multiple.
        i1p = pad2(i1.astype(jnp.bfloat16)).reshape((-1, hp, wp))
        i1pad = jnp.pad(
            i1p, [(0, 0), (8, 8), (_COL_PAD, w2p - wp - _COL_PAD)], mode="edge"
        )
        i1_row_off = 0

    if i2_pad is not None:
        i2pad = i2_pad
        assert i2pad.shape == (nb, h2p, w2p), (i2pad.shape, (nb, h2p, w2p))
    else:
        # i2: wide padding for flow-mean offsets.
        i2pad = pad_image_kernel_layout(i2, bh, bw)

    t2h = bh + 2 * (_PAD + r + search) + 8
    t2h += (-t2h) % 8
    t2w = bw + 2 * (_PAD + r + search) + _COL_PAD
    t2w += (-t2w) % 128

    if grid_plan is not None:
        assert stage == 99, "grid fusion and stage bisection are exclusive"
        assert gw_blocks == 1 and grid_plan["bh"] == bh and grid_plan["bw"] == bw, (
            "grid_plan built for different block geometry",
            (grid_plan["bh"], grid_plan["bw"]), (bh, bw),
        )

    kernel = functools.partial(
        _refine_kernel,
        bh=bh,
        bw=bw,
        r=r,
        s=search,
        gw_blocks=gw_blocks,
        gh_blocks=gh_blocks,
        h2p=h2p,
        w2p=w2p,
        himg=hp,
        wimg=wp,
        t2h=t2h,
        t2w=t2w,
        img_dtype=img_dtype,
        out_dtype=out_dtype,
        uv_dtype=u.dtype,
        axis_sep=axis_sep and search == 1,
        i1_row_off=i1_row_off,
        stage=stage,
        up=coarse_flow,
        wcp=wcp,
        hcp=hcp,
        tch=tch,
        tcw=tcw,
        grid_fused=grid_plan is not None,
    )
    if coarse_flow:
        uv_specs = [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        extra_scratch = [
            pltpu.VMEM((2, tch, tcw), u.dtype),
            pltpu.VMEM((2, tch, tcw), u.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    else:
        uv_specs = [
            pl.BlockSpec((1, bh, bw), lambda b, i, j, *_: (b, i, j)),
            pl.BlockSpec((1, bh, bw), lambda b, i, j, *_: (b, i, j)),
        ]
        extra_scratch = []
    grid_inputs = ()
    grid_in_specs = []
    if grid_plan is None:
        out_specs = [
            pl.BlockSpec((1, bh, bw), lambda b, i, j, *_: (b, i, j)),
            pl.BlockSpec((1, bh, bw), lambda b, i, j, *_: (b, i, j)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((nb, hp, wp), out_dtype),
            jax.ShapeDtypeStruct((nb, hp, wp), out_dtype),
        ]
    else:
        k = grid_plan["k"]
        gh_g, gw_g = grid_plan["gh"], grid_plan["gw"]
        grid_inputs = (
            jnp.asarray(grid_plan["syt"], jnp.bfloat16),
            jnp.asarray(grid_plan["sx"], jnp.bfloat16),
        )
        grid_in_specs = [
            pl.BlockSpec((1, k, bh), lambda b, i, j, *_: (i, 0, 0)),
            pl.BlockSpec((bw, gw_g), lambda b, i, j, *_: (0, 0)),
        ]
        out_specs = [
            pl.BlockSpec((1, k, gw_g), lambda b, i, j, *_: (b, i, 0)),
            pl.BlockSpec((1, k, gw_g), lambda b, i, j, *_: (b, i, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((nb, gh_blocks * k, gw_g), jnp.float32),
            jax.ShapeDtypeStruct((nb, gh_blocks * k, gw_g), jnp.float32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, gh_blocks, gw_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        + uv_specs
        + grid_in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, bh + 16, bw + 2 * _COL_PAD), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, t2h, t2w), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        + extra_scratch,
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            # The default 16 MB scoped-vmem budget is tight for the live set
            # (costs + warp extensions + penalty masks); v5e VMEM is 128 MB.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    ou, ov = fn(means_u, means_v, i1pad, i2pad, us, vs, *grid_inputs)
    if grid_plan is not None:
        # Assemble the per-block partial rows into the (gh, gw) sums — a
        # tiny static 0/1 matmul ("highest": f32 sums must not quantize to
        # bf16 on the MXU, see CLAUDE.md numerics).
        asm = jnp.asarray(grid_plan["asm"])
        gu = jnp.einsum("gp,npk->ngk", asm, ou, precision="highest")
        gv = jnp.einsum("gp,npk->ngk", asm, ov, precision="highest")
        gshape = batch + (gh_g, gw_g)
        return gu.reshape(gshape), gv.reshape(gshape)
    shape = batch + (h, w)
    return ou[:, :h, :w].reshape(shape), ov[:, :h, :w].reshape(shape)


def flow_refine_tpu(
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    flow: jnp.ndarray,
    search: int,
    win: int,
    bh: int = 0,
    bw: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Packed-flow convenience wrapper: (..., H, W, 2) in and out."""
    u, v = flow_refine_uv(
        i1, i2, flow[..., 0], flow[..., 1], search, win, bh, bw, interpret
    )
    return jnp.stack([u, v], axis=-1)
