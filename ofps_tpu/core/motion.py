"""Motion-field data layer.

Behavioral spec: ``/root/reference/ofps/src/motion_field.rs`` and the sparse
``MotionVectors`` type from ``/root/reference/ofps/src/decoder.rs:40-42``.

TPU-first design: the variable-length ``Vec<(pos, motion)>`` of the reference
becomes a fixed-capacity ``SparseFlow`` (padded arrays + validity mask) so that
every consumer is a fixed-shape jittable function, and the dense
``MotionField`` becomes an ``(H, W, 2)`` array.  Densification (scatter-mean)
is a segment-sum; hole-filling is a convergent parallel relaxation with the
same 6-neighborhood and distance weights as the reference's priority-queue
algorithm (``motion_field.rs:193-294``).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

F32_EPS = float(jnp.finfo(jnp.float32).eps)

# 6-neighborhood used by the reference hole-filling (motion_field.rs:208):
# (dx, dy) offsets.
_INTERP_NEIGHBORS = ((-1, 0), (0, -1), (-1, -1), (1, 0), (0, 1), (1, 1))


class SparseFlow(NamedTuple):
    """Fixed-capacity sparse motion-vector field.

    ``pos``/``motion``: (N, 2) float32 in [0,1]-normalized screen units;
    ``mask``: (N,) float32 validity (1.0 = real entry, 0.0 = padding).
    Equivalent of the reference's ``MotionVectors`` list.
    """

    pos: jnp.ndarray
    motion: jnp.ndarray
    mask: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.pos.shape[-2]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.mask, axis=-1)

    @classmethod
    def from_arrays(cls, pos, motion, capacity: int | None = None) -> "SparseFlow":
        """Build from host arrays, padding/truncating to ``capacity``."""
        import numpy as np

        pos = np.asarray(pos, dtype=np.float32).reshape(-1, 2)
        motion = np.asarray(motion, dtype=np.float32).reshape(-1, 2)
        n = pos.shape[0]
        cap = capacity or max(n, 1)
        if n > cap:
            pos, motion, n = pos[:cap], motion[:cap], cap
        out_pos = np.zeros((cap, 2), dtype=np.float32)
        out_mot = np.zeros((cap, 2), dtype=np.float32)
        out_mask = np.zeros((cap,), dtype=np.float32)
        out_pos[:n] = pos
        out_mot[:n] = motion
        out_mask[:n] = 1.0
        return cls(jnp.asarray(out_pos), jnp.asarray(out_mot), jnp.asarray(out_mask))


def _round_half_up(x: jnp.ndarray) -> jnp.ndarray:
    """Rust ``f32::round`` rounds half away from zero; inputs here are >= 0."""
    return jnp.floor(x + 0.5)


def flow_cell_index(pos: jnp.ndarray, width: int, height: int):
    """Grid cell for a [0,1]^2 position (motion_field.rs:164-178 semantics)."""
    p = jnp.clip(pos, 0.0, 1.0)
    x = _round_half_up(p[..., 0] * (width - 1)).astype(jnp.int32)
    y = _round_half_up(p[..., 1] * (height - 1)).astype(jnp.int32)
    return x, y


class Densifier(NamedTuple):
    """Accumulator equivalent of ``MotionFieldDensifier``.

    ``sums``: (H, W, 2) weighted motion sums; ``counts``: (H, W) weight sums,
    initialized at f32 epsilon like the reference (motion_field.rs:136).
    """

    sums: jnp.ndarray
    counts: jnp.ndarray

    @classmethod
    def zeros(cls, width: int, height: int) -> "Densifier":
        return cls(
            jnp.zeros((height, width, 2), dtype=jnp.float32),
            jnp.full((height, width), F32_EPS, dtype=jnp.float32),
        )

    @property
    def shape(self) -> Tuple[int, int]:
        h, w = self.counts.shape[-2:]
        return w, h

    def add_flow(self, flow: SparseFlow, weight: jnp.ndarray | float = 1.0) -> "Densifier":
        """Scatter-add a sparse flow into the accumulator (vectorized).

        For SMALL grids (the detector's ~14x14 accumulator, the hot
        path) the scatter is computed as a one-hot MXU matmul rather
        than ``.at[idx].add``: an XLA:TPU scatter with N=12,600 updates
        serializes on the scalar core (~0.2 ms/stream in the detector
        stage), while onehotᵀ·values is ~2.5 MMAC — noise on the MXU.
        f32 with ``precision="highest"`` keeps the accumulation exact
        (one-hot entries are 0/1; summation-order differences vs the
        scatter are ordinary f32 reassociation, under the oracle-parity
        test tolerances).  Big grids (e.g. the 150x84 motion-extract
        densify, cold paths) keep the scatter: there the one-hot
        materializes N x cells f32 (~0.6 GB at 12,600 x 12,600), far
        worse than the serialized updates.
        """
        h, w = self.counts.shape[-2:]
        x, y = flow_cell_index(flow.pos, w, h)
        idx = y * w + x
        wgt = flow.mask * weight
        if h * w <= 1024:
            onehot = (
                idx[..., None] == jnp.arange(h * w, dtype=idx.dtype)
            ).astype(jnp.float32)  # (N, h*w)
            counts = self.counts + jnp.einsum(
                "n,nc->c", wgt, onehot, precision="highest"
            ).reshape(h, w)
            sums = self.sums + jnp.einsum(
                "nk,nc->ck", flow.motion * wgt[..., None], onehot,
                precision="highest",
            ).reshape(h, w, 2)
            return Densifier(sums, counts)
        counts = self.counts.reshape(-1).at[idx].add(wgt).reshape(h, w)
        sums = (
            self.sums.reshape(-1, 2)
            .at[idx].add(flow.motion * wgt[..., None])
            .reshape(h, w, 2)
        )
        return Densifier(sums, counts)

    def finalize(self) -> jnp.ndarray:
        """Weighted mean per cell: the dense (H, W, 2) motion field."""
        return self.sums / self.counts[..., None]

    def interpolate_empty_cells(self) -> "Densifier":
        """Fill empty cells from filled neighbors until convergence.

        Parallel reformulation of the reference's priority-queue interpolation
        (motion_field.rs:193-294): each round, every still-empty cell that has
        at least one filled 6-neighbor receives the distance-weighted average
        of its filled neighbors' mean values.  The reference fills cells one at
        a time in most-neighbors-first order; this Jacobi-style sweep converges
        to the same fill class and is TPU-parallel.  Weighting matches the
        reference exactly per contribution: ``add_vector_idx`` multiplies the
        passed ``scale * mean`` by the ``scale`` weight again
        (motion_field.rs:141-147 + 265), so sums accumulate ``scale^2 * mean``
        against ``scale`` counts.  Agreement with the sequential oracle is
        gated in ``tests/test_oracle_parity.py``.
        """
        h, w = self.counts.shape[-2:]

        # 2x2 parity coloring: every offset in _INTERP_NEIGHBORS flips the x
        # or y parity, so no two same-color cells are neighbors.  Filling one
        # color at a time (recomputing filled state in between) reproduces
        # the reference's within-tier sequential feeding — a cell filled
        # earlier in the tier contributes to its neighbors filled later
        # (motion_field.rs:231-246 pops re-sort after every fill) — while
        # each sub-round stays fully parallel.
        ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        color_of = (ys % 2) * 2 + (xs % 2)

        def round_step(state):
            sums, counts, _, color = state
            filled = counts > 0.1
            mean = sums / counts[..., None]
            add_sum = jnp.zeros_like(sums)
            add_cnt = jnp.zeros_like(counts)
            nb_count = jnp.zeros_like(counts)
            for dx, dy in _INTERP_NEIGHBORS:
                scale = 1.0 - math.sqrt(dx * dx + dy * dy) * 0.5
                nb_filled = _shift2d(filled.astype(sums.dtype), dx, dy)
                nb_mean = _shift2d(mean, dx, dy)
                add_sum = add_sum + (scale * scale) * nb_mean * nb_filled[..., None]
                add_cnt = add_cnt + scale * nb_filled
                nb_count = nb_count + nb_filled
            # Priority batching: the reference pops cells most-filled-
            # neighbors-first (the BTreeSet order, motion_field.rs:231-246);
            # fill only the cells tied at the current maximum count AND in
            # the current parity color so the parallel order tracks the
            # sequential one.
            cand = (~filled) & (nb_count > 0.0)
            maxc = jnp.max(jnp.where(cand, nb_count, 0.0))
            gets_fill = cand & (nb_count >= maxc) & (color_of == color)
            new_sums = jnp.where(gets_fill[..., None], sums + add_sum, sums)
            new_counts = jnp.where(gets_fill, counts + add_cnt, counts)
            # A color round that fills nothing still "progresses" as long as
            # some candidate exists for another color; track fillable, not
            # filled-this-round.
            return new_sums, new_counts, jnp.any(cand), (color + 1) % 4

        def cond(state):
            _, counts, fillable, _ = state
            return jnp.logical_and(fillable, jnp.any(counts <= 0.1))

        sums, counts, _, _ = jax.lax.while_loop(
            cond,
            round_step,
            (self.sums, self.counts, jnp.array(True), jnp.array(0)),
        )
        return Densifier(sums, counts)


def _shift2d(a: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """Shift so that out[y, x] = a[y + dy, x + dx], zero-padded at borders."""
    pad_y = (max(-dy, 0), max(dy, 0))
    pad_x = (max(-dx, 0), max(dx, 0))
    pads = ((pad_y, pad_x) + ((0, 0),) * (a.ndim - 2))
    padded = jnp.pad(a, pads)
    h, w = a.shape[0], a.shape[1]
    return padded[max(dy, 0) : max(dy, 0) + h, max(dx, 0) : max(dx, 0) + w]


def densify(flow: SparseFlow, width: int, height: int) -> jnp.ndarray:
    """Sparse flow -> dense (H, W, 2) field by scatter-mean."""
    return Densifier.zeros(width, height).add_flow(flow).finalize()


def field_to_sparse(field: jnp.ndarray) -> SparseFlow:
    """Dense (H, W, 2) field -> sparse entries at pos (x/W, y/H).

    Matches ``MotionField::motion_iter`` (motion_field.rs:106-114), which is
    what detectors receive when fed a dense field.
    """
    h, w = field.shape[-3:-1]
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    pos = jnp.stack([xs / w, ys / h], axis=-1).astype(jnp.float32).reshape(-1, 2)
    motion = field.reshape(-1, 2)
    mask = jnp.ones((h * w,), dtype=jnp.float32)
    return SparseFlow(pos, motion, mask)


def grid_size_for(width: int, height: int, max_dim: int = 150) -> Tuple[int, int]:
    """Densified-grid size ≤ max_dim per side, preserving aspect.

    Matches cv-decoder's downsample target (cv-decoder/src/lib.rs:98-121):
    1920x1080 -> (150, 84).  Never exceeds the source dimensions.
    """
    if width >= height:
        gw = min(max_dim, width)
        gh = max(1, min(height, round(height * gw / width)))
    else:
        gh = min(max_dim, height)
        gw = max(1, min(width, round(width * gh / height)))
    return gw, gh


def _axis_scatter_matrix(n: int, g: int) -> jnp.ndarray:
    """(n, g) one-hot map of pixel index -> grid cell, round-half-up.

    Pixel centers at (i + 0.5)/n in [0,1]; cell = round(p * (g - 1)) — the
    same cell rule as :func:`flow_cell_index` / motion_field.rs:164-178.
    """
    import numpy as np

    return jnp.asarray(_axis_scatter_matrix_np(n, g))


def _axis_scatter_matrix_np(n: int, g: int):
    import numpy as np

    p = (np.arange(n) + 0.5) / n
    cell = np.floor(p * (g - 1) + 0.5).astype(np.int32)
    m = np.zeros((n, g), dtype=np.float32)
    m[np.arange(n), cell] = 1.0
    return m


def grid_downsample_field(field: jnp.ndarray, gw: int, gh: int) -> jnp.ndarray:
    """Dense (..., H, W, 2) field -> (..., gh, gw, 2) cell-mean field.

    The MXU formulation of the reference's downsample-densify (cv-decoder
    lib.rs:246-291: every pixel's vector scatter-meaned into a ≤150² grid):
    because the cell map is separable and monotone per axis, the scatter-mean
    is exactly ``S_yᵀ · field · S_x`` with per-axis one-hot matrices — two
    matmuls instead of a 2M-element scatter.
    """
    h, w = field.shape[-3], field.shape[-2]
    sy = _axis_scatter_matrix(h, gh)  # (H, gh)
    sx = _axis_scatter_matrix(w, gw)  # (W, gw)
    sums = jnp.einsum(
        "hg,...hwc,wk->...gkc", sy, field, sx, precision="highest"
    )
    counts = jnp.sum(sy, axis=0)[:, None] * jnp.sum(sx, axis=0)[None, :]
    return sums / jnp.maximum(counts, 1.0)[..., None]


def grid_scatter_plan_np(h: int, w: int, gh: int, gw: int, border_px: int = 0):
    """Static numpy pieces of the scatter-mean densify.

    Returns ``(sy, sx, counts, idx_y, idx_x)``: per-axis one-hot scatter
    matrices (``(h, gh)`` / ``(w, gw)``, border rows/cols zeroed), the
    per-cell valid-pixel ``counts`` (``(gh, gw)``, floored at 1), and the
    nearest-valid-cell replicate gathers (None when ``border_px == 0``).
    Shared by :func:`grid_downsample_uv` (XLA path) and the fused in-kernel
    densify (:func:`ofps_tpu.pallas.flow_refine.build_grid_plan`), so both
    paths compute the same cell partition by construction.
    """
    import numpy as np

    sy_np = _axis_scatter_matrix_np(h, gh)  # (H, gh)
    sx_np = _axis_scatter_matrix_np(w, gw)  # (W, gw)
    idx_y = idx_x = None
    if border_px > 0:
        m = min(border_px, (h - 1) // 2, (w - 1) // 2)

        def mask_axis(s_np, n, g):
            s_np = s_np.copy()
            s_np[:m] = 0.0
            s_np[n - m:] = 0.0
            col = s_np.sum(axis=0)  # valid pixels per grid cell
            valid = np.nonzero(col > 0)[0]
            idx = np.clip(np.arange(g), valid.min(), valid.max())
            return s_np, idx

        sy_np, idx_y = mask_axis(sy_np, h, gh)
        sx_np, idx_x = mask_axis(sx_np, w, gw)
    counts = np.maximum(
        sy_np.sum(axis=0)[:, None] * sx_np.sum(axis=0)[None, :], 1.0
    ).astype(np.float32)
    return sy_np, sx_np, counts, idx_y, idx_x


def grid_downsample_uv(
    u: jnp.ndarray,
    v: jnp.ndarray,
    gw: int,
    gh: int,
    norm_wh: Optional[Tuple[int, int]] = None,
    border_px: int = 0,
) -> jnp.ndarray:
    """Split-plane variant of :func:`grid_downsample_field`.

    ``u``/``v``: (..., H, W) flow components (bf16 accepted — the matmul
    upcasts on the fly, so the HBM read stays half-width).  ``norm_wh``
    additionally converts pixel units to the [0,1]-normalized decoder
    convention by (W, H) division, folded into the tiny grid-sized output
    instead of a full-resolution pass.  ``border_px`` excludes the outer
    pixel band from every cell mean (block matching has no valid
    correspondence there — :func:`ofps_tpu.ops.flow_pyramid.auto_margin`);
    cells wholly inside the band are replicated from the nearest valid
    cell.  Because the masking lives in the static scatter matrices and
    the replicate is a static gather over the tiny grid axes, it costs
    nothing at full resolution.  Returns (..., gh, gw, 2) float32.
    """
    h, w = u.shape[-2], u.shape[-1]
    sy_np, sx_np, counts_np, idx_y, idx_x = grid_scatter_plan_np(
        h, w, gh, gw, border_px
    )
    if idx_y is not None:
        idx_y, idx_x = jnp.asarray(idx_y), jnp.asarray(idx_x)
    sy, sx = jnp.asarray(sy_np), jnp.asarray(sx_np)
    counts = jnp.asarray(counts_np)

    def ds(x):
        t = jnp.einsum(
            "...hw,wk->...hk", x.astype(jnp.float32), sx, precision="highest"
        )
        return jnp.einsum("hg,...hk->...gk", sy, t, precision="highest")

    su = ds(u) / counts
    sv = ds(v) / counts
    if norm_wh is not None:
        su = su / norm_wh[0]
        sv = sv / norm_wh[1]
    out = jnp.stack([su, sv], axis=-1)
    if idx_y is not None:
        out = jnp.take(jnp.take(out, idx_y, axis=-3), idx_x, axis=-2)
    return out


def gaussian_blur(field: jnp.ndarray, ksize: int, sigma: float = 0.0) -> jnp.ndarray:
    """Separable Gaussian blur over an (H, W, C) field.

    Matches OpenCV defaults: ``sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8`` when
    sigma is unset (used by flow-extract/src/main.rs:69-127 with 11x11).
    """
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    r = ksize // 2
    xs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-(xs**2) / (2.0 * sigma**2))
    k = k / jnp.sum(k)
    # Reflect-101 padding like OpenCV's default border.
    def conv1d(a, axis):
        pads = [(0, 0)] * a.ndim
        pads[axis] = (r, r)
        ap = jnp.pad(a, pads, mode="reflect")
        out = jnp.zeros_like(a)
        for i in range(ksize):
            sl = [slice(None)] * a.ndim
            sl[axis] = slice(i, i + a.shape[axis])
            out = out + k[i] * ap[tuple(sl)]
        return out

    return conv1d(conv1d(field, 0), 1)
