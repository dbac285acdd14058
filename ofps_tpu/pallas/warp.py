"""Pallas TPU kernel: bilinear backward warp without per-element gathers.

XLA lowers a 1080p bilinear warp (the inner loop of coarse-to-fine flow,
spec: cv-decoder's Farneback warm start) to a scalar-core gather that costs
>100 ms/frame on v5e.  This kernel restructures the warp TPU-natively:

* each (BH, BW) output block computes the **rounded mean flow** of its block;
* the **row** offset is applied by an 8-aligned dynamic-slice DMA from the
  (edge-padded) source image — Mosaic requires sublane-aligned starts, the
  <=7-row alignment slack joins the vertical tap window;
* the **column** offset is applied as a one-hot **matmul on the MXU** — a
  comparison matrix built from iotas shifts the tile by an arbitrary dynamic
  amount at matrix-unit speed, sidestepping lane-alignment constraints;
* the per-pixel **residual** displacement (flow minus block mean, clamped to
  +-RES pixels) is two separable passes of statically-sliced fused
  multiply-adds with triangle (bilinear) weights — pure VPU work.

The source is edge-padded by P0 so border blocks keep the base-offset
invariant; out-of-image samples resolve to replicated edge pixels, matching
the XLA reference's coordinate clamp.  Residuals beyond +-RES (strong
intra-block motion variance) clamp, trading exactness at motion boundaries
for a gather-free hot loop; the pyramid's per-level search absorbs the clamp
error at the next refinement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RES = 7  # max per-pixel residual from the block mean (pixels)
_PAD = RES + 1
_YSLACK = 8  # row-DMA alignment slack
_P0 = 72  # edge padding of the source image; keeps the block-offset DMA
#           window in bounds for mean flows up to +-64 px


def _tri(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def _warp_kernel(img_hbm, u_ref, v_ref, out_ref, scratch, sem, *, bh, bw, hp, wp):
    b = pl.program_id(0)
    bi = pl.program_id(1)
    bj = pl.program_id(2)

    u = u_ref[0]
    v = v_ref[0]

    mean_u = jnp.round(jnp.mean(u)).astype(jnp.int32)
    mean_v = jnp.round(jnp.mean(v)).astype(jnp.int32)

    block_top = bi * bh + _P0  # padded-image coords
    block_left = bj * bw + _P0

    tile_h = bh + 2 * _PAD + _YSLACK
    tile_w = bw + 2 * _PAD

    want_row = jnp.clip(block_top + mean_v - _PAD, 0, hp - tile_h)
    base_row = pl.multiple_of((want_row // 8) * 8, 8)
    base_col = jnp.clip(block_left + mean_u - _PAD, 0, wp - tile_w)

    dma = pltpu.make_async_copy(
        img_hbm.at[b, pl.ds(base_row, tile_h), :],
        scratch,
        sem,
    )
    dma.start()

    # Column shift via one-hot matmul: tile2[y, c] = scratch[y, base_col + c].
    col_src = jax.lax.broadcasted_iota(jnp.int32, (wp, tile_w), 0)
    col_dst = jax.lax.broadcasted_iota(jnp.int32, (wp, tile_w), 1)
    shift_mat = (col_src == col_dst + base_col).astype(jnp.float32)

    dy0 = (block_top - base_row).astype(jnp.float32)  # in [PAD-meanv.., ..]
    dx0 = (block_left - base_col).astype(jnp.float32)

    dma.wait()
    tile2 = jnp.dot(scratch[...], shift_mat, preferred_element_type=jnp.float32)

    # Vertical pass over the x-extended tile; v is edge-padded horizontally
    # (exact for block-smooth flow).
    v_ext = jnp.concatenate(
        [
            jnp.repeat(v[:, :1], _PAD, axis=1),
            v,
            jnp.repeat(v[:, -1:], _PAD, axis=1),
        ],
        axis=1,
    )  # (bh, tile_w)
    vv = jnp.clip(dy0 + v_ext, 0.0, float(tile_h - bh - 1))
    c = jnp.zeros((bh, tile_w), jnp.float32)
    for i in range(tile_h - bh):
        c = c + _tri(vv - i) * tile2[i : i + bh, :]

    # Horizontal pass.
    uu = jnp.clip(dx0 + u, 0.0, float(tile_w - bw - 1))
    out = jnp.zeros((bh, bw), jnp.float32)
    for j in range(tile_w - bw):
        out = out + _tri(uu - j) * c[:, j : j + bw]

    out_ref[0] = out


def warp_bilinear_tpu(img: jnp.ndarray, flow: jnp.ndarray, bh: int = 32, bw: int = 128):
    """Backward warp ``img`` by ``flow`` (pixels).  (H, W), (H, W, 2) -> (H, W).

    H must be divisible by ``bh`` and W by ``bw``.
    """
    h, w = img.shape[-2], img.shape[-1]
    assert h % bh == 0 and w % bw == 0, (h, w, bh, bw)
    batch = img.shape[:-2]
    imgs = img.reshape((-1,) + img.shape[-2:])
    us = flow[..., 0].reshape((-1, h, w))
    vs = flow[..., 1].reshape((-1, h, w))
    nb = imgs.shape[0]

    # Pad by P0 on all sides, then round the padded width up to a lane
    # multiple (Mosaic requires 128-aligned slice widths).  The batch is a
    # native leading grid dimension (vmap over pallas_call trips a jax-0.9
    # lowering-cache bug when nested in control flow).
    wp = w + 2 * _P0
    extra_w = (-wp) % 128
    wp += extra_w
    imgp = jnp.pad(
        imgs, [(0, 0), (_P0, _P0), (_P0, _P0 + extra_w)], mode="edge"
    )
    hp = h + 2 * _P0

    kernel = functools.partial(_warp_kernel, bh=bh, bw=bw, hp=hp, wp=wp)
    fn = pl.pallas_call(
        kernel,
        grid=(nb, h // bh, w // bw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # full padded img, manual DMA
            pl.BlockSpec((1, bh, bw), lambda b, i, j: (b, i, j)),
            pl.BlockSpec((1, bh, bw), lambda b, i, j: (b, i, j)),
        ],
        out_specs=pl.BlockSpec((1, bh, bw), lambda b, i, j: (b, i, j)),
        out_shape=jax.ShapeDtypeStruct((nb, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bh + 2 * _PAD + _YSLACK, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = fn(imgp, us, vs)
    return out.reshape(batch + (h, w)) if batch else out[0]
