"""Block-subdivision motion detector.

Behavioral spec: ``/root/reference/block-motion-detector/src/lib.rs`` —
densify motion vectors into a coarse grid, threshold per-cell mean motion
magnitude, find the largest 8-connected motion island, report it when its
area covers at least ``min_size`` of the frame.

TPU-first: densification is a scatter-mean, the flood fill becomes parallel
min-label propagation (:mod:`ofps_tpu.ops.components`), and the whole
detector is one jittable fixed-shape function that vmaps across streams.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from ofps_tpu.core.motion import Densifier, SparseFlow
from ofps_tpu.detectors.base import DetectionResult, DetectorInstance, register
from ofps_tpu.ops.components import largest_component


class BlockMotionParams(NamedTuple):
    """Properties parity with lib.rs:29-46."""

    min_size: float = 0.05
    subdivide: int = 3
    target_motion: float = 0.003


def block_dim(params: BlockMotionParams) -> int:
    """Grid side length: ceil(1 / (sqrt(min_size) / subdivide)) (lib.rs:52-54)."""
    block_width = math.sqrt(params.min_size) / params.subdivide
    return math.ceil(1.0 / block_width)


def _detect_from_cells(
    params: BlockMotionParams, field: jnp.ndarray, target_motion
) -> DetectionResult:
    """Shared tail: thresold + largest island on the (dim, dim, 2) means."""
    dim = block_dim(params)
    if target_motion is None:
        target_motion = params.target_motion
    # target_motion may be a traced scalar (runtime-mutable property);
    # min_size stays static because it sizes the grid.
    moving = jnp.linalg.norm(field, axis=-1) >= target_motion
    mask, area = largest_component(moving)
    detected = (area.astype(jnp.float32) / float(dim * dim)) >= params.min_size
    island_field = jnp.where(mask[..., None], field, 0.0)
    return DetectionResult(detected=detected, area=area, field=island_field, mask=mask)


def detect_motion(
    params: BlockMotionParams, flow: SparseFlow, target_motion=None
) -> DetectionResult:
    dim = block_dim(params)
    field = Densifier.zeros(dim, dim).add_flow(flow).finalize()  # (dim, dim, 2)
    return _detect_from_cells(params, field, target_motion)


def _axis_cell_matrix_np(src: int, dst: int):
    """(src, dst) one-hot lattice-row -> detector-cell map.

    Replicates :func:`ofps_tpu.core.motion.flow_cell_index` in f32 on the
    :func:`field_to_sparse` lattice positions (j / src), so the dense fast
    path lands every entry in exactly the cell the sparse path would.
    """
    import numpy as np

    pos = (np.arange(src, dtype=np.float32) / np.float32(src)).astype(
        np.float32
    )
    c = np.floor(pos * np.float32(dst - 1) + np.float32(0.5)).astype(np.int64)
    m = np.zeros((src, dst), np.float32)
    m[np.arange(src), np.clip(c, 0, dst - 1)] = 1.0
    return m


def detect_motion_field(
    params: BlockMotionParams, field: jnp.ndarray, target_motion=None
) -> DetectionResult:
    """Dense fast path: detect on a regular-lattice (gh, gw, 2) field.

    Exactly ``detect_motion(params, field_to_sparse(field))``, but because
    the positions are the static lattice, the scatter-mean densify is two
    STATIC separable one-hot matmuls (~0.5 MMAC) instead of a 12,600-entry
    one-hot materialization (~30 MB of HBM round-trips per stream at B=8 —
    the bulk of the detector's 0.26 ms/frame, scripts/profile_pipeline.py
    det_densify).  Gated against the sparse path in tests/test_detector.py.
    """
    from ofps_tpu.core.motion import F32_EPS

    dim = block_dim(params)
    gh, gw = field.shape[-3], field.shape[-2]
    sy = jnp.asarray(_axis_cell_matrix_np(gh, dim))
    sx = jnp.asarray(_axis_cell_matrix_np(gw, dim))
    sums = jnp.einsum(
        "hg,hwc,wk->gkc", sy, field, sx, precision="highest"
    )
    counts = (
        jnp.sum(sy, axis=0)[:, None] * jnp.sum(sx, axis=0)[None, :] + F32_EPS
    )
    return _detect_from_cells(params, sums / counts[..., None], target_motion)


@register("block_motion")
def make_block_motion(**kwargs) -> DetectorInstance:
    params = BlockMotionParams(**kwargs)
    return DetectorInstance(
        name="block_motion",
        params=params,
        detect=lambda flow, props=None: detect_motion(
            params, flow, target_motion=(props or {}).get("target_motion")
        ),
        dyn_defaults=lambda: {
            "target_motion": jnp.float32(params.target_motion)
        },
        detect_field=lambda field, props=None: detect_motion_field(
            params, field, target_motion=(props or {}).get("target_motion")
        ),
    )
