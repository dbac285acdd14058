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


def detect_motion(
    params: BlockMotionParams, flow: SparseFlow, target_motion=None
) -> DetectionResult:
    dim = block_dim(params)
    if target_motion is None:
        target_motion = params.target_motion
    field = Densifier.zeros(dim, dim).add_flow(flow).finalize()  # (dim, dim, 2)
    # target_motion may be a traced scalar (runtime-mutable property);
    # min_size stays static because it sizes the grid.
    moving = jnp.linalg.norm(field, axis=-1) >= target_motion
    mask, area = largest_component(moving)
    detected = (area.astype(jnp.float32) / float(dim * dim)) >= params.min_size
    island_field = jnp.where(mask[..., None], field, 0.0)
    return DetectionResult(detected=detected, area=area, field=island_field, mask=mask)


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
    )
