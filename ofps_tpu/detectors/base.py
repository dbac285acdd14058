"""Detector protocol and registry.

Behavioral spec: ``/root/reference/ofps/src/detection.rs`` (the ``Detector``
trait: ``detect_motion(&[MotionEntry]) -> Option<(usize, MotionField)>``) and
the plugin registry naming of ``plugins/mod.rs``.

The jittable detector returns fixed-shape ``DetectionResult`` (an Option is
not a TPU type); ``detected`` carries the Some/None distinction.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple

import jax.numpy as jnp

_REGISTRY: Dict[str, Callable[..., "DetectorInstance"]] = {}


class DetectionResult(NamedTuple):
    """Fixed-shape equivalent of ``Option<(area, MotionField)>``."""

    detected: jnp.ndarray  # bool scalar
    area: jnp.ndarray  # int32 scalar (number of blocks in the motion island)
    field: jnp.ndarray  # (H, W, 2) motion field of the winning island
    mask: jnp.ndarray  # (H, W) bool island membership


@dataclasses.dataclass
class DetectorInstance:
    name: str
    params: Any
    # (flow: SparseFlow, props=None) -> DetectionResult
    detect: Callable[..., DetectionResult]

    def __post_init__(self):
        # Externally-registered detectors may predate the optional props=
        # kwarg; adapt instead of TypeError-ing (core.plugins contract).
        from ofps_tpu.core.plugins import adapt_optional_kwargs

        self.detect = adapt_optional_kwargs(self.detect, ("props",))
        if self.detect_field is not None:
            self.detect_field = adapt_optional_kwargs(
                self.detect_field, ("props",)
            )
    # () -> dict of *dynamic* property scalars (continuous-valued params the
    # reference pushes into a RUNNING plugin every frame,
    # app/utils/properties.rs:5-18).  These are jnp scalars traced through
    # the step, so mutating them takes effect next frame with NO re-jit;
    # shape-affecting params stay static in ``params``.
    dyn_defaults: Callable[[], dict] = lambda: {}
    # Optional dense fast path: (field (gh, gw, 2), props=None) ->
    # DetectionResult.  When the caller holds the REGULAR-LATTICE field the
    # sparse entries came from (StreamPipeline's densified grid), the
    # position->cell map is static and the densify collapses to two static
    # separable matmuls — must agree exactly with detect(field_to_sparse(f)).
    detect_field: Callable[..., DetectionResult] | None = None


def register(name: str):
    def deco(factory):
        _REGISTRY[name] = factory
        return factory

    return deco


def create_detector(name: str, **kwargs) -> DetectorInstance:
    _load_builtin_detectors()
    if name not in _REGISTRY:
        raise KeyError(f"unknown detector {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def _load_builtin_detectors():
    import importlib

    for mod in ("block_motion",):
        try:
            importlib.import_module(f"ofps_tpu.detectors.{mod}")
        except ImportError:
            pass
    from ofps_tpu.core.plugins import load_external_plugins

    load_external_plugins()


def available_detectors():
    _load_builtin_detectors()
    return sorted(_REGISTRY)
