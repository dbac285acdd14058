"""Estimator protocol, registry, and pose integration.

Behavioral spec: ``/root/reference/ofps/src/estimator.rs`` (the ``Estimator``
trait) and the plugin registry semantics of
``/root/reference/ofps/src/plugins/mod.rs`` (``create_estimator(name, arg)``).

TPU-first design: estimators are *pure functions* over fixed-shape arrays.
Each estimator module registers a factory under the same name the reference
plugin exports ("almeida", "homography", "multiview", "libmv"), returning an
:class:`EstimatorInstance` that carries

* ``params``   — static configuration (Properties parity),
* ``init()``   — initial carried state pytree (stateless estimators: ``()``),
* ``estimate(state, flow, camera, key) -> (quat, t, state)`` — jittable.

State is threaded explicitly (scan-style) instead of ``&mut self``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax.numpy as jnp

from ofps_tpu.core import quat
from ofps_tpu.core.motion import SparseFlow

_REGISTRY: Dict[str, Callable[..., "EstimatorInstance"]] = {}


@dataclasses.dataclass
class EstimatorInstance:
    """A configured estimator: pure functions + static params."""

    name: str
    params: Any
    init: Callable[[], Any]
    # (state, flow, camera, key, move_magnitude=None, props=None)
    #   -> (rotation quat, translation vec3, state)
    estimate: Callable[..., Tuple[jnp.ndarray, jnp.ndarray, Any]]
    # () -> dict of *dynamic* property scalars (continuous-valued params the
    # reference pushes into a RUNNING plugin every frame,
    # app/utils/properties.rs:5-18).  Traced through the step: mutating them
    # takes effect next frame with NO re-jit; shape-affecting params (batch
    # sizes, iteration counts, algorithm switches) stay static in ``params``.
    dyn_defaults: Callable[[], dict] = dataclasses.field(
        default_factory=lambda: (lambda: {})
    )

    def __post_init__(self):
        # Externally-registered estimators may predate the optional
        # move_magnitude=/props= kwargs; adapt instead of TypeError-ing.
        from ofps_tpu.core.plugins import adapt_optional_kwargs

        self.estimate = adapt_optional_kwargs(
            self.estimate, ("move_magnitude", "props", "dense")
        )

    def motion_step(
        self, state, flow: SparseFlow, camera, key, rot, pos,
        move_magnitude=None, props=None,
    ):
        """Estimate and integrate into (rot, pos) — estimator.rs:38-53.

        ``pos += rot * tr; rot = r * rot``; returns (rot, pos, state).
        ``move_magnitude`` is the optional translation-magnitude hint of
        estimator.rs:18-23 (None = unhinted, matching ``Option<f32>``).
        """
        r, tr, state = self.estimate(
            state, flow, camera, key, move_magnitude=move_magnitude,
            props=props,
        )
        pos = pos + quat.rotate_vec(rot, tr)
        rot = quat.mul(r, rot)
        return rot, pos, state


def register(name: str):
    def deco(factory):
        _REGISTRY[name] = factory
        return factory

    return deco


def create_estimator(name: str, **kwargs) -> EstimatorInstance:
    """Registry lookup matching ``PluginStore::create_estimator`` semantics."""
    _load_builtin_estimators()
    if name not in _REGISTRY:
        raise KeyError(f"unknown estimator {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def _load_builtin_estimators():
    """Import builtin estimator modules so their factories register."""
    import importlib

    for mod in ("almeida", "homography", "multiview", "libmv"):
        try:
            importlib.import_module(f"ofps_tpu.estimators.{mod}")
        except ImportError:
            pass
    from ofps_tpu.core.plugins import load_external_plugins

    load_external_plugins()


def available_estimators():
    _load_builtin_estimators()
    return sorted(_REGISTRY)
