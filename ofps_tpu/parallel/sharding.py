"""Mesh + sharding helpers for multi-stream scaling.

The reference is a single-node app whose only "data parallelism" axis is
absent (SURVEY.md §2.9: one stream at a time).  The TPU-native win is to
batch many video streams per chip and shard that stream axis — plus the
image width axis of the dense-flow compute — across a
:class:`jax.sharding.Mesh`, letting XLA insert the ICI collectives.

Axes:
* ``stream`` — data parallelism over independent video streams (the
  reference's missing multi-stream axis).
* ``space``  — spatial parallelism over image columns inside the dense-flow
  stencil (halo exchanges become XLA collective-permutes).

All constraints are optional: with ``shardings=None`` every function is a
plain single-device program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class StreamSharding(NamedTuple):
    """Sharding constraints applied inside the multi-stream pipeline step.

    Each field is a :class:`NamedSharding` or ``None`` (no constraint).
    """

    batch: Optional[NamedSharding] = None  # (B, ...) per-stream vectors
    image: Optional[NamedSharding] = None  # (B, H, W) frames
    flow: Optional[NamedSharding] = None  # (B, H, W, 2) dense flow


def constrain(x, sharding: Optional[NamedSharding]):
    """``with_sharding_constraint`` that no-ops outside a mesh context."""
    if sharding is None:
        return x
    return jax.lax.with_sharding_constraint(x, sharding)


def make_stream_mesh(
    n_devices: Optional[int] = None, space: Optional[int] = None
) -> Mesh:
    """A ("stream", "space") mesh over the first ``n_devices`` devices.

    ``space`` defaults to 2 when the device count allows it, else 1; the
    stream (data-parallel) axis gets the rest.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if space is None:
        space = 2 if n % 2 == 0 and n >= 4 else 1
    assert n % space == 0, (n, space)
    arr = np.array(devs).reshape(n // space, space)
    return Mesh(arr, ("stream", "space"))


def stream_sharding(mesh: Mesh) -> StreamSharding:
    """Default constraint set: batch over 'stream', width over 'space'."""
    return StreamSharding(
        batch=NamedSharding(mesh, P("stream")),
        image=NamedSharding(mesh, P("stream", None, "space")),
        flow=NamedSharding(mesh, P("stream", None, "space", None)),
    )


def shard_put(tree, sharding: Optional[NamedSharding]):
    """``device_put`` a pytree of batch-leading arrays onto a sharding."""
    if sharding is None:
        return tree
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1 else x,
        tree,
    )
