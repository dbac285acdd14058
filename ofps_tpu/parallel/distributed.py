"""Multi-host (DCN-scale) initialization and stream sharding.

The reference is a single-machine app; its closest analog is "run one suite
per machine".  The TPU-native scale-out story (SURVEY.md §2.9 ICI/DCN row)
is: every host runs the SAME program, `jax.distributed` stitches their
device sets into one global mesh, and the `stream` axis of
:func:`ofps_tpu.parallel.sharding.make_stream_mesh` spans hosts — each host
decodes/feeds its own streams while XLA keeps collectives on ICI within a
host-local `space` axis and only the (rare) cross-stream reductions ride
DCN.

Recipe (every host, same binary):

    OFPS_TPU_COORDINATOR=host0:8476 \\
    OFPS_TPU_NUM_PROCESSES=4 \\
    OFPS_TPU_PROCESS_ID=$RANK  python my_serving_job.py

    from ofps_tpu.parallel import distributed
    distributed.maybe_initialize()          # no-op unless env vars are set
    mesh = distributed.global_stream_mesh() # spans all hosts' devices
    batch = distributed.host_local_batch(mesh, my_local_frames)  # global arr

On TPU pods with the standard launcher the env vars are unnecessary —
``jax.distributed.initialize()`` auto-detects — so ``maybe_initialize``
also honors ``OFPS_TPU_DIST=auto``.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_initialized = False


def maybe_initialize() -> bool:
    """Env-var-driven ``jax.distributed.initialize``.

    Reads ``OFPS_TPU_COORDINATOR`` (host:port), ``OFPS_TPU_NUM_PROCESSES``
    and ``OFPS_TPU_PROCESS_ID``; or ``OFPS_TPU_DIST=auto`` for launcher
    auto-detection.  Returns True if the distributed runtime was (already)
    initialized, False when the env selects single-process mode.

    Must run BEFORE the first jax array/device operation.
    """
    global _initialized
    if _initialized:
        return True
    coord = os.environ.get("OFPS_TPU_COORDINATOR")
    auto = os.environ.get("OFPS_TPU_DIST") == "auto"
    if not coord and not auto:
        return False
    import jax

    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["OFPS_TPU_NUM_PROCESSES"]),
            process_id=int(os.environ["OFPS_TPU_PROCESS_ID"]),
        )
    else:
        jax.distributed.initialize()
    _initialized = True
    return True


def global_stream_mesh(space: Optional[int] = None):
    """("stream", "space") mesh over the GLOBAL device set.

    Devices are ordered host-major (jax.devices() groups by process), so
    the outer ``stream`` axis naturally places whole streams on single
    hosts and host-local ICI carries the inner ``space`` axis — DCN only
    sees traffic if a stream's space axis is forced across hosts.
    """
    from ofps_tpu.parallel.sharding import make_stream_mesh

    if space is None:
        import jax

        # Keep the space axis within one host: it carries halo exchanges.
        local = jax.local_device_count()
        space = 2 if local % 2 == 0 and local >= 2 else 1
    return make_stream_mesh(space=space)


def host_local_batch(mesh, local_tree, axis: str = "stream"):
    """Assemble a global batch from per-host local stream data.

    Each process passes its OWN streams' arrays (leading axis = its local
    share of the global batch); returns global jax.Arrays sharded over
    ``axis`` without any cross-host transfer of the data itself.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def one(x):
        if not hasattr(x, "shape") or getattr(x, "ndim", 0) < 1:
            return x
        spec = P(axis, *([None] * (np.ndim(x) - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x)
        )

    import jax.tree_util as jtu

    return jtu.tree_map(one, local_tree)
