"""One process of the multi-host (DCN-scale) smoke test.

This is the documented recipe from ``ofps_tpu/parallel/distributed.py`` run
for real: every host executes THIS SAME program; ``maybe_initialize`` reads
``OFPS_TPU_COORDINATOR`` / ``OFPS_TPU_NUM_PROCESSES`` / ``OFPS_TPU_PROCESS_ID``
and stitches the per-process device sets into one global mesh.  Each process
contributes its OWN streams' frames via ``host_local_batch`` (no cross-host
copy of the data), then a jitted global reduction runs over the full
``stream`` axis — on a TPU pod the same code path rides ICI/DCN collectives.

Launched by ``tests/test_multihost.py`` as two local CPU processes
(2 virtual devices each -> a 4-device global mesh).
"""

import os
import sys

import numpy as np


def main() -> int:
    from ofps_tpu.parallel import distributed

    if not distributed.maybe_initialize():
        print("MULTIHOST_FAIL no coordinator env", flush=True)
        return 1

    import jax
    import jax.numpy as jnp

    pid = jax.process_index()
    nproc = jax.process_count()
    mesh = distributed.global_stream_mesh(space=1)

    # Two local streams per host; stream i (global) carries value i + 1.
    local_streams = 2
    base = pid * local_streams
    local = np.stack(
        [np.full((4, 8), float(base + s + 1), np.float32)
         for s in range(local_streams)]
    )
    batch = distributed.host_local_batch(mesh, {"frames": local})

    g = batch["frames"]
    assert g.shape[0] == nproc * local_streams, g.shape

    @jax.jit
    def global_stats(tree):
        x = tree["frames"]
        return jnp.sum(x), jnp.max(jnp.mean(x, axis=(1, 2)))

    total, maxmean = (float(v) for v in jax.device_get(global_stats(batch)))
    n_global = nproc * local_streams
    want_total = sum(
        (i + 1) * 4 * 8 for i in range(n_global)
    )
    assert abs(total - want_total) < 1e-3, (total, want_total)
    assert abs(maxmean - n_global) < 1e-3, maxmean

    print(
        f"MULTIHOST_OK pid={pid}/{nproc} devices={len(jax.devices())} "
        f"mesh={dict(zip(mesh.axis_names, mesh.devices.shape))} "
        f"total={total}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
