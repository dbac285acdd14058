"""Substage profile of the libmv estimator on the current backend.

The all-4-estimator serving configuration is now libmv-bound
(PARITY_BENCH: 6.66 ms/frame vs multiview 4.47 after its progressive-
scoring round).  This breaks one libmv step into its stages — primary
robust solve, GN pose polish, chain lookup (find_nearest), chain
rasterize, secondary (chained-field) solve — each timed as K scanned
iterations of a stage-truncated step on the PARITY_BENCH 150x84 field,
so differences between consecutive rows are per-stage costs.

    python scripts/profile_libmv.py            # axon TPU
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

ITERS = 48


def main():
    from ofps_tpu.core.camera import StandardCamera
    from ofps_tpu.estimators.libmv import (
        LibmvParams,
        PrevMotion,
        _pose_from_field,
        estimate_libmv,
        find_nearest,
        rasterize_prev,
    )

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from synthetic import euler_deg, get_grid, synthetic_field

    cam = StandardCamera.create(150.0 / 84.0, 90.0)
    grid = get_grid(150, 84, cam)
    flow = synthetic_field(cam, euler_deg(0.3, -0.2, 0.5), grid=grid,
                           capacity=150 * 84)
    params = LibmvParams()
    state0 = PrevMotion.empty()

    def timed(label, fn):
        @jax.jit
        def run(key):
            def body(c, k):
                return c + fn(k), ()

            keys = jax.random.split(key, ITERS)
            out, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
            return out

        k = jax.random.PRNGKey(0)
        float(jax.device_get(run(k)))  # compile + warm
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            float(jax.device_get(run(k)))
            best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
        print(f"{label:<22s}{best:8.3f} ms/iter", flush=True)
        return best

    pos, motion, w = flow.pos, flow.motion, flow.mask

    # 1. primary robust solve alone (no GN polish).
    p_nogn = params._replace(gn_polish=False)
    timed("primary_solve", lambda k: jnp.sum(
        _pose_from_field(k, p_nogn, cam, pos, motion, w)[0])
        + jnp.sum(_pose_from_field(k, p_nogn, cam, pos, motion, w)[1]))

    # 2. + GN polish.
    timed("primary_gn", lambda k: jnp.sum(
        _pose_from_field(k, params, cam, pos, motion, w)[0])
        + jnp.sum(_pose_from_field(k, params, cam, pos, motion, w)[1]))

    # 3. chain lookup over the full field.
    st = PrevMotion(
        pos=jnp.zeros((40, 40, 2)).at[...].set(0.3),
        motion=jnp.zeros((40, 40, 2)).at[...].set(0.01),
        valid=jnp.ones((40, 40)),
        rot=jnp.asarray([1.0, 0, 0, 0]),
        tr=jnp.zeros(3),
        has=jnp.ones(()),
    )
    # *1e-9, not *0.0: a zero multiplier folds, the body becomes loop-
    # invariant, and XLA hoists the whole stage out of the scan.
    timed("find_nearest", lambda k: jnp.sum(
        find_nearest(st, pos + jax.random.uniform(k, ()) * 1e-9, w)[1]))

    # 4. rasterize (the two scatter passes of one step).
    timed("rasterize_x2", lambda k: jnp.sum(
        rasterize_prev(pos + jax.random.uniform(k, ()) * 1e-9, motion, w)[1])
        + jnp.sum(rasterize_prev(
            pos + jax.random.uniform(k, ()) * 2e-9, motion, w)[2]))

    # 5. secondary solve on a 1600-point chained field.
    cp = st.pos.reshape(-1, 2)
    cm = st.motion.reshape(-1, 2)
    cw = st.valid.reshape(-1)
    timed("chained_solve", lambda k: jnp.sum(
        _pose_from_field(k, params, cam, cp, cm, cw)[0]))

    # 6. the whole step for reference.
    def whole(k):
        r, t, st2 = estimate_libmv(k, params, state0, flow, cam)
        return jnp.sum(r) + jnp.sum(t) + jnp.sum(st2.rot)

    timed("whole_step", whole)


if __name__ == "__main__":
    main()
