"""Per-stage cost attribution for the serving pipeline step.

Times each pipeline stage in isolation on the live backend using the
scan-chained timing recipe from bench.py (K iterations inside one jit, sync
via a scalar device_get).  Run on the axon TPU from /root/repo:

    python scripts/profile_pipeline.py [--iters 96] [--batch 1]

Stages:
  flow        dense pyramid flow at 1080p
  densify     grid_downsample_uv 1080p -> 150x84
  almeida     full almeida-RANSAC estimate on the 150x84 grid
  alm_fits    RANSAC minimal fits + scoring only (no final refit)
  alm_refit   one full-N weighted LSQ refit only
  homography  full homography estimate on the grid
  detector    block-motion detect on the grid
  step        the complete StreamPipeline step (reference total)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from ofps_tpu.core.camera import StandardCamera
from ofps_tpu.core.motion import SparseFlow, field_to_sparse, grid_downsample_uv
from ofps_tpu.detectors.base import create_detector
from ofps_tpu.estimators.almeida import (
    AlmeidaParams,
    solve_ypr_ransac,
    solve_ypr_weighted,
)
from ofps_tpu.estimators.base import create_estimator
from ofps_tpu.ops.flow_pyramid import FlowParams, dense_flow_warm
from ofps_tpu.parallel.stream import StreamPipeline


def timed_scan(fn, carry0, iters, repeats=3):
    """Chain fn (carry -> carry, checksum) iters times inside one jit."""

    @jax.jit
    def run(carry):
        def body(c, _):
            c, s = fn(c)
            return c, s

        c, ss = jax.lax.scan(body, carry, None, length=iters)
        return jnp.sum(ss[-1]) + jnp.sum(ss[0])

    float(jax.device_get(run(carry0)))  # compile + warm
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jax.device_get(run(carry0)))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=96)
    ap.add_argument("--stages", default=None, help="comma list to run")
    args = ap.parse_args()

    b, h, w = args.batch, 1080, 1920
    gw, gh = 150, 84
    n = gw * gh
    camera = StandardCamera.create(w / h, 90.0)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    i1 = jax.random.uniform(k1, (b, h, w), jnp.float32, 0.0, 255.0)
    i2 = jnp.roll(i1, 3, axis=-1) + jax.random.uniform(
        k2, (b, h, w), jnp.float32, -2.0, 2.0
    )
    u0 = jax.random.uniform(k3, (b, h, w), jnp.float32, -3.0, 3.0)
    v0 = jnp.roll(u0, 1, axis=-1)
    grid = grid_downsample_uv(u0, v0, gw, gh, norm_wh=(w, h))
    sparse = jax.vmap(field_to_sparse)(grid)
    params = FlowParams()
    alm = AlmeidaParams()

    results = {}
    want = set(args.stages.split(",")) if args.stages else None

    def stage(name, fn, carry0):
        if want is not None and name not in want:
            return
        dt = timed_scan(fn, carry0, args.iters)
        results[name] = round(dt * 1e6, 1)
        print(f"{name:12s} {dt*1e3:8.3f} ms/iter", file=sys.stderr)

    # flow
    def flow_fn(c):
        warm, s = c
        (u, v), warm = dense_flow_warm(i1, i2, params, warm=warm)
        return (warm, s), jnp.sum(u) + jnp.sum(v)

    (u, v), warm0 = dense_flow_warm(i1, i2, params)
    stage("flow", flow_fn, (warm0, jnp.float32(0)))

    # densify (feed it evolving input so scan iterations are not CSE'd)
    def dens_fn(c):
        uu, vv = c
        g = grid_downsample_uv(uu, vv, gw, gh, norm_wh=(w, h))
        s = jnp.sum(g)
        return (uu + s * 1e-9, vv), s

    stage("densify", dens_fn, (u0, v0))

    # almeida full
    def alm_fn(c):
        sp, k = c
        k, sub = jax.random.split(k)
        keys = jax.random.split(sub, b)
        def one(fl, kk):
            # dense=True: the serving grid field's mask is statically
            # all-valid (what StreamPipeline._consume passes).
            return solve_ypr_ransac(
                kk, camera, fl, alm.num_iters, alm.inlier_angle_deg,
                alm.ransac_samples, dense=True,
            )
        q = jax.vmap(one)(sp, keys)
        s = jnp.sum(q)
        sp = sp._replace(motion=sp.motion + s * 1e-12)
        return (sp, k), s

    stage("almeida", alm_fn, (sparse, jax.random.PRNGKey(1)))

    # almeida substages: sampling / minimal fits / eval scoring
    from ofps_tpu.estimators.almeida import solve_ypr_weighted as _ypr
    from ofps_tpu.ops.robust import sample_indices as _sample_indices

    def samp_fn(c):
        sp, k = c
        k, sub = jax.random.split(k)
        def one(fl, kk):
            return jnp.sum(
                _sample_indices(kk, fl.mask, alm.num_iters, 3, dense=True)
            )
        s = jnp.sum(jax.vmap(one)(sp, jax.random.split(sub, b)))
        return (sp._replace(motion=sp.motion + s * 1e-12), k), s

    stage("alm_sample", samp_fn, (sparse, jax.random.PRNGKey(4)))

    def fits_fn(c):
        sp, k = c
        k, sub = jax.random.split(k)
        def one(fl, kk):
            idx = _sample_indices(kk, fl.mask, alm.num_iters, 3, dense=True)
            fits = jax.vmap(
                lambda p_, m_, w_: _ypr(camera, p_, m_, w_)
            )(fl.pos[idx], fl.motion[idx], fl.mask[idx])
            return jnp.sum(fits)
        s = jnp.sum(jax.vmap(one)(sp, jax.random.split(sub, b)))
        return (sp._replace(motion=sp.motion + s * 1e-12), k), s

    stage("alm_fits", fits_fn, (sparse, jax.random.PRNGKey(5)))

    # almeida refit only (the full-N 30-iteration LSQ)
    def refit_fn(c):
        sp = c
        def one(fl):
            return solve_ypr_weighted(camera, fl.pos, fl.motion, fl.mask)
        q = jax.vmap(one)(sp)
        s = jnp.sum(q)
        return sp._replace(motion=sp.motion + s * 1e-12), s

    stage("alm_refit", refit_fn, sparse)

    # homography full
    hom = create_estimator("homography")

    def hom_fn(c):
        sp, k = c
        k, sub = jax.random.split(k)
        keys = jax.random.split(sub, b)
        q, t, _ = jax.vmap(
            lambda fl, kk: hom.estimate((), fl, camera, kk, dense=True)
        )(sp, keys)
        s = jnp.sum(q)
        return (sp._replace(motion=sp.motion + s * 1e-12), k), s

    stage("homography", hom_fn, (sparse, jax.random.PRNGKey(2)))

    # homography substages: robust_fit with/without the LO refits (the
    # tail = full - hom_fit is the final full-N DLT + GN polish + sign
    # disambiguation + decomposition).
    from ofps_tpu.estimators.homography import HomographyParams
    from ofps_tpu.ops.homography import (
        dlt_homography,
        homography_transfer_error,
    )
    from ofps_tpu.ops.robust import ransac_budget, robust_fit

    hp_ = HomographyParams()

    def _hom_minimal(x1s, x2s, ws):
        return dlt_homography(x1s, x2s, ws)[None], jnp.ones((1,), bool)

    def _hom_fit_stage(name, seed, lo):
        def fit_fn(c):
            sp, k = c
            k, sub = jax.random.split(k)

            def one(fl, kk):
                res = robust_fit(
                    kk, fl.pos, fl.pos + fl.motion, fl.mask,
                    minimal_fit=_hom_minimal, sample_size=4,
                    error_fn=homography_transfer_error,
                    num_hypotheses=ransac_budget(
                        hp_.desired_confidence, hp_.outlier_proba, 4,
                        min(hp_.num_hypotheses, hp_.max_iters),
                    ),
                    threshold=hp_.max_error, eval_cap=hp_.eval_cap,
                    adaptive_threshold=hp_.adaptive_threshold,
                    refit_fn=dlt_homography if lo else None,
                    lo_iters=2 if lo else 0,
                    prescore_cap=hp_.prescore_cap,
                    finalists=hp_.finalists,
                    dense=True,
                )
                return jnp.sum(res.model) + jnp.sum(res.inliers)

            s = jnp.sum(jax.vmap(one)(sp, jax.random.split(sub, b)))
            return (sp._replace(motion=sp.motion + s * 1e-12), k), s

        stage(name, fit_fn, (sparse, jax.random.PRNGKey(seed)))

    _hom_fit_stage("hom_fit", 6, lo=True)
    _hom_fit_stage("hom_fit0", 7, lo=False)

    # detector
    det = create_detector("block_motion")

    def det_fn(c):
        sp = c
        d = jax.vmap(det.detect)(sp)
        s = jnp.sum(d.field) + jnp.sum(d.area)
        return sp._replace(motion=sp.motion + s * 1e-12), s

    stage("detector", det_fn, sparse)

    # detector substages: the scatter-mean densify into the ~14x14 grid vs
    # the transitive-closure labeling (everything else is tiny reductions).
    from ofps_tpu.core.motion import Densifier
    from ofps_tpu.detectors.block_motion import block_dim
    from ofps_tpu.ops.components import largest_component

    ddim = block_dim(det.params)

    def det_dens_fn(c):
        sp = c

        def one(fl):
            return jnp.sum(Densifier.zeros(ddim, ddim).add_flow(fl).finalize())

        s = jnp.sum(jax.vmap(one)(sp))
        return sp._replace(motion=sp.motion + s * 1e-12), s

    stage("det_densify", det_dens_fn, sparse)

    def det_label_fn(c):
        act, tick = c
        mask, area = jax.vmap(largest_component)(act)
        s = jnp.sum(area).astype(jnp.float32) + tick
        # Flip one cell each iteration so the scan body is not loop-invariant.
        act = act.at[:, 0, 0].set(tick.astype(jnp.int32) % 2 == 0)
        return (act, tick + 1.0), s

    act0 = (
        jax.random.uniform(jax.random.PRNGKey(8), (b, ddim, ddim)) > 0.5
    )
    stage("det_label", det_label_fn, (act0, jnp.float32(0)))

    # full step
    pipe = StreamPipeline(
        camera=camera,
        estimators=[create_estimator("almeida"), create_estimator("homography")],
        detector=create_detector("block_motion"),
        flow_params=params,
        emit_dense_flow=False,
    )
    st0 = pipe.init_state(b, h, w)

    def step_fn(c):
        st, k = c
        k, sub = jax.random.split(k)
        st, out = pipe.step_from_frames(st, i2, sub)
        # Consume EVERY output: unconsumed stages get DCE'd out of the
        # while loop by XLA's loop simplifier (see bench._step_checksum).
        s = sum(jnp.sum(r) for r in out.rot) + sum(
            jnp.sum(p) for p in out.pos
        )
        s = s + jnp.sum(out.detection.detected.astype(jnp.float32))
        return (st, k), s

    stage("step", step_fn, (st0, jax.random.PRNGKey(3)))

    print(json.dumps({"unit": "us/frame", "batch": b, **results}))


if __name__ == "__main__":
    main()
