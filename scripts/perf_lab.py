"""Scratch perf lab: attribute dense-flow 1080p time across levels/stages.

Run from /root/repo on the axon TPU.  Not part of the package API.
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

from ofps_tpu.ops.flow_pyramid import FlowParams, dense_flow

B = int(os.environ.get("PERF_B", "16"))
ITERS = int(os.environ.get("PERF_ITERS", "6"))
H, W = 1080, 1920


def make_inputs():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    i1 = jax.random.uniform(k1, (B, H, W), jnp.float32, 0.0, 255.0)
    i2 = jnp.roll(i1, shift=3, axis=-1) + jax.random.uniform(
        k2, (B, H, W), jnp.float32, -2.0, 2.0
    )
    return i1, i2


def timeit(name, fn, *args):
    out = fn(*args)
    float(jax.device_get(out))  # compile+warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    fps = B * ITERS / best
    print(f"{name:40s} {best*1e3:8.1f} ms  {fps:7.1f} fps")
    return best


def scan_flow(params, warm=True):
    @jax.jit
    def run(i1, i2):
        init = jnp.zeros((B, H, W, 2), jnp.float32)

        def body(flow, _):
            f = dense_flow(i1, i2, params, init_flow=flow if warm else None)
            return f, ()

        flow, _ = jax.lax.scan(body, init, None, length=ITERS)
        return jnp.sum(flow[..., 0])

    return run


def bench_like(params, b=1, iters=192):
    """Bench-identical harness: warm-carry chain via dense_flow_warm."""
    from ofps_tpu.ops.flow_pyramid import dense_flow_warm

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    i1 = jax.random.uniform(k1, (b, H, W), jnp.float32, 0.0, 255.0)
    i2 = jnp.roll(i1, shift=3, axis=-1) + jax.random.uniform(
        k2, (b, H, W), jnp.float32, -2.0, 2.0
    )

    @jax.jit
    def run(i1, i2):
        (u, v), warm = dense_flow_warm(i1, i2, params)
        acc = jnp.sum(u) + jnp.sum(v)

        def body(carry, _):
            warm, acc = carry
            (u, v), warm = dense_flow_warm(i1, i2, params, warm=warm)
            return (warm, acc + jnp.sum(u) + jnp.sum(v)), ()

        (_, acc), _ = jax.lax.scan(body, (warm, acc), None, length=iters - 1)
        return acc

    float(jax.device_get(run(i1, i2)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(run(i1, i2)))
        best = min(best, time.perf_counter() - t0)
    return b * iters / best


def ablate():
    """Attribute the r3 quality-feature cost on the bench config (B=1)."""
    variants = [
        ("default (guarded+median+axis_sep)", FlowParams()),
        ("guarded_warm=False", FlowParams(guarded_warm=False)),
        ("median_levels=False", FlowParams(median_levels=False)),
        ("both off (~r2 config)", FlowParams(guarded_warm=False,
                                             median_levels=False)),
        ("axis_sep=False", FlowParams(axis_sep=False)),
    ]
    for name, p in variants:
        fps = bench_like(p)
        print(f"{name:40s} {fps:8.1f} fps", flush=True)


def blocks():
    """Block-shape sweep for the L0 fused kernel (DMA padding overhead)."""
    from ofps_tpu.pallas.flow_refine import flow_refine_uv

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    b = 4
    i1 = jax.random.uniform(k1, (b, H, W), jnp.float32, 0.0, 255.0)
    i2 = jnp.roll(i1, shift=3, axis=-1) + jax.random.uniform(
        k2, (b, H, W), jnp.float32, -2.0, 2.0
    )
    uc = jnp.zeros((b, H // 2, W // 2), jnp.float32)

    for bh, bw in ((128, 1920), (160, 1920), (80, 1920), (112, 1920),
                   (96, 1920), (48, 1920)):
        def fn(i1, i2, uc, c, _bh=bh, _bw=bw):
            return flow_refine_uv(
                i1, i2, uc + c, uc, 1, 5, bh=_bh, bw=_bw,
                coarse_flow=True, axis_sep=True, out_dtype=jnp.bfloat16,
            )

        @jax.jit
        def run(i1, i2, uc):
            def body(c, _):
                out = fn(i1, i2, uc, c)
                return jnp.sum(out[0].astype(jnp.float32)) * 1e-20, ()

            s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=24)
            return s

        try:
            float(jax.device_get(run(i1, i2, uc)))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(jax.device_get(run(i1, i2, uc)))
                best = min(best, time.perf_counter() - t0)
            us = best / (b * 24) * 1e6
            print(f"bh={bh:4d} bw={bw:5d}  {us:8.1f} us/frame L0", flush=True)
        except Exception as e:
            print(f"bh={bh:4d} bw={bw:5d}  FAILED: {str(e)[:120]}", flush=True)


def main():
    i1, i2 = make_inputs()
    which = sys.argv[1:] or ["base"]
    if "blocks" in which:
        blocks()
        return
    if "ablate" in which:
        ablate()
        return
    if "base" in which:
        timeit("baseline levels=5", scan_flow(FlowParams()), i1, i2)
    if "cold" in which:
        timeit("no warm start", scan_flow(FlowParams(), warm=False), i1, i2)
    if "parts" in which:
        # Time each pyramid level's work in isolation (ITERS reps in a scan).
        from ofps_tpu.ops.flow_pyramid import _level_refine, _warp
        from ofps_tpu.ops.image import build_pyramid, resize_bilinear_matmul
        from ofps_tpu.pallas.flow_refine import flow_refine_uv

        def rep(fn):
            @jax.jit
            def run(*args):
                def body(c, _):
                    out = fn(*args, c)
                    return jnp.sum(out[0]) * 1e-20, ()

                s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
                return s

            return run

        pyr = build_pyramid(i1, 5)
        pyr2 = build_pyramid(i2, 5)

        def lvl_fused(lvl, search):
            a, b = pyr[lvl], pyr2[lvl]
            h, w = a.shape[-2], a.shape[-1]
            uc = jnp.zeros(a.shape[:-2] + (h // 2, w // 2), jnp.float32)

            def fn(a, b, uc, c):
                return flow_refine_uv(
                    a, b, uc + c, uc, search, 5, coarse_flow=True
                )

            return timeit(f"fused level {lvl} ({h}x{w})", rep(fn), a, b, uc)

        def lvl_xla(lvl, search):
            a, b = pyr[lvl], pyr2[lvl]
            h, w = a.shape[-2], a.shape[-1]
            f0 = jnp.zeros(a.shape + (2,), jnp.float32)

            def fn(a, b, f0, c):
                warped = _warp(b, f0 + c)
                return (f0 + _level_refine(a, warped, search, 5),)

            return timeit(f"xla level {lvl} ({h}x{w}) s={search}", rep(fn), a, b, f0)

        if "stages" in which:
            a, b = pyr[0], pyr2[0]
            h, w = a.shape[-2], a.shape[-1]
            uc = jnp.zeros(a.shape[:-2] + (h // 2, w // 2), jnp.float32)
            for st in (0, 1, 2, 3, 4, 99):
                def fn(a, b, uc, c, st=st):
                    return flow_refine_uv(
                        a, b, uc + c, uc, 1, 5, coarse_flow=True, stage=st
                    )

                timeit(f"L0 stage<={st}", rep(fn), a, b, uc)
            return

        t0 = lvl_fused(0, 1)
        t1 = lvl_fused(1, 1)
        t2 = lvl_xla(2, 1)
        t3 = lvl_xla(3, 1)
        t4 = lvl_xla(4, 6)

        print(f"sum of levels: {(t0+t1+t2+t3+t4)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
