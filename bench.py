"""Headline benchmark: dense 1080p optical flow, frames/sec/chip.

Prints ONE JSON line.  ``vs_baseline`` is the speedup over the reference's
own dense-flow cost — OpenCV Farneback at 45.679 ms/frame on CPU
(/root/reference/docs/demo.md:85, BASELINE.md) ≈ 21.89 fps.  The line also
carries ``pipeline``: the COMPLETE per-frame step (dense flow -> grid
densify -> almeida-RANSAC + homography estimators -> block-motion
detector) at 1080p, batch-swept — the serving configuration, not just the
flow kernel (disable with --no-pipeline for quick kernel iterations).

Timing method (see .claude/skills/verify/SKILL.md): the axon TPU tunnel makes
per-call dispatch ~29 ms and ``block_until_ready`` unreliable, so the K
benchmark iterations run inside ONE jit via ``lax.scan`` with a warm-start
data dependency between iterations (which is also the real streaming
behavior), and the sync point is a host ``device_get`` of a scalar.
"""

from __future__ import annotations

import argparse
import os
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from ofps_tpu.ops.flow_pyramid import (
    FlowParams,
    dense_flow_stream,
)

BASELINE_FPS = 1000.0 / 45.679  # reference OpenCV dense flow, demo.md:85


def _step_checksum(out) -> jnp.ndarray:
    """Scalar consuming EVERY pipeline output.

    Honesty-critical: XLA's while-loop simplifier strips dead carry/output
    elements, so any stage whose outputs the benchmark does not consume is
    dead-code-eliminated from the loop entirely.  Round 4 caught exactly
    this: a rot[0]-only checksum silently reduced the "full pipeline"
    numbers to flow+densify+almeida — adding the homography estimator cost
    1.5 us/frame because it never ran.  Every estimator's pose and the
    detector verdicts must feed the returned scalar.
    """
    s = jnp.float32(0)
    for r in out.rot:
        s += jnp.sum(r)
    for p in out.pos:
        s += jnp.sum(p)
    if out.detection is not None:
        s += jnp.sum(out.detection.detected.astype(jnp.float32))
    return s


def build_pipeline_runner(
    batch: int, h: int, w: int, iters: int,
    estimators=("almeida", "homography"),
):
    """Jitted runner for the full multi-stream step at (batch, h, w)."""
    from ofps_tpu.core.camera import StandardCamera
    from ofps_tpu.detectors.base import create_detector
    from ofps_tpu.estimators.base import create_estimator
    from ofps_tpu.parallel.stream import StreamPipeline

    pipe = StreamPipeline(
        camera=StandardCamera.create(w / h, 90.0),
        estimators=[create_estimator(name) for name in estimators],
        detector=create_detector("block_motion"),
        flow_params=FlowParams(),
        emit_dense_flow=False,
    )
    state0 = pipe.init_state(batch, h, w)

    @jax.jit
    def run(gray, key):
        # prev_cache is carried state, so every step does the streaming
        # amount of work (one new-frame pyramid+pad, the i1 side reused
        # from the carry — exactly what serving does); the constant input
        # frame only pins the flow near zero (worst case for none of the
        # stages).
        st, out = pipe.step_from_frames(state0, gray, key)
        keys = jax.random.split(key, iters - 1)

        def body(carry, k):
            st, acc = carry
            st, out = pipe.step_from_frames(st, gray, k)
            return (st, acc + _step_checksum(out)), ()

        (st, acc), _ = jax.lax.scan(
            body, (st, _step_checksum(out)), keys
        )
        return acc

    return run


def bench_pipeline(
    h: int, w: int, batches=(1, 4, 8), iters: int = 96,
    estimators=("almeida", "homography"),
):
    # 96 chained steps: at 24 the ~29 ms tunnel dispatch still added
    # ~1.2 ms/frame at b1 and underreported the step rate by ~30%.
    """fps of the complete step per batch size (one warm compile each)."""
    out = {}
    for b in batches:
        key = jax.random.PRNGKey(1)
        gray = jax.random.uniform(key, (b, h, w), jnp.float32, 0.0, 255.0)
        run = build_pipeline_runner(b, h, w, iters, estimators)
        float(jax.device_get(run(gray, key)))  # compile + warm
        best = min(_timed(run, gray, key) for _ in range(3))
        out[f"b{b}"] = round(b * iters / best, 2)
    return out


def build_runner(batch: int, h: int, w: int, iters: int, params: FlowParams):
    @jax.jit
    def run(i1, i2):
        # Streaming carry (dense_flow_stream): the half-res warm-start flow
        # (bf16, the real OPTFLOW_USE_INITIAL_FLOW chain) plus the previous
        # frame's pyramid/pad cache — the per-iteration work is exactly the
        # per-frame serving cost (one new-frame pyramid+pad, kernels on the
        # cached i1 side).  HLO-verified (round 4): the while body carries
        # the full per-step op set, XLA does not hoist the loop-invariant
        # frame's preprocessing out of the scan.  A scalar checksum of every
        # frame's FULL-RES output keeps each level live.
        _, carry = dense_flow_stream(i1, params)
        (u, v), carry = dense_flow_stream(i2, params, carry)
        acc = jnp.sum(u) + jnp.sum(v)

        def body(c, _):
            carry, acc = c
            (u, v), carry = dense_flow_stream(i2, params, carry)
            return (carry, acc + jnp.sum(u) + jnp.sum(v)), ()

        (_, acc), _ = jax.lax.scan(
            body, (carry, acc), None, length=iters - 1
        )
        return acc

    return run


def _timed(run, *args) -> float:
    t0 = time.perf_counter()
    float(jax.device_get(run(*args)))
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    # Single-stream defaults: per-frame cost is LOWEST at batch=1 on this
    # fractional v5e (larger batches saturate HBM: 0.97 ms/frame at B=1 vs
    # 1.4 at B=16); 192 chained frames amortize the ~29 ms tunnel dispatch.
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=192)
    ap.add_argument("--repeats", type=int, default=3,
                    help="timed repeats; best taken (tunnel jitter ~5%%)")
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--no-pipeline", action="store_true",
                    help="skip the full-pipeline sweep (kernel-only run)")
    ap.add_argument(
        "--profile",
        default=None,
        metavar="DIR",
        help="capture a jax.profiler trace of the timed run into DIR",
    )
    args = ap.parse_args()

    b, h, w = args.batch, args.height, args.width

    # Fail CLEANLY — but not fast — if the device backend is unreachable.
    # The axon tunnel goes down intermittently and can hang backend init
    # forever (no exception); round 4 lost its entire perf evidence to a
    # single 180-s probe that happened to land inside such an outage.  A
    # hung in-process init can never recover (jax backend init is
    # once-per-process), so each retry MUST be a fresh subprocess; only
    # once a subprocess probe succeeds do we touch the backend here.
    _PROBE_SRC = (
        # device_get, NOT block_until_ready: the latter does not block
        # through the tunnel transport (CLAUDE.md), so an execution-side
        # hang would pass a block_until_ready probe.
        "import jax, jax.numpy as jnp;"
        "print(float(jax.device_get(jnp.ones((8, 8)).sum())))"
    )

    def _wait_for_device(budget_s: float = 780.0) -> bool:
        import subprocess

        deadline = time.time() + budget_s
        attempt = 0
        while time.time() < deadline:
            attempt += 1
            per_try = min(150.0, max(30.0, deadline - time.time()))
            try:
                rc = subprocess.run(
                    [sys.executable, "-c", _PROBE_SRC],
                    timeout=per_try,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                    stdout=subprocess.DEVNULL,
                    stderr=subprocess.DEVNULL,
                ).returncode
            except subprocess.TimeoutExpired:
                rc = -1
            if rc == 0:
                return True
            print(
                f"bench: device probe attempt {attempt} failed "
                f"(rc={rc}); tunnel likely down, retrying...",
                file=sys.stderr,
            )
            sys.stderr.flush()
            time.sleep(min(60.0, 15.0 * attempt))
        return False

    if not _wait_for_device():
        print(
            "bench: device backend unreachable (subprocess probes failed "
            "for ~13 min) — the TPU tunnel is down; no measurement taken",
            file=sys.stderr,
        )
        sys.stderr.flush()
        os._exit(1)  # plain exit could hang in jax atexit syncs

    # The tunnel answered a fresh process; arm a generous in-process
    # watchdog in case it drops again between the probe and our init.
    import threading

    probe_ok = threading.Event()

    def _probe():
        float(jax.device_get(jnp.ones((8, 8)).sum()))
        probe_ok.set()

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(180.0)
    if not probe_ok.is_set():
        print(
            "bench: backend init hung after a successful subprocess probe "
            "— tunnel dropped mid-run; no measurement taken",
            file=sys.stderr,
        )
        sys.stderr.flush()
        os._exit(1)

    params = FlowParams()
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    i1 = jax.random.uniform(k1, (b, h, w), jnp.float32, 0.0, 255.0)
    shift = jnp.roll(i1, shift=3, axis=-1)
    noise = jax.random.uniform(k2, (b, h, w), jnp.float32, -2.0, 2.0)
    i2 = shift + noise

    run = build_runner(b, h, w, args.iters, params)
    print(
        f"compiling on {jax.devices()[0].platform} "
        f"(batch={b}, {h}x{w}, iters={args.iters})...",
        file=sys.stderr,
    )
    float(jax.device_get(run(i1, i2)))  # compile + warm up

    if args.profile:
        with jax.profiler.trace(args.profile):
            t0 = time.perf_counter()
            float(jax.device_get(run(i1, i2)))
            elapsed = time.perf_counter() - t0
    else:
        elapsed = min(
            _timed(run, i1, i2) for _ in range(max(1, args.repeats))
        )

    fps = b * args.iters / elapsed
    record = {
        "metric": "dense_flow_1080p_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }
    if not args.no_pipeline and not args.profile:
        print("benchmarking full pipeline step...", file=sys.stderr)
        record["pipeline_1080p_fps_per_chip"] = bench_pipeline(h, w)
        # All-FOUR-estimator serving config (the reference's full suite:
        # almeida + homography + multiview + libmv concurrently).  The
        # 5-point multiview stage dominates, so fewer chained iters keep
        # the run bounded; B=8 amortizes its fixed hypothesis math best.
        print("benchmarking all-4-estimator step...", file=sys.stderr)
        record["pipeline_all4_fps_per_chip"] = bench_pipeline(
            h, w, batches=(8,), iters=24,
            estimators=("almeida", "homography", "multiview", "libmv"),
        )["b8"]
    print(json.dumps(record))


if __name__ == "__main__":
    main()
