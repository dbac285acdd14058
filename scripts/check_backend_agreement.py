"""CPU-vs-TPU agreement check on representative eval-matrix cells.

The round-2 incident class this kills: an unguarded bf16 matmul (TPU's
default matmul precision) quantizes geometry ON CHIP ONLY — CPU tests stay
green (f32 default there) while the shipped chip numbers silently degrade
(measured then: 0.35 deg/frame on multiview).  ``tests/test_precision_lint``
guards the source; this script *measures* the property on the live chip:
it runs a handful of (source, estimator) cells from the evaluation matrix
(scripts/evaluate_matrix.py) on the current backend AND in a CPU
subprocess with identical inputs and PRNG keys, then asserts the per-cell
average rotation errors agree.

Tolerance: 0.01 deg/frame absolute.  The inputs are bit-identical and the
estimators are deterministic given the key, so the residual is pure
backend numerics (f32 reduction order, fused-multiply-add shapes); the
healthy spread is ~1e-3 deg.  A backend-dependent *algorithm* divergence
(the round-4 example: an LO refit accepted without strict improvement
replaced a degenerate 7-point model with an arbitrary null-family member —
0.0016 deg CPU vs 0.4765 TPU) lands orders of magnitude above it.

Run from the repo root with the axon TPU env active:

    python scripts/check_backend_agreement.py

Exits nonzero on disagreement.  Wall cost is ~2 min (a few cells; the CPU
subprocess re-jits the estimators).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "scripts"))

# (estimator factory name, props, label); gt-mv fields are synthesized
# identically on both backends (numpy-seeded — no device math upstream).
CELLS = [
    ("almeida", {}, "almeida-ransac"),
    ("homography", {}, "homography-ransac"),
    ("multiview", {}, "multiview-ransac"),
    ("libmv", {"algo_points": 7}, "libmv-7pt"),
    ("libmv", {"algo_points": 8}, "libmv-8pt"),
]
CLIPS = (0, 5)
TOL_DEG = 0.01


def run_cells() -> dict:
    import numpy as np
    import jax

    from ofps_tpu.core.camera import StandardCamera
    from ofps_tpu.estimators.base import create_estimator
    from ofps_tpu.apps import gt as gtmod
    from synthetic import synthetic_field, euler_deg
    from evaluate_matrix import make_schedules, GRID

    cam = StandardCamera.create(1.0, 90.0)
    schedules = make_schedules()
    out = {}
    for name, props, label in CELLS:
        est = create_estimator(name, **props)
        fn = jax.jit(est.estimate)
        for ci in CLIPS:
            deltas = schedules[ci]
            fields = [
                synthetic_field(cam, euler_deg(*d), capacity=GRID * GRID)
                for d in deltas
            ]
            truth = [np.asarray(euler_deg(*d)) for d in deltas]
            key = jax.random.PRNGKey(7)
            state = est.init()
            errs = []
            for fl, qt in zip(fields, truth):
                key, sub = jax.random.split(key)
                r, _, state = fn(state, fl, cam, sub)
                errs.append(
                    gtmod._qangle(
                        gtmod.rotation_to(np.asarray(jax.device_get(r)), qt)
                    )
                )
            out[f"{label}/clip{ci}"] = float(np.degrees(np.mean(errs)))
    return {"backend": jax.default_backend(), "cells": out}


def main() -> int:
    here = run_cells()
    print(f"[{here['backend']}] " + json.dumps(here["cells"]), flush=True)
    if here["backend"] == "cpu":
        # Invoked as the subprocess half: emit JSON for the parent.
        print("AGREEMENT_JSON:" + json.dumps(here))
        return 0

    env = {
        k: v
        for k, v in os.environ.items()
        # Scrub the axon plugin: with PYTHONPATH=/root/.axon_site set, CPU
        # backend discovery blocks whenever the TPU tunnel wobbles.
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")
    }
    env.update(JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=1800,
    )
    tagged = [
        l for l in proc.stdout.splitlines() if l.startswith("AGREEMENT_JSON:")
    ]
    if proc.returncode != 0 or not tagged:
        print(proc.stdout[-2000:])
        print(proc.stderr[-2000:])
        print("CPU subprocess failed", file=sys.stderr)
        return 2
    cpu = json.loads(tagged[0][len("AGREEMENT_JSON:"):])
    print(f"[cpu] " + json.dumps(cpu["cells"]), flush=True)

    bad = []
    for cell, tpu_err in here["cells"].items():
        d = abs(tpu_err - cpu["cells"][cell])
        status = "ok" if d <= TOL_DEG else "DISAGREE"
        print(f"{cell:24s} tpu={tpu_err:8.4f} cpu={cpu['cells'][cell]:8.4f} "
              f"|d|={d:7.4f}  {status}")
        if d > TOL_DEG:
            bad.append(cell)
    if bad:
        print(f"FAIL: backend disagreement on {bad}", file=sys.stderr)
        return 1
    print("backend agreement OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
