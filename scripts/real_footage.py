"""Real-imagery panning validation (VERDICT r3 missing #3).

The reference reports ~1 deg tracking error on real panning recordings
(docs/report.tex:1190).  This zero-egress environment has no camera and no
real video, but the reference thesis ships REAL photographs — including the
keyframe panorama built from its own real-world recording
(docs/report/panorama.jpg).  This script builds the closest honest
equivalent of that scenario:

* the real panorama is treated as a wide planar projection and a 90-deg-FOV
  camera PANS across it with an exactly-known rotation schedule (panning a
  pinhole camera over a planar projection is geometrically exact — every
  frame is one bilinear resample through ``camera.delta``, the same warp
  model the eval matrix uses);
* the frames are H.264/MPEG-4-encoded by the production native encoder, and
  the full production stack runs on them: codec MVs (``av``) and computed
  dense flow (``block``) through every estimator;
* per-frame rotation error vs the known schedule is reported next to the
  reference's ~1 deg real-footage figure.

So: real sensor texture, real codec, real decoders and estimators; only the
camera trajectory is synthetic (and therefore exactly known).  Writes
``docs_stats/real_world.md`` + the clip/GT under ``samples/data/`` for
``samples/real_world.json``.

Usage: python scripts/real_footage.py [--frames N]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

PANORAMA = "/root/reference/docs/report/panorama.jpg"
OUT_RES = 512  # output frame side (square, 90-deg FOV)


def pan_schedule(frames: int):
    """(roll, pitch, yaw) per-frame deltas in degrees: pan right, hold,
    pan back with a slight tilt — the reference's real-world panning
    scenario shape."""
    deltas = []
    for t in range(frames):
        if t < frames * 0.4:
            deltas.append((0.0, 0.06, 0.5))
        elif t < frames * 0.5:
            deltas.append((0.0, 0.0, 0.0))
        else:
            deltas.append((0.0, -0.05, -0.42))
    return deltas


def render_real_pan(gray_pano: np.ndarray, cam, deltas):
    """Frames of a panning camera over the real panorama (planar model)."""
    from scipy.ndimage import map_coordinates

    from ofps_tpu.core import quat

    ph, pw = gray_pano.shape
    h = w = OUT_RES
    mx, my = (pw - w) // 2, (ph - h) // 2
    ys, xs = np.meshgrid(
        (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w, indexing="ij"
    )
    pts = jnp.asarray(
        np.stack([xs, ys], axis=-1).reshape(-1, 2).astype(np.float32)
    )

    def sample(q_acc):
        m4 = np.asarray(quat.to_matrix4(jnp.asarray(q_acc, jnp.float32)))
        delta = np.asarray(cam.delta(pts, jnp.asarray(m4))).reshape(h, w, 2)
        sy = (ys + delta[..., 1]) * h + my - 0.5
        sx = (xs + delta[..., 0]) * w + mx - 0.5
        return map_coordinates(gray_pano, [sy, sx], order=1, mode="nearest")

    from synthetic import euler_deg

    frames = [sample(quat.identity())]
    qs = []
    q_acc = quat.identity()
    for d in deltas:
        q = euler_deg(*d)
        qs.append(np.asarray(q))
        q_acc = quat.mul(q_acc, q)
        frames.append(sample(q_acc))
    return frames, qs


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    args = ap.parse_args()

    from PIL import Image

    from ofps_tpu.apps import gt as gtmod
    from ofps_tpu.core import quat
    from ofps_tpu.core.camera import StandardCamera
    from ofps_tpu.core.motion import SparseFlow
    from ofps_tpu.decoders.av import encode_gray_video
    from ofps_tpu.decoders.base import create_decoder
    from ofps_tpu.decoders.cv import CvDecoder
    from ofps_tpu.estimators.base import create_estimator

    if not os.path.exists(PANORAMA):
        print(f"real panorama not found at {PANORAMA}; nothing to do")
        return
    pano = np.asarray(
        Image.open(PANORAMA).convert("L"), dtype=np.float32
    )
    cam = StandardCamera.create(1.0, 90.0)
    deltas = pan_schedule(args.frames)
    frames, qs = render_real_pan(pano, cam, deltas)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.path.join(repo, "samples", "data")
    os.makedirs(data, exist_ok=True)
    clip = os.path.join(data, "real_world_pan.avi")
    arr = np.clip(np.stack(frames), 0, 255).astype(np.uint8)
    encode_gray_video(clip, arr, gop=24)

    # GT CSV in the tracking-app convention (acc = q * acc, so calc_err's
    # per-frame delta is exactly the schedule entry).
    rows = []
    acc = np.asarray(quat.identity())
    rows.append(gtmod.GroundTruthRow(1, 90.0, 90.0, acc.copy(), np.zeros(3)))
    for k, q in enumerate(qs):
        acc = np.asarray(quat.mul(jnp.asarray(q), jnp.asarray(acc)))
        rows.append(
            gtmod.GroundTruthRow(k + 2, 90.0, 90.0, acc.copy(), np.zeros(3))
        )
    gtcsv = os.path.join(data, "real_world_gt.csv")
    gtmod.write_ground_truth(gtcsv, rows)

    # ---- run the production stack over it --------------------------------
    GRIDCAP = 96 * 96
    T = len(qs)

    def drain(dec):
        out = []
        dec.process_frame()
        for _ in range(T):
            f = dec.process_frame()
            out.append(
                SparseFlow.from_arrays(f.pos, f.motion, capacity=GRIDCAP)
                if f is not None and f.has_mvs and len(f.pos) >= 8
                else None
            )
        return out

    sources = {
        "av": lambda: drain(create_decoder(clip)),
        "block": lambda: drain(
            CvDecoder(clip, grid_max_dim=96, levels=5, use_rlof=False)
        ),
    }
    configs = [
        ("almeida", "almeida", {"use_ransac": False}),
        ("almeida-ransac", "almeida", {}),
        ("homography-ransac", "homography", {}),
        ("multiview-ransac", "multiview", {}),
        ("libmv-7pt", "libmv", {"algo_points": 7}),
    ]
    results = {}
    for sname, mk in sources.items():
        fields = mk()
        for label, name, props in configs:
            est = create_estimator(name, **props)
            fn = jax.jit(est.estimate)
            key = jax.random.PRNGKey(7)
            state = est.init()
            tr = []
            for fl in fields:
                if fl is None:
                    tr.append(np.array([1.0, 0, 0, 0], np.float32))
                    continue
                key, sub = jax.random.split(key)
                r, _, state = fn(state, fl, cam, sub)
                tr.append(np.asarray(jax.device_get(r)))
            errs = [
                gtmod._qangle(gtmod.rotation_to(qe, qg))
                for qe, qg in zip(tr, qs)
            ]
            e = float(np.degrees(np.mean(errs)))
            results[(sname, label)] = e
            print(f"{sname:6s} {label:18s} {e:.4f} deg/frame", flush=True)

    md = os.path.join(repo, "docs_stats", "real_world.md")
    with open(md, "w") as f:
        f.write(
            "# Real-imagery panning validation\n\n"
            "Source: the REAL keyframe panorama from the reference thesis's\n"
            "real-world recording (docs/report/panorama.jpg), panned over by\n"
            f"a 90-deg-FOV camera for {T} frames (exact schedule), encoded\n"
            "MPEG-4 by the production native encoder, decoded by the\n"
            "production av/cv decoders.  Real sensor texture + real codec;\n"
            "only the trajectory is synthetic (zero-egress environment: no\n"
            "camera or real video exists here — see scripts/real_footage.py).\n\n"
            "Reference bar: ~1 deg/frame on its real panning recordings\n"
            "(docs/report.tex:1190).\n\n"
            f"backend: {jax.default_backend()}\n\n"
            "| source | estimator | avg rotation error (deg/frame) |\n"
            "|---|---|---|\n"
        )
        for (sname, label), e in results.items():
            f.write(f"| {sname} | {label} | {e:.4f} |\n")
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
