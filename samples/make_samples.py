"""Generate the sample inputs + configs named in BASELINE.json.

The reference evaluates against downloadable Blender clips with GT CSVs
(README.md:92-130); this repo has no video assets, so the samples are
generated: synthetic-rotation ``.mvec`` streams with matching ground-truth
CSVs (the estimator test fixture, SURVEY.md §4) and encoded MPEG-4 clips
from the native test encoder for the codec-MV / detection configs.

Usage: python samples/make_samples.py [outdir]   (default: samples/data)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def make_rotation_stream(path_mvec, path_gt, deltas_deg, cam, seed=0):
    """Write an .mvec stream + GT CSV for a per-frame rotation schedule."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from synthetic import euler_deg, synthetic_field

    from ofps_tpu.apps import gt as gtmod
    from ofps_tpu.core import quat
    from ofps_tpu.decoders.mvec import write_mvec_frame

    rows = []
    acc = np.asarray(quat.identity())
    with open(path_mvec, "wb") as f:
        # Frame 1: I-frame analog, no MVs; GT row is the identity pose.
        write_mvec_frame(f, np.zeros((0, 2)), np.zeros((0, 2)))
        rows.append(
            gtmod.GroundTruthRow(
                frame=1, fov_x=90.0, fov_y=90.0, rot=acc.copy(), pos=np.zeros(3)
            )
        )
        for k, (r, p, y) in enumerate(deltas_deg):
            q = euler_deg(r, p, y)
            flow = synthetic_field(cam, q)
            keep = np.asarray(flow.mask) > 0.5
            write_mvec_frame(
                f, np.asarray(flow.pos)[keep], np.asarray(flow.motion)[keep]
            )
            acc = np.asarray(quat.mul(q, acc))
            rows.append(
                gtmod.GroundTruthRow(
                    frame=k + 2,
                    fov_x=90.0,
                    fov_y=90.0,
                    rot=acc.copy(),
                    pos=np.zeros(3),
                )
            )
    gtmod.write_ground_truth(path_gt, rows)


def main(outdir: str = None):
    from ofps_tpu.core.camera import StandardCamera
    from ofps_tpu.decoders.av import encode_test_video

    outdir = outdir or os.path.join(os.path.dirname(__file__), "data")
    os.makedirs(outdir, exist_ok=True)
    cam = StandardCamera.create(1.0, 90.0)

    # Panning rotation schedule: ramp up yaw, mix in pitch, return.
    deltas = (
        [(0.0, 0.0, 0.1 * k) for k in range(5)]
        + [(0.05, 0.1, 0.4)] * 5
        + [(0.0, -0.1, -0.2)] * 5
    )
    mvec = os.path.join(outdir, "synthetic_rot.mvec")
    gt = os.path.join(outdir, "synthetic_rot_gt.csv")
    make_rotation_stream(mvec, gt, deltas, cam)

    # Codec clip for detection (motion burst in the middle of a still scene).
    clip = os.path.join(outdir, "detect.avi")
    encode_test_video(clip, 320, 240, frames=30, gop=60, dx=1.5, dy=0.0,
                      pattern="noise")

    # CCTV-scale scenario: two minutes @30fps, four motion events over long
    # still spans (the reference's 30-min burglary evaluation shape,
    # docs/report.tex:919; GoP 240 like its Pi camera source).
    cctv = os.path.join(outdir, "cctv.avi")
    encode_test_video(
        cctv, 320, 240, frames=3600, gop=240, dx=1.5, dy=0.5,
        pattern="noise",
        events=[(400, 460), (1190, 1310), (2230, 2275), (3100, 3220)],
    )

    configs = {
        # BASELINE.json: "Almeida dense flow on one synthetic sample
        # (samples/synthetic_almeida_gt.json, ... GT EPE check)"
        "synthetic_almeida_gt.json": {
            "app": "tracking",
            "decoder": {"input": mvec},
            "camera_aspect": 1.0,
            "camera_fov_y": 90.0,
            "estimators": [
                {"name": "almeida", "properties": {"use_ransac": True}}
            ],
            "ground_truth": gt,
            "output": {"stats_csv_prefix": os.path.join(outdir, "stats_")},
        },
        # "All-estimator comparison incl. libmv/multiview essential-matrix
        # solve (samples/synthetic_all_gt.json)"
        "synthetic_all_gt.json": {
            "app": "tracking",
            "decoder": {"input": mvec},
            "camera_aspect": 1.0,
            "camera_fov_y": 90.0,
            "estimators": [
                {"name": "almeida"},
                {"name": "homography"},
                {"name": "multiview"},
                {"name": "libmv"},
            ],
            "ground_truth": gt,
            "output": {"stats_csv_prefix": os.path.join(outdir, "all_stats_")},
        },
        # "Block motion detection ... via decoder motion vectors
        # (samples/basic_detect.json grid detector)"
        "basic_detect.json": {
            "app": "detection",
            "decoder": {"input": clip},
            "detector": {"name": "block_motion",
                         "properties": {"target_motion": 0.003}},
            "settings": {"max_frame_gap": 10, "min_frames": 3},
            "output": {"ranges_csv": os.path.join(outdir, "ranges.csv")},
        },
        # CCTV event-detection scenario (report.tex:919 mirror): all four
        # events must produce ranges, nothing outside them.
        "cctv_detect.json": {
            "app": "detection",
            "decoder": {"input": cctv},
            "detector": {"name": "block_motion",
                         "properties": {"target_motion": 0.003}},
            "settings": {"max_frame_gap": 10, "min_frames": 5},
            "output": {"ranges_csv": os.path.join(outdir, "cctv_ranges.csv")},
        },
        # samples/real_world.json (real-imagery panning, rendered by
        # scripts/real_footage.py) is CHECKED IN, not generated here —
        # it must keep pointing at the real footage + its GT CSV.
    }
    here = os.path.dirname(os.path.abspath(__file__))
    for name, cfg in configs.items():
        with open(os.path.join(here, name), "w") as f:
            json.dump(cfg, f, indent=2)
    print(f"samples written to {outdir}; configs in {here}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
