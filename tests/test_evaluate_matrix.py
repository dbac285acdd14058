"""CI gate on the quantitative evaluation matrix (scaled down).

The reference publishes per-(source, estimator) average rotation errors over
8 Blender clips (docs/report.tex:919-1186, BASELINE.md).  Nothing gated
those numbers here until round 3 — regressions in flow quality or estimator
accuracy were invisible to CI.  This runs two clips (the hardest,
always-moving clip 0 and an easy clip 5), encoded to MPEG-4 exactly like
the full matrix, through the av (codec MVs) and block (production
CvDecoder: warm-started flow + Sobel mask + masked densify) sources plus
exact gt-mv fields, and asserts per-config error ceilings calibrated on
THIS (CPU-mesh) platform with ~1.7x headroom (argmin ties and RANSAC draws
wiggle the numbers a few percent).

Platform note: CI runs the XLA reference flow path (also the spatially-
sharded multi-chip path); the single-chip TPU serving path runs the fused
Pallas kernels.  The two paths compute the same algorithm (axis-separable
refine at warm levels, 2-D argmin at coarse/small levels, edge-padded
candidate windows, displacement tie prior) and are parity-gated in
tests/test_flow_refine_kernel.py (zero-bias + bounded-scatter + EPE-
quality gates); scripts/check_backend_agreement.py additionally asserts
CPU-vs-TPU agreement of whole-matrix cells on the live chip.
docs_stats/SUMMARY.md carries the TPU numbers.

Reference comparison points (BASELINE.md): Farneback column plain almeida
0.0205, homography 0.0285; MPEG column almeida 0.0237/0.0480 deg/frame.
"""

import os

import numpy as np
import pytest

import jax

import scripts.evaluate_matrix as em
from ofps_tpu.apps import gt as gtmod
from ofps_tpu.core.camera import StandardCamera
from ofps_tpu.core.motion import SparseFlow
from ofps_tpu.estimators.base import create_estimator
from synthetic import euler_deg, synthetic_field

# (label, estimator, props) -> max avg deg/frame per (source, clip).
GATES = {
    # libmv-7pt pins the LO-refit degenerate rule: on exact pure-rotation
    # fields the fundamental has a 3-dim solution family, and a refit
    # accepted without strict error improvement replaces the minimal-
    # sample model with an arbitrary family member whose twisted-pair
    # resolution flips per-backend (measured 0.0016 CPU / 0.4765 TPU
    # before the rule; ~0.004 on both after).
    ("gt-mv", 0): {"almeida": 1e-3, "almeida-ransac": 1e-3,
                   "homography-ransac": 0.02, "multiview-lmeds": 0.06,
                   "libmv-7pt": 0.02},
    ("block", 0): {"almeida": 0.12, "almeida-ransac": 0.021,
                   "homography-ransac": 0.055, "multiview-lmeds": 0.03},
    ("block", 5): {"almeida": 0.017, "almeida-ransac": 0.016,
                   "homography-ransac": 0.03, "multiview-lmeds": 0.028},
    # Real codec MVs through the native MPEG-4 encoder+decoder (the
    # reference's primary source; its av column reads 0.0237/0.0480 on the
    # representative clips — we gate at ~2-8x better).  The epipolar cells
    # gate the round-4 adaptive RANSAC threshold + LO refit (without them
    # quarter-pel codec noise broke consensus counting: multiview-ransac
    # read 0.1932 avg vs the reference's ~0.104; now 0.0305 — measured
    # clip0 0.0153/0.0157, gated with ~2x headroom).
    # libmv-7pt tightened 0.035 -> 0.030 in r5: the Gauss-Newton essential-
    # manifold polish (estimators/libmv.py gn_polish) measured 0.0197 here.
    ("av", 0): {"almeida": 0.012, "almeida-ransac": 0.018,
                "homography-ransac": 0.09, "multiview-ransac": 0.035,
                "libmv-7pt": 0.030},
    ("av", 5): {"almeida": 0.010, "almeida-ransac": 0.015,
                "homography-ransac": 0.09},
    # Robust dense-LK (rlof slot) through the production decoder; the warm
    # guard is what holds clip 0 (unguarded it reads 0.125).
    ("rlof", 0): {"almeida": 0.025, "almeida-ransac": 0.021},
    ("rlof", 5): {"almeida": 0.008, "almeida-ransac": 0.013},
}

CONFIGS = [
    ("almeida", "almeida", {"use_ransac": False}),
    ("almeida-ransac", "almeida", {}),
    ("homography-ransac", "homography", {}),
    ("multiview-ransac", "multiview", {}),
    ("multiview-lmeds", "multiview", {"use_ransac": False}),
    ("libmv-7pt", "libmv", {"algo_points": 7}),
]


@pytest.fixture(scope="module")
def camera():
    return StandardCamera.create(1.0, 90.0)


def _run_configs(camera, fields, truth_qs, only=None):
    errs = {}
    for label, name, props in CONFIGS:
        if only is not None and label not in only:
            continue
        est = create_estimator(name, **props)
        fn = jax.jit(est.estimate)
        key = jax.random.PRNGKey(7)
        state = est.init()
        out = []
        for fl in fields:
            key, sub = jax.random.split(key)
            r, _, state = fn(state, fl, camera, sub)
            out.append(np.asarray(r))
        errs[label] = float(
            np.degrees(
                np.mean(
                    [
                        gtmod._qangle(gtmod.rotation_to(qe, qg))
                        for qe, qg in zip(out, truth_qs)
                    ]
                )
            )
        )
    return errs


def _encoded_clip(camera, ci, tmp_path):
    """Rendered eval clip -> MPEG-4 via the native encoder (matrix parity)."""
    from ofps_tpu.decoders.av import encode_gray_video

    frames, _ = em.render_clip(camera, em.make_schedules()[ci], seed=100 + ci)
    arr = np.clip(
        np.stack([np.asarray(f) for f in frames]), 0, 255
    ).astype(np.uint8)
    path = os.path.join(str(tmp_path), "clip.avi")
    encode_gray_video(path, arr, gop=em.T + 2)
    return path


def _drain(decoder):
    """First frame (no MVs) skipped, then T per-frame SparseFlows."""
    first = decoder.process_frame()
    assert first is not None and not first.has_mvs
    out = []
    for _ in range(em.T):
        f = decoder.process_frame()
        assert f is not None and f.has_mvs
        out.append(
            SparseFlow.from_arrays(f.pos, f.motion, capacity=em.GRID * em.GRID)
        )
    return out


def _av_fields(camera, ci, tmp_path):
    """Real codec MVs: rendered clip -> native MPEG-4 encode -> +export_mvs."""
    from ofps_tpu.decoders.base import create_decoder

    return _drain(create_decoder(_encoded_clip(camera, ci, tmp_path)))


def _cv_fields(camera, ci, tmp_path, use_rlof):
    """The PRODUCTION cv decoder (warm-started flow + Sobel contrast mask +
    masked grid densify) over the encoded clip — the same path the full
    matrix and the serving stack use."""
    from ofps_tpu.decoders.cv import CvDecoder

    return _drain(
        CvDecoder(
            _encoded_clip(camera, ci, tmp_path),
            grid_max_dim=em.GRID,
            levels=4,
            use_rlof=use_rlof,
        )
    )


@pytest.mark.parametrize("source,ci", sorted(GATES))
def test_matrix_gate(camera, source, ci, tmp_path):
    deltas = em.make_schedules()[ci]
    truth = [np.asarray(q) for q in em._truth_quats(deltas)]
    if source == "gt-mv":
        fields = [
            synthetic_field(camera, euler_deg(*d), capacity=em.GRID * em.GRID)
            for d in deltas
        ]
    elif source == "av":
        fields = _av_fields(camera, ci, tmp_path)
    else:
        fields = _cv_fields(camera, ci, tmp_path, use_rlof=(source == "rlof"))
    gates = GATES[(source, ci)]
    errs = _run_configs(camera, fields, truth, only=set(gates))
    for label, ceiling in gates.items():
        assert errs[label] <= ceiling, (
            f"{source} clip{ci} {label}: {errs[label]:.4f} > {ceiling}"
        )


def test_translation_matrix_cell(camera):
    """Gates one cell of the published ATE matrix (docs_stats/ate.csv):
    the libmv-8pt chain on translation path 0 must hold scale-aligned ATE
    under 10% of path length and direction error under 11 deg — the same
    bars tests/test_translation_gt.py establishes, here pinned to the
    exact path/cloud seeds the published artifact uses."""
    cloud = em.translation_cloud(camera)
    quats, positions = em.make_translation_paths()[0]
    ate_pct, dir_deg, _ = em.eval_translation_path(
        camera, cloud, quats, positions, algo_points=8
    )
    assert ate_pct < 10.0, ate_pct
    assert dir_deg < 11.0, dir_deg
