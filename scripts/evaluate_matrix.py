"""Reference-scale evaluation matrix: estimators x clips x flow sources.

The reference's quantitative evaluation runs 4 estimators (+RANSAC/LMedS
variants) x 8 Blender clips x 3 motion-vector sources and publishes the
per-config average rotation error and runtime (docs/statistics/err_*.csv,
perf.csv; report.tex:925-1186).  This harness reproduces that shape with
generated data:

* clips  — 8 seeded rotation schedules; for the pixel-based sources each
  clip is RENDERED by warping a multi-octave texture through the exact
  per-frame rotation field (so dense-flow algorithms see real imagery with
  exact GT).
* sources — "gt-mv" (exact synthetic fields = the codec-MV analog),
  "block" (SAD pyramid dense flow), "rlof" (robust dense LK), each
  densified to the reference's <=150 grid.
* estimators — almeida(+RANSAC), homography (RANSAC/LMedS), multiview
  (5-point RANSAC), libmv 7-point: 7 configs -> 168 evaluations.

Writes ``docs_stats/err_<source>.csv`` (clips x estimators, avg deg/frame),
``docs_stats/perf_<source>.csv`` (ms/frame) and a summary markdown.

Run on the TPU:  python scripts/evaluate_matrix.py [outdir]
"""

from __future__ import annotations

import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

H = W = 288  # rendered clip resolution
T = 10  # frames per clip
GRID = 96  # densified grid max dim (reference: <=150; scaled to the render)

ESTIMATORS = [
    ("almeida", "almeida", {"use_ransac": False}),
    ("almeida-ransac", "almeida", {}),
    ("homography-ransac", "homography", {}),
    ("homography-lmeds", "homography", {"use_ransac": False}),
    ("multiview-ransac", "multiview", {}),
    ("multiview-lmeds", "multiview", {"use_ransac": False}),
    ("libmv-7pt", "libmv", {"algo_points": 7}),
    ("libmv-8pt", "libmv", {"algo_points": 8}),
]
# 8 estimator configs x 8 clips x 4 sources = 256 evaluations.  The
# reference's published matrix is 8 x 8 x 3 (docs/report.tex:919-925) with
# sources MPEG-MV / Farneback / RLOF; ours maps av (real codec MVs via the
# native encoder+decoder) / block / rlof onto those and ADDS gt-mv (exact
# synthetic fields) as a numerics floor.


def make_schedules(n_clips=8, seed=0):
    """Per-clip per-frame (roll, pitch, yaw) delta schedules in degrees."""
    rng = np.random.default_rng(seed)
    clips = []
    for c in range(n_clips):
        # Mix of static spans, pans and combined-axis moves, like the
        # reference's clip set (half "static-ish", half moving).
        mag = 0.2 + 0.8 * rng.random()
        axes = rng.random(3) < 0.7
        deltas = []
        for t in range(T):
            on = 1.0 if (t % 4 != 3 or c % 2 == 0) else 0.0
            d = mag * on * (axes * rng.uniform(0.5, 1.0, 3))
            deltas.append(tuple(d))
        clips.append(deltas)
    return clips


def render_clip(cam, deltas, seed, margin=96):
    """Render T+1 frames by sampling an OVERSIZED texture through the
    accumulated rotation.

    Two properties matter for parity with the reference's Blender renders:
    (1) each frame is ONE resample of the original texture (sequential
    frame-to-frame warping compounds bilinear blur), and (2) content exists
    beyond the visible frame (``margin`` px), so the accumulated rotation
    never drags a clamped/streaked boundary band into view — that band,
    not the flow algorithm, dominated the matrix error on the always-moving
    clips.
    """
    from scipy.ndimage import gaussian_filter, map_coordinates

    from ofps_tpu.core import quat
    from synthetic import euler_deg

    rng = np.random.default_rng(seed)
    big = sum(
        gaussian_filter(
            rng.uniform(-1, 1, (H + 2 * margin, W + 2 * margin)), s
        ).astype(np.float32)
        * s
        for s in (1, 2, 4, 8, 16)
    )
    big = (big - big.min()) / (big.max() - big.min()) * 255.0

    ys, xs = np.meshgrid(
        (np.arange(H) + 0.5) / H, (np.arange(W) + 0.5) / W, indexing="ij"
    )
    pts = jnp.asarray(
        np.stack([xs, ys], axis=-1).reshape(-1, 2).astype(np.float32)
    )

    def sample(q_acc):
        delta = np.asarray(
            cam.delta(pts, jnp.asarray(quat_to_m4(np.asarray(q_acc))))
        ).reshape(H, W, 2)
        sy = (ys + delta[..., 1]) * H + margin - 0.5
        sx = (xs + delta[..., 0]) * W + margin - 0.5
        return jnp.asarray(
            map_coordinates(big, [sy, sx], order=1, mode="nearest").astype(
                np.float32
            )
        )

    frames = [sample(quat.identity())]
    qs = []
    q_acc = quat.identity()
    for d in deltas:
        q = euler_deg(*d)
        qs.append(np.asarray(q))
        q_acc = quat.mul(q_acc, q)
        frames.append(sample(q_acc))
    return frames, qs


def quat_to_m4(q):
    from ofps_tpu.core import quat as qm

    return np.asarray(qm.to_matrix4(jnp.asarray(q, jnp.float32)))


def main(outdir=None):
    from ofps_tpu.core.camera import StandardCamera
    from ofps_tpu.estimators.base import create_estimator
    from ofps_tpu.apps import gt as gtmod
    from synthetic import synthetic_field

    outdir = outdir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs_stats",
    )
    os.makedirs(outdir, exist_ok=True)
    cam = StandardCamera.create(1.0, 90.0)
    schedules = make_schedules()

    # --- flow sources -----------------------------------------------------
    # Every non-GT source decodes the SAME MPEG-4 clip per clip index,
    # matching the reference's matrix structure (report.tex:919-925: one set
    # of Blender clips read by three decoder plugins).  block/rlof run the
    # PRODUCTION CvDecoder end to end — warm-started flow + Sobel contrast
    # mask + masked grid densify (lib.rs:156-291 parity), not a raw
    # dense-flow call; av extracts the clip's real codec motion vectors.
    import tempfile

    _tmpdir = tempfile.mkdtemp(prefix="ofps_eval_")
    _clip_cache = {}

    def encoded_clip(clip_idx):
        if clip_idx not in _clip_cache:
            from ofps_tpu.decoders.av import encode_gray_video

            frames, _ = render_clip(cam, schedules[clip_idx],
                                    seed=100 + clip_idx)
            arr = np.clip(
                np.stack([np.asarray(f) for f in frames]), 0.0, 255.0
            ).astype(np.uint8)
            path = os.path.join(_tmpdir, f"clip{clip_idx}.avi")
            encode_gray_video(path, arr, gop=T + 2)
            _clip_cache[clip_idx] = path
        return _clip_cache[clip_idx]

    def decoder_fields(decoder):
        """Drain a decoder into T per-frame SparseFlows (None = no MVs)."""
        from ofps_tpu.core.motion import SparseFlow

        out = []
        decoder.process_frame()  # frame 0: I-frame / flow warm-up, no MVs
        for _ in range(T):
            f = decoder.process_frame()
            if f is not None and f.has_mvs and len(f.pos) >= 8:
                out.append(
                    SparseFlow.from_arrays(
                        f.pos, f.motion, capacity=GRID * GRID
                    )
                )
            else:
                out.append(None)
        return out

    def source_fields(name, clip_idx):
        """Per-frame SparseFlow list for one clip through one source."""
        deltas = schedules[clip_idx]
        if name == "gt-mv":
            from synthetic import euler_deg

            return [
                synthetic_field(cam, euler_deg(*d), capacity=GRID * GRID)
                for d in deltas
            ]
        if name == "av":
            from ofps_tpu.decoders.base import create_decoder

            return decoder_fields(create_decoder(encoded_clip(clip_idx)))
        from ofps_tpu.decoders.cv import CvDecoder

        return decoder_fields(
            CvDecoder(
                encoded_clip(clip_idx),
                grid_max_dim=GRID,
                levels=4,
                use_rlof=(name == "rlof"),
            )
        )

    results = {}  # (source, clip, est) -> (avg_err_deg, ms_per_frame)
    sources = ["gt-mv", "av", "block", "rlof"]
    # One jitted step per estimator config, shared across sources and clips
    # (all fields have the same GRID*GRID capacity -> one compile each).
    jitted = {}
    warm_flow = synthetic_field(
        cam, _truth_quats(schedules[0])[0], capacity=GRID * GRID
    )
    for label, name, props in ESTIMATORS:
        est = create_estimator(name, **props)
        fn = jax.jit(est.estimate)
        # Warm the compile outside the timed loops.
        r, _, _ = fn(est.init(), warm_flow, cam, jax.random.PRNGKey(0))
        jax.block_until_ready(r)
        jitted[label] = (est, fn)
    for source in sources:
        for ci in range(len(schedules)):
            fields = source_fields(source, ci)
            truth_qs = [
                np.asarray(qq)
                for qq in _truth_quats(schedules[ci])
            ]
            for label, name, props in ESTIMATORS:
                est, fn = jitted[label]
                key = jax.random.PRNGKey(7)
                state = est.init()
                transforms = []
                t0 = time.perf_counter()
                for fl in fields:
                    if fl is None:  # no MVs (I-frame): pose holds
                        transforms.append(
                            np.array([1.0, 0.0, 0.0, 0.0], np.float32)
                        )
                        continue
                    key, sub = jax.random.split(key)
                    r, tr, state = fn(state, fl, cam, sub)
                    transforms.append(np.asarray(jax.device_get(r)))
                ms = (time.perf_counter() - t0) / T * 1e3
                errs = [
                    gtmod._qangle(gtmod.rotation_to(q_est, q_gt))
                    for q_est, q_gt in zip(transforms, truth_qs)
                ]
                avg_deg = float(np.degrees(np.mean(errs)))
                results[(source, ci, label)] = (avg_deg, ms)
                print(
                    f"{source:6s} clip{ci} {label:18s} "
                    f"err={avg_deg:8.4f} deg  {ms:7.2f} ms/frame",
                    flush=True,
                )

    # --- CSV export (docs/statistics layout) ------------------------------
    labels = [l for l, _, _ in ESTIMATORS]
    for source in sources:
        with open(os.path.join(outdir, f"err_{source}.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["clip"] + labels)
            for ci in range(len(schedules)):
                w.writerow(
                    [ci]
                    + [f"{results[(source, ci, l)][0]:.5f}" for l in labels]
                )
        with open(os.path.join(outdir, f"perf_{source}.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["clip"] + labels)
            for ci in range(len(schedules)):
                w.writerow(
                    [ci]
                    + [f"{results[(source, ci, l)][1]:.3f}" for l in labels]
                )

    with open(os.path.join(outdir, "SUMMARY.md"), "w") as f:
        f.write(
            "# Evaluation matrix summary\n\n"
            f"{len(sources)} sources x {len(schedules)} clips x "
            f"{len(labels)} estimator configs = "
            f"{len(sources)*len(schedules)*len(labels)} evaluations "
            f"(backend: {jax.default_backend()}).\n\n"
            "ms/frame here is WALL time of the sequential per-frame loop "
            "and is dominated by the ~29 ms axon tunnel dispatch per call; "
            "device-time per-estimator numbers are in PARITY_BENCH.md "
            "(scan-chained, dispatch amortized).\n\n"
            "| source | estimator | avg err (deg/frame) | ms/frame |\n"
            "|---|---|---|---|\n"
        )
        for source in sources:
            for l in labels:
                errs = [results[(source, ci, l)][0] for ci in range(len(schedules))]
                mss = [results[(source, ci, l)][1] for ci in range(len(schedules))]
                f.write(
                    f"| {source} | {l} | {np.mean(errs):.4f} | "
                    f"{np.mean(mss):.2f} |\n"
                )
    run_translation_matrix(outdir)
    print(f"wrote {outdir}")


def _truth_quats(deltas):
    from synthetic import euler_deg

    return [euler_deg(*d) for d in deltas]


# --- translation (ATE) section --------------------------------------------
#
# The reference's GT schema carries positions (tracking/mod.rs:111-123) and
# its suite exports position stats in the tracking CSVs (mod.rs:813-850),
# but its published matrix scores rotation only.  We publish the missing
# column: libmv (the translation-emitting estimator chain,
# libmv-estimator/src/lib.rs:213-279) integrated over seeded 3-D camera
# paths, scored with scale-aligned ATE (monocular translation is observable
# up to one global scale; the chain's triangulate_scale keeps it consistent).
#
# Source: exact projections of a seeded non-planar point cloud — the gt-mv
# analog.  The pixel sources cannot serve here: the rendered clips warp a
# flat texture (a rotation-only scene with no parallax), and no 3-D renderer
# exists in this environment, so ATE over decoded pixels is not measurable.

T_PATH = 6  # positions per translation path (T_PATH - 1 flow frames)


def make_translation_paths(n_paths=4, seed=11):
    """Seeded 3-D paths: per-path (quats, positions), varied directions."""
    from ofps_tpu.core import quat
    from synthetic import euler_deg

    rng = np.random.default_rng(seed)
    paths = []
    for c in range(n_paths):
        step = 0.06 + 0.06 * rng.random()
        d = rng.normal(size=3)
        positions = [np.zeros(3, np.float32)]
        quats = [np.asarray(quat.identity())]
        for t in range(T_PATH - 1):
            # Slowly turning heading; odd paths also rotate the camera.
            d = d + 0.6 * rng.normal(size=3)
            d /= np.linalg.norm(d)
            positions.append(
                (positions[-1] + step * d.astype(np.float32)).astype(
                    np.float32
                )
            )
            dq = (
                euler_deg(*rng.uniform(-0.5, 0.5, 3))
                if c % 2 == 1
                else quat.identity()
            )
            quats.append(np.asarray(quat.mul(jnp.asarray(quats[-1]), dq)))
        paths.append((quats, positions))
    return paths


def translation_cloud(cam, n=40, seed=0):
    """Non-planar cloud (epipolar translation needs depth parallax)."""
    from synthetic import get_grid

    rng = np.random.default_rng(seed)
    g = np.asarray(get_grid(n, n, cam))
    return jnp.asarray(
        g * rng.uniform(0.3, 1.0, (len(g), 1)).astype(np.float32)
    )


def path_fields(cam, cloud, quats, positions, capacity=1600):
    """Exact per-frame SparseFlows of the cloud along the path."""
    from synthetic import calc_view

    from ofps_tpu.core.motion import SparseFlow

    out = []
    for i in range(len(positions) - 1):
        v1 = calc_view(jnp.asarray(quats[i]), jnp.asarray(positions[i]))
        v2 = calc_view(
            jnp.asarray(quats[i + 1]), jnp.asarray(positions[i + 1])
        )
        a = np.asarray(cam.project(cloud, v1))
        b = np.asarray(cam.project(cloud, v2))
        keep = (np.abs(a - 0.5).max(1) < 0.5) & (np.abs(b - 0.5).max(1) < 0.5)
        out.append(
            SparseFlow.from_arrays(a[keep], (b - a)[keep], capacity=capacity)
        )
    return out


def eval_translation_path(cam, cloud, quats, positions, algo_points):
    """(ate_pct_of_path, mean_dir_err_deg, avg_rot_err_deg) for one path."""
    from ofps_tpu.apps import gt as gtmod
    from ofps_tpu.core import quat
    from ofps_tpu.estimators.base import create_estimator

    est = create_estimator("libmv", algo_points=algo_points)
    fn = jax.jit(est.estimate)
    state = est.init()
    key = jax.random.PRNGKey(7)
    r_acc = jnp.asarray(quats[0])
    p_acc = jnp.zeros(3, jnp.float32)
    rots, poss = [], []
    for flow in path_fields(cam, cloud, quats, positions):
        key, sub = jax.random.split(key)
        r, t, state = fn(state, flow, cam, sub)
        # motion_step (estimator.rs:38-53): pos += rot * tr; rot = r * rot.
        p_acc = p_acc + quat.rotate_vec(r_acc, t)
        r_acc = quat.mul(r, r_acc)
        rots.append(np.asarray(r_acc))
        poss.append(np.asarray(p_acc))
    truth = [
        gtmod.GroundTruthRow(
            frame=i,
            fov_x=90.0,
            fov_y=90.0,
            rot=np.asarray(quats[i], np.float64),
            pos=np.asarray(positions[i], np.float64),
        )
        for i in range(1, len(positions))
    ]
    ate, stats = gtmod.calc_pos_err(truth, poss)
    path_len = sum(
        float(np.linalg.norm(np.subtract(b, a)))
        for a, b in zip(positions, positions[1:])
    )
    rot_errs = [
        gtmod._qangle(gtmod.rotation_to(qe, np.asarray(qg)))
        for qe, qg in zip(rots, quats[1:])
    ]
    return (
        100.0 * ate / path_len,
        float(np.degrees(np.mean([s.error_dir for s in stats]))),
        float(np.degrees(np.mean(rot_errs))),
    )


def run_translation_matrix(outdir):
    """ate.csv + the SUMMARY.md translation section; returns the rows."""
    from ofps_tpu.core.camera import StandardCamera

    cam = StandardCamera.create(1.0, 90.0)
    cloud = translation_cloud(cam)
    paths = make_translation_paths()
    rows = []
    for ci, (quats, positions) in enumerate(paths):
        row = {"clip": ci}
        for pts in (7, 8):
            ate_pct, dir_deg, rot_deg = eval_translation_path(
                cam, cloud, quats, positions, pts
            )
            row[f"ate_pct_{pts}pt"] = ate_pct
            row[f"dir_deg_{pts}pt"] = dir_deg
            row[f"rot_deg_{pts}pt"] = rot_deg
            print(
                f"trans path{ci} libmv-{pts}pt  ATE={ate_pct:6.2f}% of path"
                f"  dir={dir_deg:6.2f} deg  rot={rot_deg:.4f} deg",
                flush=True,
            )
        rows.append(row)
    cols = [
        "clip",
        "ate_pct_7pt", "dir_deg_7pt", "rot_deg_7pt",
        "ate_pct_8pt", "dir_deg_8pt", "rot_deg_8pt",
    ]
    with open(os.path.join(outdir, "ate.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(cols)
        for row in rows:
            w.writerow(
                [row["clip"]] + [f"{row[c]:.4f}" for c in cols[1:]]
            )
    with open(os.path.join(outdir, "SUMMARY.md"), "a") as f:
        f.write(
            "\n## Translation (scale-aligned ATE)\n\n"
            "libmv chain integrated over 4 seeded 3-D camera paths "
            "(exact cloud projections — see scripts/evaluate_matrix.py for "
            "why pixel sources cannot measure parallax here); ATE is the "
            "scale-aligned RMS trajectory error as %% of path length, dir "
            "the mean per-frame translation-direction error.  The reference "
            "carries GT positions (tracking/mod.rs:111-123) but never "
            "scores them; no reference column exists.\n\n"
            "| path | libmv-7pt ATE | 7pt dir | libmv-8pt ATE | 8pt dir |\n"
            "|---|---|---|---|---|\n"
        )
        for row in rows:
            f.write(
                f"| {row['clip']} | {row['ate_pct_7pt']:.2f}% | "
                f"{row['dir_deg_7pt']:.2f} deg | {row['ate_pct_8pt']:.2f}% | "
                f"{row['dir_deg_8pt']:.2f} deg |\n"
            )
    return rows


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
