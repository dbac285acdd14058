"""App-layer tests: properties, runtime, detection/tracking apps, CLI, viz."""

import json
import math
import os
import time

import numpy as np
import pytest

import jax

from ofps_tpu.apps import gt as gtmod
from ofps_tpu.core import quat
from ofps_tpu.core.properties import describe, set_properties
from ofps_tpu.decoders.base import DecodedFrame
from ofps_tpu.decoders.mvec import write_mvec_frame
from ofps_tpu.estimators.almeida import AlmeidaParams
from ofps_tpu.pipeline.runtime import DecoderFeed, PerfStats
from synthetic import euler_deg, synthetic_field
from ofps_tpu.core.camera import StandardCamera


# -- properties ---------------------------------------------------------------


def test_properties_describe_and_set():
    params = AlmeidaParams()
    props = {p.name: p for p in describe("almeida", params)}
    assert props["use_ransac"].kind == "bool"
    assert props["num_iters"].kind == "usize"
    assert props["inlier_angle_deg"].kind == "float"
    assert props["num_iters"].bounds == (1, 500)

    p2 = set_properties("almeida", params, {"num_iters": 50, "use_ransac": False})
    assert p2.num_iters == 50 and p2.use_ransac is False
    # Clamping to declared bounds (BoundedProp slider semantics).
    p3 = set_properties("almeida", params, {"num_iters": 99999})
    assert p3.num_iters == 500

    with pytest.raises(KeyError):
        set_properties("almeida", params, {"nope": 1})
    with pytest.raises(TypeError):
        set_properties("almeida", params, {"use_ransac": 3})


# -- runtime ------------------------------------------------------------------


class FakeDecoder:
    def __init__(self, n):
        self.n = n
        self.i = 0

    def process_frame(self, want_frame=False, skip=0):
        if self.i >= self.n:
            return None
        self.i += 1
        pos = np.full((4, 2), 0.5, np.float32)
        mot = np.full((4, 2), 0.01 * self.i, np.float32)
        return DecodedFrame(pos=pos, motion=mot)

    def get_framerate(self):
        return 30.0

    def get_aspect(self):
        return (64, 48)


def test_decoder_feed_order_and_stats(tmp_path):
    feed = DecoderFeed(FakeDecoder(7))
    frames = list(feed)
    assert len(frames) == 7
    # Frames arrive in order with decode timing attached.
    assert [f.motion[0, 0] for f in frames] == pytest.approx(
        [0.01 * (i + 1) for i in range(7)]
    )
    assert all(hasattr(f, "decode_time") for f in frames)

    stats = PerfStats()
    for f in frames:
        stats.add("decode", f.decode_time)
        with stats.time("estimate"):
            pass
    s = stats.summary()
    assert s["decode"]["frames"] == 7 and s["estimate"]["frames"] == 7
    path = tmp_path / "perf.csv"
    stats.write_csv(str(path))
    lines = path.read_text().strip().splitlines()
    assert lines[0] == "frame,decode,estimate" and len(lines) == 8


def test_decoder_feed_propagates_errors():
    class Boom(FakeDecoder):
        def process_frame(self, want_frame=False, skip=0):
            if self.i >= 2:
                raise IOError("boom")
            return super().process_frame(want_frame, skip)

    with pytest.raises(IOError):
        list(DecoderFeed(Boom(5)))


# -- detection app ------------------------------------------------------------


def _write_mvec(path, frames_moving):
    """Frames with uniform strong motion (or none) on a 20x20 grid."""
    xs = (np.arange(20) + 0.5) / 20
    pos = np.stack(np.meshgrid(xs, xs), -1).reshape(-1, 2).astype(np.float32)
    with open(path, "wb") as f:
        for moving in frames_moving:
            mot = np.full_like(pos, 0.05 if moving else 0.0)
            write_mvec_frame(f, pos, mot)


def test_detection_ranges(tmp_path):
    from ofps_tpu.apps.detection import DetectionSettings, run_detection

    pattern = [False] * 3 + [True] * 8 + [False] * 2 + [True] * 7 + [False] * 3
    path = str(tmp_path / "in.mvec")
    _write_mvec(path, pattern)
    res = run_detection(path, settings=DetectionSettings())
    assert res.frames == len(pattern)
    # Raw ranges: moving spans at [3,10] and [13,19].
    assert res.motion_ranges == [(3, 10), (13, 19)]
    # The inter-range gap is 13-10=3: coalesced iff max_frame_gap >= 3.
    assert res.filtered_ranges(3, 5) == [(3, 19)]
    assert res.filtered_ranges(2, 5) == [(3, 10), (13, 19)]
    assert res.filtered_ranges(2, 7) == [(3, 10)]

    csv_path = tmp_path / "ranges.csv"
    res.write_ranges_csv(str(csv_path), DetectionSettings(max_frame_gap=3))
    assert csv_path.read_text().strip() == "3,19"


# -- ground truth -------------------------------------------------------------


def _gt_rows(q, n):
    """Blender-style GT rebased to the first frame: row 1 is identity.

    (scripts/blender_ground_truth.py rebases; the decoder's first frame is
    an I-frame with no MVs, so transforms[0] is identity too.)
    """
    rows = []
    acc = np.array(quat.identity())
    for k in range(1, n + 1):
        rows.append(
            gtmod.GroundTruthRow(
                frame=k, fov_x=90.0, fov_y=90.0, rot=acc.copy(), pos=np.zeros(3)
            )
        )
        acc = np.asarray(quat.mul(q, acc))
    return rows


def test_gt_round_trip_and_err(tmp_path):
    q = np.asarray(euler_deg(0.0, 0.0, 0.5))
    rows = _gt_rows(q, 6)
    path = str(tmp_path / "gt.csv")
    gtmod.write_ground_truth(path, rows)
    loaded = gtmod.load_ground_truth(path)
    assert len(loaded) == 6 and loaded[3].frame == 4
    np.testing.assert_allclose(loaded[2].rot, rows[2].rot, atol=1e-6)

    # Perfect transforms -> ~zero error (row 1 pairs identity vs identity).
    transforms = [np.array(quat.identity())] + [q] * 5
    stats = gtmod.calc_err(loaded, transforms)
    assert len(stats) == 6
    for s in stats:
        assert s.error < 1e-5
    avg = gtmod.calc_avg_err(loaded, transforms)
    assert avg[0] < 1e-5

    # A wrong transform shows up at the right frame.
    bad = list(transforms)
    bad[3] = np.asarray(euler_deg(0.0, 0.0, 1.5))
    stats_bad = gtmod.calc_err(loaded, bad)
    assert stats_bad[3].frame == 3  # GT row frame=4 reads transforms[3]
    assert stats_bad[3].error > math.radians(0.9)


# -- tracking app end-to-end --------------------------------------------------


def test_tracking_config_end_to_end(tmp_path):
    from ofps_tpu.apps.tracking import run_tracking_config

    cam = StandardCamera.create(1.0, 90.0)
    q = euler_deg(0.0, 0.3, 0.2)
    flow = synthetic_field(cam, q)
    pos = np.asarray(flow.pos)[np.asarray(flow.mask) > 0.5]
    mot = np.asarray(flow.motion)[np.asarray(flow.mask) > 0.5]
    n = 5
    mvec = str(tmp_path / "in.mvec")
    with open(mvec, "wb") as f:
        # First frame: I-frame, no MVs (identity estimate expected).
        write_mvec_frame(f, np.zeros((0, 2)), np.zeros((0, 2)))
        for _ in range(n - 1):
            write_mvec_frame(f, pos, mot)
    gt_path = str(tmp_path / "gt.csv")
    gtmod.write_ground_truth(gt_path, _gt_rows(np.asarray(q), n))

    config = {
        "app": "tracking",
        "decoder": {"input": mvec},
        "camera_aspect": 1.0,
        "camera_fov_y": 90.0,
        "estimators": [
            {"name": "almeida", "properties": {"num_iters": 64}},
            {"name": "homography", "enabled": False},
        ],
        "ground_truth": gt_path,
        "output": {
            "stats_csv_prefix": str(tmp_path / "stats_"),
            "perf_csv": str(tmp_path / "perf.csv"),
            "plot_prefix": str(tmp_path / "plot_"),
        },
    }
    res = run_tracking_config(config)
    assert res.frames == n
    assert [t.name for t in res.tracks] == ["almeida"]
    track = res.tracks[0]
    truth = gtmod.load_ground_truth(gt_path)
    avg = track.avg_err(truth)
    # Same 10%-of-rotation class bound as the estimator suite.
    assert avg[0] < math.radians(0.36) * 0.1, math.degrees(avg[0])
    # Integrated pose after n frames ~ q^(n-1) (first frame is identity).
    expect = truth[-1].rot
    got = track.poses_rot[-1]
    assert float(quat.angle_to(got, expect)) < math.radians(0.2)

    assert os.path.exists(tmp_path / "stats_almeida.csv")
    assert os.path.exists(tmp_path / "perf.csv")
    assert os.path.exists(tmp_path / "plot_almeida.png")
    header = (tmp_path / "stats_almeida.csv").read_text().splitlines()[0]
    assert header.split(",")[:4] == ["frame", "delta", "delta_r", "delta_p"]


# -- CLI ----------------------------------------------------------------------


def test_cli_extract_and_config(tmp_path):
    from ofps_tpu.apps.cli import main
    from ofps_tpu.decoders.av import encode_test_video
    from ofps_tpu.decoders.flo import read_flo

    clip = str(tmp_path / "clip.avi")
    encode_test_video(clip, 160, 120, frames=8, gop=30, dx=1.0, dy=0.0)

    mvec = str(tmp_path / "out.mvec")
    assert main(["motion-extract", clip, mvec]) == 0
    assert os.path.getsize(mvec) > 0

    flodir = str(tmp_path / "flo")
    assert main(["flow-extract", mvec, flodir, "--width", "40", "--height", "30"]) == 0
    flo = read_flo(os.path.join(flodir, "000001.flo"))
    assert flo.shape == (30, 40, 2)
    assert np.all(np.isfinite(flo))
    # The clip's MVs carry ~+1px/frame (1/160 normalized * 40 cells wide
    # = 0.25 cell units) on a sparse subset of grid cells; hole-filled
    # cells are DAMPED by the reference fill quirk (scale^2 sums vs scale
    # counts, motion_field.rs:141-147+265) and the 11x11 blur spreads that
    # over the sources too, so the field settles in a damped positive band
    # (~0.3x the source motion) with x dominating y.
    assert 0.03 < np.median(flo[..., 0]) < 0.2
    assert np.median(flo[..., 0]) > 5.0 * abs(np.median(flo[..., 1]))

    cfg = {
        "app": "detection",
        "decoder": {"input": mvec},
        "detector": {"name": "block_motion", "properties": {"target_motion": 0.004}},
        "settings": {"max_frame_gap": 2, "min_frames": 1},
        "output": {"ranges_csv": str(tmp_path / "r.csv")},
    }
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    assert main(["run-config", cfg_path]) == 0
    assert os.path.exists(tmp_path / "r.csv")

    assert main(["info"]) == 0


# -- external plugins -----------------------------------------------------------


def test_external_plugin_discovery(tmp_path, monkeypatch):
    """PluginStore parity: OFPS_TPU_PLUGINS modules register components."""
    (tmp_path / "extplug.py").write_text(
        "from ofps_tpu.detectors.base import DetectorInstance, register\n"
        "@register('ext_detector')\n"
        "def make(**kw):\n"
        "    return DetectorInstance(name='ext_detector', params=None,"
        " detect=None)\n"
    )
    import sys

    import ofps_tpu.core.plugins as plugmod

    monkeypatch.syspath_prepend(str(tmp_path))
    monkeypatch.setenv("OFPS_TPU_PLUGINS", "extplug")
    monkeypatch.setattr(plugmod, "_LOADED", False)
    from ofps_tpu.detectors.base import available_detectors

    assert "ext_detector" in available_detectors()
    # A broken plugin module must not break discovery.
    monkeypatch.setenv("OFPS_TPU_PLUGINS", "no_such_module_xyz")
    monkeypatch.setattr(plugmod, "_LOADED", False)
    assert "block_motion" in available_detectors()


# -- keyframe keeper ------------------------------------------------------------


def test_keyframe_keeper_evicts_redundant():
    from ofps_tpu.apps.tracking import KeyframeKeeper

    kk = KeyframeKeeper(max_frames=4)
    # Distinct yaws 0/10/20/30 deg, then a near-duplicate of 10 deg: the
    # duplicate pair is the most redundant; one of them must go.
    yaws = [0.0, 10.0, 20.0, 30.0, 10.01]
    for i, y in enumerate(yaws):
        kk.add(i, np.asarray(euler_deg(0, 0, y)))
    assert len(kk.frames) == 4
    kept = sorted(f[0] for f in kk.frames)
    assert kept in ([0, 2, 3, 4], [0, 1, 2, 3])  # one of the 10-deg pair left

    # Three equidistant poses: the middle one is the most redundant.
    kk2 = KeyframeKeeper(max_frames=2)
    for i in range(3):
        kk2.add(i, np.asarray(euler_deg(0, 0, i * 5.0)))
    assert [f[0] for f in kk2.frames] == [0, 2]

    # With <= 2 kept frames the oldest goes (worker.rs:111-113).
    kk3 = KeyframeKeeper(max_frames=1)
    kk3.add(0, np.asarray(euler_deg(0, 0, 0.0)))
    kk3.add(1, np.asarray(euler_deg(0, 0, 5.0)))
    assert [f[0] for f in kk3.frames] == [1]


# -- tcp ingestion --------------------------------------------------------------


def test_mvec_over_tcp(tmp_path):
    import socket
    import threading

    from ofps_tpu.decoders.mvec import write_mvec_frame

    pos = np.random.RandomState(0).rand(8, 2).astype(np.float32)
    mot = np.random.RandomState(1).rand(8, 2).astype(np.float32) * 0.01

    # Pick a free port.
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    def client():
        import io, time

        buf = io.BytesIO()
        for _ in range(3):
            write_mvec_frame(buf, pos, mot)
        for _ in range(100):  # wait for the listener
            try:
                s = socket.create_connection(("127.0.0.1", port), timeout=0.3)
                break
            except OSError:
                time.sleep(0.05)
        s.sendall(buf.getvalue())
        s.close()

    t = threading.Thread(target=client, daemon=True)
    t.start()
    # utils.rs open_file parity: tcp://@:port listens and accepts one peer.
    from ofps_tpu.decoders.base import create_decoder

    d = create_decoder(f"tcp://@:{port}", plugin="mvec")
    for _ in range(3):
        f = d.process_frame()
        np.testing.assert_array_equal(f.pos, pos)
        np.testing.assert_array_equal(f.motion, mot)
    assert d.process_frame() is None
    t.join(timeout=5)


# -- stats aggregation --------------------------------------------------------


def test_stats_summary(tmp_path):
    from ofps_tpu.apps.stats import summarize_stats_dir

    (tmp_path / "stats_almeida.csv").write_text(
        "frame,delta,delta_r,delta_p,delta_y,r,p,y,error,error_r,error_p,error_y\n"
        "0,0.01,0,0,0.01,0,0,0.01,0.002,0.001,0.0,0.001\n"
        "1,0.01,0,0,0.01,0,0,0.02,0.004,0.002,0.0,0.002\n"
    )
    (tmp_path / "perf.csv").write_text(
        "frame,decode,estimate\n0,1.0,5.0\n1,3.0,7.0\n"
    )
    out = tmp_path / "summary.csv"
    rows = summarize_stats_dir(str(tmp_path), str(out))
    assert len(rows) == 1 and rows[0]["estimator"] == "almeida"
    assert rows[0]["avg_error_deg"] == pytest.approx(math.degrees(0.003))
    assert rows[0]["avg_decode_ms"] == pytest.approx(2.0)
    assert rows[0]["avg_estimate_ms"] == pytest.approx(6.0)
    assert out.exists() and "almeida" in out.read_text()


# -- viz ----------------------------------------------------------------------


def test_flow_to_rgba():
    from ofps_tpu.apps.viz import flow_to_rgba, overlay

    field = np.zeros((4, 6, 2), np.float32)
    field[1, 1] = [1.0, 0.0]
    field[2, 3] = [0.0, -0.5]
    rgba = flow_to_rgba(field)
    assert rgba.shape == (4, 6, 4) and rgba.dtype == np.uint8
    assert rgba[0, 0, 3] == 0  # zero motion -> transparent
    assert rgba[1, 1, 3] == 255  # |m|=1 -> saturated alpha
    # Distinct directions -> distinct hues.
    assert not np.array_equal(rgba[1, 1, :3], rgba[2, 3, :3])

    frame = np.full((16, 24, 4), 64, np.uint8)
    out = overlay(frame, rgba)
    assert out.shape == (16, 24, 4)
    assert not np.array_equal(out, frame)  # overlay applied


def test_decoder_feed_early_stop_joins_worker():
    """stop() while the worker is blocked on a full queue must not stall.

    Round-1 drained at most one item, so the worker's final _END put blocked
    forever: every early-stopped feed leaked its thread after a 5 s join
    timeout.
    """
    feed = DecoderFeed(FakeDecoder(1000))
    it = iter(feed)
    next(it)
    next(it)  # worker now blocked putting frame ~4
    t0 = time.perf_counter()
    feed.stop()
    assert time.perf_counter() - t0 < 2.0, "stop() stalled"
    assert not feed._thread.is_alive(), "decoder thread leaked"


def test_run_batch_with_ground_truth(tmp_path):
    """B streams with per-stream GT: per-stream stats CSVs + avg errors.

    The batch-scale version of the reference's multi-config tracking
    evaluation (tracking/mod.rs:756-1028).
    """
    from ofps_tpu.apps.batch import run_batch

    cam = StandardCamera.create(1.0, 90.0)
    schedules = [(0.0, 0.0, 0.4), (0.3, 0.0, 0.0), (0.0, -0.3, 0.2),
                 (0.1, 0.1, -0.1)]
    inputs, gts = [], []
    n = 5
    for si, (r, p, y) in enumerate(schedules):
        q = euler_deg(r, p, y)
        flow = synthetic_field(cam, q)
        keep = np.asarray(flow.mask) > 0.5
        mvec = str(tmp_path / f"in{si}.mvec")
        with open(mvec, "wb") as f:
            write_mvec_frame(f, np.zeros((0, 2)), np.zeros((0, 2)))
            for _ in range(n - 1):
                write_mvec_frame(
                    f, np.asarray(flow.pos)[keep], np.asarray(flow.motion)[keep]
                )
        gt = str(tmp_path / f"gt{si}.csv")
        gtmod.write_ground_truth(gt, _gt_rows(np.asarray(q), n))
        inputs.append(mvec)
        gts.append(gt)

    res = run_batch(
        inputs,
        estimators=[{"name": "almeida", "properties": {"num_iters": 64}}],
        detector=None,
        camera_aspect=1.0,
        camera_fov_y=90.0,
        ground_truths=gts,
        stats_csv_prefix=str(tmp_path / "bstats_"),
    )
    assert res.frames == n and res.streams == 4
    # Every stream tracked its own schedule within the usual 10% gate.
    for si, (r, p, y) in enumerate(schedules):
        avg = res.gt_avg_err[(si, "almeida")]
        mag = math.radians(max(abs(r), abs(p), abs(y)))
        assert avg[0] < 0.1 * mag + 1e-4, (si, avg)
        path = tmp_path / f"bstats_s{si}_almeida.csv"
        assert path.exists()
        lines = path.read_text().strip().splitlines()
        assert len(lines) == n + 1  # header + n frames


def test_keyframe_export_with_payload(tmp_path):
    from ofps_tpu.apps.tracking import KeyframeKeeper

    kk = KeyframeKeeper(max_frames=3)
    img = np.zeros((8, 8, 4), np.uint8)
    img[..., 3] = 255
    for i in range(6):
        q = np.asarray(euler_deg(0.0, 0.0, 3.0 * i), np.float64)
        kk.add(i, q, payload=img if i % 2 == 0 else None)
    assert len(kk.frames) == 3
    prefix = str(tmp_path / "kf" / "t_")
    path = kk.export(prefix)
    lines = open(path).read().strip().splitlines()
    assert lines[0].startswith("frame,rot_w")
    assert len(lines) == 4
    # Rows referencing an image payload wrote the PNG next to the CSV.
    import csv as _csv

    with open(path) as f:
        for row in _csv.DictReader(f):
            if row["image"]:
                assert os.path.exists(row["image"])


def test_run_batch_drop_ended_continues(tmp_path):
    """Mixed-length streams with drop_ended: live streams keep stepping,
    ended streams freeze (masked empty flow), per-stream ranges differ."""
    from ofps_tpu.apps.batch import run_batch

    lens = [4, 8]
    inputs = []
    for si, n in enumerate(lens):
        path = str(tmp_path / f"in{si}.mvec")
        # moving every frame
        _write_mvec(path, [True] * n)
        inputs.append(path)

    res = run_batch(
        inputs,
        estimators=[],
        detector="block_motion",
        camera_aspect=1.0,
        camera_fov_y=90.0,
        drop_ended=True,
    )
    assert res.frames == max(lens)
    assert res.active.shape == (max(lens), 2)
    assert res.active[:, 0].sum() == lens[0]
    assert res.active[:, 1].sum() == lens[1]
    r0 = res.motion_ranges(0)
    r1 = res.motion_ranges(1)
    assert r0 == [(0, lens[0] - 1)], r0
    assert r1 == [(0, lens[1] - 1)], r1

    # Default (strict lockstep) stops at the shortest stream.
    res2 = run_batch(
        inputs,
        estimators=[],
        detector="block_motion",
        camera_aspect=1.0,
        camera_fov_y=90.0,
    )
    assert res2.frames == min(lens)


def test_keyframe_panorama_places_views_by_yaw(tmp_path):
    """Solid-color keyframes at different yaws land at distinct longitudes."""
    from ofps_tpu.apps.viz import keyframe_panorama

    cam = StandardCamera.create(1.0, 90.0)
    red = np.zeros((8, 8, 4), np.uint8); red[..., 0] = 255; red[..., 3] = 255
    blue = np.zeros((8, 8, 4), np.uint8); blue[..., 2] = 255; blue[..., 3] = 255
    kfs = [
        (0, np.asarray(euler_deg(0.0, 0.0, 0.0), np.float64), red),
        (1, np.asarray(euler_deg(0.0, 0.0, 90.0), np.float64), blue),
    ]
    pano = keyframe_panorama(kfs, cam, width=256, height=128)
    mid = pano[64]  # equator row
    # Identity-pose keyframe covers the pano center (lon ~ 0).
    assert tuple(mid[128][:3]) in [(255, 0, 0), (0, 0, 255)]
    center_red = mid[118:138, 0].max() > 0 or mid[118:138, 2].max() > 0
    assert center_red
    # The two colors occupy different longitude bands 90 deg apart.
    red_cols = np.nonzero(mid[:, 0] == 255)[0]
    blue_cols = np.nonzero(mid[:, 2] == 255)[0]
    assert len(red_cols) > 10 and len(blue_cols) > 10
    sep = abs(np.median(red_cols) - np.median(blue_cols))
    assert 40 < sep < 90 or 166 < sep < 216, sep  # ~64 cols = 90 deg (mod wrap)
    # Poles (extreme latitudes) stay unpainted with a 90 deg FOV.
    assert pano[0].max() == 0 and pano[-1].max() == 0


def test_tracking_config_panorama_export(tmp_path):
    """run-config with panorama_prefix: keyframes from a real decoded clip
    stitch into a non-empty equirect PNG (the 3D-view equivalent)."""
    from ofps_tpu.decoders.av import encode_test_video
    from ofps_tpu.apps.tracking import run_tracking_config

    clip = str(tmp_path / "clip.avi")
    encode_test_video(clip, 96, 64, frames=6, gop=30, dx=1.0, pattern="noise")
    config = {
        "app": "tracking",
        "decoder": {"input": clip},
        "camera_aspect": 1.5,
        "camera_fov_y": 90.0,
        "estimators": [{"name": "almeida", "properties": {"num_iters": 16}}],
        "output": {"panorama_prefix": str(tmp_path / "pano_")},
    }
    run_tracking_config(config)
    pano_path = tmp_path / "pano_almeida.png"
    assert pano_path.exists()
    import matplotlib.image as mpimg

    pano = mpimg.imread(str(pano_path))
    assert pano.shape[:2] == (512, 1024)
    assert pano[:, :, :3].max() > 0  # something got painted


def test_run_batch_isolates_failing_stream(tmp_path):
    """drop_ended: a stream whose decoder raises is dropped; others run on.
    Strict lockstep propagates the error (the reference's failure model)."""
    import pytest as _pytest

    from ofps_tpu.apps.batch import run_batch
    from ofps_tpu.decoders import base as dbase

    good = str(tmp_path / "good.mvec")
    _write_mvec(good, [True] * 6)

    class BoomDecoder:
        def __init__(self):
            self.i = 0

        def process_frame(self, want_frame=False, skip=0):
            if self.i >= 2:
                raise IOError("boom")
            self.i += 1
            pos = np.full((4, 2), 0.5, np.float32)
            return dbase.DecodedFrame(pos=pos, motion=pos * 0.01)

        def get_framerate(self):
            return 30.0

        def get_aspect(self):
            return (64, 48)

    def mix_factory(path, **kw):
        if path.endswith(".mvec"):
            return dbase._REGISTRY["mvec"](path, **kw)
        return BoomDecoder()

    dbase._REGISTRY["mixtest"] = mix_factory
    try:
        res = run_batch(
            [good, "x.boom"],
            estimators=[],
            detector="block_motion",
            camera_aspect=1.0,
            camera_fov_y=90.0,
            decoder_plugin="mixtest",
            drop_ended=True,
        )
        assert res.frames == 6
        assert res.active[:, 0].sum() == 6  # good stream ran to its end
        assert res.active[:, 1].sum() == 2  # boom stream dropped at frame 2

        # Strict lockstep: the failure propagates.
        with _pytest.raises(IOError):
            run_batch(
                [good, "x.boom"],
                estimators=[],
                detector="block_motion",
                camera_aspect=1.0,
                camera_fov_y=90.0,
                decoder_plugin="mixtest",
            )
    finally:
        dbase._REGISTRY.pop("mixtest", None)


def test_config_decoder_properties_reach_decoder(tmp_path):
    """decoder.properties in configs must construct the decoder with them
    (transfer_props parity): use_rlof routes the cv decoder to dense LK."""
    from ofps_tpu.apps.tracking import run_tracking
    from ofps_tpu.decoders.av import encode_test_video

    clip = str(tmp_path / "c.avi")
    encode_test_video(clip, 96, 64, frames=4, gop=30, dx=1.0, pattern="noise")
    res = run_tracking(
        clip,
        [{"name": "almeida", "properties": {"num_iters": 8}}],
        camera_aspect=1.5,
        camera_fov_y=90.0,
        decoder_plugin="cv",
        decoder_props={"use_rlof": True, "levels": 2},
    )
    assert res.frames == 4
    # Unknown property names stay loud (TypeError from the constructor).
    import pytest as _pytest

    with _pytest.raises(TypeError):
        run_tracking(
            clip,
            [{"name": "almeida"}],
            camera_aspect=1.5,
            camera_fov_y=90.0,
            decoder_plugin="cv",
            decoder_props={"nope": 1},
        )


def test_bench_e2e_cli(tmp_path, capsys, monkeypatch):
    """bench-e2e: decode feeds the batched step; JSON line reports the
    overlapped sustained rate and whether decode keeps up (SURVEY hard
    part (e)).  fetch_lag pipelining must not change any result."""
    import json as _json

    from ofps_tpu.apps.batch import run_batch
    from ofps_tpu.apps.cli import main
    from ofps_tpu.decoders.av import encode_test_video

    clip = str(tmp_path / "clip.avi")
    encode_test_video(clip, 96, 64, frames=8, gop=30, dx=1.0, dy=0.0,
                      pattern="noise", move_start=2, move_stop=6)

    # Lag pipelining parity: identical detections + poses vs strict sync.
    kw = dict(
        estimators=[{"name": "almeida", "properties": {"num_iters": 8}}],
        detector="block_motion",
        camera_aspect=1.5,
        camera_fov_y=90.0,
    )
    r0 = run_batch([clip, clip], fetch_lag=0, **kw)
    r3 = run_batch([clip, clip], fetch_lag=3, **kw)
    assert r0.frames == r3.frames
    assert np.array_equal(r0.detections, r3.detections)
    for a, b in zip(r0.poses_rot, r3.poses_rot):
        assert np.allclose(a, b)

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    rc = main([
        "bench-e2e", "--input", clip, "--streams", "2", "--frames", "8",
        "--width", "96", "--height", "64", "--estimators", "almeida",
    ])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = _json.loads(line)
    assert rec["metric"] == "e2e_stream_fps"
    assert rec["streams"] == 2 and rec["frames"] == 8
    assert rec["value"] > 0
    assert isinstance(rec["decode_keeps_up"], bool)
