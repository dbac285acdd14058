"""Native codec-MV decoder round-trip tests (C++ libav bindings).

The reference's core claim is that codec motion vectors are a cheap flow
substitute (docs/demo.md:82-87); these tests encode a known-translation
MPEG-4 clip with the native test encoder and verify the decoded motion
vectors recover that translation in the reference's normalized convention.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from ofps_tpu.core.motion import SparseFlow
from ofps_tpu.decoders.base import create_decoder


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    from ofps_tpu.decoders.av import encode_test_video

    path = str(tmp_path_factory.mktemp("av") / "clip.avi")
    encode_test_video(path, 320, 240, frames=20, gop=30, dx=2.0, dy=1.0)
    return path


def test_decode_motion_vectors(clip):
    d = create_decoder(clip)  # routes through the "av" plugin
    assert d.get_aspect() == (320, 240)
    assert d.get_framerate() == pytest.approx(30.0)

    first = d.process_frame()
    assert first is not None and not first.has_mvs  # I-frame: no MVs

    med = []
    for _ in range(19):
        f = d.process_frame()
        assert f is not None and f.has_mvs
        assert len(f.pos) == len(f.motion) > 0
        assert np.all((f.pos >= 0) & (f.pos <= 1))
        med.append(
            [np.median(f.motion[:, 0]) * 320, np.median(f.motion[:, 1]) * 240]
        )
    med = np.array(med)
    # Encoded translation is (+2, +1) px/frame; the reference convention
    # reports content motion directly (motion = -mv/scale/(w,h)).
    np.testing.assert_allclose(np.median(med, axis=0), [2.0, 1.0], atol=0.5)

    assert d.process_frame() is None  # EOF


def test_decode_rgba_frame(clip):
    d = create_decoder(clip)
    f = d.process_frame(want_frame=True)
    assert f.frame is not None and f.frame.shape == (240, 320, 4)
    assert f.frame[..., 3].min() == 255  # opaque alpha
    assert 100 < f.frame[..., 0].mean() < 160  # gray-ish sine texture


def test_skip_frames(clip):
    d = create_decoder(clip)
    d.process_frame()  # I-frame
    f = d.process_frame(skip=5)
    assert f is not None and f.has_mvs


def test_decoded_flow_feeds_estimator(clip):
    """End-to-end: codec MVs -> SparseFlow -> almeida (library story §3.3)."""
    from ofps_tpu.core.camera import StandardCamera
    from ofps_tpu.estimators.base import create_estimator

    d = create_decoder(clip)
    d.process_frame()
    f = d.process_frame()
    flow = SparseFlow.from_arrays(f.pos, f.motion, capacity=2048)
    est = create_estimator("almeida", num_iters=32, ransac_samples=256)
    cam = StandardCamera.create(320 / 240, 90.0)
    rot, tr, _ = est.estimate(est.init(), flow, cam, jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(rot)))
    np.testing.assert_allclose(np.asarray(tr), 0.0)


def test_motion_event_detection(tmp_path):
    """CCTV scenario class (report.tex:919): a motion event inside a still
    clip must come back as one coalesced range with no false positives."""
    from ofps_tpu.apps.detection import DetectionSettings, run_detection
    from ofps_tpu.decoders.av import encode_test_video

    path = str(tmp_path / "event.avi")
    encode_test_video(
        path, 320, 240, frames=30, gop=60, dx=2.0, dy=0.0,
        move_start=10, move_stop=20,
    )
    res = run_detection(path, settings=DetectionSettings())
    ranges = res.filtered_ranges(max_frame_gap=3, min_frames=3)
    assert len(ranges) == 1, ranges
    s, e = ranges[0]
    assert 8 <= s <= 12 and 18 <= e <= 22, ranges  # the [10, 20) event
    # No false positives outside the event (± codec warm-up slack).
    for rs, re_ in res.motion_ranges:
        assert rs >= 8 and re_ <= 22, res.motion_ranges


def test_mvec_dump_round_trip(clip, tmp_path):
    """motion-extract parity: decode -> .mvec dump -> replay decoder."""
    from ofps_tpu.decoders.mvec import write_mvec_frame

    d = create_decoder(clip)
    frames = []
    path = tmp_path / "dump.mvec"
    with open(path, "wb") as fh:
        while (f := d.process_frame()) is not None:
            write_mvec_frame(fh, f.pos, f.motion)
            frames.append((f.pos, f.motion))

    r = create_decoder(str(path))
    for pos, motion in frames:
        g = r.process_frame()
        np.testing.assert_array_equal(g.pos, pos)
        np.testing.assert_array_equal(g.motion, motion)
    assert r.process_frame() is None


def test_encode_gray_round_trip(tmp_path):
    """Arbitrary-frame encoder: known-shift noise frames -> codec MVs.

    `encode_gray_video` is what turns rendered content (e.g. the evaluation
    clips) into a REAL codec-MV source (reference av-decoder path)."""
    from ofps_tpu.decoders.av import encode_gray_video

    rng = np.random.default_rng(3)
    w, h, n = 192, 160, 12
    big = rng.uniform(0, 255, (h, w + 4 * n)).astype(np.float32)
    # Smooth it so the codec can actually match blocks.
    for _ in range(2):
        big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
               + np.roll(big, -1, 0) + np.roll(big, -1, 1)) / 5.0
    frames = np.stack(
        [big[:, 3 * t : 3 * t + w] for t in range(n)]
    ).astype(np.uint8)

    path = str(tmp_path / "gray.avi")
    encode_gray_video(path, frames, gop=30)

    d = create_decoder(path)
    assert d.get_aspect() == (w, h)
    assert not d.process_frame().has_mvs  # I-frame
    med = []
    for _ in range(n - 1):
        f = d.process_frame()
        assert f is not None and f.has_mvs
        med.append(np.median(f.motion[:, 0]) * w)
    # The sampling window pans +3 px/frame in x, so the CONTENT moves
    # -3 px/frame in the frame (reference convention: content motion).
    assert np.median(med) == pytest.approx(-3.0, abs=0.5)
    assert d.process_frame() is None
