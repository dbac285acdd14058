"""On-device dense-flow decoder ("cv") tests.

Spec: cv-decoder (/root/reference/cv-decoder/src/lib.rs) — frames -> dense
flow -> contrast mask -> <=150-grid densify.  Uses the aperiodic value-noise
test clip: the sine pattern aliases wide block-matching searches (the codec's
own +-16px rate-biased search doesn't — a real difference between the MV and
flow paths, not a bug).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from ofps_tpu.decoders.base import create_decoder


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    from ofps_tpu.decoders.av import encode_test_video

    path = str(tmp_path_factory.mktemp("cv") / "clip.avi")
    encode_test_video(
        path, 128, 96, frames=5, gop=30, dx=2.0, dy=-1.0, pattern="noise"
    )
    return path


def test_cv_decoder_recovers_translation(clip):
    d = create_decoder(clip, plugin="cv", levels=3)
    assert d.get_aspect() == (128, 96)

    first = d.process_frame(want_frame=True)
    assert first is not None and not first.has_mvs  # no previous frame yet
    assert first.frame is not None and first.frame.shape == (96, 128, 4)

    meds = []
    for _ in range(4):
        f = d.process_frame()
        assert f is not None and f.has_mvs
        assert len(f.pos) == len(f.motion) > 0
        assert np.all((f.pos >= 0) & (f.pos <= 1))
        meds.append(
            [np.median(f.motion[:, 0]) * 128, np.median(f.motion[:, 1]) * 96]
        )
    med = np.median(np.array(meds), axis=0)
    np.testing.assert_allclose(med, [2.0, -1.0], atol=0.5)

    assert d.process_frame() is None  # EOF


def test_cv_decoder_contrast_mask_drops_flat_cells(tmp_path):
    # A mostly-flat clip: with the contrast mask on, flat cells emit no
    # vectors (the reference's Sobel->threshold->dilate mask semantics).
    from ofps_tpu.decoders.av import encode_test_video

    path = str(tmp_path / "flat.avi")
    encode_test_video(path, 128, 96, frames=3, gop=30, dx=1.0, pattern="noise")

    masked = create_decoder(path, plugin="cv", levels=3, mask_threshold=1e6)
    masked.process_frame()
    f = masked.process_frame()
    assert f.has_mvs and len(f.pos) == 0  # everything below threshold

    unmasked = create_decoder(path, plugin="cv", levels=3, use_contrast_mask=False)
    unmasked.process_frame()
    g = unmasked.process_frame()
    assert len(g.pos) > 0


def test_cv_decoder_rlof_recovers_translation(clip):
    # The second flow algorithm (use_rlof, cv-decoder lib.rs:45,169-186):
    # robust dense LK must recover the same clip motion.
    d = create_decoder(clip, plugin="cv", levels=3, use_rlof=True)
    d.process_frame()
    meds = []
    for _ in range(4):
        f = d.process_frame()
        assert f is not None and f.has_mvs
        meds.append(
            [np.median(f.motion[:, 0]) * 128, np.median(f.motion[:, 1]) * 96]
        )
    med = np.median(np.array(meds), axis=0)
    np.testing.assert_allclose(med, [2.0, -1.0], atol=0.5)
