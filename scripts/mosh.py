"""Datamosh a clip: single-I-frame re-encode with a foreign first frame.

Equivalent of the reference's ``scripts/mosh.sh`` (an ffmpeg-CLI splice:
re-encode the video with one I-frame and replace that I-frame with another
image, so every later P-frame's motion vectors "mosh" the foreign content).
This image has no ffmpeg binary, so the splice runs through the repo's own
native libav encoder (``ofps_tpu.decoders.av.encode_gray_video`` with a
huge GOP -> exactly one I-frame) and decoder.

Usage:
    python scripts/mosh.py MOSH_FRAME_CLIP SOURCE_CLIP OUT.avi

The first decoded frame of MOSH_FRAME_CLIP becomes the only I-frame; all
frames after the first of SOURCE_CLIP follow as P-frames.  Feed the result
to ``python -m ofps_tpu.apps.cli motion-extract`` / ``flow-extract`` to see
the codec-MV field drag the foreign frame around — the classic mosh demo.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from ofps_tpu.decoders.av import AvDecoder, encode_gray_video


def _gray_frames(path: str, limit: int = 100000) -> np.ndarray:
    dec = AvDecoder(path)
    out = []
    while len(out) < limit:
        fr = dec.process_frame(want_frame=True)
        if fr is None:
            break
        rgba = fr.frame.astype(np.float32)
        out.append(
            (0.299 * rgba[..., 0] + 0.587 * rgba[..., 1] + 0.114 * rgba[..., 2])
            .clip(0, 255)
            .astype(np.uint8)
        )
    if not out:
        raise SystemExit(f"no decodable frames in {path!r}")
    return np.stack(out)


def main() -> None:
    if len(sys.argv) != 4:
        raise SystemExit(__doc__)
    mosh_src, video_src, out_path = sys.argv[1:4]
    mosh = _gray_frames(mosh_src, limit=1)[0]
    vid = _gray_frames(video_src)
    h, w = vid.shape[1:]
    if mosh.shape != (h, w):
        # Nearest resize to the video geometry (mosh.sh crops/scales).
        yi = (np.arange(h) * mosh.shape[0] // h).clip(0, mosh.shape[0] - 1)
        xi = (np.arange(w) * mosh.shape[1] // w).clip(0, mosh.shape[1] - 1)
        mosh = mosh[yi][:, xi]
    frames = np.concatenate([mosh[None], vid[1:]], axis=0)
    encode_gray_video(out_path, frames, gop=1 << 20)
    print(f"moshed {len(frames)} frames -> {out_path} (single I-frame)")


if __name__ == "__main__":
    main()
