"""Export a clip as downscaled preview frames (slides/docs asset).

Role parity with the reference's ``scripts/webp.sh`` (ffmpeg -> animated
webp for its slides).  This image ships neither an ffmpeg binary nor a
libwebp encoder, so the exporter emits the same content as a PNG frame
sequence (fps-subsampled, lanczos-free nearest downscale) plus an optional
flow-overlay variant rendered by the repo's own viz stack — directly
embeddable in docs, or packable into any animated format elsewhere.

Usage:
    python scripts/export_preview.py IN.avi OUT_DIR [--fps 15] [--width 720]
        [--overlay]   # HSV optical-flow overlay via the cv decoder
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("out_dir")
    ap.add_argument("--fps", type=float, default=15.0)
    ap.add_argument("--width", type=int, default=720)
    ap.add_argument("--overlay", action="store_true")
    args = ap.parse_args()

    from ofps_tpu.apps.viz import flow_to_rgba, overlay, save_png
    from ofps_tpu.decoders.av import AvDecoder
    from ofps_tpu.decoders.base import create_decoder

    os.makedirs(args.out_dir, exist_ok=True)
    dec = AvDecoder(args.input)
    src_fps = dec.get_framerate() or 30.0
    step = max(1, round(src_fps / args.fps))

    cv = (
        create_decoder(args.input, plugin="cv") if args.overlay else None
    )

    i = written = 0
    while True:
        fr = dec.process_frame(want_frame=True)
        if fr is None:
            break
        flow_rgba = None
        if cv is not None:
            cfr = cv.process_frame(want_frame=False)
            if cfr is not None and len(cfr.pos):
                from ofps_tpu.core.motion import SparseFlow, densify

                field = np.asarray(
                    densify(
                        SparseFlow.from_arrays(cfr.pos, cfr.motion), 90, 60
                    )
                )
                flow_rgba = flow_to_rgba(field)
        if i % step == 0:
            rgba = fr.frame
            h, w = rgba.shape[:2]
            ow = args.width
            oh = max(1, round(h * ow / w))
            yi = (np.arange(oh) * h // oh).clip(0, h - 1)
            xi = (np.arange(ow) * w // ow).clip(0, w - 1)
            small = rgba[yi][:, xi]
            if flow_rgba is not None:
                fy = (np.arange(oh) * flow_rgba.shape[0] // oh).clip(
                    0, flow_rgba.shape[0] - 1
                )
                fx = (np.arange(ow) * flow_rgba.shape[1] // ow).clip(
                    0, flow_rgba.shape[1] - 1
                )
                small = overlay(small, flow_rgba[fy][:, fx])
            save_png(
                os.path.join(args.out_dir, f"frame_{written:05d}.png"), small
            )
            written += 1
        i += 1
    print(f"wrote {written} preview frames to {args.out_dir}/")


if __name__ == "__main__":
    main()
