"""Headless motion-detection app (MotionDetectionApp equivalent).

Behavioral spec: ``/root/reference/ofps-suite/src/app/detection.rs`` — the
per-frame loop (decoder -> detector, :92-168), motion-range accumulation and
coalescing by ``max_frame_gap`` / ``min_frames`` (:196-212), CSV export of
the (start, end) ranges (:458-490), and per-stage perf times (:110-148).

The detector math runs on-device through a jitted single-stream step; the
range bookkeeping stays on host exactly like the reference.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from ofps_tpu.core.motion import SparseFlow
from ofps_tpu.core.properties import set_properties
from ofps_tpu.decoders.base import create_decoder
from ofps_tpu.detectors.base import create_detector
from ofps_tpu.pipeline.runtime import DecoderFeed, PerfStats, RealtimeTimer


@dataclasses.dataclass
class DetectionSettings:
    """App settings parity (detection.rs:24-38 defaults)."""

    max_frame_gap: int = 10
    min_frames: int = 5
    realtime: bool = False


@dataclasses.dataclass
class DetectionResultSummary:
    frames: int = 0
    motion_ranges: List[Tuple[int, int]] = dataclasses.field(default_factory=list)
    perf: PerfStats = dataclasses.field(default_factory=PerfStats)

    def filtered_ranges(
        self, max_frame_gap: int, min_frames: int
    ) -> List[Tuple[int, int]]:
        """Coalesce + filter (detection.rs:196-212 semantics)."""
        out: List[Tuple[int, int]] = []
        for s, e in self.motion_ranges:
            if out and s - out[-1][1] <= max_frame_gap:
                out[-1] = (out[-1][0], e)
            else:
                out.append((s, e))
        return [(s, e) for s, e in out if e - s >= min_frames]

    def write_ranges_csv(self, path: str, settings: "DetectionSettings"):
        import csv

        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            for s, e in self.filtered_ranges(
                settings.max_frame_gap, settings.min_frames
            ):
                w.writerow([s, e])


def _create_with_props(create, name: str, props: Dict[str, Any]):
    inst = create(name)
    if props:
        params = set_properties(name, inst.params, props)
        inst = create(name, **params._asdict())
    return inst


def run_detection(
    input_path: str,
    detector_name: str = "block_motion",
    decoder_plugin: Optional[str] = None,
    decoder_props: Optional[Dict[str, Any]] = None,
    detector_props: Optional[Dict[str, Any]] = None,
    settings: Optional[DetectionSettings] = None,
    capacity: int = 16384,
    max_frames: Optional[int] = None,
    overlay_dir: Optional[str] = None,
) -> DetectionResultSummary:
    """Decode a stream and accumulate detected-motion frame ranges.

    ``overlay_dir`` writes an HSV motion overlay PNG per detected frame —
    the headless equivalent of the suite's live overlay (detection.rs:705).
    """
    settings = settings or DetectionSettings()
    detector = _create_with_props(create_detector, detector_name, detector_props or {})
    decoder = create_decoder(input_path, decoder_plugin, **(decoder_props or {}))
    if overlay_dir:
        import os

        os.makedirs(overlay_dir, exist_ok=True)

    detect = jax.jit(detector.detect)
    res = DetectionResultSummary()
    feed = DecoderFeed(decoder, want_frames=bool(overlay_dir))
    timer = RealtimeTimer(decoder.get_framerate() if settings.realtime else None)

    current: Optional[Tuple[int, int]] = None
    try:
        for frame in feed:
            res.perf.add("decode", getattr(frame, "decode_time", 0.0))
            with res.perf.time("detect"):
                flow = SparseFlow.from_arrays(frame.pos, frame.motion, capacity)
                out = detect(flow)
                detected = bool(out.detected) and frame.has_mvs
            if overlay_dir and detected:
                import os

                from ofps_tpu.apps.viz import flow_to_rgba, overlay, save_png

                rgba = flow_to_rgba(np.asarray(jax.device_get(out.field)))
                img = (
                    overlay(frame.frame, rgba)
                    if frame.frame is not None
                    else rgba
                )
                save_png(
                    os.path.join(overlay_dir, f"{res.frames:06}.png"), img
                )
            i = res.frames
            if detected:
                current = (current[0], i) if current else (i, i)
            elif current:
                res.motion_ranges.append(current)
                current = None
            res.frames += 1
            timer.tick()
            if max_frames is not None and res.frames >= max_frames:
                break
    finally:
        feed.stop()
    if current:
        res.motion_ranges.append(current)
    return res


def run_detection_config(config: Dict[str, Any]) -> DetectionResultSummary:
    """Run from a JSON config (MotionDetectionConfig schema equivalent).

    Schema::

        {"app": "detection",
         "decoder": {"input": "...", "plugin": null, "properties": {}},
         "detector": {"name": "block_motion", "properties": {}},
         "settings": {"max_frame_gap": 10, "min_frames": 5,
                      "realtime": false},
         "output": {"ranges_csv": "...", "perf_csv": "..."}}
    """
    dec = config.get("decoder", {})
    det = config.get("detector", {})
    s = config.get("settings", {})
    settings = DetectionSettings(
        max_frame_gap=int(s.get("max_frame_gap", 10)),
        min_frames=int(s.get("min_frames", 5)),
        realtime=bool(s.get("realtime", False)),
    )
    out = config.get("output", {})
    res = run_detection(
        dec["input"],
        detector_name=det.get("name", "block_motion"),
        decoder_plugin=dec.get("plugin"),
        decoder_props=dec.get("properties"),
        detector_props=det.get("properties"),
        settings=settings,
        max_frames=config.get("max_frames"),
        overlay_dir=out.get("overlay_dir"),
    )
    if out.get("ranges_csv"):
        res.write_ranges_csv(out["ranges_csv"], settings)
    if out.get("perf_csv"):
        res.perf.write_csv(out["perf_csv"])
    if out.get("timeline_png"):
        from ofps_tpu.apps.viz import plot_detection_timeline

        plot_detection_timeline(
            out["timeline_png"],
            res.filtered_ranges(settings.max_frame_gap, settings.min_frames),
            res.frames,
        )
    return res
