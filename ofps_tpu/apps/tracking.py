"""Headless camera-tracking app (MotionTrackingApp equivalent).

Behavioral spec: ``/root/reference/ofps-suite/src/app/tracking/`` — a decoder
feeds every enabled estimator each frame (worker.rs:305-401; the rayon
fan-out becomes one fused jitted step), poses integrate via ``motion_step``,
and the results compare against ground-truth CSVs with per-frame error stats
and CSV/plot export (mod.rs:149-216, 756-1028).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from ofps_tpu.core.camera import StandardCamera
from ofps_tpu.core.motion import SparseFlow
from ofps_tpu.core.properties import set_properties
from ofps_tpu.decoders.base import create_decoder
from ofps_tpu.estimators.base import create_estimator
from ofps_tpu.apps import gt as gtmod
from ofps_tpu.parallel.stream import StreamPipeline
from ofps_tpu.pipeline.runtime import DecoderFeed, PerfStats, RealtimeTimer


class KeyframeKeeper:
    """Pose-diversity keyframe set (tracking/worker.rs:110-150 semantics).

    The reference keeps frames WITH their textures for the sphere-panorama
    overlay; the headless equivalent keeps the pose-stamped frame payload
    (decoded image, when the decoder provides one) and exports the set as
    ``keyframes.csv`` + per-keyframe PNGs — the same pose-diverse gallery a
    downstream renderer would consume.

    When over capacity, evicts the frame whose summed angular distance to
    its 5 nearest kept poses is smallest (the most redundant view); with
    two or fewer kept frames, the oldest goes.
    """

    def __init__(self, max_frames: int = 10):
        self.max_frames = max_frames
        self.frames: List[tuple] = []  # (frame_idx, rot wxyz, payload)

    def add(self, frame_idx: int, rot: np.ndarray, payload=None):
        self.frames.append((frame_idx, np.asarray(rot, np.float64), payload))
        if len(self.frames) > self.max_frames:
            self._remove_least_significant()

    def _remove_least_significant(self):
        if len(self.frames) <= 2:
            self.frames.pop(0)
            return
        n = len(self.frames)
        # Pairwise pose distances once (n <= max_frames+1, vectorized):
        # O(n^2) total per add instead of the old per-candidate sort.
        rots = np.stack([r for _, r, _ in self.frames])  # (n, 4)
        dots = np.abs(rots @ rots.T)
        ang = 2.0 * np.arccos(np.clip(dots, -1.0, 1.0))
        k = min(5, n)
        nearest = np.partition(ang, k - 1, axis=1)[:, :k].sum(axis=1)
        self.frames.pop(int(np.argmin(nearest)))

    def export(self, prefix: str) -> str:
        """Write ``{prefix}keyframes.csv`` (+ PNG per image payload)."""
        import csv
        import os

        os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)
        path = prefix + "keyframes.csv"
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow("frame rot_w rot_i rot_j rot_k image".split())
            for idx, rot, payload in self.frames:
                img = ""
                if payload is not None:
                    img = f"{prefix}kf_{idx:06d}.png"
                    from ofps_tpu.apps.viz import save_png

                    save_png(img, np.asarray(payload))
                w.writerow([idx, *[f"{v:.8f}" for v in rot], img])
        return path


@dataclasses.dataclass
class EstimatorTrack:
    """Per-estimator accumulated results (EstimatorState parity)."""

    name: str
    transforms: List[np.ndarray] = dataclasses.field(default_factory=list)
    translations: List[np.ndarray] = dataclasses.field(default_factory=list)
    poses_rot: List[np.ndarray] = dataclasses.field(default_factory=list)
    poses_pos: List[np.ndarray] = dataclasses.field(default_factory=list)
    keyframes: KeyframeKeeper = dataclasses.field(default_factory=KeyframeKeeper)

    def pose_stats(self):
        return gtmod.pose_stats(self.transforms, self.poses_rot)

    def err_stats(self, truth):
        return gtmod.calc_err(truth, self.transforms)

    def avg_err(self, truth):
        return gtmod.calc_avg_err(truth, self.transforms)


@dataclasses.dataclass
class TrackingResult:
    frames: int
    tracks: List[EstimatorTrack]
    perf: PerfStats


def _estimator_with_props(name: str, props: Dict[str, Any]):
    inst = create_estimator(name)
    if props:
        params = set_properties(name, inst.params, props)
        inst = create_estimator(name, **params._asdict())
    return inst


def run_tracking(
    input_path: str,
    estimators: List[Dict[str, Any]],
    camera_aspect: float,
    camera_fov_y: float,
    decoder_plugin: Optional[str] = None,
    capacity: int = 16384,
    realtime: bool = False,
    max_frames: Optional[int] = None,
    seed: int = 0,
    want_frames: bool = False,
    decoder_props=None,
    props_hook=None,
) -> TrackingResult:
    """Track camera motion with every listed estimator on one stream.

    ``estimators``: [{"name": ..., "properties": {...}}, ...].
    ``want_frames=True`` asks the decoder for RGBA frames so keyframes
    carry image payloads (keyframe gallery / panorama export).
    ``props_hook(frame_idx, props) -> props`` may mutate the dynamic
    property pytree between frames — the reference's per-frame
    transfer_props push (tracking/worker.rs:183,356); changes apply on the
    next frame with no recompilation.
    """
    insts = [
        _estimator_with_props(e["name"], e.get("properties") or {})
        for e in estimators
        if e.get("enabled", True)
    ]
    camera = StandardCamera.create(camera_aspect, camera_fov_y)
    pipe = StreamPipeline(camera=camera, estimators=insts)
    state = pipe.init_state(1, 1, 1)  # flow path unused on the MV input
    step = jax.jit(pipe.step_from_flow)
    props = pipe.dyn_props()

    decoder = create_decoder(
        input_path, decoder_plugin, **(decoder_props or {})
    )
    feed = DecoderFeed(decoder, want_frames=want_frames)
    timer = RealtimeTimer(decoder.get_framerate() if realtime else None)
    perf = PerfStats()
    tracks = [EstimatorTrack(name=i.name) for i in insts]
    key = jax.random.PRNGKey(seed)
    frames = 0

    try:
        for frame in feed:
            perf.add("decode", getattr(frame, "decode_time", 0.0))
            with perf.time("estimate"):
                flow = SparseFlow.from_arrays(frame.pos, frame.motion, capacity)
                flow = SparseFlow(
                    flow.pos[None], flow.motion[None], flow.mask[None]
                )
                key, sub = jax.random.split(key)
                if props_hook is not None:
                    props = props_hook(frames, props)
                state, out = step(state, flow, sub, props)
                out = jax.device_get(out)
            for t, track in enumerate(tracks):
                track.transforms.append(np.asarray(out.delta_rot[t][0]))
                track.translations.append(np.asarray(out.delta_tr[t][0]))
                track.poses_rot.append(np.asarray(out.rot[t][0]))
                track.poses_pos.append(np.asarray(out.pos[t][0]))
                track.keyframes.add(
                    frames,
                    track.poses_rot[-1],
                    payload=getattr(frame, "frame", None),
                )
            frames += 1
            timer.tick()
            if max_frames is not None and frames >= max_frames:
                break
    finally:
        feed.stop()

    return TrackingResult(frames=frames, tracks=tracks, perf=perf)


def run_tracking_config(config: Dict[str, Any]) -> TrackingResult:
    """Run from a JSON config (MotionTrackingConfig schema equivalent).

    Schema::

        {"app": "tracking",
         "decoder": {"input": "...", "plugin": null, "properties": {}},
         "camera_aspect": 1.777, "camera_fov_y": 90.0,
         "estimators": [{"name": "almeida", "enabled": true,
                         "properties": {}}, ...],
         "ground_truth": "gt.csv" | null,
         "realtime_processing": false,
         "output": {"stats_csv_prefix": "out/stats_",
                    "perf_csv": "...", "plot_prefix": "..."}}
    """
    dec = config.get("decoder", {})
    out_cfg = config.get("output", {})
    res = run_tracking(
        dec["input"],
        config.get("estimators", [{"name": "almeida"}]),
        camera_aspect=float(config.get("camera_aspect", 16.0 / 9.0)),
        camera_fov_y=float(config.get("camera_fov_y", 90.0)),
        decoder_plugin=dec.get("plugin"),
        decoder_props=dec.get("properties"),
        realtime=bool(config.get("realtime_processing", False)),
        max_frames=config.get("max_frames"),
        want_frames=bool(
            out_cfg.get("keyframes_prefix") or out_cfg.get("panorama_prefix")
        ),
    )

    truth = None
    if config.get("ground_truth"):
        truth = gtmod.load_ground_truth(config["ground_truth"])

    out = config.get("output", {})
    for track in res.tracks:
        pose = track.pose_stats()
        err = track.err_stats(truth) if truth else []
        if out.get("stats_csv_prefix"):
            gtmod.write_stats_csv(
                out["stats_csv_prefix"] + track.name + ".csv", err, pose
            )
        if out.get("keyframes_prefix"):
            track.keyframes.export(out["keyframes_prefix"] + track.name + "_")
        if out.get("panorama_prefix"):
            from ofps_tpu.apps.viz import keyframe_panorama, save_png

            cam = StandardCamera.create(
                float(config.get("camera_aspect", 16.0 / 9.0)),
                float(config.get("camera_fov_y", 90.0)),
            )
            save_png(
                out["panorama_prefix"] + track.name + ".png",
                keyframe_panorama(track.keyframes.frames, cam),
            )
        if out.get("plot_prefix"):
            from ofps_tpu.apps.viz import plot_tracking

            plot_tracking(
                out["plot_prefix"] + track.name + ".png",
                pose,
                err,
                title=track.name,
            )
        if truth:
            avg = track.avg_err(truth)
            deg = 180.0 / np.pi
            print(
                f"{track.name}: avg err {avg[0]*deg:.4f} deg "
                f"(r {avg[1]*deg:.4f}, p {avg[2]*deg:.4f}, y {avg[3]*deg:.4f})"
            )
    if out.get("perf_csv"):
        res.perf.write_csv(out["perf_csv"])
    return res
