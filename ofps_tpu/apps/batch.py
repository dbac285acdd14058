"""Multi-stream batch runner: N videos through ONE jitted device step.

The reference processes a single stream at a time (SURVEY.md §2.9 — its
missing data-parallel axis).  This runner decodes N inputs on host threads
(1-frame lookahead each) and feeds their motion-vector fields as one
(B, N, 2) SparseFlow batch into a single :class:`StreamPipeline` step —
estimators and detector vmapped across streams, optionally sharded over a
("stream", "space") mesh.
"""

from __future__ import annotations

import collections
import dataclasses
import logging
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ofps_tpu.core.camera import StandardCamera
from ofps_tpu.core.motion import SparseFlow
from ofps_tpu.decoders.base import create_decoder
from ofps_tpu.detectors.base import create_detector
from ofps_tpu.estimators.base import create_estimator
from ofps_tpu.parallel.stream import StreamPipeline
from ofps_tpu.pipeline.runtime import DecoderFeed, PerfStats

_LOG = logging.getLogger(__name__)


@dataclasses.dataclass
class BatchResult:
    frames: int  # batched steps executed (= min frame count across streams)
    streams: int
    poses_rot: List[np.ndarray]  # per estimator: (B, 4) final integrated
    poses_pos: List[np.ndarray]
    detections: Optional[np.ndarray]  # (T, B) bool, if a detector ran
    perf: PerfStats
    # (T, B) bool: stream had a live frame at step t (False once ended,
    # when drop_ended keeps the batch going).
    active: Optional[np.ndarray] = None
    estimator_names: List[str] = dataclasses.field(default_factory=list)
    # Per-frame history, recorded when GT evaluation is requested:
    # delta_rot[e][t]: (B, 4); rot[e][t]: (B, 4).
    delta_rot: Optional[List[List[np.ndarray]]] = None
    rot_hist: Optional[List[List[np.ndarray]]] = None
    # (stream_idx, estimator_name) -> (avg_err, avg_r, avg_p, avg_y) rad.
    gt_avg_err: Optional[Dict] = None

    def throughput_fps(self) -> float:
        s = self.perf.summary().get("step", {})
        total = s.get("total_ms", 0.0) / 1e3
        return self.frames * self.streams / total if total else 0.0

    def motion_ranges(self, stream: int):
        """Per-stream detected-motion frame ranges (detection.rs:196-212
        accumulation semantics, before coalescing)."""
        if self.detections is None:
            return []
        det = self.detections[:, stream]
        if self.active is not None:
            det = det & self.active[:, stream]
        out, start = [], None
        for t, d in enumerate(det):
            if d and start is None:
                start = t
            elif not d and start is not None:
                out.append((start, t - 1))
                start = None
        if start is not None:
            out.append((start, len(det) - 1))
        return out


def run_batch(
    inputs: List[str],
    estimators: Optional[List[Dict[str, Any]]] = None,
    detector: Optional[str] = "block_motion",
    camera_aspect: float = 16.0 / 9.0,
    camera_fov_y: float = 90.0,
    decoder_plugin: Optional[str] = None,
    capacity: int = 16384,
    max_frames: Optional[int] = None,
    seed: int = 0,
    shardings=None,
    ground_truths: Optional[List[Optional[str]]] = None,
    stats_csv_prefix: Optional[str] = None,
    drop_ended: bool = False,
    fetch_lag: int = 0,
) -> BatchResult:
    """Run every input stream in lockstep through one batched device step.

    Lockstep means processing stops at the SHORTEST stream: when any input
    ends, the remaining frames of longer streams are not processed (a log
    line reports which stream ended the batch).  Pad inputs to equal length
    or group them by length to avoid truncation.

    ``ground_truths``: optional per-stream GT CSV paths (None entries skip a
    stream).  Per-stream, per-estimator error/pose statistics are computed
    with the same host math as the single-stream tracking app
    (tracking/mod.rs:756-1028 semantics at batch scale) and written to
    ``{stats_csv_prefix}s{stream}_{estimator}.csv`` when a prefix is given.

    ``drop_ended=True`` keeps the batch running after individual streams
    end: an ended stream feeds an empty (all-masked) flow, so its pose
    freezes and its detector goes quiet, while live streams continue until
    ALL end (the serving semantics; default preserves strict lockstep).
    """
    ests = [
        create_estimator(e["name"], **(e.get("properties") or {}))
        for e in (estimators or [{"name": "almeida"}])
    ]
    det = create_detector(detector) if detector else None
    camera = StandardCamera.create(camera_aspect, camera_fov_y)
    pipe = StreamPipeline(
        camera=camera, estimators=ests, detector=det, shardings=shardings
    )
    b = len(inputs)
    state = pipe.init_state(b, 1, 1)
    step = jax.jit(pipe.step_from_flow)

    feeds = [
        DecoderFeed(create_decoder(path, decoder_plugin)) for path in inputs
    ]
    iters = [iter(f) for f in feeds]
    perf = PerfStats()
    key = jax.random.PRNGKey(seed)
    detections: List[np.ndarray] = []
    want_gt = ground_truths is not None and any(ground_truths)
    dr_hist: List[List[np.ndarray]] = [[] for _ in ests]
    rot_hist: List[List[np.ndarray]] = [[] for _ in ests]
    active_hist: List[List[bool]] = []
    frames = 0
    pending: "collections.deque" = collections.deque()

    def _drain(out):
        if want_gt:
            for e in range(len(ests)):
                dr_hist[e].append(np.asarray(jax.device_get(out.delta_rot[e])))
                rot_hist[e].append(np.asarray(jax.device_get(out.rot[e])))
        if det is not None:
            detections.append(np.asarray(jax.device_get(out.detection.detected)))
        else:
            jax.device_get(out.rot)  # force completion (block_until_ready
            # does not block through the tunneled-TPU transport)

    try:
        while max_frames is None or frames < max_frames:
            with perf.time("decode"):
                batch = []
                for si, it in enumerate(iters):
                    try:
                        batch.append(next(it, None))
                    except Exception:
                        # Stream-level fault isolation under drop_ended:
                        # a failing decoder ends ITS stream, the batch
                        # lives on.  Strict lockstep re-raises (the
                        # reference's worker-exit failure model).
                        if not drop_ended:
                            raise
                        _LOG.exception(
                            "run_batch: stream %s failed at frame %d; "
                            "dropping it (drop_ended)", inputs[si], frames
                        )
                        batch.append(None)
                        iters[si] = iter(())
                live = [f is not None for f in batch]
                if not all(live):
                    ended = [
                        inputs[i] for i, f in enumerate(batch) if f is None
                    ]
                    if drop_ended and any(live):
                        pass  # masked empty flows keep the step shape
                    else:
                        if any(live):
                            _LOG.info(
                                "run_batch: stream(s) %s ended at frame %d; "
                                "longer streams are truncated (lockstep "
                                "batch; pass drop_ended=True to continue)",
                                ended,
                                frames,
                            )
                        break
                active_hist.append(live)
                flows = [
                    SparseFlow.from_arrays(f.pos, f.motion, capacity)
                    if f is not None
                    else SparseFlow.from_arrays(
                        np.zeros((0, 2)), np.zeros((0, 2)), capacity
                    )
                    for f in batch
                ]
                flow = SparseFlow(
                    jnp.stack([f.pos for f in flows]),
                    jnp.stack([f.motion for f in flows]),
                    jnp.stack([f.mask for f in flows]),
                )
            with perf.time("step"):
                key, sub = jax.random.split(key)
                state, out = step(state, flow, sub)
                pending.append(out)
            # Deferred result fetch: jax dispatch is async, so keeping
            # ``fetch_lag`` steps in flight overlaps each result's
            # host<->device round trip (~29 ms through a tunneled TPU) with
            # the compute of the steps behind it — per-frame cost becomes
            # max(decode, step) instead of decode + step + RTT.  lag=0
            # preserves strict per-frame sync.
            if len(pending) > fetch_lag:
                with perf.time("fetch"):
                    _drain(pending.popleft())
            frames += 1
        while pending:
            with perf.time("fetch"):
                _drain(pending.popleft())
    finally:
        for f in feeds:
            f.stop()

    gt_avg = None
    if want_gt:
        from ofps_tpu.apps import gt as gtmod

        gt_avg = {}
        for si, gt_path in enumerate(ground_truths):
            if not gt_path:
                continue
            truth = gtmod.load_ground_truth(gt_path)
            for e, est in enumerate(ests):
                transforms = [dr_hist[e][t][si] for t in range(frames)]
                poses = [rot_hist[e][t][si] for t in range(frames)]
                err = gtmod.calc_err(truth, transforms)
                pose = gtmod.pose_stats(transforms, poses)
                gt_avg[(si, est.name)] = gtmod.calc_avg_err(truth, transforms)
                if stats_csv_prefix:
                    gtmod.write_stats_csv(
                        f"{stats_csv_prefix}s{si}_{est.name}.csv", err, pose
                    )

    return BatchResult(
        frames=frames,
        streams=b,
        poses_rot=[np.asarray(jax.device_get(r)) for r in state.rot],
        poses_pos=[np.asarray(jax.device_get(p)) for p in state.pos],
        detections=np.stack(detections) if detections else None,
        perf=perf,
        active=np.asarray(active_hist, bool) if active_hist else None,
        estimator_names=[e.name for e in ests],
        delta_rot=dr_hist if want_gt else None,
        rot_hist=rot_hist if want_gt else None,
        gt_avg_err=gt_avg,
    )
