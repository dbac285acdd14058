"""Host-side streaming runtime: decoder feed, perf stats, realtime pacing.

Behavioral spec (SURVEY.md §2.9, §3):

* ``DecoderFeed`` reproduces the reference's dedicated decoder thread +
  rendezvous channel with exactly one frame of lookahead
  (ofps-suite/src/app/tracking/worker.rs:165-269): the decoder runs ahead by
  one frame while the device consumes the previous one.
* ``PerfStats`` mirrors the per-stage wall-clock Duration vectors and their
  total/avg summary + CSV export (app/utils/perf_stats.rs:27-151).
* ``RealtimeTimer`` mirrors the 1/framerate pacing of app/utils/timer.rs.
"""

from __future__ import annotations

import csv
import queue
import threading
import time
from contextlib import contextmanager
from typing import Dict, Iterator, List, Optional

from ofps_tpu.decoders.base import DecodedFrame, Decoder


class DecoderFeed:
    """Runs ``decoder.process_frame`` on a worker thread, 1-frame lookahead.

    Iterating yields :class:`DecodedFrame` items until end of stream.  The
    bounded queue of size 1 gives the rendezvous-channel semantics of the
    reference (``sync_channel(0)`` + the in-flight frame): decode of frame
    N+1 overlaps consumption of frame N, never more.
    """

    _END = object()

    def __init__(self, decoder: Decoder, want_frames: bool = False):
        self._decoder = decoder
        self._want_frames = want_frames
        self._q: "queue.Queue" = queue.Queue(maxsize=1)
        self._stop = threading.Event()
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        """Blocking put that re-checks the stop flag; False if stopped."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _run(self):
        try:
            while not self._stop.is_set():
                t0 = time.perf_counter()
                frame = self._decoder.process_frame(self._want_frames)
                dt = time.perf_counter() - t0
                if frame is None:
                    break
                if not self._put((frame, dt)):
                    return  # consumer stopped early; don't block forever
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            if not self._put(self._END):
                # Stopped: nobody is iterating, but leave the sentinel if a
                # slot is free so a racing __iter__ terminates cleanly.
                try:
                    self._q.put_nowait(self._END)
                except queue.Full:
                    pass

    def __iter__(self) -> Iterator[DecodedFrame]:
        while True:
            item = self._q.get()
            if item is self._END:
                if self._err is not None:
                    raise self._err
                return
            frame, decode_time = item
            frame.decode_time = decode_time  # type: ignore[attr-defined]
            yield frame

    def stop(self):
        """Stop the feed and join the worker without leaking it.

        Drains the queue in a loop (not a single get): the worker may be
        blocked on the data put *and then* on the ``_END`` put, so one drain
        is not enough — the round-1 version stalled 5 s per early-stopped
        feed and leaked the thread + decoder.
        """
        self._stop.set()
        deadline = time.perf_counter() + 5.0
        while self._thread.is_alive() and time.perf_counter() < deadline:
            try:
                self._q.get(timeout=0.05)
            except queue.Empty:
                pass
            self._thread.join(timeout=0.05)


class PerfStats:
    """Per-stage wall-clock statistics with CSV export parity."""

    def __init__(self):
        self.stages: Dict[str, List[float]] = {}

    @contextmanager
    def time(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.add(stage, time.perf_counter() - t0)

    def add(self, stage: str, seconds: float):
        self.stages.setdefault(stage, []).append(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        """{stage: {total_ms, avg_ms, frames}} like the perf window table."""
        out = {}
        for stage, xs in self.stages.items():
            total = sum(xs)
            out[stage] = {
                "total_ms": total * 1e3,
                "avg_ms": total * 1e3 / max(len(xs), 1),
                "frames": len(xs),
            }
        return out

    def write_csv(self, path: str):
        """Per-frame times, one column per stage (perf_stats.rs CSV layout)."""
        stages = sorted(self.stages)
        rows = max((len(self.stages[s]) for s in stages), default=0)
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["frame"] + stages)
            for i in range(rows):
                w.writerow(
                    [i]
                    + [
                        f"{self.stages[s][i] * 1e3:.4f}"
                        if i < len(self.stages[s])
                        else ""
                        for s in stages
                    ]
                )


class RealtimeTimer:
    """Sleeps so consecutive ticks land 1/rate apart (utils/timer.rs:28-44)."""

    def __init__(self, rate: Optional[float]):
        self._dt = 1.0 / rate if rate else None
        self._next = time.perf_counter()

    def tick(self):
        if self._dt is None:
            return
        self._next += self._dt
        delay = self._next - time.perf_counter()
        if delay > 0:
            time.sleep(delay)
        else:  # fell behind; resynchronize
            self._next = time.perf_counter()


class LivePipeline:
    """A running jitted pipeline with runtime-mutable plugin properties.

    The reference pushes UI property edits into the *running* plugins every
    frame (``transfer_props``, app/utils/properties.rs:5-18 applied at
    tracking/worker.rs:183,356).  Here the continuous-valued properties are
    a pytree of jnp scalars traced through the step, so ``set_property``
    between frames takes effect on the next frame with NO recompilation;
    shape-affecting properties remain constructor arguments.

    >>> live = LivePipeline(pipe, batch=1, height=h, width=w)
    >>> state, out = live.step(gray, key)
    >>> live.set_property("detector", "target_motion", 0.5)
    >>> state, out = live.step(gray2, key2)      # same compiled program
    """

    def __init__(self, pipe, batch: int, height: int, width: int,
                 from_flow: bool = False):
        import jax

        self.pipe = pipe
        self.props = pipe.dyn_props()
        self.state = pipe.init_state(batch, height, width)
        fn = pipe.step_from_flow if from_flow else pipe.step_from_frames
        self._step = jax.jit(fn)

    def _names(self):
        return [e.name for e in self.pipe.estimators]

    def set_property(self, target, name: str, value) -> bool:
        """Set a property on a running component; returns True when it was
        applied dynamically (no re-jit needed).

        ``target``: "detector", an estimator name, or an estimator index.
        Unknown property names raise (matching
        :func:`ofps_tpu.core.properties.set_properties` loudness); known but
        static (shape-affecting) properties return False — the caller must
        rebuild the pipeline for those, as the reference rebuilds plugins on
        structural changes.
        """
        import jax.numpy as jnp

        from ofps_tpu.core.properties import set_properties

        if target == "detector":
            comp = self.pipe.detector
            dyn = self.props["detector"]
        else:
            idx = target if isinstance(target, int) else self._names().index(target)
            comp = self.pipe.estimators[idx]
            dyn = self.props["estimators"][idx]
        # Validate kind/bounds through the property layer (raises on unknown
        # names / kind mismatch, clamps to declared bounds).
        validated = set_properties(comp.name, comp.params, {name: value})
        if name not in dyn:
            return False  # static property: needs a rebuild + re-jit
        dyn[name] = jnp.float32(getattr(validated, name))
        return True

    def step(self, frame_or_flow, key):
        self.state, out = self._step(
            self.state, frame_or_flow, key, self.props
        )
        return self.state, out
