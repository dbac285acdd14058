"""Live watch mode: browser view of the running pipeline.

The reference suite shows a live motion overlay and a 3D pose view while
processing (ofps-suite/src/app/detection.rs:705-737, tracking/mod.rs:274-336
— egui + wgpu).  The headless TPU-native equivalent serves the same
information over HTTP while the pipeline runs:

* ``/``           — single-page view: the overlay stream + a pose trace
                    canvas + detection status, no dependencies.
* ``/stream``     — ``multipart/x-mixed-replace`` MJPEG of the HSV motion
                    overlay (the suite's live overlay).
* ``/state.json`` — latest frame index, per-estimator euler pose + history,
                    detection flag and ranges.

Run with ``python -m ofps_tpu.apps.cli watch <config.json> [--port N]`` on
any detection/tracking JSON config.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>ofps-tpu watch</title><style>
body { font-family: sans-serif; background: #111; color: #ddd; margin: 1em; }
img { border: 1px solid #444; image-rendering: pixelated; max-width: 60vw; }
canvas { border: 1px solid #444; background: #181818; }
#status { margin: 0.5em 0; }
.det { color: #f55; font-weight: bold; }
</style></head><body>
<h3>ofps-tpu live view</h3>
<div id="status">waiting…</div>
<div style="display:flex; gap:1em">
  <img src="/stream" alt="motion overlay">
  <canvas id="trace" width="480" height="360"></canvas>
</div>
<script>
const colors = ["#6cf", "#fc6", "#6f6", "#f6f", "#ccc"];
async function poll() {
  try {
    const s = await (await fetch("/state.json")).json();
    const el = document.getElementById("status");
    el.innerHTML = `frame ${s.frame}` +
      (s.detected === null ? "" :
        (s.detected ? ' — <span class="det">MOTION</span>' : " — still")) +
      (s.estimators.length ?
        " — " + s.estimators.map((e, i) =>
          `<span style="color:${colors[i%5]}">${e.name}` +
          ` r=${e.euler_deg[0].toFixed(2)}&deg;` +
          ` p=${e.euler_deg[1].toFixed(2)}&deg;` +
          ` y=${e.euler_deg[2].toFixed(2)}&deg;</span>`).join(" | ") : "");
    const c = document.getElementById("trace"), g = c.getContext("2d");
    g.clearRect(0, 0, c.width, c.height);
    g.strokeStyle = "#333";
    g.beginPath(); g.moveTo(0, c.height/2); g.lineTo(c.width, c.height/2);
    g.stroke();
    s.estimators.forEach((e, i) => {
      const hist = e.trace;  // [[r,p,y], ...] degrees
      [0, 1, 2].forEach(a => {
        g.strokeStyle = colors[i % 5];
        g.globalAlpha = 1.0 - 0.3 * a;
        g.beginPath();
        hist.forEach((v, t) => {
          const x = t * c.width / Math.max(hist.length - 1, 1);
          const y = c.height/2 - v[a] * c.height / (2 * s.trace_scale_deg);
          t ? g.lineTo(x, y) : g.moveTo(x, y);
        });
        g.stroke();
      });
    });
    g.globalAlpha = 1.0;
  } catch (err) {}
  setTimeout(poll, 250);
}
poll();
</script></body></html>"""


class WatchState:
    """Shared latest-frame state between the pipeline loop and HTTP."""

    def __init__(self, trace_len: int = 300, trace_scale_deg: float = 60.0):
        self.lock = threading.Lock()
        self.cond = threading.Condition(self.lock)
        self.jpeg: Optional[bytes] = None
        self.jpeg_ctype = "image/jpeg"
        self.jpeg_seq = 0
        self.frame = -1
        self.detected: Optional[bool] = None
        self.ranges: List[tuple] = []
        self.names: List[str] = []
        self.euler: List[List[float]] = []
        self.trace: List[List[List[float]]] = []
        self.trace_len = trace_len
        self.trace_scale_deg = trace_scale_deg
        self.done = False

    def push(self, frame_idx, overlay_rgba, detected, names, euler_deg):
        """Publish one processed frame (overlay may be None)."""
        blob = ctype = None
        if overlay_rgba is not None:
            blob, ctype = _encode_image(overlay_rgba)
        with self.cond:
            self.frame = frame_idx
            self.detected = detected
            self.names = list(names)
            if not self.trace:
                self.trace = [[] for _ in names]
            self.euler = [list(map(float, e)) for e in euler_deg]
            for tr, e in zip(self.trace, self.euler):
                tr.append(e)
                del tr[: -self.trace_len]
            if blob is not None:
                self.jpeg = blob
                self.jpeg_ctype = ctype
                self.jpeg_seq += 1
            self.cond.notify_all()

    def finish(self):
        with self.cond:
            self.done = True
            self.cond.notify_all()

    def snapshot(self) -> Dict[str, Any]:
        with self.lock:
            return {
                "frame": self.frame,
                "detected": self.detected,
                "done": self.done,
                "trace_scale_deg": self.trace_scale_deg,
                # Copy the traces while holding the lock: the handler
                # serializes AFTER release, racing push()'s append/trim on
                # the same inner lists otherwise.
                "estimators": [
                    {"name": n, "euler_deg": list(e), "trace": [list(v) for v in t]}
                    for n, e, t in zip(self.names, self.euler, self.trace)
                ],
            }


def _encode_image(rgba: np.ndarray):
    """RGBA float/uint8 -> (bytes, content_type): JPEG via cv2, else PNG."""
    img = np.asarray(rgba)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    try:
        import cv2

        bgr = img[..., :3][..., ::-1]
        ok, buf = cv2.imencode(".jpg", bgr, [cv2.IMWRITE_JPEG_QUALITY, 85])
        if ok:
            return buf.tobytes(), "image/jpeg"
    except ImportError:
        pass
    # PNG fallback (browsers accept image/png parts in MJPEG streams, but
    # each part must DECLARE its actual type).
    import io

    import matplotlib.image as mpimg

    bio = io.BytesIO()
    mpimg.imsave(bio, img, format="png")
    return bio.getvalue(), "image/png"


def make_server(state: WatchState, port: int = 8799) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/state.json":
                body = json.dumps(state.snapshot()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/stream":
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "multipart/x-mixed-replace; boundary=ofpsframe",
                )
                self.end_headers()
                last = -1
                while True:
                    with state.cond:
                        state.cond.wait_for(
                            lambda: state.jpeg_seq != last or state.done,
                            timeout=5.0,
                        )
                        if state.jpeg_seq == last and state.done:
                            break
                        blob, last = state.jpeg, state.jpeg_seq
                        ctype = state.jpeg_ctype
                    if blob is None:
                        continue
                    try:
                        self.wfile.write(
                            f"--ofpsframe\r\nContent-Type: {ctype}\r\n"
                            f"Content-Length: {len(blob)}\r\n\r\n".encode()
                        )
                        self.wfile.write(blob)
                        self.wfile.write(b"\r\n")
                    except (BrokenPipeError, ConnectionResetError):
                        break
            else:
                self.send_error(404)

    srv = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    srv.daemon_threads = True
    return srv


def run_watch(
    config: Dict[str, Any],
    port: int = 8799,
    max_frames: Optional[int] = None,
    hold: bool = False,
    _server_box: Optional[list] = None,
) -> int:
    """Run a tracking/detection config with the live view served on ``port``.

    ``hold=True`` keeps serving after the stream ends (Ctrl-C to quit).
    ``_server_box``: when given, the started server is appended so a caller
    (tests) can discover the bound port and shut it down.
    """
    import jax

    from ofps_tpu.apps.tracking import _estimator_with_props
    from ofps_tpu.apps.viz import flow_to_rgba, overlay as blend_overlay
    from ofps_tpu.core.camera import StandardCamera
    from ofps_tpu.core.motion import SparseFlow
    from ofps_tpu.decoders.base import create_decoder
    from ofps_tpu.detectors.base import create_detector
    from ofps_tpu.parallel.stream import StreamPipeline
    from ofps_tpu.pipeline.runtime import DecoderFeed, RealtimeTimer
    from ofps_tpu.apps import gt as gtmod

    state = WatchState()
    srv = make_server(state, port)
    if _server_box is not None:
        _server_box.append(srv)
    srv_thread = threading.Thread(target=srv.serve_forever, daemon=True)
    srv_thread.start()
    print(f"watch: serving on http://localhost:{srv.server_address[1]}/")

    dec_cfg = config.get("decoder", {})
    est_cfgs = [
        e for e in config.get("estimators", []) if e.get("enabled", True)
    ]
    det_cfg = config.get("detector")
    if det_cfg is None and config.get("app") == "detection":
        det_cfg = {"name": "block_motion"}
    insts = [
        _estimator_with_props(e["name"], e.get("properties") or {})
        for e in est_cfgs
    ]
    det = None
    if det_cfg:
        from ofps_tpu.apps.detection import _create_with_props

        det = _create_with_props(
            create_detector, det_cfg.get("name", "block_motion"),
            det_cfg.get("properties") or {},
        )
    camera = StandardCamera.create(
        float(config.get("camera_aspect", 16.0 / 9.0)),
        float(config.get("camera_fov_y", 90.0)),
    )
    pipe = StreamPipeline(camera=camera, estimators=insts, detector=det)
    pstate = pipe.init_state(1, 1, 1)
    step = jax.jit(pipe.step_from_flow)

    decoder = create_decoder(
        dec_cfg["input"], dec_cfg.get("plugin"),
        **(dec_cfg.get("properties") or {}),
    )
    feed = DecoderFeed(decoder, want_frames=True)
    timer = RealtimeTimer(
        decoder.get_framerate()
        if config.get("realtime_processing") else None
    )
    key = jax.random.PRNGKey(0)
    capacity = int(config.get("capacity", 16384))
    frames = 0
    try:
        for frame in feed:
            flow = SparseFlow.from_arrays(frame.pos, frame.motion, capacity)
            flow = SparseFlow(
                flow.pos[None], flow.motion[None], flow.mask[None]
            )
            key, sub = jax.random.split(key)
            pstate, out = step(pstate, flow, sub)
            out = jax.device_get(out)

            img = None
            detected = None
            if det is not None:
                detected = bool(np.asarray(out.detection.detected)[0])
                rgba = flow_to_rgba(np.asarray(out.detection.field)[0])
                img = (
                    blend_overlay(frame.frame, rgba)
                    if getattr(frame, "frame", None) is not None
                    else rgba
                )
            eulers = []
            for t in range(len(insts)):
                q = np.asarray(out.rot[t][0])
                eulers.append(
                    [float(np.degrees(v)) for v in gtmod._qeuler(q)]
                )
            state.push(
                frames, img, detected, [i.name for i in insts], eulers
            )
            frames += 1
            timer.tick()
            if max_frames is not None and frames >= max_frames:
                break
    finally:
        feed.stop()
        state.finish()
    print(f"watch: stream ended after {frames} frames")
    if hold:
        try:
            srv_thread.join()
        except KeyboardInterrupt:
            pass
    if _server_box is None:
        srv.shutdown()
    return 0
