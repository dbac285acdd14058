"""Live watch mode (apps/watch.py): server units + end-to-end run.

Parity target: the suite's live overlay + pose view
(ofps-suite/src/app/detection.rs:705-737, tracking/mod.rs:274-336), served
headlessly over HTTP.
"""

import json
import threading
import time
import urllib.request

import numpy as np

from ofps_tpu.apps.watch import WatchState, make_server, run_watch


def _get(port, path, timeout=30):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=timeout
    ) as r:
        return r.read()


def test_watch_server_units():
    """State pushes show up in /state.json and /stream without a pipeline."""
    state = WatchState(trace_len=4)
    srv = make_server(state, port=0)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        overlay = np.zeros((16, 16, 4), np.float32)
        overlay[4:12, 4:12] = [1.0, 0.2, 0.2, 1.0]
        state.push(
            0, overlay, True, ["almeida"], [[0.1, -0.2, 0.3]],
            quats=[[1.0, 0.0, 0.0, 0.0]], positions=[[0.0, 0.5, 1.0]],
        )

        page = _get(port, "/").decode()
        assert "ofps-tpu live view" in page
        assert 'id="scene"' in page and "drawScene" in page  # 3-D pose pane

        snap = json.loads(_get(port, "/state.json"))
        assert snap["frame"] == 0 and snap["detected"] is True
        assert snap["estimators"][0]["name"] == "almeida"
        assert snap["estimators"][0]["euler_deg"] == [0.1, -0.2, 0.3]
        assert snap["estimators"][0]["q"] == [1.0, 0.0, 0.0, 0.0]
        assert snap["estimators"][0]["pos"] == [0.0, 0.5, 1.0]
        assert snap["estimators"][0]["path"] == [[0.0, 0.5, 1.0]]
        # frame 0 is a keyframe: [w,x,y,z,px,py,pz]
        assert snap["estimators"][0]["keyframes"] == [
            [1.0, 0.0, 0.0, 0.0, 0.0, 0.5, 1.0]
        ]

        # Stream: read the first multipart chunk, then finish the state so
        # the handler terminates.
        req = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stream", timeout=30
        )
        assert "multipart/x-mixed-replace" in req.headers["Content-Type"]
        head = req.readline()
        assert b"--ofpsframe" in head
        ctype = req.readline()
        assert b"image/" in ctype
        clen = int(req.readline().split(b":")[1])
        req.readline()
        blob = req.read(clen)
        assert len(blob) == clen and clen > 100
        state.finish()
        req.close()

        # Trace ring buffer caps at trace_len.
        for i in range(1, 8):
            state.push(i, None, False, ["almeida"], [[float(i), 0.0, 0.0]])
        snap = json.loads(_get(port, "/state.json"))
        tr = snap["estimators"][0]["trace"]
        assert len(tr) == 4
        assert tr[-1][0] == 7.0
    finally:
        srv.shutdown()


def test_watch_end_to_end(tmp_path):
    """run_watch over a real decoded clip: detection + pose trace served."""
    from ofps_tpu.decoders.av import encode_test_video

    clip = str(tmp_path / "clip.avi")
    encode_test_video(clip, 96, 64, frames=6, gop=30, dx=1.0, dy=0.0,
                      pattern="noise")
    config = {
        "app": "tracking",
        "decoder": {"input": clip},
        "camera_aspect": 1.5,
        "camera_fov_y": 90.0,
        "estimators": [
            {"name": "almeida", "properties": {"num_iters": 8}}
        ],
        "detector": {"name": "block_motion"},
    }
    box = []
    th = threading.Thread(
        target=run_watch,
        kwargs=dict(
            config=config, port=0, max_frames=6, _server_box=box
        ),
        daemon=True,
    )
    th.start()
    t0 = time.time()
    while not box and time.time() - t0 < 60:
        time.sleep(0.05)
    assert box, "server did not start"
    port = box[0].server_address[1]
    try:
        deadline = time.time() + 600
        snap = None
        while time.time() < deadline:
            snap = json.loads(_get(port, "/state.json"))
            if snap["done"]:
                break
            time.sleep(0.5)
        assert snap and snap["done"], snap
        assert snap["frame"] == 5
        est = snap["estimators"][0]
        assert est["name"] == "almeida"
        assert len(est["trace"]) == 6
        assert all(np.isfinite(v) for e in est["trace"] for v in e)
        # 3-D pose scene data: integrated quaternion (unit), position,
        # trail and keyframes all served.
        assert abs(np.linalg.norm(est["q"]) - 1.0) < 1e-3
        assert len(est["pos"]) == 3 and len(est["path"]) == 6
        assert len(est["keyframes"]) >= 1
        assert all(len(k) == 7 for k in est["keyframes"])
        # The clip translates -> no detection flag is required, but the
        # field must have produced a JPEG at some point iff detected once.
        assert snap["detected"] in (True, False)
    finally:
        box[0].shutdown()
        th.join(timeout=60)
