"""IO format tests: .mvec wire format, .flo files, decoder factory, tcp."""

import struct
import threading

import numpy as np

from ofps_tpu.decoders.base import available_decoders, create_decoder
from ofps_tpu.decoders.flo import read_flo, write_flo
from ofps_tpu.decoders.mvec import read_mvec_frame, write_mvec_frame


def test_mvec_roundtrip(tmp_path):
    path = tmp_path / "test.mvec"
    frames = [
        (np.random.rand(5, 2).astype(np.float32), np.random.rand(5, 2).astype(np.float32)),
        (np.random.rand(3, 2).astype(np.float32), np.random.rand(3, 2).astype(np.float32)),
        (np.zeros((0, 2), np.float32), np.zeros((0, 2), np.float32)),
    ]
    with open(path, "wb") as f:
        for pos, mot in frames:
            write_mvec_frame(f, pos, mot)
    with open(path, "rb") as f:
        for pos, mot in frames:
            rec = read_mvec_frame(f)
            assert rec is not None
            assert np.allclose(rec[0], pos)
            assert np.allclose(rec[1], mot)
        assert read_mvec_frame(f) is None  # EOF


def test_mvec_exact_wire_format(tmp_path):
    # Byte-level parity with motion-loader/src/lib.rs:52-64.
    path = tmp_path / "wire.mvec"
    with open(path, "wb") as f:
        write_mvec_frame(f, [[0.25, 0.5]], [[-0.125, 1.0]])
    raw = path.read_bytes()
    assert raw[:4] == struct.pack("<I", 1)
    assert raw[4:] == struct.pack("<4f", 0.25, 0.5, -0.125, 1.0)


def test_mvec_decoder_factory(tmp_path):
    path = tmp_path / "clip.mvec"
    with open(path, "wb") as f:
        write_mvec_frame(f, [[0.1, 0.2], [0.3, 0.4]], [[0.01, 0.0], [0.0, 0.02]])
        write_mvec_frame(f, [[0.5, 0.5]], [[0.0, 0.0]])
    dec = create_decoder(str(path))
    f1 = dec.process_frame()
    assert f1 is not None and f1.pos.shape == (2, 2)
    f2 = dec.process_frame()
    assert f2 is not None and f2.pos.shape == (1, 2)
    assert dec.process_frame() is None
    assert dec.get_framerate() is None


def test_mvec_decoder_skip(tmp_path):
    path = tmp_path / "skip.mvec"
    with open(path, "wb") as f:
        for i in range(4):
            write_mvec_frame(f, [[0.1 * i, 0.0]], [[0.0, 0.0]])
    dec = create_decoder(str(path))
    fr = dec.process_frame(skip=2)  # drops frames 0,1; returns frame 2
    assert abs(fr.pos[0, 0] - 0.2) < 1e-6


def test_flo_roundtrip(tmp_path):
    flow = np.random.randn(7, 9, 2).astype(np.float32)
    path = str(tmp_path / "f.flo")
    write_flo(path, flow)
    back = read_flo(path)
    assert back.shape == (7, 9, 2)
    assert np.allclose(back, flow)
    raw = open(path, "rb").read()
    assert raw[:4] == b"PIEH"  # 202021.25 little-endian spells the magic


def test_tcp_stream_decoder():
    # tcp:// ingestion parity (ofps/src/utils.rs:92-118).
    import socket

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    payload_pos = np.array([[0.5, 0.25]], np.float32)
    payload_mot = np.array([[0.01, -0.01]], np.float32)

    def serve():
        conn, _ = srv.accept()
        import io

        buf = io.BytesIO()
        write_mvec_frame(buf, payload_pos, payload_mot)
        conn.sendall(buf.getvalue())
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    dec = create_decoder(f"tcp://127.0.0.1:{port}", plugin="mvec")
    fr = dec.process_frame()
    assert np.allclose(fr.pos, payload_pos)
    assert np.allclose(fr.motion, payload_mot)
    assert dec.process_frame() is None
    t.join(timeout=5)


def test_available_decoders():
    decs = available_decoders()
    assert "mvec" in decs
