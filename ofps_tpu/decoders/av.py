"""Codec motion-vector decoder ("av"): ctypes bindings over the native lib.

Host-side equivalent of the reference av-decoder plugin
(``/root/reference/av-decoder/src/lib.rs``): FFmpeg demux + decode with
``+export_mvs``, surfacing H.264/MPEG motion vectors as normalized
(pos, motion) arrays.  The C++ implementation lives in
``ofps_tpu/native/avdec.cpp`` and is auto-built on first use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from ofps_tpu.decoders.base import DecodedFrame, register

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO = os.path.join(_NATIVE_DIR, "libofps_av.so")
_SRC = os.path.join(_NATIVE_DIR, "avdec.cpp")

_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        subprocess.run(
            ["make", "-s", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
    lib = ctypes.CDLL(_SO)
    lib.ofps_av_open.restype = ctypes.c_void_p
    lib.ofps_av_open.argtypes = [ctypes.c_char_p]
    lib.ofps_av_close.argtypes = [ctypes.c_void_p]
    lib.ofps_av_meta.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.ofps_av_next.restype = ctypes.c_int
    lib.ofps_av_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.ofps_av_encode_test_ex.restype = ctypes.c_int
    lib.ofps_av_encode_test_ex.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.ofps_av_encode_test_events.restype = ctypes.c_int
    lib.ofps_av_encode_test_events.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.ofps_av_encode_gray.restype = ctypes.c_int
    lib.ofps_av_encode_gray.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int64,
        ctypes.c_char_p,
    ]
    _lib = lib
    return lib


def encode_test_video(
    path: str,
    width: int = 320,
    height: int = 240,
    frames: int = 30,
    gop: int = 30,
    dx: float = 2.0,
    dy: float = 0.0,
    pattern: str = "sine",
    move_start: int = 0,
    move_stop: int = 1 << 30,
    events=None,
) -> None:
    """Write a synthetic MPEG-4 clip (translating texture) for tests.

    ``pattern``: "sine" (periodic — fine for codec-MV tests) or "noise"
    (aperiodic value noise — required for optical-flow tests, where the
    periodic sines alias the block-matching search).
    ``move_start``/``move_stop`` bound the moving frames (CCTV-style motion
    events: still -> moving -> still); ``events`` instead takes a LIST of
    (start, stop) windows for multi-event scenario clips (the 30-min CCTV
    evaluation shape, report.tex:919).
    """
    lib = _load_native()
    if events is None:
        events = [(move_start, move_stop)]
    n = len(events)
    starts = (ctypes.c_int * n)(*[int(a) for a, _ in events])
    stops = (ctypes.c_int * n)(*[int(b) for _, b in events])
    rc = lib.ofps_av_encode_test_events(
        path.encode(),
        width,
        height,
        frames,
        gop,
        dx,
        dy,
        1 if pattern == "noise" else 0,
        starts,
        stops,
        n,
    )
    if rc != 0:
        raise RuntimeError(f"test-clip encoder failed ({rc})")


def encode_gray_video(
    path: str, frames, gop: int = 30, bit_rate: int = 0
) -> None:
    """Encode caller-provided grayscale frames to an MPEG-4 clip.

    ``frames``: (N, H, W) uint8 (anything array-like is converted).  No
    B-frames, so every inter frame carries forward codec motion vectors —
    this turns arbitrary rendered/captured content into a REAL codec-MV
    source for the `av` decoder, the reference's primary input path
    (av-decoder/src/lib.rs).  ``bit_rate`` 0 = default (w*h*8 bps).
    """
    import numpy as np

    lib = _load_native()
    arr = np.ascontiguousarray(np.asarray(frames, dtype=np.uint8))
    if arr.ndim != 3:
        raise ValueError(f"frames must be (N, H, W) uint8, got {arr.shape}")
    n, h, w = arr.shape
    rc = lib.ofps_av_encode_gray(
        path.encode(), w, h, n, gop, int(bit_rate), arr.tobytes()
    )
    if rc != 0:
        raise RuntimeError(f"gray-frame encoder failed ({rc})")


@register("av")
class AvDecoder:
    """Decoder over any libavformat input (file path or ``tcp://`` URL).

    The reference's ``@addr`` listen convention becomes ``?listen=1``
    (handled here for parity with ofps/src/utils.rs:92-118).
    """

    def __init__(self, input_path: str, capacity: int = 65536):
        if input_path.startswith("tcp://@"):
            input_path = "tcp://" + input_path[7:] + "?listen=1"
        lib = _load_native()
        self._lib = lib
        self._ctx = lib.ofps_av_open(input_path.encode())
        if not self._ctx:
            raise IOError(f"failed to open {input_path!r}")
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        lib.ofps_av_meta(self._ctx, ctypes.byref(w), ctypes.byref(h), ctypes.byref(fps))
        self._size = (w.value, h.value)
        self._fps = fps.value or None
        self._cap = capacity
        self._pos = np.empty((capacity, 2), dtype=np.float32)
        self._mot = np.empty((capacity, 2), dtype=np.float32)

    def process_frame(
        self, want_frame: bool = False, skip: int = 0
    ) -> Optional[DecodedFrame]:
        w, h = self._size
        rgba = np.empty((h, w, 4), dtype=np.uint8) if want_frame else None
        n = ctypes.c_int()
        rc = self._lib.ofps_av_next(
            self._ctx,
            self._pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._mot.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._cap,
            ctypes.byref(n),
            rgba.ctypes.data_as(ctypes.c_char_p) if rgba is not None else None,
            skip,
        )
        if rc == -1:
            return None
        if rc < -1:
            raise IOError(f"decode error ({rc})")
        k = n.value
        return DecodedFrame(
            pos=self._pos[:k].copy(),
            motion=self._mot[:k].copy(),
            has_mvs=bool(rc),
            frame=rgba,
        )

    def get_framerate(self) -> Optional[float]:
        return self._fps

    def get_aspect(self) -> Optional[Tuple[int, int]]:
        return self._size

    def close(self):
        if getattr(self, "_ctx", None):
            self._lib.ofps_av_close(self._ctx)
            self._ctx = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
