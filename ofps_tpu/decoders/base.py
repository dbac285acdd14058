"""Decoder protocol and registry (host-side flow producers).

Behavioral spec: ``/root/reference/ofps/src/decoder.rs`` (the ``Decoder``
trait) and ``motion-loader/src/lib.rs`` (``create_decoder`` factory: ``.mvec``
files get the built-in replay reader, everything else goes to the "av"
codec-MV decoder).

Decoders are host-side stateful Python/native objects (I/O cannot live under
jit); they produce numpy arrays which the pipeline turns into fixed-capacity
:class:`~ofps_tpu.core.motion.SparseFlow` batches for the device.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Protocol, Tuple

import numpy as np

_REGISTRY: Dict[str, Callable[..., "Decoder"]] = {}


@dataclasses.dataclass
class DecodedFrame:
    """One frame's worth of decoder output.

    ``pos``/``motion``: (N, 2) float32, [0,1]-normalized (decoder.rs:40-42).
    ``has_mvs`` mirrors the reference's ``Ok(true/false)``.
    ``frame``: optional (H, W, 4) uint8 RGBA image.
    """

    pos: np.ndarray
    motion: np.ndarray
    has_mvs: bool = True
    frame: Optional[np.ndarray] = None


class Decoder(Protocol):
    def process_frame(
        self, want_frame: bool = False, skip: int = 0
    ) -> Optional[DecodedFrame]:
        """Decode the next frame; ``None`` at end of stream.

        ``skip`` drops that many frames first (decoder.rs:54-59 semantics).
        """
        ...

    def get_framerate(self) -> Optional[float]:
        ...

    def get_aspect(self) -> Optional[Tuple[int, int]]:
        ...


def register(name: str):
    def deco(factory):
        _REGISTRY[name] = factory
        return factory

    return deco


def create_decoder(input_path: str, plugin: Optional[str] = None, **kwargs) -> Decoder:
    """Factory matching motion-loader/src/lib.rs:13-29.

    ``.mvec`` inputs use the built-in replay reader; otherwise the named
    plugin (default "av") handles the stream.
    """
    _load_builtin_decoders()
    if plugin is None:
        if input_path.endswith(".mvec"):
            return _REGISTRY["mvec"](input_path, **kwargs)
        plugin = "av"
    if plugin not in _REGISTRY:
        raise KeyError(f"unknown decoder {plugin!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[plugin](input_path, **kwargs)


def _load_builtin_decoders():
    import importlib

    for mod in ("mvec", "av", "cv"):
        try:
            importlib.import_module(f"ofps_tpu.decoders.{mod}")
        except ImportError:
            pass
    from ofps_tpu.core.plugins import load_external_plugins

    load_external_plugins()


def available_decoders():
    _load_builtin_decoders()
    return sorted(_REGISTRY)
