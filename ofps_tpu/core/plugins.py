"""External plugin discovery.

Behavioral spec: the reference's ``PluginStore`` scans well-known paths and
dlopens shared libraries exporting ``OFPS_<Trait>_<name>`` descriptors
(``/root/reference/ofps/src/plugins/mod.rs:296-352``).  The TPU-native
analog: third-party Python modules register their components through the
same ``register`` decorators the builtins use, and are discovered by
importing every module listed in the ``OFPS_TPU_PLUGINS`` environment
variable (comma-separated module paths) — the runtime equivalent of the
reference's plugin search paths.

A plugin module simply does::

    from ofps_tpu.estimators.base import register, EstimatorInstance

    @register("my_estimator")
    def make_my_estimator(**kwargs): ...

and becomes visible to ``create_estimator("my_estimator")`` / the CLI once
its module is on ``OFPS_TPU_PLUGINS``.
"""

from __future__ import annotations

import importlib
import logging
import os

_LOADED = False


def load_external_plugins() -> None:
    """Import every module named in ``OFPS_TPU_PLUGINS`` (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    spec = os.environ.get("OFPS_TPU_PLUGINS", "")
    for mod in filter(None, (m.strip() for m in spec.split(","))):
        try:
            importlib.import_module(mod)
        except Exception:  # a broken plugin must not take down the host app
            logging.getLogger(__name__).exception(
                "failed to load plugin module %r", mod
            )
