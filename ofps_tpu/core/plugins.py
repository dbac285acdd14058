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


def adapt_optional_kwargs(fn, names):
    """Wrap ``fn`` so the optional keyword args in ``names`` are only
    forwarded when its signature accepts them.

    Compat shim for externally-registered plugins (``OFPS_TPU_PLUGINS``)
    written against an older callable contract: the pipeline always passes
    the newer optional kwargs (``props=``, ``move_magnitude=``), and a
    legacy ``estimate(state, flow, camera, key)`` would otherwise raise
    TypeError on the first step.  Returns ``fn`` unchanged when it already
    accepts everything (the builtin plugins), so there is no wrapper on the
    hot path.
    """
    import inspect

    try:
        params = inspect.signature(fn).parameters
        var_kw = any(
            p.kind == inspect.Parameter.VAR_KEYWORD for p in params.values()
        )
        accepted = {n for n in names if var_kw or n in params}
    except (TypeError, ValueError):  # builtins / C callables: assume new API
        return fn
    if accepted == set(names):
        return fn

    def shim(*args, **kwargs):
        dropped = {
            k: kwargs.pop(k)
            for k in list(kwargs)
            if k in names and k not in accepted
        }
        # Silently dropping a non-default value would hide a user's
        # set_properties call from a legacy plugin — be loud about it.
        for k, v in dropped.items():
            if v is not None and v != {}:
                raise TypeError(
                    f"plugin callable {fn!r} does not accept {k!r}; "
                    "it was built against the pre-runtime-properties API"
                )
        return fn(*args, **kwargs)

    return shim
