"""Driver entry-point hardening tests (MULTICHIP_r01/r02 post-mortem).

The driver calls ``entry()`` / ``dryrun_multichip()`` from environments where
the default jax backend is an unusable tunneled TPU, from arbitrary cwds,
with a sitecustomize that injects a TPU PJRT plugin into every process.
Rounds 1-2 died on eager ops dispatched to that backend before the CPU
dryrun ever ran.  These tests pin the three defenses:

1. importing the package and calling ``entry()`` dispatches ZERO device ops
   (verified under ``JAX_PLATFORMS=<nonexistent>``, where any dispatch
   raises),
2. ``dryrun_multichip`` re-execs into a whitelist-scrubbed CPU subprocess
   when the calling env is poisoned (exercised end-to-end), and
3. the numpy example state returned by ``entry()`` matches
   ``StreamPipeline.init_state`` leaf-for-leaf.
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, env_overrides: dict, timeout=900):
    env = dict(os.environ)
    env.update(env_overrides)
    return subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_entry_dispatches_no_device_ops():
    """entry() must work even when the default backend cannot exist."""
    code = (
        "import sys; sys.path.insert(0, %r); "
        "from __graft_entry__ import entry; "
        "fn, (state, gray, key) = entry(); "
        "import numpy as np; "
        "assert type(state.prev_cache.pyr[0]) is np.ndarray, "
        "type(state.prev_cache.pyr[0]); "
        "assert type(gray) is np.ndarray and type(key) is np.ndarray; "
        "print('OK')" % REPO
    )
    # A platform that cannot be initialized: any eager dispatch would raise.
    proc = _run(
        code,
        {
            "JAX_PLATFORMS": "no_such_platform",
            "JAX_PLATFORM_NAME": "no_such_platform",
        },
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout


def test_package_import_dispatches_no_device_ops():
    """Importing every ofps_tpu module must not touch a device backend."""
    code = (
        "import sys, pkgutil, importlib; sys.path.insert(0, %r); "
        "import ofps_tpu; "
        "mods = [m.name for m in pkgutil.walk_packages("
        "ofps_tpu.__path__, 'ofps_tpu.')]; "
        "[importlib.import_module(m) for m in mods]; "
        "print('IMPORTED', len(mods))" % REPO
    )
    proc = _run(code, {"JAX_PLATFORMS": "no_such_platform"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "IMPORTED" in proc.stdout


def test_dryrun_reexec_branch_from_poisoned_env():
    """dryrun_multichip must self-bootstrap out of a TPU-poisoned env.

    Simulates the driver environment: JAX_PLATFORMS points at an
    uninitializable platform, TPU plugin-injection vars are present, and the
    child marker is absent — the only way this passes is the scrubbed
    re-exec path.
    """
    code = (
        "import sys; sys.path.insert(0, %r); "
        "from __graft_entry__ import dryrun_multichip; "
        "dryrun_multichip(8); print('PARENT_OK')" % REPO
    )
    proc = _run(
        code,
        {
            "JAX_PLATFORMS": "no_such_platform",
            "JAX_PLATFORM_NAME": "no_such_platform",
            "PALLAS_AXON_POOL_IPS": "127.0.0.1",
            "PALLAS_AXON_REMOTE_COMPILE": "1",
            "XLA_FLAGS": "",
            "OFPS_TPU_DRYRUN_CHILD": "",
        },
    )
    assert proc.returncode == 0, (proc.stdout[-500:], proc.stderr[-3000:])
    assert "dryrun_multichip OK" in proc.stdout
    assert "PARENT_OK" in proc.stdout


def test_example_state_matches_init_state():
    """The numpy example args mirror init_state leaf-for-leaf."""
    import jax

    from __graft_entry__ import _build_pipeline, _example_state_np

    pipe = _build_pipeline()
    b, h, w = 2, 108, 192
    ref = pipe.init_state(b, h, w)
    got = _example_state_np(pipe, b, h, w)
    ref_leaves, ref_def = jax.tree_util.tree_flatten(ref)
    got_leaves, got_def = jax.tree_util.tree_flatten(got)
    assert ref_def == got_def
    for r, g in zip(ref_leaves, got_leaves):
        assert np.asarray(r).shape == np.asarray(g).shape
        assert np.asarray(r).dtype == np.asarray(g).dtype
        np.testing.assert_allclose(np.asarray(r), np.asarray(g))


def test_entry_step_runs_on_cpu_mesh():
    """The entry fn jits and runs with the numpy example args."""
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    state, out = jax.jit(fn)(*args)
    rot = np.asarray(out.rot[0])
    assert rot.shape == (2, 4)
    assert np.all(np.isfinite(rot))
