"""Runtime property mutation without recompilation.

The reference pushes property edits into RUNNING plugins every frame
(app/utils/properties.rs:5-18, tracking/worker.rs:183,356).  Here dynamic
(continuous) properties are traced scalars: mutating one between frames must
change behavior on the next frame while the jitted step's compile cache
stays at ONE entry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofps_tpu.core.camera import StandardCamera
from ofps_tpu.core.motion import SparseFlow
from ofps_tpu.detectors.base import create_detector
from ofps_tpu.estimators.base import create_estimator
from ofps_tpu.parallel.stream import StreamPipeline
from ofps_tpu.pipeline.runtime import LivePipeline


def _flow_batch(n=256, mag=0.02):
    rng = np.random.default_rng(0)
    pos = rng.uniform(0.1, 0.9, (n, 2)).astype(np.float32)
    motion = np.full((n, 2), mag, np.float32)
    fl = SparseFlow.from_arrays(pos, motion, capacity=n)
    return SparseFlow(fl.pos[None], fl.motion[None], fl.mask[None])


@pytest.fixture(scope="module")
def live():
    pipe = StreamPipeline(
        camera=StandardCamera.create(1.0, 90.0),
        estimators=[create_estimator("almeida")],
        detector=create_detector("block_motion"),
    )
    return LivePipeline(pipe, batch=1, height=1, width=1, from_flow=True)


def test_detector_mutation_no_recompile(live):
    key = jax.random.PRNGKey(0)
    _, out = live.step(_flow_batch(), key)
    assert bool(out.detection.detected[0])  # uniform motion everywhere

    # Raise the threshold above the field magnitude: detection must flip
    # off on the NEXT frame, with no recompilation.
    assert live.set_property("detector", "target_motion", 0.09) is True
    _, out2 = live.step(_flow_batch(), key)
    assert not bool(out2.detection.detected[0])

    # Back down: flips on again.
    live.set_property("detector", "target_motion", 0.003)
    _, out3 = live.step(_flow_batch(), key)
    assert bool(out3.detection.detected[0])

    assert live._step._cache_size() == 1


def test_estimator_mutation_no_recompile(live):
    key = jax.random.PRNGKey(1)
    n0 = live._step._cache_size()
    live.set_property("almeida", "inlier_angle_deg", 2.0)
    live.step(_flow_batch(), key)
    live.set_property(0, "inlier_angle_deg", 0.05)  # index addressing
    live.step(_flow_batch(), key)
    assert live._step._cache_size() == max(n0, 1)


def test_static_property_requires_rebuild(live):
    # Shape-affecting properties are static jit args: set_property reports
    # False so the caller rebuilds (the reference also rebuilds plugins on
    # structural changes).
    assert live.set_property("almeida", "num_iters", 64) is False
    assert live.set_property("detector", "min_size", 0.1) is False


def test_unknown_property_raises(live):
    with pytest.raises(KeyError):
        live.set_property("almeida", "no_such_prop", 1.0)


def test_bounds_clamp_applies(live):
    # Bounds from the property layer clamp before tracing in.
    live.set_property("detector", "target_motion", 99.0)  # clamps to 0.1
    got = float(live.props["detector"]["target_motion"])
    assert got == pytest.approx(0.1)
    live.set_property("detector", "target_motion", 0.003)


def test_legacy_plugin_signature_adapts():
    """Externally-registered plugins written against the pre-props API must
    keep working: the bases adapt the optional kwargs instead of TypeError-
    ing, and raise loudly only if a real property push would be dropped."""
    import jax
    import jax.numpy as jnp
    import pytest

    from ofps_tpu.core import quat
    from ofps_tpu.core.camera import StandardCamera
    from ofps_tpu.core.motion import SparseFlow
    from ofps_tpu.detectors.base import DetectionResult, DetectorInstance
    from ofps_tpu.estimators.base import EstimatorInstance

    def legacy_estimate(state, flow, camera, key):  # old 4-arg contract
        return quat.identity(), jnp.zeros(3), state

    est = EstimatorInstance(
        name="legacy", params=None, init=lambda: (), estimate=legacy_estimate
    )
    cam = StandardCamera.create(1.0, 90.0)
    fl = SparseFlow.from_arrays([[0.5, 0.5]], [[0.0, 0.0]], capacity=8)
    rot, pos, _ = est.motion_step(
        (), fl, cam, jax.random.PRNGKey(0), quat.identity(), jnp.zeros(3)
    )
    assert rot.shape == (4,)
    # A real (non-empty) props push cannot be silently dropped.
    with pytest.raises(TypeError):
        est.estimate((), fl, cam, jax.random.PRNGKey(0),
                     props={"x": jnp.float32(1)})

    def legacy_detect(flow):  # old 1-arg contract
        z = jnp.zeros((2, 2))
        return DetectionResult(
            detected=jnp.bool_(False), area=jnp.int32(0),
            field=jnp.zeros((2, 2, 2)), mask=z.astype(bool),
        )

    det = DetectorInstance(name="legacy", params=None, detect=legacy_detect)
    out = det.detect(fl, props=None)  # None/empty props are fine
    assert not bool(out.detected)
