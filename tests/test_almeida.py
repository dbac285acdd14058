"""Almeida estimator accuracy tests.

Port of the reference's test suite (almeida-estimator/src/lib.rs:308-373):
synthetic rotations at 0.01/0.1/1/10 degrees in 8 axis combos must be
recovered within 10% relative error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofps_tpu.core import quat
from ofps_tpu.core.camera import StandardCamera
from ofps_tpu.estimators.base import create_estimator
from synthetic import ANGLE_COMBOS, euler_deg, get_grid, synthetic_field


def _run_suite(estimator, rots=(0.01, 0.1, 1.0, 10.0), seed=7):
    cam = StandardCamera.create(1.0, 90.0)
    grid = get_grid(50, 50, cam)
    est_fn = jax.jit(estimator.estimate)
    key = jax.random.PRNGKey(seed)
    for rot in rots:
        for combo in ANGLE_COMBOS:
            r, p, y = (c * rot for c in combo)
            q = euler_deg(r, p, y)
            flow = synthetic_field(cam, q, grid=grid)
            key, sub = jax.random.split(key)
            est_q, tr, _ = est_fn((), flow, cam, sub)
            delta = float(jnp.rad2deg(quat.angle_to(q, est_q)))
            assert delta < 0.1 * rot, (
                f"rot={rot} combo={combo}: err {delta} >= {0.1 * rot}"
            )
            assert np.allclose(np.asarray(tr), 0.0)


def test_rotation_lsq():
    _run_suite(create_estimator("almeida", use_ransac=False))


def test_rotation_ransac():
    _run_suite(create_estimator("almeida", use_ransac=True, num_iters=100))


def test_masked_padding_invariance():
    # Padding entries must not affect the LSQ solution.
    cam = StandardCamera.create(1.0, 90.0)
    q = euler_deg(0.5, 0.2, -0.3)
    flow_tight = synthetic_field(cam, q)
    flow_padded = synthetic_field(cam, q, capacity=4096)
    est = create_estimator("almeida", use_ransac=False)
    q1, _, _ = est.estimate((), flow_tight, cam, None)
    q2, _, _ = est.estimate((), flow_padded, cam, None)
    assert float(quat.angle_to(q1, q2)) < 1e-6


def test_vmap_over_streams():
    # The estimator must vmap across a stream batch (the core TPU win).
    cam = StandardCamera.create(1.0, 90.0)
    qs = [euler_deg(0.3, 0.0, 0.0), euler_deg(0.0, 0.4, 0.0)]
    flows = [synthetic_field(cam, q) for q in qs]
    batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *flows)
    est = create_estimator("almeida", use_ransac=False)
    fn = jax.vmap(lambda f: est.estimate((), f, cam, None)[0])
    out = fn(batch)
    for i, q in enumerate(qs):
        err = float(jnp.rad2deg(quat.angle_to(q, out[i])))
        assert err < 0.05


def test_uniform_cap_weights_is_spatially_uniform():
    """The capped eval subset must cover the whole raster, not the top strip."""
    from ofps_tpu.estimators.almeida import uniform_cap_weights

    n, k = 4000, 500
    mask = np.ones(n, np.float32)
    mask[::7] = 0.0  # some invalid entries sprinkled in
    w = np.asarray(uniform_cap_weights(jnp.asarray(mask), k))
    assert w.sum() == pytest.approx(k, abs=2)
    assert np.all(w <= mask)  # never selects invalid points
    # Each quarter of the raster receives ~k/4 of the subset.
    quarters = w.reshape(4, -1).sum(axis=1)
    assert np.all(np.abs(quarters - k / 4) <= 3), quarters
    # No-cap case: every valid point kept.
    w_all = np.asarray(uniform_cap_weights(jnp.asarray(mask), n))
    assert np.array_equal(w_all, mask)


def test_ransac_scores_bottom_of_frame():
    """Regression: outliers confined to the TOP raster strip must not win.

    Round-1 scored only the first num_samples valid points (raster order =
    top of frame); corrupting exactly that strip flipped the winner.
    """
    cam = StandardCamera.create(1.0, 90.0)
    grid = get_grid(50, 50, cam)
    q = euler_deg(0.0, 1.0, 0.5)
    flow = synthetic_field(cam, q, grid=grid)
    n = flow.pos.shape[0]
    n_top = n // 4
    # Corrupt the first (top-of-frame) quarter with inconsistent motion.
    bad = jnp.asarray(
        np.random.default_rng(3).uniform(-0.05, 0.05, (n_top, 2)),
        jnp.float32,
    )
    motion = flow.motion.at[:n_top].set(bad)
    flow = flow._replace(motion=motion)
    est = create_estimator("almeida", ransac_samples=n_top)  # cap < clean pts
    est_q, _, _ = jax.jit(est.estimate)((), flow, cam, jax.random.PRNGKey(0))
    delta = float(jnp.rad2deg(quat.angle_to(q, est_q)))
    assert delta < 0.1, delta
