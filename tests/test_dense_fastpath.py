"""Dense-mask fast path parity: ``dense=True`` must be BIT-IDENTICAL.

Serving feeds the estimators densified-grid fields whose mask is a constant
all-ones array (core.motion.field_to_sparse), so the RANSAC sample draws and
eval-cap subsets can be resolved at compile time
(ops.robust.dense_eval_indices / sample_indices(dense=True)) instead of the
runtime cumsum + searchsorted machinery whose binary-search gathers
serialize on the TPU scalar core.  The fast path claims *bit-identical*
selections — these tests hold it to that on every estimator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofps_tpu.core.camera import StandardCamera
from ofps_tpu.core.motion import SparseFlow
from ofps_tpu.ops.robust import (
    dense_eval_indices,
    sample_indices,
    uniform_cap_weights,
)


def _dense_flow(key, n=700):
    k1, k2 = jax.random.split(key)
    pos = jax.random.uniform(k1, (n, 2), jnp.float32, 0.05, 0.95)
    motion = jax.random.uniform(k2, (n, 2), jnp.float32, -0.02, 0.02)
    return SparseFlow(pos, motion, jnp.ones((n,), jnp.float32))


def test_sample_indices_dense_bit_identical():
    key = jax.random.PRNGKey(3)
    w = jnp.ones((1234,), jnp.float32)
    a = sample_indices(key, w, 64, 7)
    b = sample_indices(key, w, 64, 7, dense=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("n,cap", [(12600, 2048), (12600, 1000), (701, 128)])
def test_dense_eval_indices_match_runtime_machinery(n, cap):
    # Replay the runtime path (uniform_cap_weights + cumulative-count
    # compaction) on an all-ones mask and demand the same subset.
    w = jnp.ones((n,), jnp.float32)
    wc = uniform_cap_weights(w, cap)
    cw = jnp.cumsum((wc > 0.5).astype(jnp.int32))
    eidx_rt = jnp.minimum(
        jnp.searchsorted(
            cw, jnp.arange(1, cap + 1, dtype=jnp.int32), side="left"
        ),
        n - 1,
    )
    we_rt = jnp.where(jnp.arange(cap) < cw[-1], wc[eidx_rt], 0.0)
    eidx, we = dense_eval_indices(n, cap)
    np.testing.assert_array_equal(np.asarray(eidx_rt), np.asarray(eidx))
    np.testing.assert_array_equal(np.asarray(we_rt), np.asarray(we))


@pytest.mark.parametrize("name", ["almeida", "homography", "multiview", "libmv"])
def test_estimator_dense_flag_bit_identical(name):
    from ofps_tpu.estimators.base import create_estimator

    est = create_estimator(name)
    camera = StandardCamera.create(16 / 9, 90.0)
    flow = _dense_flow(jax.random.PRNGKey(11))
    key = jax.random.PRNGKey(7)
    st = est.init()

    r0, t0, s0 = jax.jit(
        lambda st_, fl, k: est.estimate(st_, fl, camera, k, dense=False)
    )(st, flow, key)
    r1, t1, s1 = jax.jit(
        lambda st_, fl, k: est.estimate(st_, fl, camera, k, dense=True)
    )(st, flow, key)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    for a, b in zip(jax.tree_util.tree_leaves(s0), jax.tree_util.tree_leaves(s1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
