"""Whole-image small-level Pallas kernel parity (interpret mode).

Must reproduce ``ops.flow_pyramid._level_refine`` at the coarse pyramid
shapes for both the mid-level (search=1) and coarse (search=6) configs,
up to bf16 image quantization and the +-RES_SMALL warp clamp.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ofps_tpu.ops.flow_pyramid import _level_refine
from ofps_tpu.ops.image import warp_bilinear
from ofps_tpu.pallas.flow_refine_small import flow_refine_small_uv


@pytest.fixture(scope="module")
def scene():
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(0)
    h, w = 33, 60
    img = gaussian_filter(
        rng.standard_normal((h + 20, w + 20)).astype(np.float32), 1.5
    ) * 100
    u = gaussian_filter(rng.standard_normal((h, w)).astype(np.float32), 6) * 4
    v = gaussian_filter(rng.standard_normal((h, w)).astype(np.float32), 6) * 3
    flow = jnp.asarray(np.stack([u, v], -1))
    i2 = jnp.asarray(img[10 : 10 + h, 10 : 10 + w])
    i1 = jnp.asarray(np.asarray(warp_bilinear(i2, flow)))
    return i1, i2, flow


@pytest.mark.parametrize("search", [1, 6])
def test_small_kernel_matches_xla_path(scene, search):
    i1, i2, flow = scene
    ref = np.asarray(
        flow
        + _level_refine(i1, warp_bilinear(i2, flow), search, 5, jnp.float32)
    )
    gu, gv = flow_refine_small_uv(
        i1, i2, flow[..., 0], flow[..., 1], search, 5, interpret=True
    )
    d = np.abs(np.stack([np.asarray(gu), np.asarray(gv)], -1) - ref)[3:-3, 3:-3]
    assert d.mean() < 0.02, d.mean()
    assert d.max() < 0.2, d.max()


def test_small_kernel_batched(scene):
    i1, i2, flow = scene
    g1u, g1v = flow_refine_small_uv(
        i1, i2, flow[..., 0], flow[..., 1], 1, 5, interpret=True
    )
    gbu, gbv = flow_refine_small_uv(
        jnp.stack([i1, i1]),
        jnp.stack([i2, i2]),
        jnp.stack([flow[..., 0]] * 2),
        jnp.stack([flow[..., 1]] * 2),
        1,
        5,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(gbu[0]), np.asarray(g1u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gbv[1]), np.asarray(g1v), atol=1e-5)
