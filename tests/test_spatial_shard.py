"""Spatially-sharded dense flow (parallel/spatial.py) on the 8-device CPU
mesh: halo-exchange correctness and sharded-vs-unsharded flow agreement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ofps_tpu.ops.flow_pyramid import FlowParams, dense_flow_warm
from ofps_tpu.parallel.sharding import make_stream_mesh
from ofps_tpu.parallel.spatial import dense_flow_warm_spatial, exchange_halo


def test_exchange_halo_neighbors_and_edges():
    """Interior halos carry REAL neighbor columns; global edges replicate."""
    mesh = make_stream_mesh(8, space=4)  # ("stream", "space") = (2, 4)
    w_local, halo = 8, 4
    x = jnp.arange(2 * 3 * (w_local * 4), dtype=jnp.float32).reshape(
        2, 3, w_local * 4
    )

    from functools import partial

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P("stream", None, "space"),
        out_specs=P("stream", None, "space"),
    )
    def f(xb):
        return exchange_halo(xb, halo, "space")[..., : w_local + 2 * halo]
        # out width must stay shardable: return the left halo + band slice.

    with mesh:
        out = np.asarray(f(x))
    xs = np.asarray(x)
    for s in range(4):
        lo = s * w_local
        got = out[:, :, s * (w_local + 2 * halo) : s * (w_local + 2 * halo) + w_local + 2 * halo]
        if s == 0:
            want_left = np.repeat(xs[:, :, :1], halo, axis=-1)
        else:
            want_left = xs[:, :, lo - halo : lo]
        np.testing.assert_array_equal(got[..., :halo], want_left)
        np.testing.assert_array_equal(
            got[..., halo : halo + w_local], xs[:, :, lo : lo + w_local]
        )


def _moving_scene(b, h, w, shift=2, seed=3):
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    big = gaussian_filter(
        rng.standard_normal((b, h, w + 16)).astype(np.float32), (0, 1.5, 1.5)
    ) * 120
    return (
        jnp.asarray(big[:, :, 8 : 8 + w]),
        jnp.asarray(big[:, :, 8 - shift : 8 - shift + w]),
    )


def test_spatial_flow_close_to_unsharded():
    mesh = make_stream_mesh(8, space=4)
    b, h, w = 2, 64, 128
    i1, i2 = _moving_scene(b, h, w)
    params = FlowParams(levels=3, coarse_search=3)
    (u0, v0), (wu0, wv0) = dense_flow_warm(i1, i2, params)

    spec = NamedSharding(mesh, P("stream", None, "space"))
    with mesh:
        (u1, v1), (wu1, wv1) = jax.jit(
            lambda a, b: dense_flow_warm_spatial(a, b, params, None, mesh)
        )(jax.device_put(i1, spec), jax.device_put(i2, spec))
        jax.block_until_ready(u1)

    # The GLOBAL border band differs by design: each shard sees replicated
    # halo content at the true image edges instead of the unsharded path's
    # out-of-image penalties.  Both products neutralize that band
    # (dense_flow replicates it; the serving path excludes it at grid
    # resolution via border_px), so the gate compares the valid interior —
    # which includes every band SEAM, the region the halo exchange
    # protects.
    m = 16
    epe = np.hypot(
        np.asarray(u0, np.float32) - np.asarray(u1, np.float32),
        np.asarray(v0, np.float32) - np.asarray(v1, np.float32),
    )[:, m:-m, m:-m]
    assert np.mean(epe) < 0.05, np.mean(epe)
    assert np.percentile(epe, 99) < 0.75, np.percentile(epe, 99)
    # The warm carry (half-res level-1 flow) must agree too — it is the
    # temporal feedback path, where seam errors would compound.
    wepe = np.hypot(
        np.asarray(wu0, np.float32) - np.asarray(wu1, np.float32),
        np.asarray(wv0, np.float32) - np.asarray(wv1, np.float32),
    )[:, m // 2 : -m // 2, m // 2 : -m // 2]
    assert np.mean(wepe) < 0.1, np.mean(wepe)
    # Global shapes/dtypes round-trip.
    assert u1.shape == u0.shape and wu1.shape == wu0.shape
    assert wu1.dtype == jnp.float32


def test_spatial_fused_kernels_inside_shard_map():
    """The FUSED Pallas kernels themselves, executed inside shard_map.

    Round-4 gap: every prior execution of `dense_flow_warm_spatial` ran the
    XLA flow path inside shard_map (CPU backend -> fused auto-off), so the
    composition the module exists to protect — pallas_call under a
    'space'-sharded mesh with halo exchange — had never actually executed.
    `FlowParams(fused=True, interpret=True)` runs the real kernel path
    (flow_refine_uv's blocked DMA kernel on the big levels, the whole-image
    small kernel at the coarsest) in Pallas interpret mode on the CPU mesh;
    the gate is sharded-vs-unsharded agreement on the same fused params,
    interior to the halo bound (the identical-algorithm comparison — both
    sides run the kernels, only the sharding differs).
    """
    mesh = make_stream_mesh(8, space=2)
    b, h, w = 4, 64, 256
    i1, i2 = _moving_scene(b, h, w)
    # fuse_min_pixels low enough that the blocked kernel serves L0+L1 at
    # both the global (64x256) and band+halo (64x384) shapes; the coarsest
    # level (16x*) stays on the small whole-image kernel — both kernel
    # entry points execute inside the shard_map body.
    params = FlowParams(
        levels=3, coarse_search=3, fused=True, interpret=True,
        fuse_min_pixels=4000,
    )
    (u0, v0), (wu0, wv0) = dense_flow_warm(i1, i2, params)

    spec = NamedSharding(mesh, P("stream", None, "space"))
    with mesh:
        (u1, v1), (wu1, wv1) = jax.jit(
            lambda a, b: dense_flow_warm_spatial(a, b, params, None, mesh)
        )(jax.device_put(i1, spec), jax.device_put(i2, spec))
        jax.block_until_ready(u1)

    m = 16  # global border band differs by design (see above)
    epe = np.hypot(
        np.asarray(u0, np.float32) - np.asarray(u1, np.float32),
        np.asarray(v0, np.float32) - np.asarray(v1, np.float32),
    )[:, m:-m, m:-m]
    assert np.mean(epe) < 0.05, np.mean(epe)
    assert np.percentile(epe, 99) < 0.75, np.percentile(epe, 99)
    wepe = np.hypot(
        np.asarray(wu0, np.float32) - np.asarray(wu1, np.float32),
        np.asarray(wv0, np.float32) - np.asarray(wv1, np.float32),
    )[:, m // 2 : -m // 2, m // 2 : -m // 2]
    assert np.mean(wepe) < 0.1, np.mean(wepe)
    assert u1.shape == u0.shape and u1.dtype == u0.dtype


def test_spatial_flow_warm_started_step():
    """Second (warm-started) step through the sharded wrapper: the guarded
    warm path and the halo'd warm planes must compose."""
    mesh = make_stream_mesh(8, space=2)
    b, h, w = 4, 64, 128
    i1, i2 = _moving_scene(b, h, w)
    params = FlowParams(levels=3, coarse_search=3)
    spec = NamedSharding(mesh, P("stream", None, "space"))

    def two_steps(a, b2):
        (_, _), warm = dense_flow_warm_spatial(a, b2, params, None, mesh)
        return dense_flow_warm_spatial(a, b2, params, warm, mesh)

    with mesh:
        (u1, v1), _ = jax.jit(two_steps)(
            jax.device_put(i1, spec), jax.device_put(i2, spec)
        )
        jax.block_until_ready(u1)
    (u0, v0), warm0 = dense_flow_warm(i1, i2, params)
    (u0, v0), _ = dense_flow_warm(i1, i2, params, warm=warm0)
    m = 16  # global border band differs by design (see above)
    epe = np.hypot(
        np.asarray(u0, np.float32) - np.asarray(u1, np.float32),
        np.asarray(v0, np.float32) - np.asarray(v1, np.float32),
    )[:, m:-m, m:-m]
    assert np.mean(epe) < 0.08, np.mean(epe)
