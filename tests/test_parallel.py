"""Multi-stream pipeline + mesh sharding tests (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofps_tpu.core import quat
from ofps_tpu.core.camera import StandardCamera
from ofps_tpu.core.motion import grid_downsample_field, grid_size_for
from ofps_tpu.detectors.base import create_detector
from ofps_tpu.estimators.base import create_estimator
from ofps_tpu.ops.flow_pyramid import FlowParams
from ofps_tpu.parallel import (
    StreamPipeline,
    make_stream_mesh,
    shard_put,
    stream_sharding,
)


def _camera():
    return StandardCamera.create(4.0 / 3.0, 90.0)


def _pipeline(shardings=None, with_libmv=False):
    ests = [create_estimator("almeida", num_iters=16, ransac_samples=128)]
    if with_libmv:
        ests.append(create_estimator("libmv", num_hypotheses=64))
    return StreamPipeline(
        camera=_camera(),
        estimators=ests,
        detector=create_detector("block_motion"),
        flow_params=FlowParams(levels=2, coarse_search=3),
        shardings=shardings,
    )


def test_grid_size_for():
    assert grid_size_for(1920, 1080) == (150, 84)
    assert grid_size_for(1080, 1920) == (84, 150)
    assert grid_size_for(64, 48) == (64, 48)


def test_grid_downsample_matches_cell_mean():
    h, w, gh, gw = 12, 16, 3, 4
    field = np.random.RandomState(0).rand(h, w, 2).astype(np.float32)
    got = np.asarray(grid_downsample_field(jnp.asarray(field), gw, gh))
    # Oracle: per-pixel cell assignment, mean per cell.
    sums = np.zeros((gh, gw, 2))
    cnt = np.zeros((gh, gw))
    for y in range(h):
        for x in range(w):
            cy = int(np.floor((y + 0.5) / h * (gh - 1) + 0.5))
            cx = int(np.floor((x + 0.5) / w * (gw - 1) + 0.5))
            sums[cy, cx] += field[y, x]
            cnt[cy, cx] += 1
    np.testing.assert_allclose(got, sums / cnt[..., None], rtol=1e-5)


def _translate_frames(b, h, w, shift):
    base = np.random.RandomState(1).rand(1, h + 8, w + 8).astype(np.float32) * 255
    base = np.repeat(base, b, axis=0)
    # Smooth so block matching has gradients to lock onto.
    k = np.ones((5, 5)) / 25.0
    from scipy import signal  # scipy ships with the jax stack

    base = np.stack(
        [signal.convolve2d(f, k, mode="same") for f in base], axis=0
    )
    f0 = base[:, 4 : 4 + h, 4 : 4 + w]
    f1 = base[:, 4 : 4 + h, 4 - shift : 4 - shift + w]
    return jnp.asarray(f0), jnp.asarray(f1)


def test_step_from_frames_recovers_translation():
    b, h, w = 2, 48, 64
    pipe = _pipeline()
    f0, f1 = _translate_frames(b, h, w, shift=2)
    state = pipe.init_state(b, h, w)
    state = pipe.state_with_frame(state, f0)
    step = jax.jit(pipe.step_from_frames)
    state, out = step(state, f1, jax.random.PRNGKey(0))
    flow = np.asarray(out.flow)
    # Median flow should be ~(+2, 0) pixels (content moved right by 2).
    inner = flow[:, 8:-8, 8:-8]
    assert abs(np.median(inner[..., 0]) - 2.0) < 0.5, np.median(inner[..., 0])
    assert abs(np.median(inner[..., 1])) < 0.5
    assert np.all(np.isfinite(np.asarray(out.rot[0])))
    assert out.detection is not None
    # Global translation moves every block: the detector must fire.
    assert np.all(np.asarray(out.detection.detected))


def test_first_frame_produces_identity_pose():
    b, h, w = 1, 32, 32
    pipe = _pipeline()
    state = pipe.init_state(b, h, w)
    gray = jnp.zeros((b, h, w))
    state, out = jax.jit(pipe.step_from_frames)(
        state, gray, jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(np.asarray(out.flow), 0.0)
    np.testing.assert_allclose(
        np.asarray(out.rot[0][0]), np.asarray(quat.identity()), atol=1e-5
    )
    assert float(state.has_prev[0]) == 1.0


def test_scan_frames_threads_state():
    b, h, w = 1, 32, 48
    pipe = _pipeline(with_libmv=True)
    f0, f1 = _translate_frames(b, h, w, shift=1)
    grays = jnp.stack([f0, f1, f0, f1])  # (T=4, B, H, W)
    state = pipe.init_state(b, h, w)
    final, outs = jax.jit(pipe.scan_frames)(state, grays, jax.random.PRNGKey(3))
    assert outs.rot[0].shape == (4, b, 4)
    assert np.all(np.isfinite(np.asarray(outs.rot[1])))
    # libmv's PrevMotion chain state must have evolved.
    assert float(final.est[1].has[0]) >= 0.0


def _run_sharded_step(flow_params=None):
    mesh = make_stream_mesh(8)  # (4 stream, 2 space) on the CPU mesh
    shard = stream_sharding(mesh)
    b, h, w = 4, 32, 64
    f0, f1 = _translate_frames(b, h, w, shift=1)
    key = jax.random.PRNGKey(5)

    plain = _pipeline()
    st = plain.state_with_frame(plain.init_state(b, h, w), f0)
    _, out_plain = jax.jit(plain.step_from_frames)(st, f1, key)

    sharded = _pipeline(shardings=shard)
    if flow_params is not None:
        sharded.flow_params = flow_params
    st2 = sharded.state_with_frame(sharded.init_state(b, h, w), f0)
    st2 = st2._replace(
        prev_cache=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, shard.image), st2.prev_cache
        ),
        warm_uv=tuple(jax.device_put(x, shard.image) for x in st2.warm_uv),
    )
    with mesh:
        _, out_sharded = jax.jit(sharded.step_from_frames)(
            st2, jax.device_put(f1, shard.image), key
        )
        jax.block_until_ready(out_sharded)
    return out_plain, out_sharded


def test_sharded_step_matches_unsharded_exact_xla_path():
    """fused=False: GSPMD partitions the XLA flow path with exact halo
    collectives — bit-comparable to the unsharded step."""
    out_plain, out_sharded = _run_sharded_step(
        FlowParams(levels=2, coarse_search=3, fused=False)
    )
    np.testing.assert_allclose(
        np.asarray(out_plain.flow), np.asarray(out_sharded.flow), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_plain.rot[0]),
        np.asarray(out_sharded.rot[0]),
        atol=1e-4,
    )


def test_sharded_step_shardmap_flow_close_to_unsharded():
    """Default spatially-sharded route: shard_map + column-halo exchange
    (parallel/spatial.py — the fused-kernel multi-chip path; on the CPU
    mesh each shard runs the XLA path, exercising the same wrapper).
    Band-seam divergence is bounded by the halo: the flow must agree with
    the unsharded step everywhere on this small-motion scene."""
    out_plain, out_sharded = _run_sharded_step()
    fp = np.asarray(out_plain.flow)
    fs = np.asarray(out_sharded.flow)
    epe = np.linalg.norm(fp - fs, axis=-1)
    # The GLOBAL border band differs by design (replicated halo at true
    # image edges instead of out-of-image penalties; both paths neutralize
    # the band downstream) — compare the interior, which includes the band
    # seam the halo exchange protects.  On this 32x64 toy frame the band
    # is a large fraction of the image, so the integrated-rotation check
    # carries a correspondingly loose tolerance.
    inner = epe[:, 8:-8, 8:-8]
    assert np.mean(inner) < 0.05, np.mean(inner)
    assert np.percentile(inner, 99) < 0.75, np.percentile(inner, 99)
    dq = np.abs(np.asarray(out_plain.rot[0]) - np.asarray(out_sharded.rot[0]))
    assert dq.max() < 2e-2, dq.max()


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    state, out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out.rot[0])))
    ge.dryrun_multichip(8)


def test_spatial_sharding_routes_to_shardmap_wrapper():
    """'space'-sharded pipelines route dense flow through the shard_map +
    halo-exchange wrapper (fused kernels intact per shard); fused=False
    opts back into plain-GSPMD XLA partitioning (round-4 redesign of the
    round-1 silent fallback)."""
    from ofps_tpu.ops.flow_pyramid import FlowParams
    from ofps_tpu.parallel.sharding import (
        make_stream_mesh,
        stream_sharding,
        StreamSharding,
    )
    from ofps_tpu.parallel.stream import StreamPipeline
    from jax.sharding import NamedSharding, PartitionSpec as P

    cam = StandardCamera.create(16 / 9, 90.0)
    mesh = make_stream_mesh(8)
    pipe = StreamPipeline(camera=cam, shardings=stream_sharding(mesh))
    space = pipe._space_mesh()
    assert space is not None
    assert space[0] is mesh and space[2] == "space"
    # Batch-only sharding: no spatial route, backend-auto fused choice.
    batch_only = StreamSharding(batch=NamedSharding(mesh, P("stream")))
    pipe2 = StreamPipeline(camera=cam, shardings=batch_only)
    assert pipe2._space_mesh() is None
    assert pipe2.flow_params.fused is None
    # Explicit XLA-path request under GSPMD: no shard_map route.
    pipe3 = StreamPipeline(
        camera=cam,
        flow_params=FlowParams(fused=False),
        shardings=stream_sharding(mesh),
    )
    assert pipe3._space_mesh() is None
