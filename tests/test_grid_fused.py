"""In-kernel grid-densify parity (interpret mode).

The serving pipeline's finest Pallas level can emit the (gh, gw)
scatter-mean SUMS directly (pallas/flow_refine.py emit(), plan from
build_grid_plan) instead of storing full-res (u, v) for a separate XLA
densify — at 1080p that full-res store + re-read is ~16 MB/frame of HBM
traffic whose only consumer is the grid.  These tests pin the fused result
to the store-then-densify path on the CPU mesh:

* kernel level: grid_plan output == Syᵀ·bf16(u)·Sx of the full-res kernel
  output (same masked matrices via core.motion.grid_scatter_plan_np) up to
  the one extra bf16 rounding of the (K, bw) row partials;
* pipeline level: StreamPipeline(emit_dense_flow=False, fused+interpret)
  grid == the emit_dense_flow=True pipeline's XLA-densified grid.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ofps_tpu.core.motion import grid_scatter_plan_np
from ofps_tpu.ops.flow_pyramid import FlowParams
from ofps_tpu.ops.image import warp_bilinear
from ofps_tpu.pallas.flow_refine import build_grid_plan, flow_refine_uv


@pytest.fixture(scope="module")
def scene():
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(3)
    h, w = 96, 768
    img = gaussian_filter(
        rng.standard_normal((h + 40, w + 40)).astype(np.float32), 2.0
    ) * 100
    u = gaussian_filter(rng.standard_normal((h, w)).astype(np.float32), 20) * 30 + 5
    v = gaussian_filter(rng.standard_normal((h, w)).astype(np.float32), 20) * 20 - 3
    flow = jnp.asarray(np.stack([u, v], -1))
    i2 = jnp.asarray(img[20 : 20 + h, 20 : 20 + w])
    i1 = jnp.asarray(np.asarray(warp_bilinear(i2, flow)))
    return i1, i2, flow


@pytest.mark.parametrize("border_px", [0, 8])
def test_kernel_grid_plan_matches_full_res_densify(scene, border_px):
    i1, i2, flow = scene
    h, w = i1.shape
    gh, gw = 28, 50
    plan = build_grid_plan(h, w, gh, gw, border_px=border_px,
                           coarse_flow=False)
    assert plan is not None  # 768 cols -> full-width blocks

    u0, v0 = flow[..., 0], flow[..., 1]
    fu, fv = flow_refine_uv(i1, i2, u0, v0, 1, 5, interpret=True,
                            axis_sep=True)
    gu, gv = flow_refine_uv(i1, i2, u0, v0, 1, 5, interpret=True,
                            axis_sep=True, grid_plan=plan)
    assert gu.shape == (gh, gw) and gv.shape == (gh, gw)

    sy, sx, counts, _, _ = grid_scatter_plan_np(h, w, gh, gw, border_px)
    # Same bf16 input quantization the kernel applies; the only residual
    # difference is the kernel's second (K, bw)-partial bf16 rounding.
    def ref_sums(x):
        xb = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(
            jnp.float32))
        return sy.T @ xb @ sx

    ru = ref_sums(fu)
    rv = ref_sums(fv)
    mu_got, mu_ref = np.asarray(gu) / counts, ru / counts
    mv_got, mv_ref = np.asarray(gv) / counts, rv / counts
    assert np.max(np.abs(mu_got - mu_ref)) < 0.15  # px, |u| up to ~35
    assert np.max(np.abs(mv_got - mv_ref)) < 0.15
    # Empty (fully masked) cells must be exactly zero in both.
    empty = (sy.sum(0)[:, None] * sx.sum(0)[None, :]) == 0
    if empty.any():
        assert np.all(np.asarray(gu)[empty] == 0.0)


def test_kernel_grid_plan_batched(scene):
    """Batched (B=2) grid emission: the serving pipeline always runs with a
    leading stream axis, so pin that each batch element's grid partials are
    assembled independently (out_specs index (b, i, 0))."""
    i1, i2, flow = scene
    h, w = i1.shape
    gh, gw = 28, 50
    plan = build_grid_plan(h, w, gh, gw, coarse_flow=False)

    u0, v0 = flow[..., 0], flow[..., 1]
    i1b = jnp.stack([i1, i2])  # two DIFFERENT pairs: (i1->i2), (i2->i1)
    i2b = jnp.stack([i2, i1])
    ub = jnp.stack([u0, -u0])
    vb = jnp.stack([v0, -v0])
    gub, gvb = flow_refine_uv(i1b, i2b, ub, vb, 1, 5, interpret=True,
                              axis_sep=True, grid_plan=plan)
    assert gub.shape == (2, gh, gw)
    for b in range(2):
        gu1, gv1 = flow_refine_uv(i1b[b], i2b[b], ub[b], vb[b], 1, 5,
                                  interpret=True, axis_sep=True,
                                  grid_plan=plan)
        np.testing.assert_array_equal(np.asarray(gub[b]), np.asarray(gu1))
        np.testing.assert_array_equal(np.asarray(gvb[b]), np.asarray(gv1))


def test_pipeline_grid_fused_matches_xla_densify():
    from ofps_tpu.core.camera import StandardCamera
    from ofps_tpu.parallel.stream import StreamPipeline

    rng = np.random.default_rng(5)
    h, w = 192, 256
    params = FlowParams(fused=True, interpret=True)
    cam = StandardCamera.create(w / h, 90.0)
    # ONE frame pair for both runs (a shared rng inside run() would hand
    # the two pipelines different noise — cost a day of round-5 debugging).
    f0 = jnp.asarray(rng.uniform(0, 255, (1, h, w)).astype(np.float32))
    shift = jnp.roll(f0, 2, axis=-1) + jnp.asarray(
        rng.uniform(-2, 2, (1, h, w)).astype(np.float32)
    )

    def run(emit_dense_flow):
        pipe = StreamPipeline(
            camera=cam, estimators=[], detector=None, flow_params=params,
            emit_dense_flow=emit_dense_flow,
        )
        if not emit_dense_flow:
            assert pipe._grid_plan(h, w) is not None
        state = pipe.init_state(1, h, w)
        import jax

        key = jax.random.PRNGKey(0)
        state, _ = pipe.step_from_frames(state, f0, key)
        _, out = pipe.step_from_frames(state, shift, key)
        return np.asarray(out.grid)

    g_fused = run(False)
    g_xla = run(True)
    assert g_fused.shape == g_xla.shape
    # Normalized units: flow ~2 px / 256 ~ 0.008.  The kernel's (K, bw)
    # row partials add one extra bf16 rounding over the store-then-densify
    # path: |diff| <= bf16_eps(2px)/dim ~ 0.0625/192 = 3.3e-4 (measured
    # exactly that); 1e-3 bounds it with margin while staying 8x under the
    # real flow signal.
    assert np.max(np.abs(g_fused - g_xla)) < 1e-3
