"""Fused Pallas flow-refine kernel parity tests (interpret mode).

The kernel must reproduce ``ops.flow_pyramid._level_refine`` (f32 costs) up
to its documented approximations: block-seam flow edge-extension and the
±RES warp-residual clamp.  Verified here in pallas interpret mode (runs on
the CPU mesh); on-chip the compiled kernel matched interpret bit-exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ofps_tpu.ops.flow_pyramid import _level_refine
from ofps_tpu.ops.image import resize_bilinear_matmul, warp_bilinear
from ofps_tpu.pallas.flow_refine import flow_refine_tpu, flow_refine_uv


@pytest.fixture(scope="module")
def scene():
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(0)
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


@pytest.mark.parametrize("search", [1, 2])
def test_kernel_matches_xla_path(scene, search):
    i1, i2, flow = scene
    ref = np.asarray(
        flow + _level_refine(i1, warp_bilinear(i2, flow), search, 5, jnp.float32)
    )
    got = np.asarray(flow_refine_tpu(i1, i2, flow, search, 5, interpret=True))
    d = np.abs(got - ref)[8:-8, 8:-8]
    assert d.mean() < 0.05, d.mean()
    assert np.percentile(d, 99) < 0.3


def test_kernel_coarse_flow_upsample(scene):
    i1, i2, flow = scene
    h, w = i1.shape
    # Coarse flow whose in-kernel upsample must match the XLA resize path.
    uc = jnp.asarray(np.asarray(flow[..., 0])[::2, ::2] * 0.5)
    vc = jnp.asarray(np.asarray(flow[..., 1])[::2, ::2] * 0.5)
    uf = resize_bilinear_matmul(uc, h, w) * 2
    vf = resize_bilinear_matmul(vc, h, w) * 2
    ref_u, ref_v = flow_refine_uv(i1, i2, uf, vf, 1, 5, interpret=True)
    got_u, got_v = flow_refine_uv(
        i1, i2, uc, vc, 1, 5, interpret=True, coarse_flow=True
    )
    du = np.abs(np.asarray(got_u) - np.asarray(ref_u))[8:-8, 8:-8]
    dv = np.abs(np.asarray(got_v) - np.asarray(ref_v))[8:-8, 8:-8]
    assert du.mean() < 0.05 and dv.mean() < 0.05
    assert max(np.percentile(du, 99), np.percentile(dv, 99)) < 0.5


def test_kernel_axis_sep_close_to_full(scene):
    """5-cost axis-separable fast path vs the full 9-cost 2-D selection.

    axis_sep is the warm-started production path (FlowParams.axis_sep); it
    must stay close to the full argmin everywhere the parent flow is good
    (the scene's flow is exact, so residuals are subpixel).
    """
    i1, i2, flow = scene
    full_u, full_v = flow_refine_uv(
        i1, i2, flow[..., 0], flow[..., 1], 1, 5, interpret=True
    )
    sep_u, sep_v = flow_refine_uv(
        i1, i2, flow[..., 0], flow[..., 1], 1, 5, interpret=True, axis_sep=True
    )
    du = np.abs(np.asarray(sep_u) - np.asarray(full_u))[8:-8, 8:-8]
    dv = np.abs(np.asarray(sep_v) - np.asarray(full_v))[8:-8, 8:-8]
    assert du.mean() < 0.05 and dv.mean() < 0.05, (du.mean(), dv.mean())
    assert max(np.percentile(du, 99), np.percentile(dv, 99)) < 1.0


def test_kernel_bf16_output(scene):
    i1, i2, flow = scene
    f32_u, f32_v = flow_refine_uv(
        i1, i2, flow[..., 0], flow[..., 1], 1, 5, interpret=True
    )
    b16_u, b16_v = flow_refine_uv(
        i1, i2, flow[..., 0], flow[..., 1], 1, 5, interpret=True,
        out_dtype=jnp.bfloat16,
    )
    assert b16_u.dtype == jnp.bfloat16
    du = np.abs(np.asarray(b16_u, np.float32) - np.asarray(f32_u))
    # bf16 quantization at |flow| <= ~40 px here: step <= 0.25 px.
    assert du.max() <= 0.25 + 1e-6, du.max()


def test_small_kernel_fused_guard():
    """guard_zero_init: the in-launch warm-vs-zero guard (the fused form of
    FlowParams.guarded_warm) must reject a runaway warm init on a static
    scene and keep a good warm init's solution."""
    from scipy.ndimage import gaussian_filter

    from ofps_tpu.pallas.flow_refine_small import flow_refine_small_uv

    rng = np.random.default_rng(3)
    h, w = 40, 64
    img = gaussian_filter(
        rng.standard_normal((h, w)).astype(np.float32), 1.5
    ) * 100
    i1 = jnp.asarray(img)

    # Static scene + garbage warm: guard must fall back to the zero branch.
    bad_u = jnp.full((h, w), 6.0, jnp.float32)
    bad_v = jnp.full((h, w), -5.0, jnp.float32)
    gu, gv = flow_refine_small_uv(
        i1, i1, bad_u, bad_v, 6, 5, interpret=True, guard_zero_init=True
    )
    mag = np.hypot(np.asarray(gu), np.asarray(gv))[4:-4, 4:-4]
    assert mag.mean() < 0.3, mag.mean()
    # Unguarded, the bad warm leaks through (sanity that the guard acts).
    uu, uv_ = flow_refine_small_uv(
        i1, i1, bad_u, bad_v, 6, 5, interpret=True
    )
    assert np.hypot(np.asarray(uu), np.asarray(uv_))[4:-4, 4:-4].mean() > mag.mean()

    # Good warm on a genuinely shifted scene: the guard must KEEP the warm
    # branch.  Production regime: warm clamped to coarse_search-1 = 5, true
    # shift 7 — reachable from the warm init (5 +- 6) but NOT from zero
    # (+-6 < 7), and within the kernel's +-RES_SMALL warp range.
    big = gaussian_filter(
        rng.standard_normal((h, w + 16)).astype(np.float32), 1.5
    ) * 100
    a = jnp.asarray(big[:, :w])
    b = jnp.asarray(big[:, 7 : 7 + w])  # b(x + f) = a(x) -> true flow u = -7
    warm_u = jnp.full((h, w), -5.0, jnp.float32)
    warm_v = jnp.zeros((h, w), jnp.float32)
    gu2, gv2 = flow_refine_small_uv(
        a, b, warm_u, warm_v, 6, 5, interpret=True, guard_zero_init=True
    )
    inner = np.asarray(gu2)[4:-4, 12:-12]
    assert np.abs(inner + 7.0).mean() < 0.3, np.abs(inner + 7.0).mean()


def test_small_kernel_fused_median_matches_xla():
    """median_out must equal ops.image.median3x3 applied to the refined
    flow — including at non-tile-aligned (h, w) edges."""
    from scipy.ndimage import gaussian_filter

    from ofps_tpu.ops.image import median3x3
    from ofps_tpu.pallas.flow_refine_small import flow_refine_small_uv

    rng = np.random.default_rng(11)
    h, w = 33, 60  # 1080p coarsest-level size: exercises hp/wp padding
    img = gaussian_filter(
        rng.standard_normal((h, w)).astype(np.float32), 1.2
    ) * 80
    i1 = jnp.asarray(img)
    i2 = jnp.asarray(np.roll(img, 2, axis=1))
    u0 = jnp.zeros((h, w), jnp.float32)
    ru, rv = flow_refine_small_uv(i1, i2, u0, u0, 3, 5, interpret=True)
    want_u = np.asarray(median3x3(ru))
    want_v = np.asarray(median3x3(rv))
    gu, gv = flow_refine_small_uv(
        i1, i2, u0, u0, 3, 5, interpret=True, median_out=True
    )
    np.testing.assert_allclose(np.asarray(gu), want_u, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gv), want_v, atol=1e-6)


def test_kernel_batched(scene):
    i1, i2, flow = scene
    got1 = np.asarray(flow_refine_tpu(i1, i2, flow, 1, 5, interpret=True))
    gotb = np.asarray(
        flow_refine_tpu(
            jnp.stack([i1, i1]),
            jnp.stack([i2, i2]),
            jnp.stack([flow, flow]),
            1,
            5,
            interpret=True,
        )
    )
    np.testing.assert_allclose(gotb[0], got1, atol=1e-5)
    np.testing.assert_allclose(gotb[1], got1, atol=1e-5)


def test_xla_axis_sep_matches_kernel_axis_sep(scene):
    """The XLA path's axis-separable selection IS the kernel's algorithm.

    Round-4 parity work: _level_refine(axis_sep=True) reproduces the fused
    kernel's 5-cost cross + per-axis refine, so the spatially-sharded XLA
    deployment computes the same flow as the single-chip kernels (the round-3
    ~15% end-to-end divergence was this algorithmic difference).
    """
    i1, i2, flow = scene
    ref = np.asarray(
        flow
        + _level_refine(
            i1, warp_bilinear(i2, flow), 1, 5, jnp.float32, axis_sep=True
        )
    )
    sep_u, sep_v = flow_refine_uv(
        i1, i2, flow[..., 0], flow[..., 1], 1, 5, interpret=True, axis_sep=True
    )
    got = np.stack([np.asarray(sep_u), np.asarray(sep_v)], axis=-1)
    d = np.abs(got - ref)[8:-8, 8:-8]
    assert d.mean() < 0.03, d.mean()
    assert np.percentile(d, 99) < 0.3


def test_dense_flow_fused_matches_xla_end_to_end(monkeypatch):
    """Full-pyramid fused(-interpret) vs XLA dense_flow parity gates.

    Gates the product risk VERDICT r3 named: multi-chip ('space'-sharded)
    deployments run the XLA path while single-chip serving runs the fused
    kernels.  Three gates, chosen for what each failure class looks like:

    * **zero signed bias** (<0.02 px per component) — any alignment/phase
      bug (upsample convention, warp ordering, selection-rule drift)
      shows up as a systematic offset; tie-flips do not.
    * **bounded pixelwise scatter** (mean < 8% of |flow|, p99 < 1.5 px) —
      the round-3 state was ~15% mean; the residual here is zero-bias
      argmin flips between near-tied candidates (bf16 cost rounding and
      different f32 summation orders legitimately pick different members
      of a cost plateau), bounded by the matcher's own ~0.3 px noise.
    * **quality parity** — both paths' EPE against ground truth within
      0.05 px of each other: a sharded deployment loses no accuracy vs
      single-chip serving, which is the guarantee users actually need.

    The scene matches the eval-clip regime (sub-degree camera rotations ->
    flows of a few px); the shared ``scene`` fixture's ±30 px flows instead
    stress the kernel's documented ±warp-residual clamp, which the
    per-level tests above cover.
    """
    import functools

    from scipy.ndimage import gaussian_filter

    import ofps_tpu.pallas.flow_refine as fr
    import ofps_tpu.pallas.flow_refine_small as frs
    from ofps_tpu.ops.flow_pyramid import FlowParams, dense_flow

    # FORCE interpret (a plain functools.partial default is overridden by
    # the pipeline's explicit interpret=params.interpret kwarg).
    def forced(fn):
        return lambda *a, **k: fn(*a, **{**k, "interpret": True})

    monkeypatch.setattr(fr, "flow_refine_uv", forced(fr.flow_refine_uv))
    monkeypatch.setattr(
        frs, "flow_refine_small_uv", forced(frs.flow_refine_small_uv)
    )

    rng = np.random.default_rng(3)
    h, w = 96, 768
    img = gaussian_filter(
        rng.standard_normal((h + 24, w + 24)).astype(np.float32), 2.0
    ) * 100
    u = gaussian_filter(rng.standard_normal((h, w)).astype(np.float32), 25) * 6 + 2
    v = gaussian_filter(rng.standard_normal((h, w)).astype(np.float32), 25) * 4 - 1
    flow = jnp.asarray(np.stack([u, v], -1))
    i2 = jnp.asarray(img[12 : 12 + h, 12 : 12 + w])
    i1 = jnp.asarray(np.asarray(warp_bilinear(i2, flow)))

    fused = np.asarray(dense_flow(i1, i2, FlowParams(fused=True)))
    xla = np.asarray(dense_flow(i1, i2, FlowParams(fused=False)))
    interior = (slice(12, -12), slice(12, -12))
    diff = (fused - xla)[interior]
    d = np.linalg.norm(diff, axis=-1)
    mag = np.linalg.norm(np.asarray(flow), axis=-1)[interior].mean()
    # 1) systematic-divergence canary: signed per-component bias ~0.
    assert abs(diff[..., 0].mean()) < 0.02, diff[..., 0].mean()
    assert abs(diff[..., 1].mean()) < 0.02, diff[..., 1].mean()
    # 2) scatter bound (r3 was ~15% mean; zero-bias tie flips remain).
    assert d.mean() < 0.08 * mag, (d.mean(), mag)
    assert np.percentile(d, 99) < 1.5, np.percentile(d, 99)
    # 3) quality parity: neither path measurably better against truth.
    true = np.asarray(flow)[interior]
    epe_f = np.linalg.norm(fused[interior] - true, axis=-1).mean()
    epe_x = np.linalg.norm(xla[interior] - true, axis=-1).mean()
    assert abs(epe_f - epe_x) < 0.05, (epe_f, epe_x)
