"""Motion field densifier and hole-filling tests.

Behavioral parity targets: /root/reference/ofps/src/motion_field.rs.
"""

import numpy as np
import jax.numpy as jnp

from ofps_tpu.core.motion import (
    Densifier,
    SparseFlow,
    densify,
    field_to_sparse,
    flow_cell_index,
    gaussian_blur,
)


def test_cell_index_rounding():
    # motion_field.rs:170-175: x = round(pos.x * (w-1)).
    w, h = 5, 5
    x, y = flow_cell_index(jnp.array([[0.0, 0.0], [1.0, 1.0], [0.5, 0.5], [0.62, 0.13]]), w, h)
    assert list(np.asarray(x)) == [0, 4, 2, 2]
    assert list(np.asarray(y)) == [0, 4, 2, 1]
    # Clamping out-of-range positions.
    x, y = flow_cell_index(jnp.array([[-0.5, 2.0]]), w, h)
    assert (int(x[0]), int(y[0])) == (0, 4)


def test_densify_scatter_mean():
    flow = SparseFlow.from_arrays(
        pos=[[0.0, 0.0], [0.0, 0.0], [1.0, 1.0]],
        motion=[[1.0, 0.0], [3.0, 0.0], [0.5, -0.5]],
    )
    field = np.asarray(densify(flow, 3, 3))
    assert np.allclose(field[0, 0], [2.0, 0.0], atol=1e-5)  # mean of two entries
    assert np.allclose(field[2, 2], [0.5, -0.5], atol=1e-5)
    assert np.allclose(field[1, 1], [0.0, 0.0])  # empty -> 0 (sum/eps trick)


def test_densify_respects_mask():
    flow = SparseFlow(
        pos=jnp.array([[0.0, 0.0], [0.0, 0.0]]),
        motion=jnp.array([[1.0, 0.0], [100.0, 0.0]]),
        mask=jnp.array([1.0, 0.0]),
    )
    field = np.asarray(densify(flow, 2, 2))
    assert np.allclose(field[0, 0], [1.0, 0.0], atol=1e-5)


def test_interpolate_fills_all_cells():
    flow = SparseFlow.from_arrays(pos=[[0.0, 0.0]], motion=[[1.0, 2.0]])
    d = Densifier.zeros(4, 4).add_flow(flow)
    filled = d.interpolate_empty_cells()
    counts = np.asarray(filled.counts)
    assert (counts > 0.1).all()
    field = np.asarray(filled.finalize())
    # Reference behavior (motion_field.rs:141-147+265): contributions are
    # scale^2 * mean against scale counts, so interpolated values DECAY away
    # from the source (~x0.5 per cardinal step) — gated against the
    # sequential oracle in test_oracle_parity.py.
    assert np.allclose(field[0, 0], [1.0, 2.0], atol=1e-5)
    assert np.allclose(field[0, 1], [0.5, 1.0], atol=0.05)
    mag = np.linalg.norm(field, axis=-1)
    assert (mag > 0.0).all()  # everything filled with same-sign motion
    assert mag[3, 3] < mag[1, 1] < mag[0, 0]  # monotone decay


def test_interpolate_no_vectors_is_noop():
    d = Densifier.zeros(4, 4)
    out = d.interpolate_empty_cells()
    assert np.allclose(np.asarray(out.finalize()), 0.0)


def test_interpolate_weighted_average():
    # Two sources with different values: interior cells must be within range
    # (damped toward zero per the reference quirk, never amplified).
    flow = SparseFlow.from_arrays(
        pos=[[0.0, 0.0], [1.0, 1.0]], motion=[[0.0, 0.0], [10.0, 10.0]]
    )
    d = Densifier.zeros(5, 5).add_flow(flow).interpolate_empty_cells()
    field = np.asarray(d.finalize())
    assert (field >= -1e-4).all() and (field <= 10.0 + 1e-4).all()
    # Middle cell picks up a damped share of the hot source.
    assert 0.1 < field[2, 2, 0] < 9.5


def test_field_to_sparse_positions():
    field = jnp.zeros((2, 3, 2)).at[1, 2].set(jnp.array([5.0, 6.0]))
    sp = field_to_sparse(field)
    pos = np.asarray(sp.pos).reshape(2, 3, 2)
    assert np.allclose(pos[0, 0], [0.0, 0.0])
    assert np.allclose(pos[1, 2], [2 / 3, 1 / 2])
    mot = np.asarray(sp.motion).reshape(2, 3, 2)
    assert np.allclose(mot[1, 2], [5.0, 6.0])


def test_gaussian_blur_preserves_constant():
    field = jnp.full((8, 8, 2), 3.0)
    out = np.asarray(gaussian_blur(field, 11))
    assert np.allclose(out, 3.0, atol=1e-5)


def test_gaussian_blur_smooths():
    field = jnp.zeros((9, 9, 1)).at[4, 4, 0].set(1.0)
    out = np.asarray(gaussian_blur(field, 5))
    assert out[4, 4, 0] < 1.0
    assert out[3, 4, 0] > 0.0
    assert abs(out.sum() - 1.0) < 1e-4  # energy preserved away from borders


def test_grid_downsample_uv_border_exclusion():
    """border_px semantics: the outer pixel band is excluded from every
    cell mean, and fully-banded edge cells replicate the nearest valid
    cell (the serving path's free border neutralization)."""
    from ofps_tpu.core.motion import grid_downsample_uv

    h = w = 32
    g = 8  # 4x4 px per cell
    u = np.ones((h, w), np.float32)
    v = 2 * np.ones((h, w), np.float32)
    # Poison the outer 4-px band with huge values.
    u[:4] = u[-4:] = u[:, :4] = u[:, -4:] = 1e3
    v[:4] = v[-4:] = v[:, :4] = v[:, -4:] = -1e3

    out0 = np.asarray(grid_downsample_uv(jnp.asarray(u), jnp.asarray(v), g, g))
    assert out0.shape == (g, g, 2)
    assert out0[..., 0].max() > 100.0  # without border_px the poison leaks

    out = np.asarray(
        grid_downsample_uv(jnp.asarray(u), jnp.asarray(v), g, g, border_px=4)
    )
    np.testing.assert_allclose(out[..., 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[..., 1], 2.0, atol=1e-6)

    # norm_wh folds the unit conversion into the same tiny output.
    outn = np.asarray(
        grid_downsample_uv(
            jnp.asarray(u), jnp.asarray(v), g, g, norm_wh=(w, h), border_px=4
        )
    )
    np.testing.assert_allclose(outn[..., 0], 1.0 / w, atol=1e-7)
    np.testing.assert_allclose(outn[..., 1], 2.0 / h, atol=1e-7)
