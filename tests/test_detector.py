"""Block-motion detector tests (spec: block-motion-detector/src/lib.rs)."""

import jax
import jax.numpy as jnp
import numpy as np

from ofps_tpu.core.motion import SparseFlow
from ofps_tpu.detectors.base import create_detector
from ofps_tpu.detectors.block_motion import BlockMotionParams, block_dim
from ofps_tpu.ops.components import label_components, largest_component


def test_block_dim_default():
    # sqrt(0.05)/3 = 0.0745 -> ceil(1/0.0745) = 14
    assert block_dim(BlockMotionParams()) == 14


def _flow_with_blob(center, radius, magnitude, n_grid=40):
    """Points on a grid; those within `radius` of `center` move by magnitude."""
    xs, ys = np.meshgrid(np.linspace(0, 1, n_grid), np.linspace(0, 1, n_grid))
    pos = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
    dist = np.linalg.norm(pos - np.asarray(center), axis=-1)
    mot = np.zeros_like(pos)
    mot[dist < radius] = magnitude
    return SparseFlow.from_arrays(pos, mot)


def test_detects_large_moving_region():
    det = create_detector("block_motion")
    flow = _flow_with_blob((0.5, 0.5), 0.25, (0.05, 0.0))
    res = jax.jit(det.detect)(flow)
    assert bool(res.detected)
    assert int(res.area) >= 10
    # Island field preserves motion inside, zero outside.
    f = np.asarray(res.field)
    m = np.asarray(res.mask)
    assert np.all(np.abs(f[~m]) == 0.0)
    assert np.abs(f[m][:, 0]).max() > 0.01


def test_ignores_small_region():
    det = create_detector("block_motion")
    # One tiny moving cell: below min_size fraction of the frame.
    flow = _flow_with_blob((0.5, 0.5), 0.02, (0.05, 0.0))
    res = det.detect(flow)
    assert not bool(res.detected)


def test_ignores_subthreshold_motion():
    det = create_detector("block_motion")
    flow = _flow_with_blob((0.5, 0.5), 0.4, (0.001, 0.0))  # below 0.003
    res = det.detect(flow)
    assert not bool(res.detected)


def test_picks_largest_island():
    det = create_detector("block_motion")
    # Two blobs: a big one left, small one right.
    xs, ys = np.meshgrid(np.linspace(0, 1, 40), np.linspace(0, 1, 40))
    pos = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
    mot = np.zeros_like(pos)
    big = np.linalg.norm(pos - [0.25, 0.5], axis=-1) < 0.2
    small = np.linalg.norm(pos - [0.85, 0.5], axis=-1) < 0.08
    mot[big] = (0.05, 0.0)
    mot[small] = (0.05, 0.0)
    res = det.detect(SparseFlow.from_arrays(pos, mot))
    assert bool(res.detected)
    m = np.asarray(res.mask)
    h, w = m.shape
    # Winning island is on the left half.
    assert m[:, : w // 2].sum() > 0
    assert m[:, 2 * w // 3 :].sum() == 0


def test_label_components_partition():
    a = jnp.array(
        [
            [1, 1, 0, 0],
            [0, 1, 0, 1],
            [0, 0, 0, 1],
            [1, 0, 0, 0],
        ],
        dtype=bool,
    )
    labels = np.asarray(label_components(a))
    # Component containing (0,0) also contains (0,1) and (1,1).
    assert labels[0, 0] == labels[0, 1] == labels[1, 1]
    # Right-side component is distinct.
    assert labels[1, 3] == labels[2, 3]
    assert labels[1, 3] != labels[0, 0]
    # (3,0) is its own component (diagonal (2,1) is inactive).
    assert labels[3, 0] not in (labels[0, 0], labels[1, 3])
    mask, area = largest_component(a)
    assert int(area) == 3
    assert np.asarray(mask).sum() == 3


def test_empty_flow_no_detection():
    det = create_detector("block_motion")
    flow = SparseFlow(jnp.zeros((16, 2)), jnp.zeros((16, 2)), jnp.zeros((16,)))
    res = det.detect(flow)
    assert not bool(res.detected)
    assert int(res.area) == 0


def test_label_components_adversarial_paths():
    """Static-round pointer jumping must converge on worst-case shapes.

    A boustrophedon snake is the longest-diameter component a grid can
    hold (diameter ~ H*W); random fields cross-check against a classic
    BFS flood fill oracle.
    """
    h, w = 14, 14
    snake = np.zeros((h, w), dtype=bool)
    for i in range(h):
        snake[i, :] = True
        if i + 1 < h:
            snake[i + 1, w - 1 if i % 2 == 0 else 0] = True
    labels = np.asarray(label_components(jnp.asarray(snake)))
    lab_vals = labels[snake]
    assert (lab_vals == lab_vals[0]).all(), "snake must be ONE component"

    def flood_oracle(a):
        seen = np.full(a.shape, -1, dtype=np.int32)
        nxt = 0
        for y in range(a.shape[0]):
            for x in range(a.shape[1]):
                if not a[y, x] or seen[y, x] >= 0:
                    continue
                stack = [(y, x)]
                seen[y, x] = nxt
                while stack:
                    cy, cx = stack.pop()
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            ny, nx_ = cy + dy, cx + dx
                            if (
                                0 <= ny < a.shape[0]
                                and 0 <= nx_ < a.shape[1]
                                and a[ny, nx_]
                                and seen[ny, nx_] < 0
                            ):
                                seen[ny, nx_] = nxt
                                stack.append((ny, nx_))
                nxt += 1
        return seen

    rng = np.random.default_rng(7)
    # (14, 14) exercises the MXU transitive-closure path; (70, 70) the
    # pointer-jump fallback (> 4096 cells).
    cases = [((h, w), d) for d in (0.3, 0.5, 0.7, 0.9)]
    cases += [((70, 70), d) for d in (0.5, 0.8)]
    for shape, density in cases:
        a = rng.random(shape) < density
        got = np.asarray(label_components(jnp.asarray(a)))
        want = flood_oracle(a)
        # Same partition: labels agree iff oracle components agree.
        for comp in range(want.max() + 1):
            vals = got[want == comp]
            assert (vals == vals[0]).all()
        # Distinct components keep distinct labels.
        reps = {}
        for comp in range(want.max() + 1):
            rep = got[want == comp][0]
            assert rep not in reps.values()
            reps[comp] = rep


def test_detect_field_fast_path_matches_sparse():
    """detect_field(grid) must equal detect(field_to_sparse(grid)) exactly.

    The dense fast path replaces the per-entry scatter with static
    separable one-hot matmuls (block_motion.detect_motion_field); the
    StreamPipeline serving step uses it for every frame, so any cell-map
    or count divergence would silently change detections.
    """
    from ofps_tpu.core.motion import field_to_sparse
    from ofps_tpu.detectors.block_motion import detect_motion, detect_motion_field

    rng = np.random.default_rng(11)
    params = BlockMotionParams()
    for gh, gw in [(84, 150), (14, 14), (30, 53), (1, 1)]:
        field = jnp.asarray(
            rng.normal(0, 0.01, (gh, gw, 2)).astype(np.float32)
        )
        a = detect_motion(params, field_to_sparse(field))
        b = detect_motion_field(params, field)
        assert bool(a.detected) == bool(b.detected)
        assert int(a.area) == int(b.area)
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
        np.testing.assert_allclose(
            np.asarray(a.field), np.asarray(b.field), rtol=0, atol=1e-7
        )


def test_detect_field_wired_into_registry():
    det = create_detector("block_motion")
    assert det.detect_field is not None
