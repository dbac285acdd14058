"""Connected components on a 2D grid via parallel label propagation.

TPU-native replacement for the reference's sequential flood fill
(``/root/reference/block-motion-detector/src/lib.rs:71-112``): every active
cell starts with its own label (its linear index) and iteratively takes the
minimum label over its 8-neighborhood until fixpoint.  Equivalent partition,
but data-parallel and jittable with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_NEIGHBORS8 = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
# Host scalar: module import must not dispatch device ops.
_BIG = np.int32(2**30)


def _shift_min(labels: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """Neighbor labels at offset (dx, dy), BIG outside the grid."""
    pad_y = (max(-dy, 0), max(dy, 0))
    pad_x = (max(-dx, 0), max(dx, 0))
    padded = jnp.pad(labels, (pad_y, pad_x), constant_values=_BIG)
    h, w = labels.shape
    return padded[max(dy, 0) : max(dy, 0) + h, max(dx, 0) : max(dx, 0) + w]


def label_components(active: jnp.ndarray) -> jnp.ndarray:
    """8-connected component labels; inactive cells get BIG.

    ``active``: (H, W) bool.  Returns (H, W) int32 where each component is
    labeled by the smallest linear index it contains.

    The detector grid is tiny (14x14 by default), so the TPU-right
    algorithm is TRANSITIVE CLOSURE ON THE MXU: boolean adjacency matrix
    squared ceil(log2(n)) times (each squaring doubles reachable path
    length — exact, static op count), then each cell takes the minimum
    linear index among its reachable set.  The previous propagate-until-
    converged ``while_loop`` needed O(component diameter) rounds of tiny
    (14, 14) VPU ops, and each round's ``jnp.any`` convergence test forced
    a sequential dependency: ~2 ms of an 8-stream serving step for ~50x
    less arithmetic than one of these matmuls.

    Grids past 64x64 (adjacency would exceed ~16M entries) fall back to
    hook + pointer-jump label propagation with a statically margined round
    count (worst observed over a 900-field random + snake ensemble is
    ~3x log2(n); see tests/test_detector.py adversarial cases).
    """
    h, w = active.shape
    n = h * w
    idx = jnp.arange(n, dtype=jnp.int32)
    if n <= 4096:
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).reshape(-1)
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).reshape(-1)
        act = active.reshape(-1)
        neigh = (jnp.abs(ys[:, None] - ys[None, :]) <= 1) & (
            jnp.abs(xs[:, None] - xs[None, :]) <= 1
        )  # includes self-loops: squaring keeps shorter paths alive
        r = (neigh & act[:, None] & act[None, :]).astype(jnp.bfloat16)
        for _ in range(max(1, int(np.ceil(np.log2(max(2, n)))))):
            # 0/1 entries are exact in bf16; row sums <= n < 2^24 are exact
            # in the f32 accumulator, so the > 0 threshold is reliable.
            rr = jnp.dot(r, r, preferred_element_type=jnp.float32)
            r = (rr > 0).astype(jnp.bfloat16)
        lab = jnp.min(
            jnp.where(r > 0, idx[None, :], _BIG), axis=1
        ).astype(jnp.int32)
        return jnp.where(act, lab, _BIG).reshape(h, w)

    labels = jnp.where(active, idx.reshape(h, w), _BIG)
    rounds = max(1, 3 * int(np.ceil(np.log2(n))) + 4)

    def body(_, lab):
        best = lab
        for dx, dy in _NEIGHBORS8:
            best = jnp.minimum(best, _shift_min(lab, dx, dy))
        lab = jnp.where(active, jnp.minimum(lab, best), _BIG)
        # Pointer jump: labels are linear indices, so lab[lab] is one
        # gather; inactive cells (BIG) keep BIG via the where.
        flat = lab.reshape(-1)
        safe = jnp.where(flat < n, flat, 0)
        jumped = flat[safe].reshape(h, w)
        return jnp.where(lab < n, jumped, _BIG)

    return jax.lax.fori_loop(0, rounds, body, labels)


def largest_component(active: jnp.ndarray):
    """Mask and area of the largest 8-connected component of ``active``.

    Returns ``(mask (H,W) bool, area int32)``; area is 0 when nothing is
    active.
    """
    h, w = active.shape
    labels = label_components(active)
    flat = labels.reshape(-1)
    # Count cells per label (labels are linear indices < h*w, or BIG).
    # One-hot compare-reduce instead of a scatter-add: n^2 VPU compares
    # (n=196 by default) beat n serialized scalar-core scatter updates.
    valid = flat < h * w
    safe = jnp.where(valid, flat, h * w)  # out-of-range -> matches nothing
    counts = jnp.sum(
        (safe[:, None] == jnp.arange(h * w, dtype=flat.dtype)[None, :])
        .astype(jnp.int32),
        axis=0,
    )
    best_label = jnp.argmax(counts)
    area = counts[best_label]
    mask = (labels == best_label) & active
    return mask, area
