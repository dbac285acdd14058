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
    """
    h, w = active.shape
    idx = (jnp.arange(h * w, dtype=jnp.int32)).reshape(h, w)
    labels = jnp.where(active, idx, _BIG)

    def body(state):
        lab, _ = state
        best = lab
        for dx, dy in _NEIGHBORS8:
            best = jnp.minimum(best, _shift_min(lab, dx, dy))
        new = jnp.where(active, jnp.minimum(lab, best), _BIG)
        return new, jnp.any(new != lab)

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.array(True)))
    return labels


def largest_component(active: jnp.ndarray):
    """Mask and area of the largest 8-connected component of ``active``.

    Returns ``(mask (H,W) bool, area int32)``; area is 0 when nothing is
    active.
    """
    h, w = active.shape
    labels = label_components(active)
    flat = labels.reshape(-1)
    # Count cells per label (labels are linear indices < h*w, or BIG).
    valid = flat < h * w
    counts = jnp.zeros((h * w,), dtype=jnp.int32).at[
        jnp.where(valid, flat, 0)
    ].add(valid.astype(jnp.int32))
    best_label = jnp.argmax(counts)
    area = counts[best_label]
    mask = (labels == best_label) & active
    return mask, area
