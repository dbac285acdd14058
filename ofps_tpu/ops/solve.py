"""Small batched linear-algebra helpers shared by the estimators.

These replace the reference's nalgebra LU solves (e.g.
``almeida-estimator/src/lib.rs:181-183``, ``ofps/src/utils.rs:82-88``) with
closed-form Cramer solves that vmap cleanly and return zeros on singular
systems (matching nalgebra's ``solve(...).unwrap_or_default()`` pattern).
"""

from __future__ import annotations

import jax.numpy as jnp


def det3(a: jnp.ndarray) -> jnp.ndarray:
    """Determinant of (..., 3, 3)."""
    return (
        a[..., 0, 0] * (a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1])
        - a[..., 0, 1] * (a[..., 1, 0] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 0])
        + a[..., 0, 2] * (a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0])
    )


def solve3x3(a: jnp.ndarray, b: jnp.ndarray, fallback: float = 0.0) -> jnp.ndarray:
    """Solve ``a @ x = b`` for (..., 3, 3) and (..., 3) via Cramer's rule.

    Singular systems return ``fallback`` (reference behavior: zero model).
    """
    d = det3(a)
    cols = []
    for i in range(3):
        ai = a.at[..., :, i].set(b) if hasattr(a, "at") else None
        cols.append(det3(ai))
    x = jnp.stack(cols, axis=-1)
    safe = jnp.abs(d) > 1e-30
    return jnp.where(
        safe[..., None], x / jnp.where(safe, d, 1.0)[..., None], fallback
    )


def solve2x2(a: jnp.ndarray, b: jnp.ndarray, fallback: float = 0.0) -> jnp.ndarray:
    d = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    x0 = b[..., 0] * a[..., 1, 1] - a[..., 0, 1] * b[..., 1]
    x1 = a[..., 0, 0] * b[..., 1] - b[..., 0] * a[..., 1, 0]
    safe = jnp.abs(d) > 1e-30
    return jnp.where(
        safe[..., None],
        jnp.stack([x0, x1], -1) / jnp.where(safe, d, 1.0)[..., None],
        fallback,
    )
