"""Axis-convention remaps between solver output and the codebase convention.

The reference remaps estimator rotations into its Z-up/Y-forward camera
convention via lossy euler-angle swaps (homography-estimator lib.rs:150-154,
libmv-estimator lib.rs:196-200, multiview-estimator lib.rs:130-134).  The
quaternion-exact equivalent of the (roll, pitch, yaw) -> (-roll, -yaw, pitch)
swap is conjugation by a -90 deg rotation about x followed by inversion:

    q' = conj(P * q * conj(P)),  P = (cos(pi/4), -sin(pi/4), 0, 0)

which maps quaternion components (w, x, y, z) -> (w, -x, -z, y) for all
angles, agreeing with the euler swap to first order and staying exact for
large rotations.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ofps_tpu.core import quat

_HALF_SQRT2 = math.sqrt(0.5)


def remap_solver_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """(w, x, y, z) -> (w, -x, -z, y): the homography/libmv axis remap."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    return jnp.stack([w, -x, -z, y], axis=-1)
