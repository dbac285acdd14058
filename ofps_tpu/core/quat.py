"""Quaternion and rotation utilities.

Conventions follow nalgebra's (the math library used by the reference
implementation, e.g. ``/root/reference/ofps/src/estimator.rs:38-53``):

* Quaternions are stored as ``(..., 4)`` arrays in ``(w, x, y, z)`` order.
* ``from_euler(roll, pitch, yaw)`` builds ``Rz(yaw) @ Ry(pitch) @ Rx(roll)``
  (nalgebra's ``UnitQuaternion::from_euler_angles``).
* ``to_euler`` returns ``(roll, pitch, yaw)`` of the same convention.

Everything is pure jax.numpy, float32 by default, and broadcasts over leading
batch dimensions so estimator math can be vmapped across streams/hypotheses.
"""

from __future__ import annotations

import jax.numpy as jnp


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, 1e-30)


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product ``a * b`` (apply ``b`` first, then ``a``)."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def inverse(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a *unit* quaternion."""
    return conj(q)


def from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-30)
    half = jnp.asarray(angle)[..., None] * 0.5
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def from_euler(roll, pitch, yaw) -> jnp.ndarray:
    """nalgebra ``from_euler_angles``: ``Rz(yaw) * Ry(pitch) * Rx(roll)``."""
    roll = jnp.asarray(roll, dtype=jnp.float32)
    pitch = jnp.asarray(pitch, dtype=jnp.float32)
    yaw = jnp.asarray(yaw, dtype=jnp.float32)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            cy * cp * cr + sy * sp * sr,
            cy * cp * sr - sy * sp * cr,
            cy * sp * cr + sy * cp * sr,
            sy * cp * cr - cy * sp * sr,
        ],
        axis=-1,
    )


def to_euler(q: jnp.ndarray):
    """Return ``(roll, pitch, yaw)`` matching nalgebra ``euler_angles()``."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    # Rotation matrix entries needed (R = Rz Ry Rx).
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    r10 = 2.0 * (x * y + w * z)
    r00 = 1.0 - 2.0 * (y * y + z * z)
    roll = jnp.arctan2(r21, r22)
    pitch = jnp.arcsin(jnp.clip(-r20, -1.0, 1.0))
    yaw = jnp.arctan2(r10, r00)
    return roll, pitch, yaw


def to_matrix3(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix, shape ``(..., 3, 3)``."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r = jnp.stack(
        [
            1.0 - 2.0 * (y * y + z * z),
            2.0 * (x * y - w * z),
            2.0 * (x * z + w * y),
            2.0 * (x * y + w * z),
            1.0 - 2.0 * (x * x + z * z),
            2.0 * (y * z - w * x),
            2.0 * (x * z - w * y),
            2.0 * (y * z + w * x),
            1.0 - 2.0 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def to_matrix4(q: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous rotation matrix, shape ``(..., 4, 4)``."""
    r3 = to_matrix3(q)
    batch = r3.shape[:-2]
    m = jnp.zeros(batch + (4, 4), dtype=r3.dtype)
    m = m.at[..., :3, :3].set(r3)
    m = m.at[..., 3, 3].set(1.0)
    return m


def from_matrix3(r: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion from a rotation matrix (branchless Shepperd method)."""
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically strongest.
    qw = jnp.stack(
        [1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1
    )
    qx = jnp.stack(
        [m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1
    )
    qy = jnp.stack(
        [m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1
    )
    qz = jnp.stack(
        [m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1
    )
    cases = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 cases, 4)
    mags = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cases, best[..., None, None].repeat(4, axis=-1), axis=-2)
    q = q[..., 0, :]
    q = normalize(q)
    # Canonicalize sign (w >= 0) like nalgebra tends to for small rotations.
    return jnp.where(q[..., :1] < 0, -q, q)


def rotate_vec(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate a 3-vector by a unit quaternion."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def angle(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle in radians of a unit quaternion."""
    return 2.0 * jnp.arctan2(jnp.linalg.norm(q[..., 1:], axis=-1), jnp.abs(q[..., 0]))


def angle_to(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Angle between two rotations (nalgebra ``angle_to``)."""
    return angle(mul(inverse(a), b))


def axis_angle(q: jnp.ndarray):
    """Return (axis, angle). Axis defaults to +x for near-identity rotations."""
    v = q[..., 1:]
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # nalgebra's axis_angle flips axis so that the represented angle is positive
    # w.r.t. its stored sign; we mimic by negating axis when w < 0.
    sign = jnp.where(q[..., :1] < 0, -1.0, 1.0)
    axis = jnp.where(n > 1e-12, sign * v / jnp.maximum(n, 1e-30), jnp.asarray([1.0, 0.0, 0.0], dtype=q.dtype))
    return axis, angle(q)
