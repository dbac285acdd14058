"""Plane-layout (SoA) screen-space rotation geometry.

TPU layout note: point arrays shaped ``(N, 2)`` / ``(N, 3, 2)`` put 2-6
elements on the 128-lane axis, so every elementwise op in the estimator hot
loops ran at <5% lane utilization.  This module carries u/v *planes* of
shape ``(..., N)`` instead: full lanes, and the whole rotation-flow chain
fuses into a handful of VPU kernels.

Behavioral spec: ``camera.rs:45-112`` — identical math to
:meth:`ofps_tpu.core.camera.StandardCamera.rotate` (which is oracle-gated at
2e-6 in tests/test_oracle_parity.py); the plane versions are gated against
the AoS versions in tests/test_geometry_uv.py.

Quaternions here are 4-tuples of planes ``(w, x, y, z)``; rotation matrices
are 9-tuples ``(r00, r01, ..., r22)`` in row-major order.  Tuples-of-planes
broadcast like any jnp arrays, so hypothesis batches are just leading dims.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from ofps_tpu.core.camera import ROTATE_VIEW

_mm = partial(jnp.matmul, precision="highest")


def rv_chain(camera):
    """The two constant 4x4s of the screen-rotation chain.

    ``m1 = ROTATE_VIEW @ inv_proj`` (unproject side),
    ``m2 = proj @ ROTATE_VIEW`` (project side) — camera.rs:89-112.
    """
    m1 = _mm(jnp.asarray(ROTATE_VIEW), camera.inv_proj())
    m2 = _mm(camera.proj(), jnp.asarray(ROTATE_VIEW))
    return m1, m2


def rotate_planes(camera, px, py, r):
    """Rotate screen points around the camera; planes in, planes out.

    ``px, py``: screen-coordinate planes; ``r``: 9-tuple rotation-matrix
    planes, broadcastable against them.  Exact plane transcription of
    ``StandardCamera.rotate`` (unproject -> rotate -> project, including the
    reference's NDC z-divide quirk).
    """
    m1, m2 = rv_chain(camera)
    nx = px * 2.0 - 1.0
    ny = py * 2.0 - 1.0
    # unproject through ROTATE_VIEW: p = [nx, ny, 1, 1] (homogeneous w fold)
    h0 = m1[0, 0] * nx + m1[0, 1] * ny + (m1[0, 2] + m1[0, 3])
    h1 = m1[1, 0] * nx + m1[1, 1] * ny + (m1[1, 2] + m1[1, 3])
    h2 = m1[2, 0] * nx + m1[2, 1] * ny + (m1[2, 2] + m1[2, 3])
    hw = m1[3, 0] * nx + m1[3, 1] * ny + (m1[3, 2] + m1[3, 3])
    inv = 1.0 / hw
    wx, wy, wz = h0 * inv, h1 * inv, h2 * inv
    # rotate (rotation-only homogeneous: translation row is zero)
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = r
    vx = r00 * wx + r01 * wy + r02 * wz
    vy = r10 * wx + r11 * wy + r12 * wz
    vz = r20 * wx + r21 * wy + r22 * wz
    # project through ROTATE_VIEW, with the reference's extra xy/z divide
    g0 = m2[0, 0] * vx + m2[0, 1] * vy + m2[0, 2] * vz + m2[0, 3]
    g1 = m2[1, 0] * vx + m2[1, 1] * vy + m2[1, 2] * vz + m2[1, 3]
    g2 = m2[2, 0] * vx + m2[2, 1] * vy + m2[2, 2] * vz + m2[2, 3]
    gw = m2[3, 0] * vx + m2[3, 1] * vy + m2[3, 2] * vz + m2[3, 3]
    ginv = 1.0 / gw
    n0, n1, n2 = g0 * ginv, g1 * ginv, g2 * ginv
    sx = n0 / n2
    sy = n1 / n2
    return (sx + 1.0) * 0.5, (sy + 1.0) * 0.5


def delta_planes(camera, px, py, r):
    """Screen displacement planes under rotation ``r`` (camera.delta)."""
    qx, qy = rotate_planes(camera, px, py, r)
    return qx - px, qy - py


def point_angle_planes(camera, px, py):
    """Per-axis angular position planes (StandardCamera.point_angle)."""
    fy = 0.5 / jnp.tan(jnp.deg2rad(camera.fov_y_deg) * 0.5)
    fx = fy / camera.aspect
    return jnp.arctan((px - 0.5) / fx), jnp.arctan((py - 0.5) / fy)


# -- quaternion planes -------------------------------------------------------


def qident_like(plane):
    o = jnp.ones_like(plane)
    z = jnp.zeros_like(plane)
    return (o, z, z, z)


def qmul(a, b):
    """Hamilton product on (w, x, y, z) plane tuples (quat.mul)."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def qconj(q):
    w, x, y, z = q
    return (w, -x, -y, -z)


def qmat(q):
    """Rotation-matrix 9-tuple from a unit-quaternion plane tuple."""
    w, x, y, z = q
    return (
        1.0 - 2.0 * (y * y + z * z),
        2.0 * (x * y - w * z),
        2.0 * (x * z + w * y),
        2.0 * (x * y + w * z),
        1.0 - 2.0 * (x * x + z * z),
        2.0 * (y * z - w * x),
        2.0 * (x * z - w * y),
        2.0 * (y * z + w * x),
        1.0 - 2.0 * (x * x + y * y),
    )


def solve3_planes(a, b, fallback: float = 0.0):
    """Cramer solve of symmetric 3x3 systems given as plane tuples.

    ``a`` = (a11, a12, a13, a22, a23, a33), ``b`` = (b1, b2, b3); matches
    :func:`ofps_tpu.ops.solve.solve3x3` semantics (singular -> fallback).
    """
    a11, a12, a13, a22, a23, a33 = a
    b1, b2, b3 = b
    c11 = a22 * a33 - a23 * a23
    c12 = a13 * a23 - a12 * a33
    c13 = a12 * a23 - a13 * a22
    d = a11 * c11 + a12 * c12 + a13 * c13
    safe = jnp.abs(d) > 1e-30
    dinv = 1.0 / jnp.where(safe, d, 1.0)
    c22 = a11 * a33 - a13 * a13
    c23 = a12 * a13 - a11 * a23
    c33 = a11 * a22 - a12 * a12
    x1 = (b1 * c11 + b2 * c12 + b3 * c13) * dinv
    x2 = (b1 * c12 + b2 * c22 + b3 * c23) * dinv
    x3 = (b1 * c13 + b2 * c23 + b3 * c33) * dinv
    fb = jnp.float32(fallback)
    return (
        jnp.where(safe, x1, fb),
        jnp.where(safe, x2, fb),
        jnp.where(safe, x3, fb),
    )
