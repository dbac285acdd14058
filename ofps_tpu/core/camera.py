"""Pinhole camera model.

Behavioral spec: ``/root/reference/ofps/src/camera.rs`` (StandardCamera).  The
camera is defined by aspect ratio and vertical field of view; the principal
point is at ``(0.5, 0.5)``.  All functions are pure jax.numpy, broadcast over
leading batch dimensions of ``coords`` and are jit/vmap-friendly.

Screen coordinates live in ``[0, 1]^2``; the projection pipeline reproduces the
reference exactly, including its quirk of dividing the NDC x/y by NDC z after
the homogeneous divide (``camera.rs:72-81``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

# The camera/estimator math is tiny (3x3 / 4x4 systems) but precision-critical;
# TPU default matmul precision is bf16, which destroys the near-cancelling
# projective terms.  Force full f32 everywhere in this layer.
_mm = partial(jnp.matmul, precision="highest")

_ZNEAR = 0.1
_ZFAR = 10.0

# Fixed "Z up, Y forward" view matrix used for screen-space rotations
# (camera.rs:89-96). It is symmetric, orthogonal and involutive, so
# V == V^T == V^-1.  Kept as a host (numpy) constant: module import must not
# dispatch device ops — the driver imports this package in environments where
# the default backend may be unusable (see __graft_entry__.py).
ROTATE_VIEW = np.array(
    [
        [-1.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ],
    dtype=np.float32,
)


class StandardCamera(NamedTuple):
    """Pinhole camera parametrized by aspect ratio and vertical FOV (degrees)."""

    aspect: jnp.ndarray
    fov_y_deg: jnp.ndarray

    @classmethod
    def create(cls, aspect: float, fov_y_deg: float) -> "StandardCamera":
        # numpy leaves: constructing a camera must not dispatch device ops
        # (pipeline construction happens before any backend is chosen).
        return cls(
            np.asarray(aspect, dtype=np.float32),
            np.asarray(fov_y_deg, dtype=np.float32),
        )

    # -- projection matrices -------------------------------------------------

    def proj(self) -> jnp.ndarray:
        """OpenGL-style right-handed perspective matrix (camera.rs:27)."""
        f = 1.0 / jnp.tan(jnp.deg2rad(self.fov_y_deg) * 0.5)
        m22 = -(_ZFAR + _ZNEAR) / (_ZFAR - _ZNEAR)
        m23 = -2.0 * _ZFAR * _ZNEAR / (_ZFAR - _ZNEAR)
        z = jnp.zeros_like(f)
        o = jnp.ones_like(f)
        return jnp.stack(
            [
                jnp.stack([f / self.aspect, z, z, z], -1),
                jnp.stack([z, f, z, z], -1),
                jnp.stack([z, z, m22 * o, m23 * o], -1),
                jnp.stack([z, z, -o, z], -1),
            ],
            axis=-2,
        )

    def inv_proj(self) -> jnp.ndarray:
        f = 1.0 / jnp.tan(jnp.deg2rad(self.fov_y_deg) * 0.5)
        m22 = -(_ZFAR + _ZNEAR) / (_ZFAR - _ZNEAR)
        m23 = -2.0 * _ZFAR * _ZNEAR / (_ZFAR - _ZNEAR)
        z = jnp.zeros_like(f)
        o = jnp.ones_like(f)
        return jnp.stack(
            [
                jnp.stack([self.aspect / f, z, z, z], -1),
                jnp.stack([z, 1.0 / f, z, z], -1),
                jnp.stack([z, z, z, -o], -1),
                jnp.stack([z, z, o / m23, (m22 / m23) * o], -1),
            ],
            axis=-2,
        )

    # -- point transforms ----------------------------------------------------

    def unproject(self, coords: jnp.ndarray, inv_view: jnp.ndarray) -> jnp.ndarray:
        """Screen-space ``[0,1]^2`` point to a 3D point (camera.rs:45-55).

        ``coords``: (..., 2); ``inv_view``: (4, 4). Returns (..., 3).
        """
        ndc = coords * 2.0 - 1.0
        m = _mm(inv_view, self.inv_proj())
        p = jnp.stack(
            [ndc[..., 0], ndc[..., 1], jnp.ones_like(ndc[..., 0])], axis=-1
        )
        h = _mm(p, m[:3, :3].T) + m[:3, 3]
        w = _mm(p, m[3, :3]) + m[3, 3]
        return h / w[..., None]

    def project(self, world: jnp.ndarray, view: jnp.ndarray) -> jnp.ndarray:
        """3D point to screen space, reproducing camera.rs:72-81 exactly.

        Includes the reference's extra divide of NDC x/y by NDC z.
        """
        m = _mm(self.proj(), view)
        h = _mm(world, m[:3, :3].T) + m[:3, 3]
        w = _mm(world, m[3, :3]) + m[3, 3]
        ndc = h / w[..., None]
        s = ndc[..., :2] / ndc[..., 2:3]
        return (s + 1.0) * 0.5

    def rotate(self, coords: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
        """Rotate a screen point around the camera (camera.rs:89-112).

        ``rotation``: (4, 4) homogeneous rotation (or (..., 4, 4) broadcastable).
        """
        world = self.unproject(coords, ROTATE_VIEW)
        if rotation.ndim == 2:
            world = _mm(world, rotation[:3, :3].T) + rotation[:3, 3]
        else:
            world = jnp.einsum("...ij,...j->...i", rotation[..., :3, :3], world, precision="highest") + rotation[..., :3, 3]
        return self.project(world, ROTATE_VIEW)

    def delta(self, coords: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
        """Screen-space displacement of a point under a camera rotation."""
        return self.rotate(coords, rotation) - coords

    # -- intrinsics ----------------------------------------------------------

    def intrinsics(self) -> jnp.ndarray:
        """K matrix with principal point (0.5, 0.5) (camera.rs:120-129)."""
        fy = 0.5 / jnp.tan(jnp.deg2rad(self.fov_y_deg) * 0.5)
        fx = fy / self.aspect
        z = jnp.zeros_like(fx)
        h = jnp.full_like(fx, 0.5)
        o = jnp.ones_like(fx)
        return jnp.stack(
            [
                jnp.stack([fx, z, h], -1),
                jnp.stack([z, fy, h], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )

    def point_angle(self, p: jnp.ndarray) -> jnp.ndarray:
        """Per-axis angular position of a screen point, radians (camera.rs:150-161)."""
        k = self.intrinsics()
        centered = p - jnp.stack([k[..., 0, 2], k[..., 1, 2]], -1)
        tan = centered / jnp.stack([k[..., 0, 0], k[..., 1, 1]], -1)
        return jnp.arctan(tan)

    def fov(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Horizontal and vertical FOV in degrees (camera.rs:166-170)."""
        ty = jnp.tan(jnp.deg2rad(self.fov_y_deg) * 0.5)
        tx = self.aspect * ty
        return jnp.rad2deg(jnp.arctan(tx)) * 2.0, self.fov_y_deg

    def essential(self, f: jnp.ndarray) -> jnp.ndarray:
        """Essential matrix from fundamental: ``K^T F K`` (camera.rs:184-187)."""
        k = self.intrinsics()
        return _mm(_mm(jnp.swapaxes(k, -1, -2), f), k)


def look_at_rh(eye: jnp.ndarray, target: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """Standard gluLookAt right-handed view matrix (nalgebra Matrix4::look_at_rh).

    Used by the reference's synthetic-GT test fixtures
    (almeida-estimator/src/lib.rs:280-286).
    """
    eye = jnp.asarray(eye, dtype=jnp.float32)
    target = jnp.asarray(target, dtype=jnp.float32)
    up = jnp.asarray(up, dtype=jnp.float32)
    fwd = target - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    s = jnp.cross(fwd, up)
    s = s / jnp.linalg.norm(s)
    u = jnp.cross(s, fwd)
    rot = jnp.stack([s, u, -fwd], axis=0)
    trans = -_mm(rot, eye)
    m = jnp.zeros((4, 4), dtype=jnp.float32)
    m = m.at[:3, :3].set(rot)
    m = m.at[:3, 3].set(trans)
    m = m.at[3, 3].set(1.0)
    return m
