"""Shared synthetic-rotation ground-truth fixture.

Port of the reference's in-code test fixture (copy-pasted into each estimator
crate there, e.g. /root/reference/almeida-estimator/src/lib.rs:253-331):
build a grid of 3D points by unprojecting screen points, render through two
camera views (identity and a known rotation), derive the flow field.
"""

import numpy as np
import jax.numpy as jnp

from ofps_tpu.core import quat
from ofps_tpu.core.camera import StandardCamera, look_at_rh
from ofps_tpu.core.motion import SparseFlow


def calc_view(rot_q, pos, forward=(0.0, -1.0, 0.0)):
    """look_at_rh(pos, pos + rot*fwd, rot*up) — almeida lib.rs:280-286.

    The homography/libmv fixtures use forward=(0,1,0) (their lib.rs:186-192).
    """
    pos = jnp.asarray(pos, dtype=jnp.float32)
    fwd = quat.rotate_vec(rot_q, jnp.asarray(forward, dtype=jnp.float32))
    up = quat.rotate_vec(rot_q, jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32))
    return look_at_rh(pos, pos + fwd, up)


def get_grid(nx, ny, camera, skip_edges=False):
    """Screen-point grid unprojected to 3D through the identity view."""
    start = 1 if skip_edges else 0
    pts = np.array(
        [[x / nx, y / ny] for x in range(start, nx) for y in range(start, ny)],
        dtype=np.float32,
    )
    view = calc_view(quat.identity(), jnp.zeros(3))
    return camera.unproject(jnp.asarray(pts), view)


def synthetic_field(camera, rot_q, grid=None, capacity=None, center_filter=True,
                    forward=(0.0, -1.0, 0.0)):
    """Flow field between identity view and rotated view (calc_field port)."""
    if grid is None:
        grid = get_grid(50, 50, camera)
    v1 = calc_view(quat.identity(), jnp.zeros(3), forward)
    v2 = calc_view(rot_q, jnp.zeros(3), forward)
    p1 = np.asarray(camera.project(grid, v1))
    p2 = np.asarray(camera.project(grid, v2))
    if center_filter:
        mid = np.array([0.5, 0.5], dtype=np.float32)
        keep = (np.linalg.norm(p1 - mid, axis=-1) <= 0.71) | (
            np.linalg.norm(p2 - mid, axis=-1) <= 0.71
        )
    else:
        keep = np.ones(len(p1), dtype=bool)
    pos = p1[keep]
    mot = (p2 - p1)[keep]
    return SparseFlow.from_arrays(pos, mot, capacity=capacity or len(grid))


ANGLE_COMBOS = [
    (0.0, 0.0, 0.0),
    (1.0, 0.0, 0.0),
    (0.0, 1.0, 0.0),
    (0.0, 0.0, 1.0),
    (1.0, 1.0, 0.0),
    (1.0, 0.0, 1.0),
    (0.0, 1.0, 1.0),
    (1.0, 1.0, 1.0),
]


def euler_deg(r, p, y):
    return quat.from_euler(np.deg2rad(r), np.deg2rad(p), np.deg2rad(y))
