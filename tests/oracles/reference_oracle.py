"""Sequential numpy oracles hand-ported from the reference Rust sources.

These are *independent* re-derivations (numpy float32, sequential control
flow — deliberately NOT the TPU formulations) used by the numeric-parity
harness to gate the BASELINE.md requirement of "<1e-3 mean EPE deviation vs
the Rust almeida-estimator":

* ``CameraOracle``          — ofps/src/camera.rs (StandardCamera)
* ``solve_ypr_given``       — almeida-estimator/src/lib.rs:123-200
* ``solve_ypr_ransac``      — almeida-estimator/src/lib.rs:202-251
* ``DensifierOracle``       — ofps/src/motion_field.rs:117-294 including the
  priority-queue (BTreeSet-ordered) empty-cell interpolation.

Quaternions are (w, x, y, z) with nalgebra's ``from_euler_angles`` order
``Rz(yaw) * Ry(pitch) * Rx(roll)``.
"""

from __future__ import annotations

import math

import numpy as np

F32 = np.float32
EPS_ANGLE = F32(0.001 * math.pi / 180.0)  # lib.rs:17
ALPHA = F32(0.5)  # lib.rs:18


# --------------------------------------------------------------------------
# quaternions (numpy, f32)
# --------------------------------------------------------------------------

def quat_identity():
    return np.array([1.0, 0.0, 0.0, 0.0], F32)


def quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        F32,
    )


def quat_inverse(q):
    return np.array([q[0], -q[1], -q[2], -q[3]], F32)


def quat_from_euler(roll, pitch, yaw):
    """nalgebra ``from_euler_angles``: Rz(yaw) * Ry(pitch) * Rx(roll)."""
    cr, sr = math.cos(roll * 0.5), math.sin(roll * 0.5)
    cp, sp = math.cos(pitch * 0.5), math.sin(pitch * 0.5)
    cy, sy = math.cos(yaw * 0.5), math.sin(yaw * 0.5)
    return np.array(
        [
            cy * cp * cr + sy * sp * sr,
            cy * cp * sr - sy * sp * cr,
            cy * sp * cr + sy * cp * sr,
            sy * cp * cr - cy * sp * sr,
        ],
        F32,
    )


def quat_to_mat4(q):
    w, x, y, z = (float(v) for v in q)
    m = np.eye(4, dtype=F32)
    m[0, 0] = 1 - 2 * (y * y + z * z)
    m[0, 1] = 2 * (x * y - w * z)
    m[0, 2] = 2 * (x * z + w * y)
    m[1, 0] = 2 * (x * y + w * z)
    m[1, 1] = 1 - 2 * (x * x + z * z)
    m[1, 2] = 2 * (y * z - w * x)
    m[2, 0] = 2 * (x * z - w * y)
    m[2, 1] = 2 * (y * z + w * x)
    m[2, 2] = 1 - 2 * (x * x + y * y)
    return m


def mat4_from_euler(roll, pitch, yaw):
    """nalgebra ``Matrix4::from_euler_angles`` (same R = Rz Ry Rx)."""
    return quat_to_mat4(quat_from_euler(roll, pitch, yaw))


# --------------------------------------------------------------------------
# StandardCamera (camera.rs)
# --------------------------------------------------------------------------

class CameraOracle:
    """Port of ofps/src/camera.rs StandardCamera (numpy f32)."""

    ZNEAR, ZFAR = F32(0.1), F32(10.0)
    # camera.rs:89-96 "Z up, Y forward" view (symmetric involution).
    VIEW = np.array(
        [
            [-1.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 1.0, 0.0],
            [0.0, 1.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        F32,
    )

    def __init__(self, aspect: float, fov_y_deg: float):
        self.aspect = F32(aspect)
        self.fov_y = F32(fov_y_deg)
        f = F32(1.0 / math.tan(math.radians(fov_y_deg) / 2.0))
        zn, zf = self.ZNEAR, self.ZFAR
        proj = np.zeros((4, 4), F32)
        proj[0, 0] = f / self.aspect
        proj[1, 1] = f
        proj[2, 2] = -(zf + zn) / (zf - zn)
        proj[2, 3] = -2 * zf * zn / (zf - zn)
        proj[3, 2] = -1.0
        self.proj = proj
        self.inv_proj = np.linalg.inv(proj.astype(np.float64)).astype(F32)

    def unproject(self, coords, inv_view):
        """camera.rs:45-55: screen [0,1]^2 -> 3D at NDC z=1."""
        ndc = coords * 2.0 - 1.0
        m = inv_view @ self.inv_proj
        p = np.array([ndc[0], ndc[1], 1.0, 1.0], F32)
        h = m @ p
        return h[:3] / h[3]

    def project(self, world, view):
        """camera.rs:66-81 including the extra NDC x/y by z divide."""
        m = self.proj @ view
        h = m @ np.array([world[0], world[1], world[2], 1.0], F32)
        ndc = h[:3] / h[3]
        s = ndc[:2] / ndc[2]
        return ((s + 1.0) * 0.5).astype(F32)

    def rotate(self, coords, rotation4):
        world = self.unproject(coords, self.VIEW.T)
        world = rotation4[:3, :3] @ world + rotation4[:3, 3]
        return self.project(world, self.VIEW)

    def delta(self, coords, rotation4):
        return self.rotate(coords, rotation4) - coords

    def intrinsics(self):
        fy = F32(0.5 / math.tan(math.radians(float(self.fov_y)) / 2.0))
        fx = fy / self.aspect
        return np.array([[fx, 0, 0.5], [0, fy, 0.5], [0, 0, 1]], F32)

    def point_angle(self, p):
        k = self.intrinsics()
        centered = p - k[:2, 2]
        return np.arctan(centered / np.array([k[0, 0], k[1, 1]], F32))

    # MotionModel for StandardCamera (almeida lib.rs:30-47)
    def roll(self, coords, eps):
        return self.delta(coords, mat4_from_euler(0.0, eps, 0.0))

    def pitch(self, coords, eps):
        return self.delta(coords, mat4_from_euler(eps, 0.0, 0.0))

    def yaw(self, coords, eps):
        return self.delta(coords, mat4_from_euler(0.0, 0.0, -eps))


# --------------------------------------------------------------------------
# Almeida estimator (almeida-estimator/src/lib.rs)
# --------------------------------------------------------------------------

def solve_ypr_given(entries, camera: CameraOracle):
    """lib.rs:123-200: iterative 3-param LSQ, sequential and faithful.

    ``entries``: list of (pos (2,), motion (2,)) numpy f32 pairs.
    Returns the (w, x, y, z) quaternion (already inverted, lib.rs:199).
    """
    limit = math.ceil(15.0 / float(ALPHA))  # 30
    rotation = quat_identity()

    for i in range(limit):
        alpha = F32(1.0) if i == limit - 1 else ALPHA
        rotm = quat_to_mat4(rotation)
        vecs = []
        for pos, motion in entries:
            delta = camera.delta(pos, rotm)
            vecs.append(
                (
                    motion - delta,
                    camera.roll(pos, EPS_ANGLE),
                    camera.pitch(pos, EPS_ANGLE),
                    camera.yaw(pos, EPS_ANGLE),
                )
            )
        a = np.zeros((3, 3), F32)
        b = np.zeros(3, F32)
        for v in vecs:
            for r in range(3):
                for c in range(3):
                    a[r, c] += v[r + 1] @ v[c + 1]
                b[r] += v[r + 1] @ v[0]
        try:
            model = np.linalg.solve(a.astype(np.float64), b.astype(np.float64))
        except np.linalg.LinAlgError:
            model = np.zeros(3)
        model = (model * float(EPS_ANGLE) * float(alpha)).astype(F32)

        roll = quat_from_euler(0.0, model[0], 0.0)
        pitch = quat_from_euler(model[1], 0.0, 0.0)
        yaw = quat_from_euler(0.0, 0.0, -model[2])
        rot = quat_mul(pitch, quat_mul(roll, yaw))
        rotation = quat_mul(rotation, rot)

    return quat_inverse(rotation)


def solve_ypr_ransac(
    entries, camera: CameraOracle, num_iters, target_delta_deg, num_samples, rng
):
    """lib.rs:202-251: sequential RANSAC over 3-point minimal fits."""
    best_inliers = []
    target = math.radians(target_delta_deg)
    n = len(entries)
    for _ in range(num_iters):
        samples = [entries[i] for i in rng.choice(n, min(3, n), replace=False)]
        fit = solve_ypr_given(samples, camera)
        idx = rng.choice(n, min(num_samples, n), replace=False)
        mat = quat_to_mat4(quat_inverse(fit))
        inliers = []
        for i in idx:
            pos, vec = entries[i]
            delta = camera.delta(pos, mat)
            sample_pt = pos + delta
            v = vec - delta
            ang = camera.point_angle(sample_pt)
            cosang = np.cos(ang)
            if float(np.sum((v * cosang) ** 2)) <= target * target:
                inliers.append((pos, vec))
        if len(inliers) > len(best_inliers):
            best_inliers = inliers
    if len(best_inliers) >= 3:
        return solve_ypr_given(best_inliers, camera)
    return quat_identity()


# --------------------------------------------------------------------------
# Densifier + priority-queue hole fill (motion_field.rs:117-294)
# --------------------------------------------------------------------------

_NEIGHBORS = ((-1, 0), (0, -1), (-1, -1), (1, 0), (0, 1), (1, 1))


class DensifierOracle:
    def __init__(self, width: int, height: int):
        self.w, self.h = width, height
        self.sums = np.zeros((width * height, 2), F32)
        self.counts = np.full(width * height, np.finfo(np.float32).eps, F32)

    def _add_idx(self, idx, motion, weight):
        self.counts[idx] += weight
        self.sums[idx] += motion * weight

    def add_vector(self, pos, motion, weight=1.0):
        p = np.clip(pos, 0.0, 1.0)
        x = int(round(float(p[0]) * (self.w - 1)))
        y = int(round(float(p[1]) * (self.h - 1)))
        self._add_idx(y * self.w + x, np.asarray(motion, F32), F32(weight))

    def _calc_counts(self, i):
        x, y = i % self.w, i // self.w
        cnt = 0
        for ox, oy in _NEIGHBORS:
            nx, ny = x + ox, y + oy
            if 0 <= nx < self.w and 0 <= ny < self.h:
                if self.counts[nx + ny * self.w] > 0.1:
                    cnt += 1
        return cnt

    def interpolate_empty_cells(self):
        """Faithful port of the BTreeSet most-neighbors-first fill."""
        queue = {
            i for i in range(self.w * self.h) if self.counts[i] < 0.5
        }
        if len(queue) == self.w * self.h:
            return
        # BTreeSet iteration order: (neighbors=-count, idx) ascending; we
        # re-derive the ordering key each pop (the reference maintains it
        # incrementally — same order, simpler port).
        while queue:
            i = min(queue, key=lambda j: (-self._calc_counts(j), j))
            if self._calc_counts(i) == 0:
                break  # nothing fillable remains (disconnected field)
            queue.remove(i)
            x, y = i % self.w, i // self.w
            for ox, oy in _NEIGHBORS:
                nx, ny = x + ox, y + oy
                if 0 <= nx < self.w and 0 <= ny < self.h:
                    idx = nx + ny * self.w
                    cnt = self.counts[idx]
                    if cnt > 0.1:
                        scale = F32(1.0 - math.sqrt(ox * ox + oy * oy) * 0.5)
                        # Reference quirk: add_vector_idx multiplies the
                        # passed motion by the weight AGAIN, so the summed
                        # contribution is scale^2 * mean with a scale count
                        # (motion_field.rs:141-147 + 265).
                        self._add_idx(
                            i, scale * (F32(1.0) / cnt) * self.sums[idx], scale
                        )

    def field(self):
        return (self.sums / self.counts[:, None]).reshape(self.h, self.w, 2)
