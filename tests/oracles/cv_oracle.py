"""OpenCV-backed oracles for the homography / multiview / libmv estimators.

The reference implementations of these three estimators are thin Rust layers
over OpenCV calib3d / libmv (homography-estimator/src/lib.rs:121-157,
multiview-estimator/src/lib.rs:113-148, libmv-estimator/src/lib.rs:165-282).
These oracles reproduce that exact pipeline — the SAME OpenCV backend the
reference links, plus faithful sequential ports of the Rust glue (solution
selection, nalgebra axis swaps, the >90-degree wraparound fix, and libmv's
PrevMotion translation-scale chain) — so the TPU estimators can be gated
against reference-equivalent outputs, not just synthetic ground truth.

Quaternions are (w, x, y, z); euler conventions follow nalgebra
(``R = Rz(yaw) * Ry(pitch) * Rx(roll)``) as in ``reference_oracle``.
"""

from __future__ import annotations

import math

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in CI; tests skip.
    cv2 = None

from .reference_oracle import (
    CameraOracle,
    F32,
    quat_from_euler,
    quat_identity,
    quat_inverse,
    quat_mul,
)


# --------------------------------------------------------------------------
# nalgebra-equivalent conversions
# --------------------------------------------------------------------------

def quat_from_mat3(m) -> np.ndarray:
    """UnitQuaternion::from_matrix (Shepperd's method; exact for rotations)."""
    m = np.asarray(m, np.float64)
    t = np.trace(m)
    if t > 0:
        s = math.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (m[2, 1] - m[1, 2]) / s
        y = (m[0, 2] - m[2, 0]) / s
        z = (m[1, 0] - m[0, 1]) / s
    elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
        s = math.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        w = (m[2, 1] - m[1, 2]) / s
        x = 0.25 * s
        y = (m[0, 1] + m[1, 0]) / s
        z = (m[0, 2] + m[2, 0]) / s
    elif m[1, 1] > m[2, 2]:
        s = math.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
        w = (m[0, 2] - m[2, 0]) / s
        x = (m[0, 1] + m[1, 0]) / s
        y = 0.25 * s
        z = (m[1, 2] + m[2, 1]) / s
    else:
        s = math.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
        w = (m[1, 0] - m[0, 1]) / s
        x = (m[0, 2] + m[2, 0]) / s
        y = (m[1, 2] + m[2, 1]) / s
        z = 0.25 * s
    q = np.array([w, x, y, z], np.float64)
    return (q / np.linalg.norm(q)).astype(F32)


def quat_to_mat3(q) -> np.ndarray:
    w, x, y, z = (float(v) for v in q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        np.float64,
    )


def euler_angles(q):
    """nalgebra ``euler_angles()``: (roll, pitch, yaw) with R = Rz Ry Rx."""
    m = quat_to_mat3(q)
    pitch = math.asin(max(-1.0, min(1.0, -m[2, 0])))
    if abs(m[2, 0]) < 1.0 - 1e-12:
        roll = math.atan2(m[2, 1], m[2, 2])
        yaw = math.atan2(m[1, 0], m[0, 0])
    else:  # gimbal lock (never hit by the small-rotation fixtures)
        roll = math.atan2(-m[1, 2], m[1, 1])
        yaw = 0.0
    return roll, pitch, yaw


def quat_angle(q) -> float:
    """UnitQuaternion::angle(): 2*acos(|w|), in [0, pi]."""
    return 2.0 * math.acos(max(-1.0, min(1.0, abs(float(q[0])))))


def _swap_axes_negated(q):
    """homography lib.rs:152-154 / libmv lib.rs:198-200 axis swap:
    ``(x, z, y) = euler(); from_euler(-x, -y, z)``."""
    roll, pitch, yaw = euler_angles(q)
    # Destructuring (x, z, y): x=roll, z=pitch, y=yaw.
    return quat_from_euler(-roll, -yaw, pitch)


def _swap_axes_plain(q):
    """multiview lib.rs:133-134: ``(x, z, y) = euler(); from_euler(x, y, z)``."""
    roll, pitch, yaw = euler_angles(q)
    return quat_from_euler(roll, yaw, pitch)


def _entries_to_points(entries):
    p1 = np.asarray([p for p, _ in entries], np.float32).reshape(-1, 1, 2)
    p2 = np.asarray(
        [np.asarray(p) + np.asarray(m) for p, m in entries], np.float32
    ).reshape(-1, 1, 2)
    return p1, p2


# --------------------------------------------------------------------------
# Homography estimator (homography-estimator/src/lib.rs)
# --------------------------------------------------------------------------

class HomographyOracle:
    """find_homography_ext + decompose_homography_mat + min-|t| pick."""

    def __init__(self, desired_confidence=0.997, max_error=0.001,
                 max_iters=2000, use_ransac=True):
        self.desired_confidence = desired_confidence
        self.max_error = max_error
        self.max_iters = max_iters
        self.use_ransac = use_ransac

    def estimate(self, entries, camera: CameraOracle):
        p1, p2 = _entries_to_points(entries)
        method = cv2.RANSAC if self.use_ransac else cv2.LMEDS
        h, _ = cv2.findHomography(
            p1, p2, method, self.max_error,
            maxIters=self.max_iters, confidence=self.desired_confidence,
        )
        k = camera.intrinsics().astype(np.float64)
        _, rs, ts, _ = cv2.decomposeHomographyMat(h, k)
        # lib.rs:136-146 fold: keep current only while its |t|^2 is strictly
        # smaller than the candidate's (ties go to the later solution).
        best_r, best_m = None, None
        for r, t in zip(rs, ts):
            dot = float(np.sum(np.asarray(t) ** 2))
            if best_m is None or not (best_m < dot):
                best_r, best_m = r, dot
        # lib.rs:148-152: ``Matrix3::from_iterator`` consumes the OpenCV
        # Mat's ROW-major iterator into a COLUMN-major matrix — an implicit
        # transpose — so the subsequent ``.inverse()`` cancels and the net
        # quaternion is from_matrix(R) un-inverted.
        r = quat_from_mat3(best_r)
        return _swap_axes_negated(r), np.zeros(3, F32)


# --------------------------------------------------------------------------
# Multiview estimator (multiview-estimator/src/lib.rs)
# --------------------------------------------------------------------------

class MultiviewOracle:
    """find_essential_mat_matrix + recover_pose_estimated + wraparound fix."""

    def __init__(self, desired_confidence=0.999, max_error=0.0001,
                 use_ransac=True, corrected_swap=False):
        self.desired_confidence = desired_confidence
        self.max_error = max_error
        self.use_ransac = use_ransac
        # lib.rs:133-134 swaps euler axes WITHOUT the sign flips the
        # homography/libmv estimators apply (lib.rs:152-154 there) — an
        # inconsistency in the reference that inverts the pitch/roll sense
        # of its multiview output relative to its own almeida convention.
        # corrected_swap=True applies the homography-style negated swap
        # instead (the convention the TPU estimator uses; see
        # ofps_tpu/estimators/convention.py).
        self.corrected_swap = corrected_swap

    def estimate(self, entries, camera: CameraOracle):
        p1, p2 = _entries_to_points(entries)
        k = camera.intrinsics().astype(np.float64)
        method = cv2.RANSAC if self.use_ransac else cv2.LMEDS
        e, inliers = cv2.findEssentialMat(
            p1, p2, k, method, self.desired_confidence, self.max_error
        )
        _, rot, _, _ = cv2.recoverPose(
            np.asarray(e, np.float64)[:3], p1, p2, k, mask=inliers
        )
        # Same implicit from_iterator transpose as the homography path
        # (lib.rs:128-132): transpose + inverse cancel.
        r = quat_from_mat3(rot)
        r = (_swap_axes_negated if self.corrected_swap else _swap_axes_plain)(r)
        # lib.rs:139-145 OpenCV-weirdness guard.
        if quat_angle(r) > math.pi / 2:
            w, x, y, z = (float(v) for v in r)
            if w < 0:
                w, x, y, z = -w, -x, -y, -z
            vn = math.sqrt(x * x + y * y + z * z)
            angle = 2.0 * math.atan2(vn, w)
            new_angle = (angle + math.pi) % (2 * math.pi)
            ax = np.array([x, y, z], np.float64) / max(vn, 1e-30)
            half = new_angle / 2
            r = np.array(
                [math.cos(half), *(math.sin(half) * ax)], F32
            )
        return r, np.zeros(3, F32)


# --------------------------------------------------------------------------
# Libmv estimator (libmv-estimator/src/lib.rs)
# --------------------------------------------------------------------------

def motion_from_essential_and_correspondence(e, k, x1, x2):
    """libmv multiview/fundamental.cc: decompose E into the 4 (R, t)
    candidates and choose by cheirality of the single correspondence."""
    u, _, vt = np.linalg.svd(np.asarray(e, np.float64))
    if np.linalg.det(u) < 0:
        u = -u
    if np.linalg.det(vt) < 0:
        vt = -vt
    w = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64)
    r1, r2 = u @ w @ vt, u @ w.T @ vt
    t = u[:, 2]
    kinv = np.linalg.inv(np.asarray(k, np.float64))
    h1 = kinv @ np.array([x1[0], x1[1], 1.0])
    h2 = kinv @ np.array([x2[0], x2[1], 1.0])
    for r, tt in ((r1, t), (r1, -t), (r2, t), (r2, -t)):
        # Linear triangulation in normalized cameras P1=[I|0], P2=[R|t].
        a = np.zeros((4, 4))
        p1 = np.hstack([np.eye(3), np.zeros((3, 1))])
        p2 = np.hstack([r, tt.reshape(3, 1)])
        a[0] = h1[0] * p1[2] - p1[0]
        a[1] = h1[1] * p1[2] - p1[1]
        a[2] = h2[0] * p2[2] - p2[0]
        a[3] = h2[1] * p2[2] - p2[1]
        _, _, vvt = np.linalg.svd(a)
        xh = vvt[-1]
        if abs(xh[3]) < 1e-30:
            continue
        x3d = xh[:3] / xh[3]
        d1 = x3d[2]
        d2 = (r @ x3d + tt)[2]
        if d1 > 0 and d2 > 0:
            return r, tt
    return r1, t  # no cheirality winner (degenerate); libmv returns None


def fundamental_cv(entries, max_error, confidence=0.99):
    """Robust F via OpenCV's 7-point RANSAC (the libmv
    robust_fundamental::from_correspondences_7_point equivalent)."""
    p1, p2 = _entries_to_points(entries)
    f, mask = cv2.findFundamentalMat(
        p1, p2, cv2.FM_RANSAC, max_error, confidence
    )
    if f is None:
        return None, []
    inl = np.flatnonzero(np.asarray(mask).ravel())
    return np.asarray(f, np.float64)[:3], list(inl)


def triangulate_scale(ab, bc, ac):
    """utils.rs:47-90: solve [-bc | ac | bc x ac] v = ab, return v.x (1 if
    singular)."""
    ab = np.asarray(ab, np.float64)
    bc = np.asarray(bc, np.float64)
    ac = np.asarray(ac, np.float64)
    lhs = np.stack([-bc, ac, np.cross(bc, ac)], axis=1)
    try:
        v = np.linalg.solve(lhs, ab)
    except np.linalg.LinAlgError:
        return 1.0
    if not np.all(np.isfinite(v)):
        return 1.0
    return float(v[0])


class LibmvOracle:
    """Stateful port of LibmvEstimator incl. the PrevMotion scale chain."""

    def __init__(self, outlier_proba=0.7, max_error=0.0001, algo_points=7):
        self.outlier_proba = outlier_proba
        self.max_error = max_error
        self.algo_points = algo_points
        self.prev = None  # (sorted mv list, rot quat, tr vec)

    # -- PrevMotion helpers (lib.rs:48-108) --------------------------------
    @staticmethod
    def _sorted_mv(entries):
        """BTreeMap<ey, BTreeMap<ex, entry>> — endpoint-sorted, later
        entries with identical endpoints overwrite."""
        m = {}
        for pos, mot in entries:
            ep = (float(pos[1] + mot[1]), float(pos[0] + mot[0]))
            m[ep] = (np.asarray(pos, F32), np.asarray(mot, F32))
        return [m[kk] for kk in sorted(m.keys())]

    @staticmethod
    def _find_nearest(mv, pos, rng=0.05):
        best, best_d = None, None
        for p, mo in mv:
            ey, ex = float(p[1] + mo[1]), float(p[0] + mo[0])
            if not (pos[1] - rng <= ey < pos[1] + rng):
                continue
            if not (pos[0] - rng <= ex < pos[0] + rng):
                continue
            d = abs(pos[1] - ey) + abs(pos[0] - ex)
            if best_d is None or d < best_d:
                best, best_d = (p, mo), d
        return best

    def _pose_from_fundamental(self, entries, camera):
        f, inliers = fundamental_cv(entries, self.max_error)
        if f is None or not inliers:
            return None
        k = camera.intrinsics().astype(np.float64)
        e = k.T @ f @ k  # camera.rs:184-187
        pos, mot = entries[inliers[0]]
        x1 = np.asarray(pos, np.float64)
        x2 = x1 + np.asarray(mot, np.float64)
        r, t = motion_from_essential_and_correspondence(e, k, x1, x2)
        return r, t

    def estimate(self, entries, camera: CameraOracle):
        entries = [
            (np.asarray(p, F32), np.asarray(m, F32)) for p, m in entries
        ]
        out = self._pose_from_fundamental(entries, camera)
        if out is None:
            raise RuntimeError("failed to compute fundamental matrix")
        rmat, t = out
        r = _swap_axes_negated(quat_from_mat3(rmat))
        tm = float(np.linalg.norm(t))
        if tm != 0.0:
            t = t / tm
            tm = 1.0
        t = t.astype(F32)

        if self.prev is not None:
            mv_prev, prev_rot, prev_tr = self.prev
            mv = []
            for me_pos, me_mot in entries:
                ne = self._find_nearest(mv_prev, me_pos, 0.05)
                if ne is not None:
                    mv.append((ne[0], ne[1] + me_mot))
            mv_prev = self._sorted_mv(mv)
            prev_rot = quat_mul(r, prev_rot)
            self.prev = (mv_prev, prev_rot, prev_tr)
            if tm == 0.0:
                sf = 0.0
            else:
                out2 = self._pose_from_fundamental(mv_prev, camera)
                if out2 is None:
                    raise RuntimeError("failed secondary fundamental")
                _, t13 = out2
                t23 = quat_to_mat3(prev_rot) @ t.astype(np.float64)
                sf = triangulate_scale(prev_tr, t23, t13)
                self.prev = (self._sorted_mv(entries), r, (t * sf))
        elif tm == 0.0:
            sf = 0.0
        else:
            self.prev = (self._sorted_mv(entries), r, t)
            sf = 1.0
        return r, (t * -sf).astype(F32)
