"""Generic batched robust model fitting (RANSAC / LMedS).

Replaces the sequential hypothesis loops inside OpenCV/libmv that back the
reference's homography, essential and fundamental estimators
(``homography-estimator/src/lib.rs:105-117``,
``multiview-estimator/src/lib.rs:95-109``, libmv's robust fundamental).

TPU-first: hypotheses are a vmapped batch — minimal-sample gathers, fits,
per-hypothesis error evaluation over all points, and scoring all run as one
fused XLA program; data-dependent inlier sets come back as fixed-shape 0/1
weights for a final weighted refit.

``minimal_fit(x1s, x2s, ws) -> (models (M, 3, 3), valid (M,))`` may return
multiple candidate models per sample (the 7-point fundamental returns 3).
``error_fn(models, x1, x2) -> (..., N)`` must broadcast over model batches.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class RobustResult(NamedTuple):
    model: jnp.ndarray  # (3, 3)
    inliers: jnp.ndarray  # (N,) float 0/1 (subset of the input weights)
    score: jnp.ndarray  # inlier count (RANSAC) or -median error (LMedS)


def sample_indices(key, w: jnp.ndarray, rows: int, k: int) -> jnp.ndarray:
    """(rows, k) indices of valid entries, without replacement per row."""
    n = w.shape[0]
    u = jax.random.uniform(key, (rows, n))
    _, idx = jax.lax.top_k(u + (w - 1.0) * 1e9, k)
    return idx


def _masked_median(err: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Median over valid entries; +inf rows (no valid) give +inf."""
    big = jnp.float32(1e30)
    masked = jnp.where(w > 0.5, err, big)
    srt = jnp.sort(masked, axis=-1)
    nvalid = jnp.sum(w > 0.5).astype(jnp.int32)
    mid = jnp.maximum(nvalid - 1, 0) // 2
    return jnp.take_along_axis(
        srt, jnp.broadcast_to(mid, srt.shape[:-1])[..., None], axis=-1
    )[..., 0]


def robust_fit(
    key,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    w: jnp.ndarray,
    *,
    minimal_fit: Callable,
    sample_size: int,
    error_fn: Callable,
    num_hypotheses: int,
    threshold: float,
    use_lmeds: bool = False,
) -> RobustResult:
    n = x1.shape[0]
    idx = sample_indices(key, w, num_hypotheses, sample_size)  # (H, k)

    def fit_one(i):
        return minimal_fit(x1[i], x2[i], w[i])

    models, valid = jax.vmap(fit_one)(idx)  # (H, M, 3, 3), (H, M)
    hm = models.shape[0] * models.shape[1]
    models = models.reshape(hm, 3, 3)
    valid = valid.reshape(hm)

    errs = error_fn(models, x1, x2)  # (HM, N)
    thr2 = jnp.float32(threshold * threshold)

    if use_lmeds:
        med = _masked_median(errs, w)  # (HM,)
        score = -jnp.where(valid, med, jnp.float32(1e30))
        best = jnp.argmax(score)
        best_err = errs[best]
        # OpenCV LMedS inlier cut: 2.5 * robust sigma from the median.
        nvalid = jnp.maximum(jnp.sum(w), sample_size + 1.0)
        sigma = 2.5 * 1.4826 * (1.0 + 5.0 / (nvalid - sample_size)) * jnp.sqrt(
            jnp.maximum(-score[best], 0.0)
        )
        cut = jnp.maximum(sigma * sigma, thr2)
        inliers = (best_err <= cut) & (w > 0.5)
    else:
        ok = (errs <= thr2) & (w > 0.5)[None, :]
        counts = jnp.sum(ok, axis=-1)
        score = jnp.where(valid, counts, -1)
        best = jnp.argmax(score)
        inliers = ok[best]

    return RobustResult(
        model=models[best],
        inliers=inliers.astype(jnp.float32),
        score=score[best].astype(jnp.float32),
    )
