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

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


def ransac_budget(
    desired_confidence: float,
    outlier_frac: float,
    sample_size: int,
    max_hypotheses: int,
    min_hypotheses: int = 8,
) -> int:
    """Hypothesis count to reach ``desired_confidence`` (trace-time).

    The standard RANSAC iteration bound N = log(1-p) / log(1-(1-eps)^k)
    (the adaptive loop of ``homography-estimator/src/lib.rs:64-117`` /
    libmv's ``outlier_prob``, evaluated at the configured outlier prior).
    All inputs are static properties, so the budget is resolved at trace
    time and directly sizes the vmapped hypothesis batch — changing
    ``desired_confidence`` or the outlier prior changes compiled work.
    """
    p_good = max(1e-9, (1.0 - outlier_frac) ** sample_size)
    denom = math.log(max(1e-12, 1.0 - p_good))
    n = math.log(max(1e-12, 1.0 - desired_confidence)) / denom
    return int(min(max_hypotheses, max(min_hypotheses, math.ceil(n))))


def uniform_cap_weights(mask: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """Cap valid weights at ``num_samples`` *spatially uniformly*.

    Sparse flows are raster-ordered, so keeping the FIRST num_samples valid
    points would weight only the top strip of the frame.  Instead keep every
    (total/num_samples)-th valid point: the cumulative-valid-count ``c``
    crosses a stride boundary ~num_samples times, spread evenly over the
    raster order.  Pure elementwise VPU work — no gathers.
    """
    c = jnp.cumsum(mask)
    stride = jnp.maximum(c[-1] / num_samples, 1.0)
    crosses = jnp.floor(c / stride) > jnp.floor((c - 1.0) / stride)
    return mask * crosses


def dense_eval_indices(n: int, cap: int):
    """Static (eidx, we) for the eval-cap subset of an ALL-VALID point set.

    Serving feeds the estimators a densified grid whose mask is a constant
    all-ones array (``field_to_sparse``), yet the runtime subset machinery
    (cumsum + ``searchsorted``) still executes: ``searchsorted``'s binary
    search is ~log2(N) rounds of dynamic gathers that lower to the TPU
    scalar core (~1.8 us per query measured — 2048 eval queries cost more
    than the whole hypothesis sweep they feed).  With the mask statically
    known, the selection is a compile-time constant: this replays
    ``uniform_cap_weights`` + the cumulative-count compaction of
    :func:`robust_fit` in numpy **bit-identically** (same f32 stride
    arithmetic), so ``dense=True`` changes zero sampled subsets, only where
    they are computed.
    """
    import numpy as np

    c = np.arange(1, n + 1, dtype=np.float32)
    stride = np.maximum(np.float32(c[-1] / np.float32(cap)), np.float32(1.0))
    crosses = np.floor(c / stride) > np.floor((c - np.float32(1.0)) / stride)
    cw = np.cumsum(crosses.astype(np.int32))
    eidx = np.minimum(
        np.searchsorted(cw, np.arange(1, cap + 1, dtype=np.int32), side="left"),
        n - 1,
    ).astype(np.int32)
    we = np.where(
        np.arange(cap) < cw[-1], crosses[eidx].astype(np.float32), 0.0
    ).astype(np.float32)
    return jnp.asarray(eidx), jnp.asarray(we)


class RobustResult(NamedTuple):
    model: jnp.ndarray  # (3, 3)
    inliers: jnp.ndarray  # (N,) float 0/1 (subset of the input weights)
    score: jnp.ndarray  # inlier count (RANSAC) or -median error (LMedS)


def sample_indices(
    key, w: jnp.ndarray, rows: int, k: int, dense: bool = False
) -> jnp.ndarray:
    """(rows, k) random valid indices: one stable partition of the valid set
    + uniform integer draws.

    Replaces per-row Gumbel top-k — a (rows, N) sort that dominated the
    hypothesis-generation stage on TPU.

    DIVERGENCE DECISION (kept, round 4): unlike the reference's
    without-replacement draws (rand::seq sampling inside OpenCV/libmv's
    RANSAC), independent draws may repeat an index within a row (prob
    ~k^2/2m, <2% at k=8, m=2000).  A repeated point yields a degenerate
    minimal fit, which loses the score vote exactly like the reference's
    degenerate (collinear) samples do — the only cost is a slightly larger
    effective hypothesis budget, priced into ``ransac_budget``'s ceiling.
    The fixed-shape without-replacement alternatives are strictly worse on
    TPU: per-row top-k over (rows, N) is the sort this replaced, and
    strided/cyclic picks correlate sample points spatially (near-collinear
    minimal sets).

    ``dense=True`` asserts every point is valid (serving's densified-grid
    fields, whose mask is a constant all-ones): the r-th valid point IS
    index r, so the cumsum + binary-search (scalar-core gathers) drop out.
    Bit-identical draws: with m == n, ``searchsorted(cumsum(ones), r+1)``
    returns exactly r.
    """
    if dense:
        n = w.shape[-1]
        u = jax.random.uniform(key, (rows, k))
        return jnp.minimum((u * n).astype(jnp.int32), n - 1)
    m = jnp.maximum(jnp.sum(w > 0.5).astype(jnp.int32), 1)
    # Index of the r-th valid point == searchsorted(cumsum(valid), r+1):
    # identical to argsort(w < 0.5, stable)[r] (valid entries keep raster
    # order) at log(N) gathers instead of a full bitonic sort over N —
    # the sampler was ~400 us of the almeida stage at serving grid sizes.
    c = jnp.cumsum((w > 0.5).astype(jnp.int32))
    u = jax.random.uniform(key, (rows, k))
    r = jnp.minimum((u * m).astype(jnp.int32), m - 1)
    return jnp.searchsorted(c, r + 1, side="left").astype(jnp.int32)


def _masked_median(err: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Median over valid entries; rows with no valid entries give 1e30.

    Bitwise radix-select instead of ``jnp.sort``: non-negative f32 bit
    patterns order like their values, so the k-th order statistic is built
    MSB-first in 31 fixed iterations of (compare + masked popcount) — pure
    VPU work that replaces the (H, S) bitonic sort (~log^2 S lane-shuffle
    passes) the per-hypothesis LMedS/adaptive-threshold medians were
    spending most of their time in.  Exact: returns the same element the
    sort-based selection picked (NaNs order above +inf, as jnp.sort).
    """
    valid = w > 0.5
    nvalid = jnp.sum(valid).astype(jnp.int32)
    k = jnp.maximum(nvalid - 1, 0) // 2  # 0-based rank of the median
    u = jax.lax.bitcast_convert_type(
        jnp.maximum(err.astype(jnp.float32), 0.0), jnp.uint32
    )

    def bit_step(i, p):
        b = jnp.uint32(1) << (30 - i).astype(jnp.uint32)
        t = p | b
        # entries strictly below the candidate prefix (lower bits zero).
        cnt = jnp.sum((u < t[..., None]) & valid, axis=-1)
        # If fewer than k+1 entries sit below t, the median has this bit.
        return jnp.where(cnt < k + 1, t, p)

    p = jax.lax.fori_loop(
        0, 31, bit_step, jnp.zeros(err.shape[:-1], jnp.uint32)
    )
    med = jax.lax.bitcast_convert_type(p, jnp.float32)
    return jnp.where(nvalid > 0, med, jnp.float32(1e30))


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
    eval_cap: int = 0,
    adaptive_threshold: bool = False,
    refit_fn: Callable | None = None,
    lo_iters: int = 2,
    refit_weight: str = "binary",
    prescore_cap: int = 0,
    finalists: int = 32,
    dense: bool = False,
) -> RobustResult:
    """``eval_cap > 0`` scores hypotheses on a spatially uniform subset of
    at most that many valid points (gathered once — H x cap work instead of
    H x N), then recomputes the winner's inlier set over ALL points.  The
    reference bounds its CPU cost the same way with random 1000-point
    subsets (almeida lib.rs:226-232); a deterministic uniform subset is
    unbiased and gather-free per hypothesis.

    ``prescore_cap > 0`` adds PROGRESSIVE evaluation on top: every candidate
    model is first scored on a strided ``prescore_cap``-point subsample of
    the eval subset, only the ``finalists`` best pre-scores are re-scored on
    the full eval subset, and the winner comes from that final round.  The
    hypothesis-scoring stage is the multiview estimator's dominant cost
    (XLA cost analysis: 650 of 989 MFLOP and 901 MB of 1.6 GB accessed per
    frame go to the (6104 models x 2048 pts) Sampson sweep); a 128-point
    pre-score cuts it ~16x while a 32-finalist full round keeps the
    selection exact for any model whose subset score lands in the top 32 —
    on real consensus distributions the true winner's margin is far larger
    than subset noise.  PROSAC/preemptive-RANSAC make the same trade on a
    per-iteration schedule; a single two-round split is the batched (SPMD)
    shape of that idea.

    ``adaptive_threshold`` (RANSAC mode): raise the scoring/inlier cut to the
    LMedS robust-sigma cut (OpenCV's 2.5-sigma rule on the best hypothesis's
    median error) whenever that exceeds ``threshold``.  The configured
    threshold assumes pixel-accurate correspondences (the reference's OpenCV
    defaults); codec motion vectors are quarter-pel on 16-px macroblocks, so
    their noise floor sits well above it and consensus counting degenerates
    into coin flips among garbage models.  On data whose noise is below the
    configured threshold the sigma cut is smaller and NOTHING changes — the
    reference behavior is preserved exactly where it worked.

    ``refit_fn(x1, x2, w) -> model``: optional least-squares refit over a
    weighted point set; when given, the winner is locally optimized
    (LO-RANSAC): ``lo_iters`` rounds of refit-on-inliers -> re-cut, keeping
    each refit only if it does not shrink the inlier set.  The final refit
    model (not just the minimal-sample model) is returned.

    ``dense=True`` asserts ``w`` is statically all-valid (serving's
    densified-grid fields): the minimal-sample draws and the eval-cap
    subset become compile-time constants (:func:`dense_eval_indices`) with
    bit-identical selections, dropping the cumsum + searchsorted binary
    searches whose dynamic gathers serialize on the TPU scalar core.
    """
    n = x1.shape[0]
    idx = sample_indices(
        key, w, num_hypotheses, sample_size, dense=dense
    )  # (H, k)

    def fit_one(i):
        return minimal_fit(x1[i], x2[i], w[i])

    models, valid = jax.vmap(fit_one)(idx)  # (H, M, 3, 3), (H, M)
    hm = models.shape[0] * models.shape[1]
    models = models.reshape(hm, 3, 3)
    valid = valid.reshape(hm)

    if eval_cap and eval_cap < n and dense:
        eidx, we = dense_eval_indices(n, eval_cap)
        x1e, x2e = x1[eidx], x2[eidx]
    elif eval_cap and eval_cap < n:
        wc = uniform_cap_weights(w, eval_cap)
        # Compact the selected entries (raster order) to the front via
        # searchsorted on their cumulative count — the same (eval_cap,)
        # subset the previous rank-sort top_k produced, at log(N) gathers
        # instead of a full top_k sort over N.
        cw = jnp.cumsum((wc > 0.5).astype(jnp.int32))
        eidx = jnp.minimum(
            jnp.searchsorted(
                cw, jnp.arange(1, eval_cap + 1, dtype=jnp.int32), side="left"
            ),
            n - 1,
        ).astype(jnp.int32)
        # Past-the-end queries clamp to the last index; zero their weight.
        we = jnp.where(jnp.arange(eval_cap) < cw[-1], wc[eidx], 0.0)
        x1e, x2e = x1[eidx], x2[eidx]
    else:
        x1e, x2e, we = x1, x2, w

    # ``threshold`` may be a traced scalar (runtime-mutable max_error).
    thr2 = jnp.square(jnp.asarray(threshold, jnp.float32))
    nvalid = jnp.maximum(jnp.sum(we), sample_size + 1.0)
    sigma_k = 2.5 * 1.4826 * (1.0 + 5.0 / (nvalid - sample_size))
    adaptive_pending = adaptive_threshold

    if prescore_cap and finalists < hm and prescore_cap < x1e.shape[0]:
        # Progressive round 1: strided subsample of the (already spatially
        # uniform, raster-ordered) eval subset stays spatially uniform.
        stride = x1e.shape[0] // prescore_cap
        pidx = jnp.arange(prescore_cap, dtype=jnp.int32) * stride
        x1p, x2p, wp = x1e[pidx], x2e[pidx], we[pidx]
        errs_p = error_fn(models, x1p, x2p)  # (HM, P)
        if use_lmeds:
            pre = -jnp.where(
                valid, _masked_median(errs_p, wp), jnp.float32(1e30)
            )
        else:
            if adaptive_threshold:
                # The noise-floor estimate moves to the pre-subset: the
                # LMedS statistic is a distribution median, for which a
                # 128-point spatially uniform sample is an unbiased
                # estimator — and it must be computed over ALL hypotheses
                # anyway (it is a min over them), so it cannot wait for
                # the finalist round.
                med_p = _masked_median(errs_p, wp)
                med_best = jnp.min(
                    jnp.where(valid, med_p, jnp.float32(1e30))
                )
                thr2 = jnp.maximum(
                    thr2, jnp.square(sigma_k) * jnp.maximum(med_best, 0.0)
                )
                adaptive_pending = False
            pre = jnp.where(
                valid,
                jnp.sum((errs_p <= thr2) & (wp > 0.5)[None, :], axis=-1),
                -1,
            ).astype(jnp.float32)
        _, fidx = jax.lax.top_k(pre, finalists)
        models = models[fidx]
        valid = valid[fidx]

    errs = error_fn(models, x1e, x2e)  # (HM or finalists, S)

    if use_lmeds:
        med = _masked_median(errs, we)  # (HM,)
        score = -jnp.where(valid, med, jnp.float32(1e30))
        best = jnp.argmax(score)
        # OpenCV LMedS inlier cut: 2.5 * robust sigma from the median.
        sigma = sigma_k * jnp.sqrt(jnp.maximum(-score[best], 0.0))
        cut = jnp.maximum(sigma * sigma, thr2)
        best_err = error_fn(models[best][None], x1, x2)[0]  # (N,)
        inliers = (best_err <= cut) & (w > 0.5)
        final_score = score[best]
    else:
        if adaptive_pending:
            # Noise floor from the data itself: the minimum (over valid
            # hypotheses) median error is the LMedS statistic; its 2.5-sigma
            # cut bounds the inlier band an accurate model needs.
            med = _masked_median(errs, we)  # (HM,)
            med_best = jnp.min(
                jnp.where(valid, med, jnp.float32(1e30))
            )
            cut_lmeds = jnp.square(sigma_k) * jnp.maximum(med_best, 0.0)
            thr2 = jnp.maximum(thr2, cut_lmeds)
        ok = (errs <= thr2) & (we > 0.5)[None, :]
        counts = jnp.sum(ok, axis=-1)
        score = jnp.where(valid, counts, -1)
        best = jnp.argmax(score)
        cut = thr2
        best_err = error_fn(models[best][None], x1, x2)[0]  # (N,)
        inliers = (best_err <= thr2) & (w > 0.5)
        final_score = jnp.sum(inliers)

    model = models[best]
    if refit_fn is not None:
        # LO-RANSAC: a least-squares refit over all inliers escapes the
        # minimal-sample noise (the reference's OpenCV RANSAC ends with the
        # same refit inside findHomography/findEssentialMat; libmv's 7-point
        # path lacks it — one source of its av-column error).
        #
        # Acceptance requires the refit to (a) keep the inlier set from
        # shrinking AND (b) strictly reduce the error over the current
        # inlier set.  (b) is what keeps DEGENERATE-data behavior backend-
        # stable: on an exact pure-rotation field the fundamental has a
        # 3-dim solution family and EVERY member fits the inliers at ~0
        # error, so an unconditional refit replaces the minimal-sample
        # model with an arbitrary family member whose downstream twisted-
        # pair/cheirality resolution flips with f32 noise — measured as
        # gt-mv libmv-7pt 0.0016 deg on CPU vs 0.4765 on TPU.  With the
        # strict-improvement rule the refit is a no-op at the degenerate
        # floor and still accepted on genuinely noisy (codec-MV) data.
        # ``refit_weight="cauchy"`` runs the refit LSQ with IRLS Cauchy
        # weights cut/(cut + err) instead of the binary inlier mask: points
        # near the (noise-adaptive) cut contribute less than confident ones,
        # which matters exactly where the cut is wide — quarter-pel codec
        # MVs under the adaptive threshold.  Acceptance stays binary (same
        # inlier-set + strict-improvement rule), so degenerate-data behavior
        # is unchanged (the refit is still a no-op at the exact-data floor).
        inl = inliers.astype(jnp.float32)
        err_pt = best_err  # current model's per-point error (weights source)
        err_cur = jnp.sum(best_err * inl)
        cutw = jnp.maximum(cut, 1e-30)
        for _ in range(max(1, lo_iters)):
            if refit_weight == "cauchy":
                wfit = inl * (cutw / (cutw + err_pt))
            else:
                wfit = inl
            m2 = refit_fn(x1, x2, wfit)
            err2 = error_fn(m2[None], x1, x2)[0]
            inl2 = ((err2 <= cut) & (w > 0.5)).astype(jnp.float32)
            err_new = jnp.sum(err2 * inl)  # same set -> comparable sums
            good = (
                (jnp.sum(inl2) >= jnp.sum(inl))
                & (err_new < err_cur)
                & jnp.all(jnp.isfinite(m2))
            )
            model = jnp.where(good, m2, model)
            err_cur = jnp.where(good, jnp.sum(err2 * inl2), err_cur)
            err_pt = jnp.where(good, err2, err_pt)
            inl = jnp.where(good, inl2, inl)
        inliers = inl > 0.5
        final_score = jnp.where(
            use_lmeds, final_score, jnp.sum(inliers)
        )

    return RobustResult(
        model=model,
        inliers=inliers.astype(jnp.float32),
        score=final_score.astype(jnp.float32),
    )
