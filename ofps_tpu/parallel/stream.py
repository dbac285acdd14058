"""Multi-stream batched per-frame pipeline (the TPU "training step").

The reference processes ONE video at a time: a decoder thread feeds a worker
that runs every estimator on the frame's motion vectors and a detector on the
same field (ofps-suite/src/app/tracking/worker.rs:305-401, detection.rs:92-168).

The TPU-native equivalent batches B streams into one jitted step:

    frames (B, H, W) ──► dense flow (Pallas/XLA pyramid) ─┐
    or codec MVs (B, N, 2) ───────────────────────────────┤
                                                          ▼
      grid densify (MXU scatter-matmul) ► SparseFlow (B, G, 2)
         ├─► every estimator (vmapped RANSAC/LSQ solves) ► pose integration
         └─► block-motion detector (vmapped)

Rotation/translation state, estimator carry (e.g. libmv's PrevMotion chain),
and the dense-flow warm start all thread explicitly through
:class:`StreamState`, so the step composes with ``lax.scan`` over time and
with ``jax.sharding`` over the stream/space mesh axes
(:mod:`ofps_tpu.parallel.sharding`).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ofps_tpu.core import quat
from ofps_tpu.core.camera import StandardCamera
from ofps_tpu.core.motion import (
    SparseFlow,
    field_to_sparse,
    grid_downsample_field,
    grid_downsample_uv,
    grid_size_for,
)
from ofps_tpu.detectors.base import DetectionResult, DetectorInstance
from ofps_tpu.estimators.base import EstimatorInstance
from ofps_tpu.ops.flow_pyramid import (
    FlowParams,
    FrameCache,
    _replicate_border_uv,
    border_margin_px,
    dense_flow_warm,
    effective_levels,
    frame_cache,
)
from ofps_tpu.parallel.sharding import StreamSharding, constrain


class StreamState(NamedTuple):
    """Per-stream carried state for a batch of B streams."""

    # Previous-frame cache (ops.flow_pyramid.FrameCache): the pyramid plus
    # the fused kernel's padded bf16 planes.  ``prev_cache.pyr[0]`` IS the
    # previous grayscale frame; the rest are pure functions of it, carried
    # so each frame's preprocessing (pyramid build + pad passes, ~0.25 ms
    # of HBM traffic at 1080p) happens once — when it arrives as the NEW
    # frame — instead of being recomputed as the next step's i1 side.
    prev_cache: Any
    # Dense-flow warm start: the refined HALF-resolution (u, v) planes from
    # the previous frame (OPTFLOW_USE_INITIAL_FLOW semantics at 1/8 the
    # carry bytes of full-res packed flow; the coarsest pyramid level sees
    # the same information either way).
    warm_uv: Tuple[jnp.ndarray, jnp.ndarray]
    has_prev: jnp.ndarray  # (B,) 1.0 once a previous frame exists
    rot: Tuple[jnp.ndarray, ...]  # per estimator: (B, 4) integrated rotation
    pos: Tuple[jnp.ndarray, ...]  # per estimator: (B, 3) integrated position
    est: Tuple[Any, ...]  # per estimator: batched carry pytree


class StreamOutputs(NamedTuple):
    """Per-frame outputs of one batched step."""

    flow: jnp.ndarray  # (B, H, W, 2) dense flow in pixels
    grid: jnp.ndarray  # (B, gh, gw, 2) densified normalized field
    rot: Tuple[jnp.ndarray, ...]  # per estimator: (B, 4) integrated rotation
    pos: Tuple[jnp.ndarray, ...]  # per estimator: (B, 3) integrated position
    delta_rot: Tuple[jnp.ndarray, ...]  # per estimator: (B, 4) this frame
    delta_tr: Tuple[jnp.ndarray, ...]  # per estimator: (B, 3) this frame
    detection: Optional[DetectionResult]  # batched over B, or None


def _broadcast_state(tree, batch: int):
    """Tile an unbatched estimator init() pytree to a leading B axis."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (batch,) + jnp.shape(x)),
        tree,
    )


class StreamPipeline:
    """A configured batched pipeline over B streams of (H, W) video.

    ``estimators`` mirror the suite's run-all-estimators-per-frame fan-out
    (rayon ``par_bridge`` in the reference) as one fused XLA program; the
    optional ``detector`` mirrors the detection app.
    """

    def __init__(
        self,
        camera: StandardCamera,
        estimators: Sequence[EstimatorInstance] = (),
        detector: Optional[DetectorInstance] = None,
        flow_params: FlowParams = FlowParams(),
        grid_wh: Optional[Tuple[int, int]] = None,
        shardings: Optional[StreamSharding] = None,
        emit_dense_flow: bool = True,
    ):
        # emit_dense_flow=False skips materializing the packed (B, H, W, 2)
        # f32 field in StreamOutputs.flow (the estimators/detector only need
        # the densified grid) — the full-rate serving configuration.
        self.emit_dense_flow = emit_dense_flow
        self.camera = camera
        self.estimators = tuple(estimators)
        self.detector = detector
        self.grid_wh = grid_wh
        self.shard = shardings or StreamSharding()
        # ``pallas_call`` has no SPMD partitioning rule over the width axis,
        # so under a spatially-sharded mesh the dense flow runs through the
        # shard_map + column-halo-exchange wrapper
        # (:func:`ofps_tpu.parallel.spatial.dense_flow_warm_spatial`), which
        # keeps the fused kernels intact per shard.  Set ``fused=False``
        # explicitly to instead run the XLA path under plain GSPMD (XLA
        # inserts exact halo collectives; slower, but bit-identical to the
        # unsharded XLA path).
        self.flow_params = flow_params

    def _spatially_sharded(self) -> bool:
        for sh in (self.shard.image, self.shard.flow):
            spec = getattr(sh, "spec", None)
            if spec is not None and any(ax is not None for ax in spec[1:]):
                return True
        return False

    def _space_mesh(self):
        """(mesh, stream_axis, space_axis) when width is sharded, else None.

        Reads them off the image NamedSharding: spec (stream?, None, space).
        """
        sh = self.shard.image
        spec = getattr(sh, "spec", None)
        if spec is None or len(spec) < 3 or spec[2] is None:
            return None
        if self.flow_params.fused is False:
            return None  # explicit XLA-path request: plain GSPMD
        stream_ax = spec[0] if len(spec) > 0 else None
        return sh.mesh, stream_ax, spec[2]

    def _grid_plan(self, h: int, w: int):
        """Static in-kernel-densify plan for the serving path, or None.

        Only the no-dense-emit, unsharded, fused-L0 configuration qualifies:
        the plan makes the finest Pallas level emit the (gh, gw) scatter-mean
        sums directly (skipping the ~16 MB/frame full-res store + re-read at
        1080p); every other configuration keeps the store-then-densify path.
        """
        if self.emit_dense_flow or self._spatially_sharded():
            return None
        import os

        if os.environ.get("OFPS_TPU_NO_GRID_FUSE"):
            # Kill switch: fall back to store-then-densify (debugging aid —
            # the fused emission is gated in tests/test_grid_fused.py, but
            # an on-chip Mosaic regression must not take serving down).
            return None
        cached = getattr(self, "_grid_plans", None)
        if cached is None:
            cached = self._grid_plans = {}
        if (h, w) not in cached:
            p = self.flow_params
            on_tpu = (
                p.fused if p.fused is not None
                else jax.default_backend() == "tpu"
            )
            plan = None
            if (
                on_tpu
                and h * w >= p.fuse_min_pixels
                and effective_levels(p, h, w) > 1
            ):
                from ofps_tpu.pallas.flow_refine import build_grid_plan

                gw, gh = self.grid_wh or grid_size_for(w, h)
                plan = build_grid_plan(
                    h, w, gh, gw,
                    border_px=border_margin_px(p, h, w),
                    coarse_flow=True,
                )
            cached[(h, w)] = plan
        return cached[(h, w)]

    # -- state ---------------------------------------------------------------

    def _make_cache(self, gray: jnp.ndarray):
        """FrameCache of ``gray`` for the state carry.

        The spatially-sharded path runs its own per-shard halo-exchanged
        pipeline (parallel/spatial.py) and only needs the raw frame, so it
        carries a pads-free single-level cache.
        """
        if self._spatially_sharded():
            return FrameCache(pyr=(gray,), pads=())
        return frame_cache(gray, self.flow_params)

    def state_with_frame(self, state: StreamState, gray: jnp.ndarray):
        """State as if ``gray`` were the last processed frame (priming)."""
        return state._replace(
            prev_cache=self._make_cache(gray),
            has_prev=jnp.ones_like(state.has_prev),
        )

    def init_state(self, batch: int, height: int, width: int) -> StreamState:
        e = len(self.estimators)
        if effective_levels(self.flow_params, height, width) > 1:
            wh, ww = (height + 1) // 2, (width + 1) // 2
        else:
            wh, ww = height, width  # single-level pyramid: warm is full res
        return StreamState(
            prev_cache=self._make_cache(
                jnp.zeros((batch, height, width), jnp.float32)
            ),
            warm_uv=(
                jnp.zeros((batch, wh, ww), jnp.float32),
                jnp.zeros((batch, wh, ww), jnp.float32),
            ),
            has_prev=jnp.zeros((batch,), jnp.float32),
            rot=tuple(
                jnp.broadcast_to(quat.identity(), (batch, 4)) for _ in range(e)
            ),
            pos=tuple(jnp.zeros((batch, 3), jnp.float32) for _ in range(e)),
            est=tuple(
                _broadcast_state(est.init(), batch) for est in self.estimators
            ),
        )

    # -- runtime-mutable properties ------------------------------------------

    def dyn_props(self):
        """Default dynamic-property pytree for this pipeline.

        A ``{"estimators": (dict, ...), "detector": dict}`` pytree of jnp
        scalars (continuous-valued plugin properties).  Pass a (possibly
        mutated) copy to the step functions: the values are TRACED, so
        changing one between frames takes effect immediately with no re-jit
        — the reference's push-properties-into-a-running-plugin semantics
        (app/utils/properties.rs:5-18, tracking/worker.rs:183).
        """
        return {
            "estimators": tuple(
                est.dyn_defaults() for est in self.estimators
            ),
            "detector": (
                self.detector.dyn_defaults()
                if self.detector is not None
                else {}
            ),
        }

    # -- consumers (estimators + detector) on a sparse flow batch ------------

    def _consume(
        self, state: StreamState, sparse: SparseFlow, key: jnp.ndarray,
        props=None, grid=None,
    ):
        """Estimators + detector on a sparse flow batch.

        ``grid``: the (B, gh, gw, 2) dense field ``sparse`` was built from,
        when the caller has it — lets detectors with a ``detect_field`` fast
        path skip the per-entry scatter (static-lattice densify), and tells
        the estimators the mask is statically all-valid (``dense=True``), so
        their RANSAC sample draws and eval subsets resolve at compile time
        (bit-identical selections; see ops.robust.dense_eval_indices)."""
        dense = grid is not None
        batch = sparse.mask.shape[0]
        rots, poss, dr, dt, est_states = [], [], [], [], []
        keys = jax.random.split(key, max(len(self.estimators), 1) * batch)
        for i, est in enumerate(self.estimators):
            ekeys = keys[i * batch : (i + 1) * batch]
            eprops = props["estimators"][i] if props is not None else None

            def one(st, fl, k, r0, p0, _est=est, _props=eprops):
                r, t, st2 = _est.estimate(
                    st, fl, self.camera, k, props=_props, dense=dense
                )
                # motion_step integration (estimator.rs:38-53).
                p1 = p0 + quat.rotate_vec(r0, t)
                r1 = quat.mul(r, r0)
                return r1, p1, st2, r, t

            r1, p1, st2, r, t = jax.vmap(one)(
                state.est[i], sparse, ekeys, state.rot[i], state.pos[i]
            )
            rots.append(constrain(r1, self.shard.batch))
            poss.append(constrain(p1, self.shard.batch))
            dr.append(r)
            dt.append(t)
            est_states.append(st2)

        detection = None
        if self.detector is not None:
            dprops = props["detector"] if props is not None else None
            if grid is not None and self.detector.detect_field is not None:
                detection = jax.vmap(
                    lambda f: self.detector.detect_field(f, props=dprops)
                )(grid)
            else:
                detection = jax.vmap(
                    lambda fl: self.detector.detect(fl, props=dprops)
                )(sparse)
        return tuple(rots), tuple(poss), tuple(dr), tuple(dt), tuple(
            est_states
        ), detection

    # -- step variants -------------------------------------------------------

    def step_from_frames(
        self, state: StreamState, gray: jnp.ndarray, key: jnp.ndarray,
        props=None,
    ) -> Tuple[StreamState, StreamOutputs]:
        """Full step from raw frames: dense flow on-device, then consumers.

        ``gray``: (B, H, W) float32.  The first frame per stream (when
        ``has_prev`` is 0) produces a zero flow field, hence identity pose
        deltas — matching the reference's warm-up frame.
        """
        gray = constrain(gray, self.shard.image)
        h, w = gray.shape[-2], gray.shape[-1]
        space = self._space_mesh()
        if space is not None:
            # Width-sharded mesh: fused kernels per shard via shard_map +
            # halo exchange (see parallel/spatial.py).
            from ofps_tpu.parallel.spatial import dense_flow_warm_spatial

            mesh, stream_ax, space_ax = space
            (u, v), warm = dense_flow_warm_spatial(
                state.prev_cache.pyr[0], gray, self.flow_params,
                state.warm_uv, mesh, stream_axis=stream_ax,
                space_axis=space_ax,
            )
            new_cache = self._make_cache(gray)
        elif self._spatially_sharded():
            # Width-sharded but explicitly fused=False (plain GSPMD XLA
            # path): the state carries the raw-frame-only cache.
            (u, v), warm = dense_flow_warm(
                state.prev_cache.pyr[0], gray, self.flow_params,
                warm=state.warm_uv,
            )
            new_cache = self._make_cache(gray)
        else:
            grid_plan = self._grid_plan(h, w)
            (u, v), warm, new_cache = dense_flow_warm(
                state.prev_cache.pyr[0], gray, self.flow_params,
                warm=state.warm_uv, prev_cache=state.prev_cache,
                want_cache=True, grid_plan=grid_plan,
            )
        new_cache = jax.tree_util.tree_map(
            lambda x: constrain(x, self.shard.image), new_cache
        )
        gw, gh = self.grid_wh or grid_size_for(w, h)
        hp = state.has_prev[:, None, None]
        u = u * hp.astype(u.dtype)
        v = v * hp.astype(v.dtype)
        fused_grid = (
            not self.emit_dense_flow
            and u.shape[-2:] == (gh, gw)
            and u.shape[-2:] != (h, w)
        )
        if not fused_grid:
            u = constrain(u, self.shard.image)
            v = constrain(v, self.shard.image)
        # Warm carry stays f32 in the state (the fused TPU path emits bf16,
        # the XLA path f32 — scan carries need one stable dtype) and is
        # zeroed until a real previous frame exists.
        warm = tuple(
            constrain(
                x.astype(jnp.float32) * hp, self.shard.image
            )
            for x in warm
        )

        if fused_grid:
            # The kernel emitted the densify SUMS (in-kernel scatter-matmul,
            # pallas/flow_refine.py emit()): finish the mean + normalized
            # units + border-cell replicate at grid resolution — identical
            # semantics to grid_downsample_uv (shared grid_scatter_plan_np).
            plan = self._grid_plan(h, w)
            counts = jnp.asarray(plan["counts"])
            grid = jnp.stack(
                [u / (counts * w), v / (counts * h)], axis=-1
            )
            if plan["idx_y"] is not None:
                grid = jnp.take(grid, jnp.asarray(plan["idx_y"]), axis=-3)
                grid = jnp.take(grid, jnp.asarray(plan["idx_x"]), axis=-2)
        else:
            # Exclude the invalid edge band at grid resolution (~free)
            # instead of a full-res replicate pass on the hot path.
            grid = grid_downsample_uv(
                u, v, gw, gh, norm_wh=(w, h),
                border_px=border_margin_px(self.flow_params, h, w),
            )
        grid = constrain(grid, self.shard.batch)
        sparse = jax.vmap(field_to_sparse)(grid)

        rot, pos, dr, dt, est, detection = self._consume(
            state, sparse, key, props=props, grid=grid
        )
        new_state = StreamState(
            prev_cache=new_cache,
            warm_uv=warm,
            has_prev=jnp.ones_like(state.has_prev),
            rot=rot,
            pos=pos,
            est=est,
        )
        if self.emit_dense_flow:
            ur, vr = _replicate_border_uv(
                u.astype(jnp.float32), v.astype(jnp.float32),
                border_margin_px(self.flow_params, h, w),
            )
            flow_px = jnp.stack([ur, vr], axis=-1)
            flow_px = constrain(flow_px, self.shard.flow)
        else:
            flow_px = jnp.zeros((gray.shape[0], 0, 0, 2), jnp.float32)
        outputs = StreamOutputs(
            flow=flow_px,
            grid=grid,
            rot=rot,
            pos=pos,
            delta_rot=dr,
            delta_tr=dt,
            detection=detection,
        )
        return new_state, outputs

    def step_from_flow(
        self, state: StreamState, sparse: SparseFlow, key: jnp.ndarray,
        props=None,
    ) -> Tuple[StreamState, StreamOutputs]:
        """Step from decoder-provided motion vectors (codec-MV / .mvec path).

        ``sparse``: batched SparseFlow with leading (B, N) arrays.
        """
        sparse = SparseFlow(
            constrain(sparse.pos, self.shard.batch),
            constrain(sparse.motion, self.shard.batch),
            constrain(sparse.mask, self.shard.batch),
        )
        rot, pos, dr, dt, est, detection = self._consume(
            state, sparse, key, props=props
        )
        new_state = state._replace(rot=rot, pos=pos, est=est)
        b = sparse.mask.shape[0]
        empty = jnp.zeros((b, 0, 0, 2), jnp.float32)
        outputs = StreamOutputs(
            flow=empty,
            grid=empty,
            rot=rot,
            pos=pos,
            delta_rot=dr,
            delta_tr=dt,
            detection=detection,
        )
        return new_state, outputs

    # -- time scan -----------------------------------------------------------

    def scan_frames(
        self, state: StreamState, grays: jnp.ndarray, key: jnp.ndarray
    ) -> Tuple[StreamState, StreamOutputs]:
        """Process (T, B, H, W) frames with ``lax.scan`` over time.

        Per-stream time stays sequential (estimators are stateful across
        frames, SURVEY.md §5); parallelism comes from the B and spatial axes.
        """
        t = grays.shape[0]
        keys = jax.random.split(key, t)

        def body(st, xt):
            g, k = xt
            st, out = self.step_from_frames(st, g, k)
            return st, out

        return jax.lax.scan(body, state, (grays, keys))

    def scan_flow(
        self, state: StreamState, sparse_seq: SparseFlow, key: jnp.ndarray
    ) -> Tuple[StreamState, StreamOutputs]:
        """Process a (T, B, N) SparseFlow sequence with ``lax.scan``."""
        t = sparse_seq.mask.shape[0]
        keys = jax.random.split(key, t)

        def body(st, xt):
            fl, k = xt
            st, out = self.step_from_flow(st, fl, k)
            return st, out

        return jax.lax.scan(body, state, (sparse_seq, keys))
