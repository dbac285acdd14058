"""Dense-optical-flow decoder ("cv"): on-device flow from decoded frames.

Behavioral spec: ``/root/reference/cv-decoder/src/lib.rs`` — decode video
frames, compute dense optical flow (OpenCV Farneback/RLOF there), mask
low-contrast regions (Sobel -> threshold 20 -> ellipse-dilate,
lib.rs:204-237), and downsample-densify the flow into a <=150x150 grid
preserving aspect (lib.rs:98-121, 246-291).

TPU-native redesign: frames decode on the host (native libav path), while
the flow itself is the on-device coarse-to-fine pyramid kernel
(:mod:`ofps_tpu.ops.flow_pyramid` — the Pallas fused path on TPU), with a
warm start from the previous field (OPTFLOW_USE_INITIAL_FLOW parity).  The
contrast mask weights the grid densification, so low-texture cells carry no
vectors, like the reference's masked scatter.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ofps_tpu.decoders.av import AvDecoder
from ofps_tpu.decoders.base import DecodedFrame, register


@register("cv")
class CvDecoder:
    """Decoder computing dense flow on-device from any libav video source.

    Properties parity with cv-decoder (grid size cap, contrast mask toggle,
    ``use_rlof`` algorithm switch, lib.rs:45,169-186): ``use_rlof=False``
    runs the SAD block-matching pyramid (the Farneback slot),
    ``use_rlof=True`` runs the robust dense-LK flow
    (:mod:`ofps_tpu.ops.flow_lk`, the RLOF slot).
    """

    def __init__(
        self,
        input_path: str,
        grid_max_dim: int = 150,
        use_contrast_mask: bool = True,
        levels: int = 5,
        mask_threshold: float = 20.0,
        mask_dilate: int = 2,
        use_rlof: bool = False,
    ):
        self._use_rlof = use_rlof
        self._av = AvDecoder(input_path)
        self._grid_max_dim = grid_max_dim
        self._use_mask = use_contrast_mask
        self._levels = levels
        self._mask_threshold = mask_threshold
        self._mask_dilate = mask_dilate
        self._prev_gray = None
        self._prev_flow = None
        self._fn = None
        self._grid_wh: Optional[Tuple[int, int]] = None
        self._grid_pos: Optional[np.ndarray] = None

    def _build(self, h: int, w: int):
        import jax
        import jax.numpy as jnp

        from ofps_tpu.core.motion import grid_size_for, _axis_scatter_matrix
        from ofps_tpu.ops.flow_pyramid import FlowParams, dense_flow
        from ofps_tpu.ops.image import dilate_disk, sobel_xy

        gw, gh = grid_size_for(w, h, self._grid_max_dim)
        self._grid_wh = (gw, gh)
        ys, xs = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
        self._grid_pos = np.stack(
            [(xs + 0.5) / gw, (ys + 0.5) / gh], axis=-1
        ).reshape(-1, 2).astype(np.float32)

        if self._use_rlof:
            from ofps_tpu.ops.flow_lk import LKParams, dense_flow_lk

            lk_params = LKParams(levels=self._levels)

            def flow_fn(prev_gray, gray, prev_flow):
                return dense_flow_lk(
                    prev_gray, gray, lk_params, init_flow=prev_flow
                )

        else:
            params = FlowParams(levels=self._levels)

            def flow_fn(prev_gray, gray, prev_flow):
                return dense_flow(
                    prev_gray, gray, params, init_flow=prev_flow
                )

        sy = _axis_scatter_matrix(h, gh)  # (H, gh)
        sx = _axis_scatter_matrix(w, gw)  # (W, gw)
        use_mask = self._use_mask
        thresh = self._mask_threshold
        dil = self._mask_dilate

        @jax.jit
        def step(prev_gray, gray, prev_flow):
            flow = flow_fn(prev_gray, gray, prev_flow)
            if use_mask:
                # Contrast mask on the *previous* frame (the flow's source):
                # Sobel mixed derivative -> threshold -> disk dilation
                # (cv-decoder lib.rs:204-237).
                grad = jnp.abs(sobel_xy(prev_gray))
                m = (grad > thresh).astype(jnp.float32)
                m = dilate_disk(m, dil)
            else:
                m = jnp.ones_like(prev_gray)
            # Mask-weighted cell means on the MXU (scatter-matmul densify).
            fl = flow / jnp.asarray([w, h], jnp.float32)  # normalized units
            wf = fl * m[..., None]
            sums = jnp.einsum("hg,hwc,wk->gkc", sy, wf, sx, precision="highest")
            cnt = jnp.einsum("hg,hw,wk->gk", sy, m, sx, precision="highest")
            grid = sums / jnp.maximum(cnt, 1.0)[..., None]
            valid = cnt > 0.5
            return flow, grid, valid

        self._fn = step

    def process_frame(
        self, want_frame: bool = False, skip: int = 0
    ) -> Optional[DecodedFrame]:
        import jax.numpy as jnp

        from ofps_tpu.ops.image import rgb_to_gray

        f = self._av.process_frame(want_frame=True, skip=skip)
        if f is None:
            return None
        gray = jnp.asarray(
            np.asarray(rgb_to_gray(jnp.asarray(f.frame[..., :3])))
        )
        out_frame = f.frame if want_frame else None
        h, w = gray.shape

        if self._fn is None:
            self._build(h, w)
        if self._prev_gray is None:
            self._prev_gray = gray
            self._prev_flow = jnp.zeros((h, w, 2), jnp.float32)
            return DecodedFrame(
                pos=np.zeros((0, 2), np.float32),
                motion=np.zeros((0, 2), np.float32),
                has_mvs=False,
                frame=out_frame,
            )

        flow, grid, valid = self._fn(self._prev_gray, gray, self._prev_flow)
        self._prev_gray = gray
        self._prev_flow = flow

        motion = np.asarray(grid).reshape(-1, 2)
        keep = np.asarray(valid).reshape(-1)
        return DecodedFrame(
            pos=self._grid_pos[keep],
            motion=motion[keep],
            has_mvs=True,
            frame=out_frame,
        )

    def get_framerate(self) -> Optional[float]:
        return self._av.get_framerate()

    def get_aspect(self) -> Optional[Tuple[int, int]]:
        return self._av.get_aspect()

    def close(self):
        self._av.close()
