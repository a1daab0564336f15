"""Streaming flow provider: on-the-fly flow + reliability for the video
driver, replacing the file-based flow pipeline entirely.

For each consecutive frame pair the provider computes backward flow
(frame i -> i-1), forward flow, and the consistency mask — all on device —
mirroring what makeOptFlow_deepflow.sh produces as files
(backward_<i>_<i-1>.flo + reliable_<i>_<i-1>.pgm, :55-64)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from . import consistency, estimator


class StreamingFlowProvider:
    """Stateful: remembers the previous frame; drive it with frames in
    playback order."""

    def __init__(self, params, use_structure: bool = True, device=None,
                 flow_scale: float = 1.0):
        """flow_scale < 1 estimates flow at reduced resolution and rescales
        (flow at 540p costs ~4x less than 1080p and the consistency mask is
        robust to it); 1.0 = full resolution."""
        self.estimator = estimator.FlowEstimator(params, device=device)
        self.use_structure = use_structure
        self.flow_scale = flow_scale
        self._prev: Optional[np.ndarray] = None

    def reset(self) -> None:
        self._prev = None

    def __call__(self, frame: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Feed frame i; returns (backward_flow_i, reliability_i) against the
        previously fed frame, or None for the first frame."""
        prev, self._prev = self._prev, frame
        if prev is None:
            return None
        cur_s, prev_s = frame, prev
        if self.flow_scale != 1.0:
            cur_s = _resize(frame, self.flow_scale)
            prev_s = _resize(prev, self.flow_scale)
        backward = self.estimator.flow(cur_s, prev_s)   # i -> i-1
        forward = self.estimator.flow(prev_s, cur_s)    # i-1 -> i
        if self.flow_scale != 1.0:
            h, w = frame.shape[:2]
            backward = _resize(backward, None, (h, w)) / self.flow_scale
            forward = _resize(forward, None, (h, w)) / self.flow_scale
        image = frame if self.use_structure else None
        from ..ops.warp import flow_band

        band = flow_band(float(np.abs(backward).max()))
        cert = np.asarray(
            consistency.consistency_mask(
                jnp.asarray(backward),
                jnp.asarray(forward),
                None if image is None else jnp.asarray(image),
                band=band,
            )
        )
        return backward, cert


def _resize(arr: np.ndarray, scale, hw=None) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    h, w = arr.shape[:2]
    nh, nw = hw if hw else (int(round(h * scale)), int(round(w * scale)))
    out = jax.image.resize(jnp.asarray(arr), (nh, nw) + arr.shape[2:], "bilinear")
    return np.asarray(out)
