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

    def __init__(self, params, use_structure: bool = True, device=None):
        self.estimator = estimator.FlowEstimator(params, device=device)
        self.use_structure = use_structure
        self._prev: Optional[np.ndarray] = None

    def reset(self) -> None:
        self._prev = None

    def __call__(self, frame: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Feed frame i; returns (backward_flow_i, reliability_i) against the
        previously fed frame, or None for the first frame."""
        prev, self._prev = self._prev, frame
        if prev is None:
            return None
        backward = self.estimator.flow(frame, prev)   # i -> i-1
        forward = self.estimator.flow(prev, frame)    # i-1 -> i
        image = frame if self.use_structure else None
        cert = np.asarray(
            consistency.consistency_mask(
                jnp.asarray(backward),
                jnp.asarray(forward),
                None if image is None else jnp.asarray(image),
            )
        )
        return backward, cert
