"""Streaming flow provider: on-the-fly flow + reliability for the video
driver, replacing the file-based flow pipeline entirely.

For each consecutive frame pair the provider computes backward flow
(frame i -> i-1), forward flow, and the consistency mask — all on device —
mirroring what makeOptFlow_deepflow.sh produces as files
(backward_<i>_<i-1>.flo + reliable_<i>_<i-1>.pgm, :55-64).

Device residency: each frame's feature pyramid is computed ONCE
(estimator.prep) and reused for both flow directions and for the next
frame pair; both directions run in one compiled program
(estimator.refine_pair); resize/pad/crop live inside those jits. The only
host traffic per step is the input frame upload and one scalar readback
(max |flow|, which picks the banded-consistency bucket). The returned flow
and certainty are DEVICE arrays — the stylizer engine consumes them
directly; callers needing host copies wrap them in np.asarray."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.warp import flow_band
from . import consistency, estimator


class StreamingFlowProvider:
    """Stateful: remembers the previous frame's pyramid; drive it with
    frames in playback order."""

    def __init__(self, params=None, use_structure: bool = True, device=None,
                 flow_scale: float = 1.0, flow_estimator=None):
        """flow_scale < 1 estimates flow at reduced resolution and rescales
        (flow at 540p costs ~4x less than 1080p and the consistency mask is
        robust to it); 1.0 = full resolution. Pass a shared `flow_estimator`
        when building several providers (the VR driver runs six, one per cube
        face) so they share one set of compiled programs."""
        if flow_estimator is not None:
            self.estimator = flow_estimator
        else:
            if params is None:
                raise ValueError("need params or flow_estimator")
            self.estimator = estimator.FlowEstimator(params, device=device)
        self.use_structure = use_structure
        self.flow_scale = flow_scale
        self._prev_feats = None
        self._pending_maxabs = None
        self.last_band = None

    def reset(self) -> None:
        self._prev_feats = None
        self._pending_maxabs = None

    def __call__(self, frame: np.ndarray) -> Optional[Tuple[jnp.ndarray, jnp.ndarray]]:
        """Feed frame i; returns (backward_flow_i, reliability_i) against the
        previously fed frame — both device arrays — or None for the first
        frame."""
        feats = self.estimator.prep(frame, self.flow_scale)
        prev_feats, self._prev_feats = self._prev_feats, feats
        if prev_feats is None:
            return None
        backward, forward, maxabs = self.estimator.refine_pair(
            feats, prev_feats, frame.shape[:2], self.flow_scale
        )
        # band from the PREVIOUS pair's max |flow| (+1 bucket headroom): its
        # device->host readback has long completed, so this costs nothing,
        # where float(maxabs) would stall ~1 RTT on the in-flight step. Flow
        # range moves slowly frame-to-frame; if it still overshoots, the
        # out-of-band pixels fail the round-trip test and are marked
        # unreliable — the conservative direction.
        prev_maxabs, self._pending_maxabs = self._pending_maxabs, maxabs
        try:
            maxabs.copy_to_host_async()  # start the 4-byte D2H now; the
        except AttributeError:           # float() next step finds it ready
            pass
        if prev_maxabs is None:
            band = 2 * flow_band(float(maxabs))
        else:
            band = 2 * flow_band(float(prev_maxabs))
        image = jnp.asarray(frame) if self.use_structure else None
        cert = consistency.consistency_mask(backward, forward, image, band=band)
        self.last_band = band  # warp-band hint for the engine step
        return backward, cert
