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
                 flow_scale: float = 1.0, flow_estimator=None,
                 consistency_at_flow_res: bool = True, dtype=None,
                 coarse_backward: bool = False, fast_check: bool = False,
                 phased: bool = False, erode_window=None):
        """flow_scale < 1 estimates flow at reduced resolution and rescales
        (flow at 540p costs ~4x less than 1080p and the consistency mask is
        robust to it); 1.0 = full resolution. Pass a shared `flow_estimator`
        when building several providers (the VR driver runs six, one per cube
        face) so they share one set of compiled programs.

        consistency_at_flow_res=True (default) runs the consistency check at
        the flow's estimation resolution and nearest-upsamples the mask —
        ~4x/16x cheaper at flow_scale 0.5/0.25 with the structure tensor
        included (consistency.consistency_mask_streaming). False checks the
        upsampled full-res flow (the pre-round-2 behavior).

        dtype: feature/compute dtype for the estimator (flow values always
        accumulate in f32); bfloat16 is ~10% faster end-to-end with
        measurably identical EPE/pass rates on the held-out protocols
        (README flow-quality section). None = float32.

        phased=True feeds the phase-resident engine: the returned backward
        flow is in the flat 16-phase layout (hq, wq, 16, 2) and the
        certainty mask stays at FLOW resolution (the engine erodes it in
        phase space). Requires consistency_at_flow_res with flow_scale < 1
        and frame H, W % 4 == 0."""
        if flow_estimator is not None:
            self.estimator = flow_estimator
        else:
            if params is None:
                raise ValueError("need params or flow_estimator")
            self.estimator = estimator.FlowEstimator(
                params, dtype=dtype or jnp.float32, device=device)
        self.use_structure = use_structure
        self.flow_scale = flow_scale
        self.consistency_at_flow_res = consistency_at_flow_res
        self.coarse_backward = coarse_backward
        self.fast_check = fast_check
        self.phased = phased
        # erode_window: apply the engine's occlusion min-filter inside the
        # consistency program at flow resolution (exact; the engine is then
        # called with pre_eroded=True). See consistency._eroded_nearest_up.
        self.erode_window = erode_window
        if erode_window and phased:
            raise ValueError("erode_window is the full-res path's option; "
                             "the phased engine erodes in phase space")
        if erode_window and (not consistency_at_flow_res or flow_scale >= 1.0):
            raise ValueError("erode_window needs consistency_at_flow_res=True "
                             "and flow_scale < 1.0")
        if phased and (not consistency_at_flow_res or flow_scale >= 1.0):
            raise ValueError("phased provider mode needs "
                             "consistency_at_flow_res and flow_scale < 1")
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
        lowres = self.consistency_at_flow_res and self.flow_scale != 1.0
        if lowres:
            backward, bwd_low, fwd_low, maxabs = self.estimator.refine_pair(
                feats, prev_feats, frame.shape[:2], self.flow_scale,
                with_lowres=True, coarse_backward=self.coarse_backward,
                fast_check=self.fast_check, phased_up=self.phased,
            )
        else:
            backward, forward, maxabs = self.estimator.refine_pair(
                feats, prev_feats, frame.shape[:2], self.flow_scale,
                coarse_backward=self.coarse_backward,
                fast_check=self.fast_check,
            )
        # band from the PREVIOUS pair's band-sizing signal: its device->host
        # readback has long completed, so this costs nothing, where a
        # float() on the in-flight step would stall ~1 RTT. The signal is
        # the max |flow| over consistency-PASSING pixels (rel_max below),
        # not the raw max: new content entering at the borders gets
        # arbitrary unmatched flow that fails the round-trip check anyway,
        # and sizing by it ran 1080p pans at band 32 where the true motion
        # needs 16 (BENCH_NOTES round 5). Flow range moves slowly
        # frame-to-frame; if it still overshoots, out-of-band pixels are
        # marked unreliable (warp_limit backstop) — the conservative
        # direction — and the <5%-pass escape hatch inside the check falls
        # back to the raw max so a scene cut re-grows the bucket next pair.
        prev_maxabs = self._pending_maxabs
        warp_low = flow_band(float(prev_maxabs if prev_maxabs is not None
                                   else maxabs))
        # Two distinct bands from the same flow bucket: the consistency
        # check composes a round trip (f1 then f2), so ITS banded sample
        # needs 2x coverage; the ENGINE's prior warp only moves by f1, so
        # its band is the plain bucket — half the taps (warp cost is linear
        # in band: 1080p flow@0.5 runs band 16 instead of 32). Pixels whose
        # flow exceeds the engine band are marked unreliable inside the
        # consistency program (warp_limit backstop), so the narrower band
        # can never sample garbage into a trusted prior.
        band = 2 * warp_low
        image = jnp.asarray(frame) if self.use_structure else None
        if lowres:
            # maxabs/band/warp_low are in estimation-res pixel units here;
            # the warp band the engine needs covers the upsampled full-res
            # flow (upsampling scales values by out/in size)
            self.last_band = flow_band(warp_low / self.flow_scale)
            limit_low = self.last_band * bwd_low.shape[0] / frame.shape[0]
            cert, rel_max = consistency.consistency_mask_streaming(
                bwd_low, fwd_low, image,
                out_hw=None if self.phased else frame.shape[:2], band=band,
                erode_window=self.erode_window, warp_limit=limit_low,
                with_rel_maxabs=True)
        else:
            self.last_band = warp_low  # warp-band hint for the engine step
            cert, rel_max = consistency.consistency_mask(
                backward, forward, image, band=band,
                warp_limit=float(warp_low), with_rel_maxabs=True)
        self._pending_maxabs = rel_max
        try:
            rel_max.copy_to_host_async()  # start the 4-byte D2H now; the
        except AttributeError:            # float() next step finds it ready
            pass
        return backward, cert


class BatchedStreamingFlowProvider:
    """Streaming flow for N synchronized temporal streams in ONE program
    per step — the VR driver's 6 cube faces (each face is its own temporal
    stream, all advancing together). Per step: one batched pyramid, one
    batched refine of both directions, one batched flow-res consistency
    check. The pyramid convs batch ~4x better than 6 sequential dispatches
    and refine ~1.2x (BENCH_NOTES VR section).

    Call with frames (N, H, W, 3); returns a list of N (backward_flow,
    certainty) device-array pairs, or None for the first frame. The band
    bucket is shared across streams (max |flow| over the batch)."""

    def __init__(self, params=None, use_structure: bool = True,
                 flow_scale: float = 1.0, flow_estimator=None, dtype=None,
                 fast_check: bool = False):
        if flow_estimator is not None:
            self.estimator = flow_estimator
        else:
            if params is None:
                raise ValueError("need params or flow_estimator")
            self.estimator = estimator.FlowEstimator(
                params, dtype=dtype or jnp.float32)
        self.use_structure = use_structure
        self.flow_scale = flow_scale
        self.fast_check = fast_check
        self._prev_feats = None
        self._pending_maxabs = None
        self.last_band = None

    def reset(self) -> None:
        self._prev_feats = None
        self._pending_maxabs = None

    def __call__(self, frames):
        frames = jnp.asarray(frames)
        n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
        feats = self.estimator.prep_batch(frames, self.flow_scale)
        prev_feats, self._prev_feats = self._prev_feats, feats
        if prev_feats is None:
            return None
        backward, bwd_low, fwd_low, maxabs = self.estimator.refine_pair_batch(
            feats, prev_feats, (h, w), self.flow_scale,
            fast_check=self.fast_check)
        # engine band = plain bucket, consistency band = 2x (round-trip
        # coverage); out-of-engine-band pixels are masked unreliable, and
        # the bucket is sized from the PREVIOUS step's check-passing
        # max |flow| over the whole batch — see StreamingFlowProvider.
        prev_maxabs = self._pending_maxabs
        warp_low = flow_band(float(prev_maxabs if prev_maxabs is not None
                                   else maxabs))
        band = 2 * warp_low
        images = frames if self.use_structure else None
        if self.flow_scale != 1.0:
            self.last_band = flow_band(warp_low / self.flow_scale)
        else:
            self.last_band = warp_low
        limit_low = self.last_band * bwd_low.shape[1] / h
        certs, rel_max = consistency.consistency_mask_streaming_batch(
            bwd_low, fwd_low, images, out_hw=(h, w), band=band,
            warp_limit=limit_low, with_rel_maxabs=True)
        self._pending_maxabs = rel_max
        try:
            rel_max.copy_to_host_async()
        except AttributeError:
            pass
        return [(backward[i], certs[i]) for i in range(n)]
