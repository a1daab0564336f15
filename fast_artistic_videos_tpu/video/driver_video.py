"""2D video stylization driver — the equivalent of fast_artistic_video.lua.

Consumes a frame sequence plus per-pair backward flow (.flo) and reliability
maps (.pgm) addressed by the reference's filename-pattern DSL, and writes
stylized PNGs. Frame recurrence:

  frame 1 (or create_inconsistent): independent stylization
  frame i: prior = warp(stylized[i-1], backward_flow_i), certainty from the
           reliability map (optionally inverted / boundary-fixed), then the
           fused engine step.

I/O (disk reads of the next frame's inputs, PNG writes) overlaps device
compute through Prefetcher/AsyncWriter. The reference instead polls the
filesystem at 1 Hz (utils.lua:74-80); `wait_for_file` preserves that
synchronization with a concurrently-running flow producer.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, List, Optional

import numpy as np

from ..core import io
from ..core.config import StylizeOptions, format_flow_name
from ..ops import warp
from ..utils import pipeline
from .engine import StylizerEngine

import jax
import jax.numpy as jnp

_u8_to_f32 = jax.jit(lambda u: u.astype(jnp.float32) / 255.0)
_f32_to_u8 = jax.jit(lambda x: jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8))


def fix_occlusions_mask(cert: np.ndarray, flow: np.ndarray) -> np.ndarray:
    """Zero certainty where warping leaves no correspondence — Sintel GT
    workaround (fast_artistic_video.lua:79-86): warp an all-ones image and
    threshold at 0.5."""
    weight = np.asarray(warp.warp_weight_map(jnp.asarray(flow), *cert.shape))
    return cert * (np.sign(weight - 0.5).clip(min=0.0))


@dataclasses.dataclass
class FrameResult:
    index: int
    path: str
    seconds: float


class VideoDriver:
    def __init__(self, engine: StylizerEngine, opt: StylizeOptions,
                 eval_fn: Optional[Callable] = None,
                 flow_provider: Optional[Callable] = None):
        """flow_provider: optional streaming estimator
        (flow.provider.StreamingFlowProvider) replacing the file-based flow
        pipeline; fed every frame in order, returns (backward_flow, cert) or
        None for the first frame. On continue_with resume the provider is
        primed with the last INPUT frame so the resumed frame gets a real
        flow/cert pair and the recurrence continues from the reloaded
        output (run(), below) — only when neither the previous output nor
        the previous input exists does the resume frame restart
        independently."""
        self.engine = engine
        self.opt = opt
        self.eval_fn = eval_fn  # called as eval_fn(i, content, stylized, prev_stylized)
        self.flow_provider = flow_provider
        self.eval_rows: List[List[float]] = []

    # -- input loading ----------------------------------------------------

    def _frame_path(self, i: int) -> str:
        return self.opt.input_pattern % i

    def load_frame(self, i: int) -> Optional[np.ndarray]:
        path = self._frame_path(i)
        if not os.path.exists(path):
            return None
        return io.load_image(path)

    def load_frame_device(self, i: int):
        """Frame i as a DEVICE uint8 array (4x less tunnel traffic than
        float32). This single upload is shared by the flow provider
        (pyramid + consistency structure image) and the stylizer engine —
        both convert to [0,1] float INSIDE their fused programs, so no
        separate u8->f32 pass ever runs (BENCH_NOTES round 4). Uploaded on
        the prefetch thread, overlapped with the previous frame's compute."""
        path = self._frame_path(i)
        if not os.path.exists(path):
            return None
        return jnp.asarray(io.load_image_u8(path))

    def load_flow_cert(self, i: int):
        opt = self.opt
        flow_name = format_flow_name(opt.flow_pattern, i - 1, i)
        cert_name = format_flow_name(opt.occlusions_pattern, i - 1, i)
        pipeline.wait_for_file(cert_name)
        pipeline.wait_for_file(flow_name)
        flow = io.read_flo(flow_name)
        cert = io.load_image(cert_name, num_channels=1)[..., 0]
        if opt.invert_occlusion:
            cert = 1.0 - cert
        if opt.fix_occlusions:
            cert = fix_occlusions_mask(cert, flow)
        return flow, cert

    def _load_inputs_phased(self, i: int):
        """Prefetchable bundle for frame i in phase-resident mode: the
        content frame is space-to-depthed on THIS (prefetch) thread
        (ops.phase.s2d2_flat_np) and uploaded in the flat 16-phase layout —
        the device never relayouts a full-res tensor; the full-res uint8
        upload still happens for the flow provider (pyramid + consistency
        structure image)."""
        from ..ops import phase as phase_ops

        path = self._frame_path(i)
        if not os.path.exists(path):
            return None
        frame_np = io.load_image_u8(path)
        if frame_np.shape[0] % 4 or frame_np.shape[1] % 4:
            raise ValueError(
                "phase_resident needs frame H, W divisible by 4 "
                f"(got {frame_np.shape[:2]})")
        frame = jnp.asarray(frame_np)
        content_ph = jnp.asarray(phase_ops.s2d2_flat_np(frame_np))
        # the provider sees EVERY frame (it needs frame i-1's pyramid to
        # pair with frame i), even when frame i stylizes independently
        flow_cert = self.flow_provider(frame)
        if flow_cert is not None:
            flow_cert = flow_cert + (self.flow_provider.last_band,)
        if self._is_single_image(i):
            flow_cert = None
        return frame, flow_cert, content_ph

    def _load_inputs(self, i: int):
        """Prefetchable bundle for frame i."""
        frame = self.load_frame_device(i)
        if frame is None:
            return None
        first = self._is_single_image(i)
        if self.flow_provider is not None and not self.opt.create_inconsistent:
            flow_cert = self.flow_provider(frame)
            if flow_cert is not None:
                # capture the band HERE (prefetch thread, before the provider
                # moves on to the next frame) so the engine's warp-band hint
                # matches this frame's flow
                band = getattr(self.flow_provider, "last_band", None)
                flow_cert = flow_cert + (band,)
            if first:
                flow_cert = None
        else:
            flow_cert = None if first else self.load_flow_cert(i)
        return frame, flow_cert

    def _is_single_image(self, i: int) -> bool:
        # Reference: i == 1 or create_inconsistent (fast_artistic_video.lua:172).
        # In -backward mode the reference would warp a nonexistent previous
        # stylized frame on its first iteration (core.lua:189-194 starts at
        # num_frames-1 but is_single_image only fires at i==1); we instead
        # stylize the first *processed* frame independently.
        if self.opt.create_inconsistent:
            return True
        return i == (self.opt.num_frames if self.opt.backward else 1)

    # -- output -----------------------------------------------------------

    def _out_path(self, i: int) -> str:
        return f"{self.opt.output_prefix}-{i:05d}.png"

    # -- main loop --------------------------------------------------------

    def run(self, progress: bool = True) -> List[FrameResult]:
        opt = self.opt
        if opt.backward:
            indices = list(range(opt.num_frames, 0, -1))
        else:
            indices = list(range(opt.continue_with, opt.num_frames + 1))

        if opt.create_inconsistent and opt.inconsistent_batch > 1:
            return self._run_batched(indices, progress)
        if (getattr(self.flow_provider, "phased", False)
                and not opt.create_inconsistent):
            return self._run_phased(indices, progress)

        results: List[FrameResult] = []
        writer = pipeline.AsyncWriter()
        # the recurrence carry stays ON DEVICE; the host copy for PNG/eval is
        # materialized in the writer thread, overlapped with the next frame
        last_stylized = None
        scale = opt.scale_factor
        if opt.continue_with > 1 and not opt.backward:
            # resume the recurrence from the last written frame (the
            # reference 2D driver has no equivalent and would warp a
            # nonexistent previous frame; the VR driver reloads its faces,
            # fast_artistic_video_vr.lua:576-583 — we do the same here)
            prev_path = self._out_path(opt.continue_with - 1)
            if os.path.exists(prev_path):
                last_stylized = io.load_image(prev_path)
                if scale != 1.0:
                    last_stylized = _resize_bicubic(last_stylized, scale)
                if self.flow_provider is not None and last_stylized is not None:
                    # prime the streaming provider with the last INPUT frame
                    # so the resumed frame gets a real flow/cert pair and
                    # warps the reloaded recurrence instead of restarting
                    # independently (matches the file-based resume path and
                    # the reference's VR reload, fast_artistic_video_vr.lua:576-583)
                    prev_in = self.load_frame_device(opt.continue_with - 1)
                    if prev_in is not None:
                        self.flow_provider(prev_in)
                    else:
                        last_stylized = None  # no input frame -> cold start
        last_stylized_host: Optional[np.ndarray] = None
        need_host_prev = self.eval_fn is not None
        # feature-reuse mode (--feature_reuse K): frame t is a keyframe when
        # K-1 reuse frames have passed since the last full forward
        reuse_k = opt.feature_reuse if self.engine.supports_feature_reuse else 0
        delta = None
        key_age = 0

        # fused-u8 fast path: unscaled, non-reuse frames come back from the
        # SAME device program as both the f32 recurrence carry and the
        # quantized uint8 output (saves a full extra pass over the float
        # frame per step vs the old separate _f32_to_u8 jit)
        fused_u8 = scale == 1.0 and reuse_k <= 1
        # provider-side exact erosion (StreamingFlowProvider erode_window):
        # the engine must then skip its own full-res min-filter
        pre_eroded = bool(getattr(self.flow_provider, "erode_window", None))
        if pre_eroded and reuse_k > 1:
            # the reuse impls have no pre_eroded fast path — they would
            # erode the already-eroded certainty a second time (the CLI
            # never builds this combination; guard the direct API too)
            raise ValueError(
                "flow_provider.erode_window and feature_reuse > 1 are "
                "mutually exclusive (the reuse steps apply the engine's "
                "own occlusion min-filter)")
        try:
            for i, item in pipeline.Prefetcher(self._load_inputs, indices):
                frame, flow_cert = item
                t0 = time.monotonic()
                content = frame
                out_u8 = None
                if scale != 1.0:
                    content = _resize_bicubic(_u8_to_f32(frame), scale)
                # NOTE: the recurrence is carried at PROCESS resolution; the
                # reference's -scale_factor only ever rescales independent
                # frames (core.lua:127-151; run_next_image ignores it), so a
                # temporally consistent scaled pipeline is a deliberate fix.
                if flow_cert is None or last_stylized is None:
                    if fused_u8:
                        stylized, out_u8 = self.engine.stylize_first(
                            content, emit_u8=True)
                    else:
                        stylized = self.engine.stylize_first(content)
                    delta = None
                else:
                    flow, cert, *rest = flow_cert
                    band_hint = rest[0] if rest else None
                    if scale != 1.0:
                        flow = _resize_bicubic(flow, scale) * scale
                        cert = _resize_bicubic(cert[..., None], scale)[..., 0]
                        if band_hint is not None:
                            band_hint = warp.flow_band(band_hint * scale)
                    if reuse_k > 1:
                        if delta is None or key_age >= reuse_k - 1:
                            stylized, delta = self.engine.stylize_next_full(
                                content, last_stylized, flow, cert, band_hint)
                            key_age = 0
                        else:
                            stylized, delta = self.engine.stylize_next_reuse(
                                content, last_stylized, flow, cert, delta,
                                band_hint)
                            key_age += 1
                    elif fused_u8:
                        stylized, out_u8 = self.engine.stylize_next(
                            content, last_stylized, flow, cert, band_hint,
                            emit_u8=True, pre_eroded=pre_eroded)
                    else:
                        stylized = self.engine.stylize_next(
                            content, last_stylized, flow, cert, band_hint,
                            pre_eroded=pre_eroded)
                out_full = stylized
                if scale != 1.0:
                    out_full = _resize_bicubic(
                        stylized, frame.shape[0] / stylized.shape[0]
                    )
                dt = time.monotonic() - t0
                out_path = self._out_path(i)
                # quantized on device (async dispatch): the writer thread
                # downloads 6 MB of uint8 instead of 25 MB of float32;
                # on the fused path the u8 frame came out of the step itself
                if out_u8 is None:
                    out_u8 = _f32_to_u8(jnp.asarray(out_full))
                writer.put(lambda p=out_path, s=out_u8: io.save_image(p, np.asarray(s)))
                if progress:
                    print(f"frame {i}: {dt*1000:.1f} ms -> {out_path}")
                if self.eval_fn is not None:
                    row = self.eval_fn(i, _u8_to_f32(frame),
                                       np.asarray(out_full), last_stylized_host)
                    if row is not None:
                        self.eval_rows.append(list(row))
                if need_host_prev:
                    last_stylized_host = np.asarray(out_full)
                last_stylized = stylized
                results.append(FrameResult(i, out_path, dt))
        finally:
            writer.close()
        if self.eval_rows and opt.evaluation_file:
            self._write_eval_file()
        return results

    def _run_phased(self, indices, progress: bool) -> List[FrameResult]:
        """Phase-resident streaming loop (--phase_resident): the recurrence
        carry, warp, certainty erosion and the whole net stay in the flat
        16-phase quarter-res layout; the content space-to-depth runs on the
        prefetch thread and the output depth-to-space on the writer thread,
        so the device never relayouts a full-res tensor after frame 1
        (BENCH_NOTES round 5 full-chain A/B). Semantics match run() exactly
        (tests/test_cli_stylize.py phase-resident parity)."""
        from ..ops import phase as phase_ops

        opt = self.opt
        if not self.engine.supports_phase_resident:
            raise ValueError(
                "phase-resident run needs an engine built with "
                "apply_vid_phased (cli.stylize_video.build_engine wires it "
                "for --phase_resident)")
        if opt.scale_factor != 1.0 or opt.feature_reuse > 1:
            raise ValueError("phase_resident is incompatible with "
                             "scale_factor / feature_reuse")
        results: List[FrameResult] = []
        writer = pipeline.AsyncWriter()
        last_ph = None  # phased recurrence carry (hq, wq, 48) f32, on device
        last_stylized_host: Optional[np.ndarray] = None
        if opt.continue_with > 1 and not opt.backward:
            # resume: reload the last written frame into the phased carry and
            # prime the provider with the last INPUT frame (same contract as
            # run(); reference VR reload fast_artistic_video_vr.lua:576-583)
            prev_path = self._out_path(opt.continue_with - 1)
            if os.path.exists(prev_path):
                prev_img = io.load_image(prev_path)
                prev_in = self.load_frame_device(opt.continue_with - 1)
                if (prev_in is not None and prev_img.shape[0] % 4 == 0
                        and prev_img.shape[1] % 4 == 0):
                    self.flow_provider(prev_in)
                    last_ph = self.engine.to_phased(prev_img)
        try:
            for i, item in pipeline.Prefetcher(self._load_inputs_phased, indices):
                frame, flow_cert, content_ph = item
                t0 = time.monotonic()
                out_path = self._out_path(i)
                if flow_cert is None or last_ph is None:
                    stylized, out_u8 = self.engine.stylize_first(
                        frame, emit_u8=True)
                    last_ph = self.engine.to_phased(stylized)
                    writer.put(lambda p=out_path, s=out_u8:
                               io.save_image(p, np.asarray(s)))
                else:
                    flow, cert, band = flow_cert
                    last_ph, u8_ph = self.engine.stylize_next_phased(
                        content_ph, last_ph, flow, cert, band, emit_u8=True)
                    # writer thread runs the host depth-to-space on 6 MB of
                    # uint8 — the device-side d2s relayout never happens
                    writer.put(lambda p=out_path, s=u8_ph: io.save_image(
                        p, phase_ops.d2s2_flat_np(np.asarray(s), 3)))
                dt = time.monotonic() - t0
                if progress:
                    print(f"frame {i}: {dt*1000:.1f} ms -> {out_path}")
                if self.eval_fn is not None:
                    out_full = phase_ops.d2s2_flat_np(
                        np.asarray(last_ph, np.float32), 3)
                    row = self.eval_fn(i, np.asarray(frame, np.float32) / 255.0,
                                       out_full, last_stylized_host)
                    if row is not None:
                        self.eval_rows.append(list(row))
                    last_stylized_host = out_full
                results.append(FrameResult(i, out_path, dt))
        finally:
            writer.close()
        if self.eval_rows and opt.evaluation_file:
            self._write_eval_file()
        return results

    def _run_batched(self, indices, progress: bool) -> List[FrameResult]:
        """create_inconsistent throughput mode: frames are independent, so
        stylize `inconsistent_batch` of them per device step."""
        results: List[FrameResult] = []
        writer = pipeline.AsyncWriter()
        batch_n = self.opt.inconsistent_batch
        pending: List = []
        try:
            def flush():
                if not pending:
                    return
                t0 = time.monotonic()
                outs = self.engine.stylize_batch([f for _, f in pending])
                dt = (time.monotonic() - t0) / len(pending)
                for (idx, _), out in zip(pending, outs):
                    path = self._out_path(idx)
                    out_u8 = _f32_to_u8(jnp.asarray(out))
                    writer.put(lambda p=path, s=out_u8: io.save_image(p, np.asarray(s)))
                    if progress:
                        print(f"frame {idx}: {dt*1000:.1f} ms -> {path}")
                    results.append(FrameResult(idx, path, dt))
                pending.clear()

            for i, item in pipeline.Prefetcher(self._load_inputs, indices):
                frame, _ = item
                pending.append((i, frame))
                if len(pending) >= batch_n:
                    flush()
            flush()
        finally:
            writer.close()
        return results

    def _write_eval_file(self):
        """Reference format (core.lua:231-240): one semicolon-joined series
        per metric, then per-metric means.

        Fixed vs reference: core.lua:237 divides by opt.num_frames (default
        9999), which is wrong whenever the driver auto-detects the sequence
        end; we divide by the actual evaluated-frame count, matching the VR
        driver (see README "faithful-vs-fixed")."""
        cols = list(zip(*self.eval_rows))
        with open(self.opt.evaluation_file, "a") as f:
            for series in cols:
                f.write(";".join(str(v) for v in series) + "\n")
            for series in cols:
                f.write(str(sum(series) / max(1, len(series))) + "\n")


def _resize_bicubic(arr, scale: float):
    """Device-resident bicubic resize (returns a jnp array — callers that
    need a host copy wrap in np.asarray)."""
    h, w = arr.shape[:2]
    nh, nw = int(round(h * scale)), int(round(w * scale))
    return jax.image.resize(jnp.asarray(arr), (nh, nw) + tuple(arr.shape[2:]),
                            method="bicubic")
