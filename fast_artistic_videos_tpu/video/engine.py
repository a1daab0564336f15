"""The generic prior-conditioned stylization engine.

TPU-native redesign of ``run_fast_neural_video`` (fast_artistic_video_core.lua:34):
the reference's callback septet becomes a small protocol —

  * :class:`FrameSource`   — yields content frames (func_load_image)
  * :class:`PriorProvider` — yields (prior image, certainty) for frame i
    (func_load_cert + func_make_last_frame_warped)
  * :class:`FrameSink`     — consumes stylized frames (func_save_image)

while the per-frame compute (certainty erosion, flow warp of the previous
stylized frame, masking, occlusion fill, 7-channel assembly, stylizer
forward, de-processing) is fused into ONE jitted device function per frame
shape — no host round-trips inside a step (reference equivalents:
core.lua:161-180 run_next_image, core.lua:121-158 run_image,
core.lua:194-229 main loop).

The recurrence over frames is inherently sequential (frame t consumes the
stylized frame t-1); throughput comes from keeping the whole step on-device
and overlapping host I/O via the driver's prefetcher.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Protocol, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import filters, phase as phase_ops, warp
from ..ops.preprocess import VGG_MEAN_BGR, vgg_preprocess, vgg_deprocess


class FrameSource(Protocol):
    def load(self, i: int) -> Optional[np.ndarray]:
        """Content frame i as float32 (H, W, 3) in [0,1], or None if done."""


class PriorProvider(Protocol):
    def prior(self, i: int, last_stylized: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Return (prior_rgb (H,W,3), certainty (H,W)) for frame i."""


class FrameSink(Protocol):
    def save(self, i: int, stylized: np.ndarray) -> None: ...


@dataclasses.dataclass
class EngineConfig:
    fill_occlusions: str = "vgg-mean"      # 'vgg-mean' | 'uniform-random'
    occlusions_min_filter: int = 7
    dtype: str = "float32"                 # 'float32' | 'bfloat16'
    seed: int = 0
    exact_warp: bool = False               # True: gather warp (exact reference
                                           # semantics, ~10x slower on TPU);
                                           # False: banded warp auto-sized to
                                           # the video's flow range
    warp_kernel: str = "auto"              # 'auto' | 'xla' | 'pallas': which
                                           # banded-warp implementation the
                                           # step uses. 'auto' = the Pallas
                                           # row-window kernel for large
                                           # bands on TPU (3-4x faster at
                                           # band>=48: 21.7 vs 88.7 ms @4K
                                           # band 48), XLA otherwise


_maxabs = jax.jit(lambda f: jnp.max(jnp.abs(f)))


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


class StylizerEngine:
    """Holds the jitted step functions for one (image-model, video-model) pair.

    apply_img may be None — then the video model stylizes independent frames
    with a zero prior and zero certainty, exactly like the reference when
    ``-model_img self`` (core.lua:133-138).
    """

    def __init__(
        self,
        apply_vid: Callable,
        params_vid,
        apply_img: Optional[Callable] = None,
        params_img=None,
        stride_multiple: int = 4,
        config: EngineConfig = EngineConfig(),
        apply_vid_split: Optional[Callable] = None,
        reuse_plan: Optional[Tuple[int, int, int]] = None,
        apply_vid_phased: Optional[Callable] = None,
        phase_pad_blocks: int = 0,
    ):
        """apply_vid_split + reuse_plan enable the FEATURE-REUSE mode (a
        capability the reference lacks; in the spirit of NetWarp's
        representation warping — "Semantic Video CNNs through Representation
        Warping", PAPERS.md — but advecting only the residual-chain DELTA so
        occluded regions degrade to the current frame's own front features):
        keyframes run the full net and capture the residual-chain delta;
        in-between frames advect that delta by feature-grid flow and
        recompute only the front and tail (stylize_next_full /
        stylize_next_reuse).

        apply_vid_split(params, x, *, stop_after=None, start_at=0) must be
        the segment-capable form of apply_vid (stylizer.apply);
        reuse_plan = (front_tap, resume_at, crop) from
        stylizer.reuse_split_plan(spec)."""
        self.apply_vid = apply_vid
        self.params_vid = params_vid
        self.apply_img = apply_img
        self.params_img = params_img
        self.stride_multiple = max(1, stride_multiple)
        self.config = config
        self.apply_vid_split = apply_vid_split
        self.reuse_plan = reuse_plan
        self.apply_vid_phased = apply_vid_phased
        self.phase_pad_blocks = phase_pad_blocks
        self._key = jax.random.PRNGKey(config.seed)
        self._dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
        self._platform = jax.devices()[0].platform
        # Model params are closed over (not traced args): XLA constant-folds
        # the stylizer's weight-layout rewrites (phase-kernel builds) at
        # compile time instead of re-running them every frame.
        self._jit_first = jax.jit(self._first_impl,
                                  static_argnames=("emit_u8",))
        self._jit_next = jax.jit(
            self._next_impl,
            static_argnames=("band", "emit_u8", "pre_eroded"))
        self._jit_prior = jax.jit(self._stylize_with_prior, static_argnames=("erode",))
        if apply_vid_split is not None and reuse_plan is not None:
            self._jit_next_full = jax.jit(
                self._next_full_impl, static_argnames=("band",))
            self._jit_next_reuse = jax.jit(
                self._next_reuse_impl, static_argnames=("band", "qband"))
        if apply_vid_phased is not None:
            self._jit_next_phased = jax.jit(
                self._next_phased_impl,
                static_argnames=("band", "r", "emit_u8"))
            self._jit_to_phased = jax.jit(
                lambda y: phase_ops.s2d2_flat(y[None])[0])
            self._jit_phased_to_u8 = jax.jit(self._phased_to_u8_impl)

    @property
    def supports_feature_reuse(self) -> bool:
        return self.apply_vid_split is not None and self.reuse_plan is not None

    @property
    def supports_phase_resident(self) -> bool:
        """The phase-resident streaming mode: recurrence, warp, certainty
        erosion and the whole net stay in the 16-phase quarter-res layout
        (no full-res tensor on the per-frame device path). Requires a
        phase-io capable video model (stylizer.supports_phase_io), the
        default 'vgg-mean' fill and the banded warp."""
        return (self.apply_vid_phased is not None
                and self.config.fill_occlusions == "vgg-mean"
                and not self.config.exact_warp)

    # -- device-side implementations ------------------------------------

    def _fill(self, key, cert3, shape):
        """Occlusion fill in VGG space (core.lua:108-117): zeros for
        'vgg-mean', preprocessed uniform noise masked to occlusions for
        'uniform-random'."""
        if self.config.fill_occlusions == "uniform-random":
            rnd = jax.random.uniform(key, shape, jnp.float32)
            return vgg_preprocess(rnd) * (1.0 - cert3)
        return jnp.zeros(shape, jnp.float32)

    @staticmethod
    def _unit_f32(x):
        """[0,1] float32 from either float or uint8 input — uint8 frames
        upload 4x less through the host link and convert for free inside
        the fused step (a separate u8->f32 jit costs a full extra
        read/write pass of the frame)."""
        if x.dtype == jnp.uint8:
            return x.astype(jnp.float32) / 255.0
        return x.astype(jnp.float32)

    @staticmethod
    def _quantize_u8(y):
        return jnp.clip(jnp.round(y * 255.0), 0.0, 255.0).astype(jnp.uint8)

    def _run_model(self, which, x):
        """Model forward in the engine's compute dtype; deprocess/clip run in
        that dtype too and only the returned frame is cast to float32."""
        if which == "img":
            return self.apply_img(self.params_img, x.astype(self._dtype))
        return self.apply_vid(self.params_vid, x.astype(self._dtype))

    def _first_impl(self, contents, key, emit_u8=False):
        """contents: (N, H, W, 3) RGB [0,1] (or uint8) — independent frames
        (the create_inconsistent path batches them for throughput)."""
        c = vgg_preprocess(self._unit_f32(contents))
        if self.apply_img is not None:
            y = self._run_model("img", c)
        else:
            n, h, w = contents.shape[0], contents.shape[1], contents.shape[2]
            cert3 = jnp.zeros((n, h, w, 3), jnp.float32)
            fill = self._fill(key, cert3, (n, h, w, 3))
            x = jnp.concatenate([c, fill, jnp.zeros((n, h, w, 1))], axis=-1)
            y = self._run_model("vid", x)
        out = jnp.clip(vgg_deprocess(y), 0.0, 1.0).astype(jnp.float32)
        if emit_u8:
            return out, self._quantize_u8(out)
        return out

    def _next_impl(self, content, prev_stylized, flow, cert, key, band=None,
                   emit_u8=False, pre_eroded=False):
        """content/prev_stylized: (H,W,3) RGB [0,1] (content may be uint8);
        flow: (H,W,2) (dx,dy) mapping frame-i pixels to frame-(i-1)
        positions (backward flow); cert: (H,W) in [0,1]. emit_u8=True also
        returns the quantized uint8 frame from the SAME program (the
        epilogue fuses with the net tail; a separate quantize jit costs a
        full extra read of the 25 MB float output). pre_eroded=True skips
        the occlusion min-filter — the streaming provider already applied
        it EXACTLY at flow resolution (consistency erode_window), which at
        4K replaces a ~10 ms full-res filter with low-res shifted mins."""
        if not pre_eroded:
            cert = filters.min_filter(cert, self.config.occlusions_min_filter)
        prior_rgb = self._banded_warp(prev_stylized, flow, band)
        out = self._stylize_with_prior(content, prior_rgb, cert, key)
        if emit_u8:
            return out, self._quantize_u8(out)
        return out

    def _banded_warp(self, prev_stylized, flow, band):
        """Banded-warp dispatch (config.warp_kernel). At large bands the
        tap-loop XLA form re-reads the frame per tap; the Pallas row-window
        kernel (ops.warp_pallas) DMAs each (8 + taps)-row window once and
        wins 3-4x on TPU (4K band 48: 21.7 vs 88.7 ms). Numerically
        identical paths (tests/test_warp_pallas.py)."""
        wk = self.config.warp_kernel
        if band is not None and (
                wk == "pallas"
                or (wk == "auto" and band >= 32
                    and self._platform != "cpu")):
            from ..ops import warp_pallas
            return warp_pallas.bilinear_warp_pallas(
                prev_stylized, flow, band=band,
                interpret=self._platform == "cpu")
        return warp.bilinear_warp(prev_stylized, flow, band=band)

    def _assemble(self, content, prior_rgb, cert, key):
        """The 7-channel stylizer input (content, masked+filled prior,
        certainty), all in VGG space (core.lua:121-158)."""
        h, w = content.shape[0], content.shape[1]
        cert1 = cert[..., None][None]                       # (1,H,W,1)
        cert3 = jnp.broadcast_to(cert1, (1, h, w, 3))
        c = vgg_preprocess(self._unit_f32(content))[None]
        prior = vgg_preprocess(prior_rgb.astype(jnp.float32))[None] * cert3
        prior = prior + self._fill(key, cert3, (1, h, w, 3))
        return jnp.concatenate([c, prior, cert1], axis=-1)

    def _stylize_with_prior(self, content, prior_rgb, cert, key, erode: bool = False):
        if erode:
            cert = filters.min_filter(cert, self.config.occlusions_min_filter)
        x = self._assemble(content, prior_rgb, cert, key)
        y = self._run_model("vid", x)
        return jnp.clip(vgg_deprocess(y[0]), 0.0, 1.0).astype(jnp.float32)

    # -- phase-resident mode ----------------------------------------------

    def _phased_to_u8_impl(self, y):
        """(hq, wq, 48) f32 RGB [0,1] -> (H, W, 3) uint8: quantize FIRST so
        the depth-to-space transpose moves uint8 (4x less than f32)."""
        u = jnp.clip(jnp.round(y * 255.0), 0, 255).astype(jnp.uint8)
        return phase_ops.d2s2_flat(u[None], 3)[0]

    def _next_phased_impl(self, content, prev_phased, flow_phased, cert_low,
                          band=None, r=2, emit_u8=False):
        """One recurrent step entirely in the flat 16-phase layout.

        content: (H, W, 3) uint8/float32 [0,1], or ALREADY PHASED
        (hq, wq, 48) — the streaming driver's prefetch thread runs the
        space-to-depth on the HOST (ops.phase.s2d2_flat_np) so no full-res
        tensor is ever relayouted on device; prev_phased: (hq, wq, 48)
        float32 RGB [0,1] (previous step's return); flow_phased:
        (hq, wq, 16, 2) or (hq, wq, 32) full-res pixel units (the provider's
        phased output); cert_low: (hl, wl) at flow resolution with
        r = H // hl in {2, 4}. Semantics identical to _next_impl +
        nearest-upsampled provider cert (tested). emit_u8=True also
        returns the quantized PHASED uint8 frame from the same program
        (the writer thread runs the host depth-to-space)."""
        cert16 = phase_ops.eroded_cert_phased(
            cert_low.astype(jnp.float32), r, self.config.occlusions_min_filter)
        prior = warp.bilinear_warp_phased(prev_phased, flow_phased, band=band)
        hq, wq = prior.shape[0], prior.shape[1]
        if content.ndim == 3 and content.shape[2] == 48:
            cp = content  # host-phased upload
        else:
            cp = phase_ops.s2d2_flat(content[None])[0]
        if content.dtype == jnp.uint8:
            c5 = cp.reshape(hq, wq, 16, 3).astype(self._dtype)
        else:
            c5 = (cp.reshape(hq, wq, 16, 3).astype(jnp.float32)
                  * 255.0).astype(self._dtype)
        p5 = (prior.reshape(hq, wq, 16, 3).astype(jnp.float32)
              * cert16[..., None]).astype(self._dtype)
        q5 = cert16[..., None].astype(self._dtype)
        o5 = jnp.ones((hq, wq, 16, 1), self._dtype)
        x = jnp.concatenate([c5, p5, q5, o5], -1).reshape(1, hq, wq, 16 * 8)
        x = phase_ops.reflect_pad_phased(x, self.phase_pad_blocks)
        y = self.apply_vid_phased(self.params_vid, x)
        # deprocess + clip in phase space; the recurrence carries f32
        y5 = y[0].reshape(hq, wq, 16, 3).astype(jnp.float32)
        bgr = (y5 + jnp.asarray(VGG_MEAN_BGR, jnp.float32)) / 255.0
        out = jnp.clip(bgr[..., ::-1], 0.0, 1.0).reshape(hq, wq, 48)
        if emit_u8:
            return out, self._quantize_u8(out)
        return out

    def to_phased(self, frame):
        """Full-res (H, W, 3) float32 [0,1] (H, W % 4 == 0) -> the phased
        recurrence carry (hq, wq, 48). One-time entry conversion (first
        frame / resume)."""
        return self._jit_to_phased(jnp.asarray(frame))

    def phased_to_u8(self, y_phased):
        """Phased recurrence carry -> full-res uint8 frame (device array)
        for the writer thread."""
        return self._jit_phased_to_u8(y_phased)

    def stylize_next_phased(self, content, prev_phased, flow_phased,
                            cert_low, band_hint, emit_u8=False):
        """Phase-resident stylize_next. All inputs should already be device
        arrays (the streaming driver's prefetch uploads content once, in
        HOST-phased (hq, wq, 48) form); band_hint is required (the
        streaming provider always knows it). emit_u8=True also returns the
        phased uint8 frame (host d2s in the writer, phase.d2s2_flat_np)."""
        if content.ndim == 3 and content.shape[2] == 48:
            h = content.shape[0] * 4
        else:
            h = content.shape[0]
            if h % 4 or content.shape[1] % 4:
                raise ValueError("phase-resident mode needs H, W % 4 == 0")
        r = h // cert_low.shape[0]
        return self._jit_next_phased(
            jnp.asarray(content), prev_phased, flow_phased, cert_low,
            band=band_hint, r=r, emit_u8=emit_u8)

    # -- feature-reuse mode (keyframe + delta advection) -------------------

    def _split(self, x, **kw):
        return self.apply_vid_split(self.params_vid, x, **kw)

    def _next_full_impl(self, content, prev_stylized, flow, cert, key, band=None):
        """Keyframe step: the exact _next_impl forward, split at the
        residual chain to also return delta = f_blocks - shave(f_front) —
        the advectable 'stylization texture' carried by reuse frames."""
        cert = filters.min_filter(cert, self.config.occlusions_min_filter)
        prior_rgb = self._banded_warp(prev_stylized, flow, band)
        x = self._assemble(content, prior_rgb, cert, key)
        tap, resume, crop = self.reuse_plan
        f = self._split(x.astype(self._dtype), stop_after=tap)
        fb = self._split(f, start_at=tap + 1, stop_after=resume - 1)
        y = self._split(fb, start_at=resume)
        fc = f[:, crop:f.shape[1] - crop, crop:f.shape[2] - crop, :] if crop else f
        out = jnp.clip(vgg_deprocess(y[0]), 0.0, 1.0).astype(jnp.float32)
        return out, (fb.astype(jnp.float32) - fc.astype(jnp.float32))[0]

    def _next_reuse_impl(self, content, prev_stylized, flow, cert, key, delta,
                         band=None, qband=None):
        """Reuse step: recompute the front and tail exactly for THIS frame's
        content, but replace the residual chain with the keyframe's delta
        warped to this frame by feature-grid flow and masked by (eroded)
        certainty — occluded regions fall back to the unstylized-texture
        front features, exactly like the prior image falls back to fill."""
        cert = filters.min_filter(cert, self.config.occlusions_min_filter)
        prior_rgb = self._banded_warp(prev_stylized, flow, band)
        x = self._assemble(content, prior_rgb, cert, key)
        tap, resume, crop = self.reuse_plan
        f = self._split(x.astype(self._dtype), stop_after=tap)
        fc = f[:, crop:f.shape[1] - crop, crop:f.shape[2] - crop, :] if crop else f
        hq, wq = fc.shape[1], fc.shape[2]
        r = content.shape[0] // hq  # feature-grid downsample factor
        fq = jnp.mean(flow.reshape(hq, r, wq, r, 2), axis=(1, 3)) / r
        cq = jnp.min(cert.reshape(hq, r, wq, r), axis=(1, 3))
        dw = warp.bilinear_warp(delta, fq, band=qband) * cq[..., None]
        y = self._split(fc + dw[None].astype(fc.dtype), start_at=resume)
        out = jnp.clip(vgg_deprocess(y[0]), 0.0, 1.0).astype(jnp.float32)
        return out, dw

    # -- host API --------------------------------------------------------

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _pad(self, arr, mode="edge"):
        """Stride padding; stays on device for device-resident inputs."""
        h, w = arr.shape[0], arr.shape[1]
        hp, wp = _round_up(h, self.stride_multiple), _round_up(w, self.stride_multiple)
        if (hp, wp) == (h, w):
            return arr, (h, w)
        pad = [(0, hp - h), (0, wp - w)] + [(0, 0)] * (arr.ndim - 2)
        return jnp.pad(jnp.asarray(arr), pad,
                       mode="edge" if mode == "edge" else "constant"), (h, w)

    def stylize_first(self, content, emit_u8=False):
        """Returns the stylized frame as a DEVICE array (the recurrence
        carry never leaves the chip; call np.asarray for a host copy).
        Content may be uint8 (converted in-program). emit_u8=True also
        returns the quantized uint8 frame from the same fused program."""
        content, (h, w) = self._pad(content)
        out = self._jit_first(jnp.asarray(content)[None], self._next_key(),
                              emit_u8=emit_u8)
        if emit_u8:
            y, u8 = out
            return y[0, :h, :w], u8[0, :h, :w]
        return out[0, :h, :w]

    def stylize_batch(self, contents):
        """Stylize N independent frames in one device step (no temporal
        prior) — the throughput mode for create_inconsistent. Frames may
        have different sizes: each output is cropped to ITS input's (h, w)
        (the batch is padded to the largest frame for the device step)."""
        shapes = [(c.shape[0], c.shape[1]) for c in contents]
        hm = max(h for h, _ in shapes)
        wm = max(w for _, w in shapes)
        hm, wm = _round_up(hm, self.stride_multiple), _round_up(wm, self.stride_multiple)
        padded = [
            np.pad(np.asarray(c), ((0, hm - c.shape[0]), (0, wm - c.shape[1]), (0, 0)),
                   mode="edge")
            for c in contents
        ]
        out = self._jit_first(jnp.asarray(np.stack(padded)), self._next_key())
        return [out[i, :h, :w] for i, (h, w) in enumerate(shapes)]

    def _prep_next(self, content, prev_stylized, flow, cert, band_hint):
        if self.config.exact_warp:
            band = None
        elif band_hint is not None:
            band = band_hint
        elif isinstance(flow, np.ndarray):
            band = warp.flow_band(float(np.abs(flow).max()))
        else:
            # device-side reduction + scalar readback (a host-side
            # np.abs(...).max() would download the whole flow field)
            band = warp.flow_band(float(_maxabs(jnp.asarray(flow))))
        content, (h, w) = self._pad(content)
        prev_stylized, _ = self._pad(prev_stylized)
        flow, _ = self._pad(flow)
        cert, _ = self._pad(cert, mode="constant")  # padded area = occluded
        args = (jnp.asarray(content), jnp.asarray(prev_stylized),
                jnp.asarray(flow), jnp.asarray(cert), self._next_key())
        return args, band, (h, w)

    def stylize_next(self, content, prev_stylized, flow, cert, band_hint=None,
                     emit_u8=False, pre_eroded=False):
        """prev_stylized may be the device array returned by a previous
        stylize_* call — the temporal recurrence then never round-trips
        through the host. band_hint: warp band already known to cover
        |flow| (e.g. from the streaming flow provider) — skips the
        per-frame flow-range readback. Content may be uint8; emit_u8=True
        also returns the quantized uint8 frame from the same fused
        program (saves a full extra pass over the float output)."""
        args, band, (h, w) = self._prep_next(
            content, prev_stylized, flow, cert, band_hint)
        out = self._jit_next(*args, band=band, emit_u8=emit_u8,
                             pre_eroded=pre_eroded)
        if emit_u8:
            y, u8 = out
            return y[:h, :w], u8[:h, :w]
        return out[:h, :w]

    def stylize_next_full(self, content, prev_stylized, flow, cert,
                          band_hint=None):
        """Feature-reuse KEYFRAME: exactly stylize_next's math, plus the
        residual-chain delta as a second return — keep it as the device
        array it is and hand it to stylize_next_reuse."""
        args, band, (h, w) = self._prep_next(
            content, prev_stylized, flow, cert, band_hint)
        out, delta = self._jit_next_full(*args, band=band)
        return out[:h, :w], delta

    def stylize_next_reuse(self, content, prev_stylized, flow, cert, delta,
                           band_hint=None):
        """Feature-reuse IN-BETWEEN frame: front + tail recomputed, the
        residual chain replaced by `delta` (from the last keyframe /
        previous reuse step) advected by feature-grid flow. Returns
        (frame, advected delta) — pass the delta to the next reuse step."""
        args, band, (h, w) = self._prep_next(
            content, prev_stylized, flow, cert, band_hint)
        qband = None
        if band is not None:
            r = max(1, self.stride_multiple)
            qband = warp.flow_band(band / r)
        out, delta = self._jit_next_reuse(*args, delta, band=band, qband=qband)
        return out[:h, :w], delta

    def stylize_with_prior(
        self, content: np.ndarray, prior_rgb: np.ndarray, cert: np.ndarray, erode_cert: bool = True
    ) -> np.ndarray:
        """VR-style entry: the prior image is assembled by the caller
        (e.g. cube-face borders); certainty is still eroded on device."""
        content, (h, w) = self._pad(content)
        prior_rgb, _ = self._pad(prior_rgb)
        cert, _ = self._pad(cert, mode="constant")
        out = self._jit_prior(
            jnp.asarray(content),
            jnp.asarray(prior_rgb),
            jnp.asarray(cert),
            self._next_key(),
            erode=erode_cert,
        )
        return out[:h, :w]
