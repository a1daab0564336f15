"""On-TPU optical flow estimation — a compact PWC-style network.

Replaces the reference's external flow binaries (DeepMatching/DeepFlow CPU,
run-deepflow.sh:14; FlowNet2 Caffe, run-flownet-multiple.sh:11) with a
self-contained estimator so the whole video pipeline runs on one chip
(SURVEY.md §7 stage 6; PWC-Net: Sun et al., CVPR 2018 — pyramid, warping,
cost volume).

Design (TPU-first):
  * Shared 5-level conv feature pyramid (stride-2 convs, NHWC, bf16-safe).
  * Coarse-to-fine refinement: at each level the second image's features are
    warped by the upsampled flow estimate (ops.warp banded path), a local
    correlation cost volume (radius 3 -> 49 channels, built from static
    shifts — no gathers) is fed with features + current flow into a small
    conv stack predicting a flow residual.
  * Final flow upsampled to input resolution and scaled.

Training is supervised on synthetic warps with exact ground truth
(train.data shift/zoom plus random affine/crop pairs) — see flow/train.py.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import warp as warp_ops

# (out_channels per level), finest first. Level l operates at stride 2^(l+1).
PYRAMID_CHANNELS = (16, 32, 64, 96)
COST_RADIUS = 3
ESTIMATOR_CHANNELS = (96, 64, 32)
# context network (PWC-Net sec 3: dilated convs over the finest estimator
# features + flow, predicting a residual). The last conv is ZERO-initialized
# so grafting the head onto existing weights is an exact no-op until trained.
CONTEXT_CHANNELS = (64, 64, 48)
CONTEXT_DILATIONS = (1, 2, 4)
# feature-warp band: level flows rarely exceed a few level-pixels
WARP_BAND = 8

Params = Dict[str, Dict[str, jnp.ndarray]]


def _conv(params, name, x, stride=1, relu=True, dilation=1):
    p = params[name]
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    y = y + p["b"].astype(x.dtype)
    return jax.nn.leaky_relu(y, 0.1) if relu else y


def _conv_s2_phase(params, name, x):
    """Exact phase-domain form of `_conv(..., stride=2)` for a 3x3 kernel and
    even H, W: space-to-depth the input to half resolution (4x channels) and
    run a 2x2 block conv whose kernel is a re-indexing of the 3x3 weights.
    Identity: with XLA SAME padding (pad_lo=0, pad_hi=1 for even H),
    y[i,j] = sum_{u,v<3} w[u,v] x[2i+u, 2j+v]; substituting u = 2*s_y + a_y
    (block shift s, phase a) turns the sum into a 2x2 conv over phase blocks.
    Same rationale as the stylizer front end (models/stylizer.py _phase_front):
    a full-resolution conv with few channels starves the MXU; its phase-domain
    form runs at half resolution with 4x the channels."""
    p = params[name]
    w = p["w"].astype(x.dtype)
    kh, kw, c, cout = w.shape
    n, h, wd, _ = x.shape
    h2, w2 = h // 2, wd // 2
    xp = x.reshape(n, h2, 2, w2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xp = xp.reshape(n, h2, w2, 4 * c)
    # w2p[s_y, s_x, (a_y*2+a_x)*c + ch, o] = w[2*s_y+a_y, 2*s_x+a_x, ch, o]
    wpad = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    w2p = wpad.reshape(2, 2, 2, 2, c, cout).transpose(0, 2, 1, 3, 4, 5)
    w2p = w2p.reshape(2, 2, 4 * c, cout)
    y = jax.lax.conv_general_dilated(
        xp, w2p, window_strides=(1, 1), padding=((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    y = y + p["b"].astype(x.dtype)
    return jax.nn.leaky_relu(y, 0.1)


def _init_conv(key, k, cin, cout):
    k1, k2 = jax.random.split(key)
    scale = (2.0 / (k * k * cin)) ** 0.5
    return {
        "w": jax.random.normal(k1, (k, k, cin, cout), jnp.float32) * scale,
        "b": jnp.zeros((cout,), jnp.float32),
    }


def init_params(key, context: bool = False) -> Params:
    params: Params = {}
    cin = 3
    for lvl, cout in enumerate(PYRAMID_CHANNELS):
        key, k1, k2 = jax.random.split(key, 3)
        params[f"pyr{lvl}_a"] = _init_conv(k1, 3, cin, cout)
        params[f"pyr{lvl}_b"] = _init_conv(k2, 3, cout, cout)
        cin = cout
    cost_ch = (2 * COST_RADIUS + 1) ** 2
    for lvl in range(len(PYRAMID_CHANNELS)):
        cin_est = cost_ch + PYRAMID_CHANNELS[lvl] + 2
        for i, cout in enumerate(ESTIMATOR_CHANNELS):
            key, k1 = jax.random.split(key)
            params[f"est{lvl}_{i}"] = _init_conv(k1, 3, cin_est, cout)
            cin_est = cout
        key, k1 = jax.random.split(key)
        params[f"est{lvl}_out"] = _init_conv(k1, 3, cin_est, 2)
    if context:
        key, k1 = jax.random.split(key)
        params.update(init_context(k1))
    return params


def init_context(key) -> Params:
    """The context-head parameter group alone (see CONTEXT_CHANNELS). The
    output conv is zero so adding the group to trained weights changes
    nothing until fine-tuned (`add_context`)."""
    params: Params = {}
    cin = ESTIMATOR_CHANNELS[-1] + 2  # finest est features + flow
    for i, cout in enumerate(CONTEXT_CHANNELS):
        key, k1 = jax.random.split(key)
        params[f"ctx_{i}"] = _init_conv(k1, 3, cin, cout)
        cin = cout
    params["ctx_out"] = {
        "w": jnp.zeros((3, 3, cin, 2), jnp.float32),
        "b": jnp.zeros((2,), jnp.float32),
    }
    return params


def add_context(params: Params, key) -> Params:
    """Graft a (no-op) context head onto existing weights — the fine-tune
    entry point for upgrading the bundled checkpoint in place."""
    if "ctx_out" in params:
        return params
    out = dict(params)
    out.update(init_context(key))
    return out


def _pyramid(params, img):
    feats = []
    x = img
    for lvl in range(len(PYRAMID_CHANNELS)):
        if lvl == 0 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            # level 0 runs at input resolution with 3 channels — the one
            # MXU-starved conv; take the exact phase-domain form
            x = _conv_s2_phase(params, "pyr0_a", x)
        else:
            x = _conv(params, f"pyr{lvl}_a", x, stride=2)
        x = _conv(params, f"pyr{lvl}_b", x, stride=1)
        feats.append(x)
    return feats


def extract_pyramid(params, img):
    """Mean-normalized shared feature pyramid (finest first) for one image
    batch (N, H, W, 3). Exposed separately from `apply` so streaming callers
    can compute each frame's pyramid ONCE and reuse it for both flow
    directions and for the next frame pair (flow/provider.py)."""
    mean = jnp.asarray([0.45, 0.45, 0.45], img.dtype)
    return _pyramid(params, img - mean)


def refine(params, f1s, f2s, collect: bool = False, skip_finest: int = 0,
           init_flow=None, run_levels: int = None):
    """Coarse-to-fine refinement given two feature pyramids. Returns the
    full-resolution flow (pyramid-input resolution), or — with collect —
    the per-level estimates (coarsest first, level pixel units).

    skip_finest=k stops the refinement k levels early and upsamples the
    coarser estimate to full resolution — the finest level is ~30% of a
    direction's cost, and a direction that only feeds the consistency
    check (whose mask is 7x7-eroded afterwards) tolerates 2x-coarser
    boundaries (quality ledger in BENCH_NOTES).

    init_flow + run_levels: start refinement at level
    (skip_finest + run_levels - 1) from `init_flow` (that level's pixel
    units) instead of zeros at the coarsest — the fast cross-check path
    initializes the b->a direction from the negated a->b flow and refines
    a single level (refine_pair fast_check)."""
    flow = None
    outs: List[jnp.ndarray] = []
    top = len(PYRAMID_CHANNELS)
    if run_levels is not None:
        top = skip_finest + run_levels
    for lvl in reversed(range(skip_finest, top)):
        f1, f2 = f1s[lvl], f2s[lvl]
        if flow is None and init_flow is not None:
            flow = init_flow.astype(jnp.float32)
            f2w = warp_ops.bilinear_warp(f2, flow, band=WARP_BAND)
        elif flow is None:
            flow = jnp.zeros(f1.shape[:3] + (2,), jnp.float32)
            f2w = f2
        else:
            flow = _upsample2_flow(flow)
            f2w = warp_ops.bilinear_warp(f2, flow, band=WARP_BAND)
        cost = jax.nn.leaky_relu(_cost_volume(f1, f2w, COST_RADIUS), 0.1)
        x = jnp.concatenate([cost, f1, flow.astype(f1.dtype)], axis=-1)
        for i in range(len(ESTIMATOR_CHANNELS)):
            x = _conv(params, f"est{lvl}_{i}", x)
        flow = flow + _conv(params, f"est{lvl}_out", x, relu=False).astype(jnp.float32)
        if lvl == 0 and "ctx_out" in params:
            # context head (PWC-Net): dilated convs over the finest
            # estimator features + flow -> flow residual. Only the finest
            # level — coarser early-exit paths (skip_finest/fast_check's
            # cross-check direction) feed the 7x7-eroded consistency mask
            # and keep the cheap form.
            cx = jnp.concatenate([x, flow.astype(x.dtype)], axis=-1)
            for i, dil in enumerate(CONTEXT_DILATIONS):
                cx = _conv(params, f"ctx_{i}", cx, dilation=dil)
            flow = flow + _conv(params, "ctx_out", cx,
                                relu=False).astype(jnp.float32)
        if collect:
            outs.append(flow)
    if collect:
        return outs
    for _ in range(1 + skip_finest):
        flow = _upsample2_flow(flow)
    return flow


def _cost_volume(f1, f2w, radius: int):
    """Local correlation from static shifts (no gathers). f*: (N, H, W, C)."""
    n, h, w, c = f1.shape
    norm = jnp.asarray(1.0 / c, f1.dtype)
    pad = jnp.pad(f2w, ((0, 0), (radius, radius), (radius, radius), (0, 0)))
    rows = []
    for dy in range(2 * radius + 1):
        for dx in range(2 * radius + 1):
            shifted = jax.lax.dynamic_slice(pad, (0, dy, dx, 0), (n, h, w, c))
            rows.append(jnp.sum(f1 * shifted, axis=-1) * norm)
    return jnp.stack(rows, axis=-1)


def _upsample2_flow(flow):
    n, h, w, _ = flow.shape
    up = jnp.broadcast_to(flow[:, :, None, :, None, :], (n, h, 2, w, 2, 2))
    return up.reshape(n, 2 * h, 2 * w, 2) * 2.0


def apply(params: Params, img1, img2):
    """img1, img2: (N, H, W, 3) RGB [0,1], H and W divisible by
    2**(len(PYRAMID_CHANNELS)). Returns flow (N, H, W, 2) (dx, dy) in pixels
    mapping img1 pixels to img2 positions."""
    return refine(params, extract_pyramid(params, img1), extract_pyramid(params, img2))


def apply_multiscale(params, img1, img2):
    """Training variant: returns the flow estimate at every pyramid level
    (finest-last), in pixel units of that level."""
    return refine(params, extract_pyramid(params, img1),
                  extract_pyramid(params, img2), collect=True)


STRIDE = 2 ** len(PYRAMID_CHANNELS)


def pad_to_stride(img: np.ndarray) -> Tuple[np.ndarray, Tuple[int, int]]:
    h, w = img.shape[0], img.shape[1]
    hp = -(-h // STRIDE) * STRIDE
    wp = -(-w // STRIDE) * STRIDE
    if (hp, wp) == (h, w):
        return img, (h, w)
    return np.pad(img, ((0, hp - h), (0, wp - w), (0, 0)), mode="edge"), (h, w)


class FlowEstimator:
    """Host-facing wrapper: pads, runs both directions, caches jits.

    `device` pins the estimator to a specific chip — with >=2 devices the
    flow stage and the stylizer can run on different chips, the in-process
    analog of the reference's concurrent flow producer (SURVEY.md §2.5 PP
    row; stylizeVideo_deepflow.sh:80-82)."""

    def __init__(self, params: Params, dtype=jnp.float32, device=None):
        self.device = device
        if device is not None:
            params = jax.device_put(params, device)
        self.params = params
        self._dtype = dtype
        self._jit = jax.jit(lambda a, b: apply(self.params, a, b))
        self._prep_cache: dict = {}
        self._pair_cache: dict = {}

    def flow(self, img1: np.ndarray, img2: np.ndarray) -> np.ndarray:
        """Flow mapping img1 -> img2, full resolution, (H, W, 2) (dx, dy)."""
        p1, (h, w) = pad_to_stride(img1)
        p2, _ = pad_to_stride(img2)
        a = jnp.asarray(p1, self._dtype)[None]
        b = jnp.asarray(p2, self._dtype)[None]
        if self.device is not None:
            a = jax.device_put(a, self.device)
            b = jax.device_put(b, self.device)
        out = self._jit(a, b)
        return np.asarray(out)[0, :h, :w].astype(np.float32)

    def flow_pair(self, img1, img2):
        """(forward img1->img2, backward img2->img1)."""
        return self.flow(img1, img2), self.flow(img2, img1)

    # -- streaming path (device-resident, pyramid reuse) -------------------

    def prep(self, frame, flow_scale: float = 1.0):
        """Device-resident feature pyramid for one frame (H, W, 3) RGB [0,1],
        optionally estimated at `flow_scale` resolution. One jit computes
        resize + pad-to-stride + pyramid. The returned tuple is the cacheable
        half of a flow computation: the streaming provider keeps the previous
        frame's pyramid so each new frame costs ONE pyramid instead of the
        four that two independent `flow()` calls would spend."""
        h, w = frame.shape[:2]
        key = (h, w, float(flow_scale))
        fn = self._prep_cache.get(key)
        if fn is None:
            if flow_scale != 1.0:
                hs, ws = int(round(h * flow_scale)), int(round(w * flow_scale))
            else:
                hs, ws = h, w
            hp, wp = -(-hs // STRIDE) * STRIDE, -(-ws // STRIDE) * STRIDE

            def _prep(x):
                if x.dtype == jnp.uint8:
                    x = x.astype(self._dtype) / 255.0
                else:
                    x = x.astype(self._dtype)
                if (hs, ws) != (h, w):
                    x = jax.image.resize(x, (hs, ws, 3), "bilinear")
                if (hp, wp) != (hs, ws):
                    x = jnp.pad(x, ((0, hp - hs), (0, wp - ws), (0, 0)), mode="edge")
                return tuple(extract_pyramid(self.params, x[None]))

            fn = jax.jit(_prep)
            self._prep_cache[key] = fn
        x = jnp.asarray(frame)
        if self.device is not None:
            x = jax.device_put(x, self.device)
        return fn(x)

    def prep_batch(self, frames, flow_scale: float = 1.0):
        """Batched `prep`: frames (N, H, W, 3) -> pyramid tuple with leading
        batch axis. The VR driver feeds all 6 cube faces of a frame in ONE
        program — the pyramid convs batch ~4x better than 6 sequential
        dispatches (BENCH_NOTES VR section)."""
        n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
        key = ("batch", n, h, w, float(flow_scale))
        fn = self._prep_cache.get(key)
        if fn is None:
            if flow_scale != 1.0:
                hs, ws = int(round(h * flow_scale)), int(round(w * flow_scale))
            else:
                hs, ws = h, w
            hp, wp = -(-hs // STRIDE) * STRIDE, -(-ws // STRIDE) * STRIDE

            def _prep(x):
                if x.dtype == jnp.uint8:
                    x = x.astype(self._dtype) / 255.0
                else:
                    x = x.astype(self._dtype)
                if (hs, ws) != (h, w):
                    x = jax.image.resize(x, (n, hs, ws, 3), "bilinear")
                if (hp, wp) != (hs, ws):
                    x = jnp.pad(x, ((0, 0), (0, hp - hs), (0, wp - ws), (0, 0)),
                                mode="edge")
                return tuple(extract_pyramid(self.params, x))

            fn = jax.jit(_prep)
            self._prep_cache[key] = fn
        x = jnp.asarray(frames)
        if self.device is not None:
            x = jax.device_put(x, self.device)
        return fn(x)

    def refine_pair_batch(self, feats_a, feats_b, out_hw,
                          flow_scale: float = 1.0, fast_check: bool = False):
        """Batched streaming pair: both flow directions for N independent
        frame pairs in one program. Returns
        (flow_ab_full (N,H,W,2), flow_ab_low, flow_ba_low, maxabs_low) —
        the flow-res consistency layout of ``refine_pair(with_lowres=True)``
        with a leading batch axis; maxabs_low is the max over the whole
        batch (one shared band bucket for all faces). fast_check as in
        refine_pair (the VR driver's 6-face flow is the main batch user)."""
        h, w = out_hw
        key = ("batch", tuple(f.shape for f in feats_a), h, w,
               float(flow_scale), bool(fast_check))
        fn = self._pair_cache.get(key)
        if fn is None:
            if flow_scale != 1.0:
                hs, ws = int(round(h * flow_scale)), int(round(w * flow_scale))
            else:
                hs, ws = h, w

            def _pair(fa, fb):
                n = fa[0].shape[0]
                if fast_check:
                    outs = refine(self.params, list(fa), list(fb),
                                  collect=True)
                    low_ab = _upsample2_flow(outs[-1])[:, :hs, :ws]
                    fab1 = outs[len(PYRAMID_CHANNELS) - 2]
                    init = -warp_ops.bilinear_warp(fab1, -fab1,
                                                   band=WARP_BAND)
                    low_ba = refine(self.params, list(fb), list(fa),
                                    init_flow=init, run_levels=1,
                                    skip_finest=1)[:, :hs, :ws]
                else:
                    low_ab = refine(self.params, list(fa), list(fb))[:, :hs, :ws]
                    low_ba = refine(self.params, list(fb), list(fa))[:, :hs, :ws]
                full = low_ab
                if (hs, ws) != (h, w):
                    full = jax.image.resize(
                        low_ab, (n, h, w, 2), "bilinear") / flow_scale
                return full, low_ab, low_ba, jnp.max(jnp.abs(low_ab))

            fn = jax.jit(_pair)
            self._pair_cache[key] = fn
        return fn(tuple(feats_a), tuple(feats_b))

    def refine_pair(self, feats_a, feats_b, out_hw, flow_scale: float = 1.0,
                    with_lowres: bool = False, coarse_backward: bool = False,
                    fast_check: bool = False, phased_up: bool = False):
        """Both flow directions from two cached pyramids, in ONE compiled
        program.

        fast_check=True computes the cross-check (b->a) direction the fast
        way: initialize pyramid level 1 with the negated-and-self-warped
        a->b flow (the first-order backward-flow inverse — exact where the
        field is smooth and invertible, i.e. everywhere except occlusions)
        and refine ONLY that level. The estimator corrects the init
        wherever the features disagree, so round-trip failures at true
        occlusions survive; the warp (a->b) flow is untouched. Takes
        precedence over coarse_backward. Quality/speed ledger in
        BENCH_NOTES ("fast cross-check").

        coarse_backward=True refines the CROSS-CHECK direction (the second,
        b->a flow — what the streaming provider labels `forward`; it feeds
        only the consistency check) one pyramid level less. The returned
        a->b warp flow is always full-quality. ~18% cheaper pair at 540p
        for a 92% identical mask; ~4.6% of non-occluded pixels are
        additionally (conservatively) flagged unreliable — measured on the
        held-out protocols, BENCH_NOTES.

        with_lowres=False: (flow_ab, flow_ba, maxabs_ab) — flows (H, W, 2)
        float32 device arrays cropped/upsampled to `out_hw` in full-res pixel
        units, maxabs_ab = max |flow_ab| (a scalar the provider reads back to
        pick the banded-consistency bucket without an extra dispatch).

        with_lowres=True (the streaming provider's flow-res consistency
        path): (flow_ab_full, flow_ab_low, flow_ba_low, maxabs_low) — only
        the checked direction is upsampled; both directions are also
        returned at the estimation resolution in estimation-res pixel units
        for the consistency check, and maxabs_low is in those units.

        phased_up=True (the phase-resident engine): the full-res checked
        flow is returned in the flat 16-phase layout (hq, wq, 16, 2)
        (ops.phase.s2d2_flat of the upsampled flow, computed inside the
        jit) instead of (H, W, 2). Requires H, W % 4 == 0."""
        h, w = out_hw
        skip = 1 if coarse_backward else 0
        key = (tuple(f.shape for f in feats_a), h, w, float(flow_scale),
               bool(with_lowres), skip, bool(fast_check), bool(phased_up))
        fn = self._pair_cache.get(key)
        if fn is None:
            if flow_scale != 1.0:
                hs, ws = int(round(h * flow_scale)), int(round(w * flow_scale))
            else:
                hs, ws = h, w

            def _up(flow):
                if phased_up and (h, w) in ((2 * hs, 2 * ws),
                                            (4 * hs, 4 * ws)):
                    # upsample + unit rescale + s2d as ONE phase-space conv:
                    # the full-res (H, W, 2) tensor (whose s2d transpose is
                    # lane-sparse layout work, ~1.4 ms at 1080p) never exists
                    from ..ops.phase import upsample_flow_phased

                    return upsample_flow_phased(
                        flow, h // hs, 1.0 / flow_scale)
                if (hs, ws) != (h, w):
                    flow = jax.image.resize(flow, (h, w, 2), "bilinear") / flow_scale
                if phased_up:
                    from ..ops.phase import s2d2_flat

                    return s2d2_flat(flow[None])[0].reshape(
                        h // 4, w // 4, 16, 2)
                return flow

            def _directions(fa, fb):
                """(low_ab, low_ba) at estimation res, est-res pixel units."""
                if not fast_check:
                    low_ab = refine(self.params, list(fa), list(fb))[0, :hs, :ws]
                    low_ba = refine(self.params, list(fb), list(fa),
                                    skip_finest=skip)[0, :hs, :ws]
                    return low_ab, low_ba
                outs = refine(self.params, list(fa), list(fb), collect=True)
                low_ab = _upsample2_flow(outs[-1])[0, :hs, :ws]
                fab1 = outs[len(PYRAMID_CHANNELS) - 2]  # level-1 estimate
                init = -warp_ops.bilinear_warp(fab1, -fab1, band=WARP_BAND)
                low_ba = refine(self.params, list(fb), list(fa),
                                init_flow=init, run_levels=1,
                                skip_finest=1)[0, :hs, :ws]
                return low_ab, low_ba

            if with_lowres:
                def _pair(fa, fb):
                    low_ab, low_ba = _directions(fa, fb)
                    return (_up(low_ab), low_ab, low_ba,
                            jnp.max(jnp.abs(low_ab)))
            else:
                def _pair(fa, fb):
                    low_ab, low_ba = _directions(fa, fb)
                    return _up(low_ab), _up(low_ba), jnp.max(jnp.abs(low_ab))

            fn = jax.jit(_pair)
            self._pair_cache[key] = fn
        return fn(tuple(feats_a), tuple(feats_b))


def save_params(path: str, params: Params) -> None:
    flat = {}
    for name, leaves in params.items():
        for k, v in leaves.items():
            flat[f"{name}/{k}"] = np.asarray(v)
    np.savez(path, **flat)


def load_params(path: str) -> Params:
    """Load estimator weights from .npz; the literal string ``bundled``
    resolves to the in-tree trained checkpoint (assets/flow_pwclite.npz),
    so every CLI accepts ``--flow_model bundled`` without an external
    download — unlike the reference, which requires DeepFlow/FlowNet2
    binaries and weights (run-flownet-multiple.sh:11)."""
    if path == "bundled":
        path = os.path.join(os.path.dirname(__file__), "..", "assets",
                            "flow_pwclite.npz")
    params: Params = {}
    with np.load(path) as z:
        for key in z.files:
            name, leaf = key.rsplit("/", 1)
            params.setdefault(name, {})[leaf] = jnp.asarray(z[key])
    return params
