"""Quantitative evaluation — the reference's ``-evaluate`` mode.

2D video (fast_artistic_video.lua:128-151 + core.lua:101-106):
  per frame: [style_loss, content_loss, temporal_loss] where the perceptual
  terms come from the VGG loss network against the style image and the
  current content frame, and the temporal term is the MSE between the
  flow-warped previous stylized frame and the current one, masked by the
  ground-truth (e.g. Sintel) occlusion map. ``backward_eval`` warps the
  current frame backward instead (for forward-only GT flow).

VR (fast_artistic_video_vr.lua:312-452): adds per-face seam metrics —
  gradient ratios along stitch borders (masked/unmasked mean gradient) and
  cross-face edge MSE.

Reference quirks handled deliberately (SURVEY.md §7 "faithful-vs-fixed"):
  * evaluate_edge_top ignores its first argument and compares img2's top row
    against img2's own edge (:327-341) — we compare img1's top row against
    img2's edge, which is plainly what was meant.
  * the VR eval reads the undeclared opt.reliable_map_min_filter (nil at
    runtime, :408-424) — we use occlusions_min_filter.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..core import io
from ..core.config import StylizeOptions, format_flow_name, parse_layers
from ..ops import filters, warp
from ..ops.preprocess import vgg_preprocess
from ..train import losses
from . import vr_geometry as vr


def load_vgg_params(path: str):
    """Load VGG-16 loss-network weights: either the flattened .npz produced
    by the t7 importer (keys 'convNN/w'), or a Torch vgg16.t7 directly."""
    if path.endswith(".t7"):
        from ..models import t7 as t7_mod

        params = t7_mod.import_vgg16(t7_mod.load_t7(path))
        return {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
                for k, v in params.items()}
    params = {}
    with np.load(path) as z:
        for k in z.files:
            layer, leaf = k.rsplit("/", 1)
            params.setdefault(layer, {})[leaf] = jnp.asarray(z[k])
    return params


class PerceptualScorer:
    """Style/content scoring of a stylized frame (core.lua:76-106)."""

    def __init__(self, opt: StylizeOptions):
        style_layers, style_weights = parse_layers(opt.style_layers, opt.style_weights)
        content_layers, content_weights = parse_layers(opt.content_layers, opt.content_weights)
        self.cfg = losses.PerceptualConfig(
            style_layers=tuple(int(l) for l in style_layers),
            style_weights=tuple(style_weights),
            content_layers=tuple(int(l) for l in content_layers),
            content_weights=tuple(content_weights),
            agg_type=opt.style_target_type,
        )
        if not opt.loss_network:
            raise ValueError("--evaluate requires --loss_network (VGG-16 weights)")
        self.vgg_params = load_vgg_params(opt.loss_network)
        style = io.load_image(opt.style_image)
        style = _scale_shorter(style, opt.style_image_size)
        pre = vgg_preprocess(jnp.asarray(style))[None]
        self.style_tgts = losses.style_targets(self.vgg_params, pre, self.cfg)

        import jax

        def _score(stylized, content):
            x = vgg_preprocess(stylized)[None]
            tgt = vgg_preprocess(content)[None]
            _, per_layer = losses.perceptual_loss(
                self.vgg_params, x, tgt, self.style_tgts, self.cfg
            )
            style = sum(v for k, v in per_layer.items() if k.startswith("style"))
            cont = sum(v for k, v in per_layer.items() if k.startswith("content"))
            return style, cont

        self._score = jax.jit(_score)

    def __call__(self, content: np.ndarray, stylized: np.ndarray):
        style, cont = self._score(jnp.asarray(stylized, jnp.float32),
                                  jnp.asarray(content, jnp.float32))
        return float(style), float(cont)


def temporal_error(prev_stylized, stylized, flow, cert, backward_eval=False):
    """Masked warp MSE (fast_artistic_video.lua:133-146). cert: (H, W)."""
    c3 = cert[..., None]
    if backward_eval:
        warped = np.asarray(warp.bilinear_warp(jnp.asarray(stylized), jnp.asarray(flow)))
        a, b = warped * c3, prev_stylized * c3
    else:
        warped = np.asarray(
            warp.bilinear_warp(jnp.asarray(prev_stylized), jnp.asarray(flow))
        )
        a, b = warped * c3, stylized * c3
    return float(np.mean((a - b) ** 2))


class VideoEvaluator:
    """eval_fn for VideoDriver: returns [style, content, temporal] per frame
    (core.lua:214-226 ordering)."""

    def __init__(self, opt: StylizeOptions):
        self.opt = opt
        self.scorer = PerceptualScorer(opt)

    def __call__(self, i: int, content, stylized, prev_stylized) -> List[float]:
        opt = self.opt
        style, cont = self.scorer(content, stylized)
        temporal = 0.0
        if i > 1 and prev_stylized is not None and opt.flow_pattern_eval:
            flow = io.read_flo(format_flow_name(opt.flow_pattern_eval, i - 1, i))
            cert = io.load_image(
                format_flow_name(opt.occlusions_pattern_eval, i - 1, i), num_channels=1
            )[..., 0]
            if opt.invert_occlusion_eval:
                cert = 1.0 - cert
            if opt.fix_occlusions_eval:
                from .driver_video import fix_occlusions_mask

                cert = fix_occlusions_mask(cert, flow)
            temporal = temporal_error(prev_stylized, stylized, flow, cert,
                                      opt.backward_eval)
        return [style, cont, temporal]


# ---------------------------------------------------------------------------
# VR seam metrics
# ---------------------------------------------------------------------------

def _grad_valid(img: np.ndarray, axis: int) -> np.ndarray:
    """|central difference| over channels-max, valid region (the reference's
    max over per-channel |torch.conv2(x, [-1,0,1], 'V')|, :344-358)."""
    if axis == 1:
        g = np.abs(img[:, 2:] - img[:, :-2])
    else:
        g = np.abs(img[2:] - img[:-2])
    return g.max(axis=-1)


def _maxpool3_same(x: np.ndarray) -> np.ndarray:
    xp = np.pad(x, 1, mode="constant", constant_values=-np.inf)
    out = x.copy()
    for dy in range(3):
        for dx in range(3):
            out = np.maximum(out, xp[dy : dy + x.shape[0], dx : dx + x.shape[1]])
    return out


def gradient_ratios(img: np.ndarray, mask: np.ndarray):
    """Seam gradient ratios (fast_artistic_video_vr.lua:344-387): how much
    stronger image gradients are along mask edges vs the whole face."""
    gx = _grad_valid(img, 1)              # (H, W-2)
    gy = _grad_valid(img, 0)              # (H-2, W)
    mask3 = mask[..., None]
    mgx = _maxpool3_same(_grad_valid(mask3, 1))
    mgy = _maxpool3_same(_grad_valid(mask3, 0))
    full_x = gx.sum() / gx.size
    full_y = gy.sum() / gy.size
    masked_x = (gx * mgx).sum() / max(mgx.sum(), 1e-12)
    masked_y = (gy * mgy).sum() / max(mgy.sum(), 1e-12)
    rx = masked_x / max(full_x, 1e-12)
    ry = masked_y / max(full_y, 1e-12)
    rmag = (rx * mgx.sum() + ry * mgy.sum()) / max(mgx.sum() + mgy.sum(), 1e-12)
    return float(rx), float(ry), float(rmag)


def edge_mse(img1: np.ndarray, img2: np.ndarray, edge: str) -> float:
    """MSE between touching edges (:312-319)."""
    if edge == "left":
        return float(np.mean((img1[:, 0] - img2[:, -1]) ** 2))
    if edge == "top":
        return float(np.mean((img1[0, :] - img2[-1, :]) ** 2))
    raise ValueError(edge)


def edge_mse_top(img1: np.ndarray, img2: np.ndarray, edge_other: str) -> float:
    """Top-face seams: img1's top row vs a rotated edge of img2 (:327-341;
    see module docstring for the fixed first-argument semantics)."""
    side1 = img1[0, :]
    if edge_other == "left":
        side2 = img2[:, 0]
    elif edge_other == "right":
        side2 = img2[:, -1][::-1]
    elif edge_other == "top":
        side2 = img2[0, :][::-1]
    elif edge_other == "bottom":
        side2 = img2[-1, :]
    else:
        raise ValueError(edge_other)
    return float(np.mean((side1 - side2) ** 2))


class VREvaluator:
    """eval_fn for VRDriver: per face returns
    [gradx_ratio, grady_ratio, gradmag_ratio, edge, style, content, temporal]
    (fast_artistic_video_vr.lua:403-452)."""

    def __init__(self, opt):
        self.opt = opt
        self.scorer = PerceptualScorer(opt)

    def __call__(self, driver, i: int) -> Optional[List[float]]:
        opt = self.opt
        g = driver.geo
        pos = (i - 1) % 6
        seg = [np.asarray(x) if x is not None else None for x in driver.segments]
        mf = opt.occlusions_min_filter

        def trim(t):
            ow, oh = opt.overlap_pixel_w // 2, opt.overlap_pixel_h // 2
            return t[oh : t.shape[0] - oh, ow : t.shape[1] - ow]

        def erode(m):
            return np.asarray(filters.min_filter(jnp.asarray(m), mf))

        gradx = grady = gradmag = edge = 0.0
        if pos == 1:
            gradx, grady, gradmag = gradient_ratios(seg[1], erode(g.mask_left))
            edge = edge_mse(trim(seg[0]), trim(seg[1]), "left")
        elif pos == 2:
            gradx, grady, gradmag = gradient_ratios(seg[2], erode(g.mask_right))
            edge = edge_mse(trim(seg[2]), trim(seg[0]), "left")
        elif pos == 3:
            gradx, grady, gradmag = gradient_ratios(
                seg[3], erode(g.mask_right + g.mask_left)
            )
            edge = edge_mse(trim(seg[1]), trim(seg[3]), "left")
        elif pos == 4:
            gradx, grady, gradmag = gradient_ratios(seg[4], erode(g.mask_all))
            edge = (
                edge_mse_top(trim(seg[0]), trim(seg[4]), "top")
                + edge_mse_top(trim(seg[1]), trim(seg[4]), "right")
                + edge_mse_top(trim(seg[2]), trim(seg[4]), "left")
                + edge_mse_top(trim(seg[3]), trim(seg[4]), "bottom")
            ) / 4
        elif pos == 5:
            gradx, grady, gradmag = gradient_ratios(seg[5], erode(g.mask_all))

        style, cont = self.scorer(driver.last_content, np.asarray(seg[pos]))
        temporal = 0.0
        has_patterns = bool(opt.flow_pattern_eval or opt.flow_pattern)
        if i > 6 and has_patterns and not getattr(opt, "no_consistency_eval", False):
            file_idx = (i - 1) // 6 + opt.start_frame
            from .driver_vr import PROC_ORDER

            pat_f = opt.flow_pattern_eval or opt.flow_pattern
            pat_c = opt.occlusions_pattern_eval or opt.occlusions_pattern
            fname = format_flow_name(pat_f, file_idx - 1, file_idx)
            cname = format_flow_name(pat_c, file_idx - 1, file_idx)
            if "%" in fname:
                fname = fname % PROC_ORDER[pos]
            if "%" in cname:
                cname = cname % PROC_ORDER[pos]
            flow = io.read_flo(fname)
            cert = io.load_image(cname, num_channels=1)[..., 0]
            if opt.invert_occlusion_eval:
                cert = 1.0 - cert
            temporal = temporal_error(
                driver.prev_segments[pos], seg[pos], flow, cert, opt.backward_eval
            )
        return [gradx, grady, gradmag, edge, style, cont, temporal]


def _scale_shorter(img: np.ndarray, size: int) -> np.ndarray:
    import jax

    h, w = img.shape[:2]
    if h < w:
        nh, nw = size, max(1, round(w * size / h))
    else:
        nh, nw = max(1, round(h * size / w)), size
    return np.asarray(
        jax.image.resize(jnp.asarray(img), (nh, nw, img.shape[2]), method="bilinear")
    )


def ssim(a: np.ndarray, b: np.ndarray, window: int = 7) -> float:
    """Mean SSIM between two [0,1] images (H, W, C) — the parity metric
    named in BASELINE.json ("temporal warp error + SSIM parity"). Uniform
    window, standard constants (K1=0.01, K2=0.03, L=1)."""
    c1, c2 = 0.01**2, 0.03**2
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]

    def box(x):
        k = window
        out = np.cumsum(np.cumsum(np.pad(x, ((1, 0), (1, 0), (0, 0))), 0), 1)
        s = out[k:, k:] - out[:-k, k:] - out[k:, :-k] + out[:-k, :-k]
        return s / (k * k)

    mu_a, mu_b = box(a), box(b)
    var_a = box(a * a) - mu_a**2
    var_b = box(b * b) - mu_b**2
    cov = box(a * b) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    return float(np.mean(num / den))
