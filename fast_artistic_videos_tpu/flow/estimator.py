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
    correlation cost volume (radius 4 -> 81 channels, built from static
    shifts — no gathers) is fed with features + current flow into a small
    conv stack predicting a flow residual.
  * Final flow upsampled to input resolution and scaled.

Training is supervised on synthetic warps with exact ground truth
(train.data shift/zoom plus random affine/crop pairs) — see flow/train.py.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import warp as warp_ops

# (out_channels per level), finest first. Level l operates at stride 2^(l+1).
PYRAMID_CHANNELS = (16, 32, 64, 96)
COST_RADIUS = 3
ESTIMATOR_CHANNELS = (96, 64, 32)
# feature-warp band: level flows rarely exceed a few level-pixels
WARP_BAND = 8

Params = Dict[str, Dict[str, jnp.ndarray]]


def _conv(params, name, x, stride=1, relu=True):
    p = params[name]
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    y = y + p["b"].astype(x.dtype)
    return jax.nn.leaky_relu(y, 0.1) if relu else y


def _init_conv(key, k, cin, cout):
    k1, k2 = jax.random.split(key)
    scale = (2.0 / (k * k * cin)) ** 0.5
    return {
        "w": jax.random.normal(k1, (k, k, cin, cout), jnp.float32) * scale,
        "b": jnp.zeros((cout,), jnp.float32),
    }


def init_params(key) -> Params:
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
    return params


def _pyramid(params, img):
    feats = []
    x = img
    for lvl in range(len(PYRAMID_CHANNELS)):
        x = _conv(params, f"pyr{lvl}_a", x, stride=2)
        x = _conv(params, f"pyr{lvl}_b", x, stride=1)
        feats.append(x)
    return feats


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
    mean = jnp.asarray([0.45, 0.45, 0.45], img1.dtype)
    f1s = _pyramid(params, img1 - mean)
    f2s = _pyramid(params, img2 - mean)
    flow = None
    for lvl in reversed(range(len(PYRAMID_CHANNELS))):
        f1, f2 = f1s[lvl], f2s[lvl]
        if flow is None:
            flow = jnp.zeros(f1.shape[:3] + (2,), jnp.float32)
            f2w = f2
        else:
            flow = _upsample2_flow(flow)
            f2w = warp_ops.bilinear_warp(f2, flow, band=WARP_BAND)
        cost = jax.nn.leaky_relu(_cost_volume(f1, f2w, COST_RADIUS), 0.1)
        x = jnp.concatenate([cost, f1, flow.astype(f1.dtype)], axis=-1)
        for i in range(len(ESTIMATOR_CHANNELS)):
            x = _conv(params, f"est{lvl}_{i}", x)
        residual = _conv(params, f"est{lvl}_out", x, relu=False).astype(jnp.float32)
        flow = flow + residual
    # finest pyramid level is stride 2: one more upsample to full res
    return _upsample2_flow(flow)


def apply_multiscale(params, img1, img2):
    """Training variant: returns the flow estimate at every pyramid level
    (finest-last), in pixel units of that level."""
    mean = jnp.asarray([0.45, 0.45, 0.45], img1.dtype)
    f1s = _pyramid(params, img1 - mean)
    f2s = _pyramid(params, img2 - mean)
    flow = None
    outs: List[jnp.ndarray] = []
    for lvl in reversed(range(len(PYRAMID_CHANNELS))):
        f1, f2 = f1s[lvl], f2s[lvl]
        if flow is None:
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
        outs.append(flow)
    return outs


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


def save_params(path: str, params: Params) -> None:
    flat = {}
    for name, leaves in params.items():
        for k, v in leaves.items():
            flat[f"{name}/{k}"] = np.asarray(v)
    np.savez(path, **flat)


def load_params(path: str) -> Params:
    params: Params = {}
    with np.load(path) as z:
        for key in z.files:
            name, leaf = key.rsplit("/", 1)
            params.setdefault(name, {})[leaf] = jnp.asarray(z[key])
    return params
