"""Synthetic VR training source: fabricates cube-face border priors from
single images (reference: DataLoader_video_fake.lua:192-272, mode 'vr').

For a random side (left/right/top/bottom):
  1. ``map_first`` perspective-projects the image as a neighboring cube
     face would appear (crop 70, oversize_h 0), and a thin border strip is
     cropped from it — this strip plays the role of the already-stylized
     neighbor ("frame 1").
  2. ``map_second`` (crop 64, oversize 0, mirrored onto the strip's side)
     is the "flow" that places the strip's stylization onto this face's
     border — an absolute-offset map whose output grid is the full training
     image, sampling from the strip (the source and grid sizes differ;
     ops.warp supports that).
  3. certainty = ones warped through map_second (nonzero exactly where the
     strip lands).

The reference hardcodes 384x384 source images for the geometry
(:249-253); we keep that contract and rescale inputs if needed.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import warp
from ..ops.preprocess import vgg_preprocess
from ..video import vr_geometry as vr
from . import data as data_mod

_GEOM_SIZE = 384
_CACHE = {}


def _maps(side: str, train_hw: Tuple[int, int]):
    key = (side, train_hw)
    if key in _CACHE:
        return _CACHE[key]
    H = W = _GEOM_SIZE
    h, w = train_hw
    if side == "left":
        first = vr.perspective_warp_map_left(H, 70, W, oversize_h=0)
        second = vr.perspective_warp_map_right(h, 64, w, 0, 0)
        second = second.copy()
        second[..., 0] += -w + 64  # mirror onto the strip (ref :209-211)
        crop = (slice(64, H - 64), slice(W - 65, W - 1))
    elif side == "right":
        first = vr.perspective_warp_map_right(H, 70, W, oversize_h=0)
        second = vr.perspective_warp_map_left(h, 64, w, 0, 0)
        crop = (slice(64, H - 64), slice(0, 64))
    elif side == "top":
        first = vr.perspective_warp_map_top(W, 70, H, oversize_w=0)
        second = vr.perspective_warp_map_bottom(w, 64, h, 0, 0)
        second = second.copy()
        second[..., 1] += -h + 64
        crop = (slice(H - 65, H - 1), slice(64, W - 64))
    else:  # bottom
        first = vr.perspective_warp_map_bottom(W, 70, H, oversize_w=0)
        second = vr.perspective_warp_map_top(w, 64, h, 0, 0)
        crop = (slice(0, 64), slice(64, W - 64))
    _CACHE[key] = (first, second, crop)
    return _CACHE[key]


def vr_batch(images: np.ndarray, rng: np.random.Generator,
             train_hw: Tuple[int, int]) -> data_mod.Batch:
    """images: (N, H, W, 3) RGB [0,1]. Returns the (imgs, flows, certs)
    triple with imgs[0] = neighbor border strip, imgs[1] = the full frame."""
    n = images.shape[0]
    h, w = train_hw
    if min(h, w) <= 128:
        # the 64-wide border geometry degenerates (strip height <= crop):
        # the reference always trains vr at >= 256 (train_video.lua:36)
        raise ValueError(f"vr source needs train_img_size > 128, got {train_hw}")
    side = ("left", "right", "top", "bottom")[int(rng.integers(0, 4))]
    first, second, crop = _maps(side, train_hw)

    pre = np.asarray(vgg_preprocess(images))
    pre384 = pre
    if pre.shape[1:3] != (_GEOM_SIZE, _GEOM_SIZE):
        pre384 = data_mod._resize_bilinear(pre, _GEOM_SIZE, _GEOM_SIZE)

    imgs1 = np.asarray(warp.bilinear_warp(jnp.asarray(pre384), jnp.asarray(first)))
    strip = imgs1[:, crop[0], crop[1]].copy()

    flow = np.broadcast_to(second[None], (n,) + second.shape).copy()

    cert_full = np.ones(pre384.shape[:3] + (1,), np.float32)
    cert_strip = cert_full[:, crop[0], crop[1]].copy()
    cert = np.asarray(warp.bilinear_warp(jnp.asarray(cert_strip), jnp.asarray(flow)))

    imgs2 = pre
    if pre.shape[1:3] != (h, w):
        imgs2 = data_mod._resize_bilinear(pre, h, w)

    return [strip, imgs2], [flow.astype(np.float32)], [cert.astype(np.float32)]
