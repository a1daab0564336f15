"""Bilinear flow warp — the framework's equivalent of the reference's
``stnbdhw`` CUDA sampler, in pure XLA. A Pallas TPU kernel with identical
semantics lives in :mod:`fast_artistic_videos_tpu.ops.warp_pallas`.

Semantics (reference: stnbdhw/BilinearSamplerBDHW.cu:48-109, and CPU parity
path Torch ``image.warp(..., 'bilinear', true, 'pad', 0)`` in utils.lua:141-149):

    out[y, x] = bilinear_sample(img, y + dy[y, x], x + dx[y, x])

with **absolute pixel offsets** (not normalized grids), floor-based corner
selection, and each of the four corner taps contributing **zero when outside
the image bounds** (zero padding).

Layout: NHWC images, flow is (..., H, W, 2) with channel 0 = dx, channel 1 = dy
(Middlebury .flo order; NOTE the reference keeps (dy, dx) order internally —
we do not).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _warp_single(img, flow):
    """img: (H, W, C); flow: (H, W, 2) (dx, dy). Returns (H, W, C)."""
    h, w = img.shape[0], img.shape[1]
    compute_dtype = jnp.promote_types(img.dtype, jnp.float32)

    xs = jax.lax.broadcasted_iota(compute_dtype, (h, w), 1)
    ys = jax.lax.broadcasted_iota(compute_dtype, (h, w), 0)
    xf = xs + flow[..., 0].astype(compute_dtype)
    yf = ys + flow[..., 1].astype(compute_dtype)

    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    # Weight of the top-left corner (1 at integer coordinates), as in
    # BilinearSamplerBDHW_getTopLeft (BilinearSamplerBDHW.cu:13-23).
    wx0 = 1.0 - (xf - x0)
    wy0 = 1.0 - (yf - y0)

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    img_flat = img.reshape(h * w, -1)

    def tap(yi, xi, weight):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take(img_flat, idx.reshape(-1), axis=0).reshape(h, w, -1)
        return vals * (weight * valid.astype(compute_dtype))[..., None]

    out = (
        tap(y0i, x0i, wy0 * wx0)
        + tap(y0i, x0i + 1, wy0 * (1.0 - wx0))
        + tap(y0i + 1, x0i, (1.0 - wy0) * wx0)
        + tap(y0i + 1, x0i + 1, (1.0 - wy0) * (1.0 - wx0))
    )
    return out.astype(img.dtype)


@functools.partial(jax.jit, static_argnames=())
def bilinear_warp(img, flow):
    """Warp ``img`` by absolute-offset ``flow`` with zero out-of-bounds taps.

    img:  (H, W, C) or (N, H, W, C)
    flow: (H, W, 2) or (N, H, W, 2), channels (dx, dy)
    """
    if img.ndim == 3:
        return _warp_single(img, flow)
    if img.ndim == 4:
        if flow.ndim == 3:
            flow = jnp.broadcast_to(flow[None], img.shape[:3] + (2,))
        return jax.vmap(_warp_single)(img, flow)
    raise ValueError(f"img must be HWC or NHWC, got shape {img.shape}")


def warp_weight_map(flow, h: int, w: int):
    """Total bilinear tap weight landing in-bounds for each output pixel —
    i.e. warp of an all-ones image. Used by ``fix_occlusions``
    (fast_artistic_video.lua:79-86) to find unmapped regions."""
    ones = jnp.ones(flow.shape[:-1] + (1,), dtype=flow.dtype)
    return bilinear_warp(ones, flow)[..., 0]
