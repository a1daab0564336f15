"""Spatial filters on NHWC images, built on XLA ``reduce_window``.

Reference semantics being matched:
  * ``min_filter`` — grayscale erosion used to grow occlusion zeros
    (utils.lua:161-169: 1-maxpool(1-x) with SAME-ish padding and windows
    clipped at the borders). Implemented directly as a min reduce-window;
    the +inf identity in the padding reproduces Torch's clipped windows.
  * ``median_filter`` — r x r median over *valid* windows only, so the
    output shrinks by r-1 in H and W (utils.lua:151-159: unfold + median).
  * ``flow_magnitude_mask`` — 1 - clamp(|flow|/max_magn, max=1)
    (utils.lua:171-177).
  * gradient masks for VR blending (utils.lua:179-213).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def min_filter(x, size: int):
    """Erosion with an odd ``size`` x ``size`` window, border-clipped.

    x: (..., H, W) or (..., H, W, C); filtering is over the two axes before
    the channel axis if x.ndim >= 3 else the last two.
    """
    if size <= 1:
        return x
    if size % 2 == 0:
        raise ValueError(f"min_filter window must be odd (got {size})")
    pad = size // 2
    h_ax = x.ndim - 3 if x.ndim >= 3 else x.ndim - 2
    w_ax = h_ax + 1

    def pass_1d(v, axis):
        # square-window erosion is separable: two 1-D passes (size+size taps
        # instead of size**2); +inf padding identity reproduces the
        # border-clipped windows
        window = [1] * x.ndim
        window[axis] = size
        padding = [(0, 0)] * x.ndim
        padding[axis] = (pad, pad)
        return jax.lax.reduce_window(
            v,
            jnp.asarray(jnp.inf, x.dtype),
            jax.lax.min,
            window_dimensions=window,
            window_strides=[1] * x.ndim,
            padding=padding,
        )

    return pass_1d(pass_1d(x, h_ax), w_ax)


def median_filter(x, size: int):
    """Median over valid ``size`` x ``size`` windows; output is
    (..., H-size+1, W-size+1, C). Matches utils.lua:151-159 including the
    Torch median convention (the ceil(n/2)-th smallest of n=size**2)."""
    if size <= 1:
        return x
    if x.ndim < 3:
        x = x[..., None]
        squeeze = True
    else:
        squeeze = False
    h_ax, w_ax = x.ndim - 3, x.ndim - 2
    hh = x.shape[h_ax] - size + 1
    ww = x.shape[w_ax] - size + 1
    patches = []
    for dy in range(size):
        for dx in range(size):
            sl = [slice(None)] * x.ndim
            sl[h_ax] = slice(dy, dy + hh)
            sl[w_ax] = slice(dx, dx + ww)
            patches.append(x[tuple(sl)])
    if size == 3:
        # Paeth's median-of-9 exchange network: 19 min/max ops instead of a
        # full 9-element sort — exact same median, ~3x cheaper on TPU
        # (sorting a 9-length minor axis is a multi-pass bitonic sort over
        # a 9x-materialized stack)
        p = patches

        def ex(i, j):
            p[i], p[j] = jnp.minimum(p[i], p[j]), jnp.maximum(p[i], p[j])

        ex(1, 2); ex(4, 5); ex(7, 8); ex(0, 1); ex(3, 4); ex(6, 7)
        ex(1, 2); ex(4, 5); ex(7, 8); ex(0, 3); ex(5, 8); ex(4, 7)
        ex(3, 6); ex(1, 4); ex(2, 5); ex(4, 7); ex(4, 2); ex(6, 4)
        ex(4, 2)
        med = p[4]
        return med[..., 0] if squeeze else med
    stack = jnp.stack(patches, axis=-1)
    k = (size * size - 1) // 2  # 0-indexed (n+1)/2-th smallest for odd n
    med = jnp.sort(stack, axis=-1)[..., k]
    return med[..., 0] if squeeze else med


def flow_magnitude_mask(flow, max_magn: float):
    """1 where flow is static, ramping to 0 at |flow| >= max_magn.

    flow: (..., H, W, 2) with (dx, dy) channels. Matches utils.lua:171-177:
    1 - min(|flow| / max_magn, 1) ... written there as add(cmax(div(mag, -m), -1), 1).
    """
    mag = jnp.sqrt(jnp.sum(jnp.square(flow), axis=-1))
    return 1.0 - jnp.minimum(mag / max_magn, 1.0)


# ---------------------------------------------------------------------------
# Linear gradient masks for VR seam blending (utils.lua:179-213).
# All return (H, W) float32, values in (0, 1): i/(n+1) ramps.
# ---------------------------------------------------------------------------

def gradient_mask_h_inc(h: int, w: int):
    ramp = (jnp.arange(1, h + 1, dtype=jnp.float32) / (h + 1))[:, None]
    return jnp.broadcast_to(ramp, (h, w))


def gradient_mask_h_dec(h: int, w: int):
    ramp = (jnp.arange(h, 0, -1, dtype=jnp.float32) / (h + 1))[:, None]
    return jnp.broadcast_to(ramp, (h, w))


def gradient_mask_w_inc(h: int, w: int):
    ramp = (jnp.arange(1, w + 1, dtype=jnp.float32) / (w + 1))[None, :]
    return jnp.broadcast_to(ramp, (h, w))


def gradient_mask_w_dec(h: int, w: int):
    ramp = (jnp.arange(w, 0, -1, dtype=jnp.float32) / (w + 1))[None, :]
    return jnp.broadcast_to(ramp, (h, w))
