"""Pallas TPU kernel for the banded bilinear warp.

Same math as ops.warp._warp_banded_single (two banded shift-accumulate
passes, <=2 nonzero bilinear taps per pixel per axis). The XLA fori_loop
formulation re-reads the whole padded image from HBM on every one of the
2*band+2 taps; this kernel tiles the output into 8-row bands, DMAs each
(8 + taps)-row input window into VMEM once, and runs the band loop on-chip.

Structure: ONE kernel implementing the *vertical* banded pass; the full
warp is vertical-pass -> transpose -> vertical-pass(with dx) -> transpose
(the horizontal pass is the vertical pass of the transposed field). This
keeps every in-kernel slice on the sublane axis, where Mosaic accepts
8-aligned dynamic starts — the tap loop runs as a fori_loop over 8-row
blocks with 8 static sub-shifts, so compile time stays flat in `band`
(a fully unrolled 2*band+2-tap kernel compiled for minutes).

Layout: channel-planar (grid axis over C) so lanes carry W, not C=3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 8


def _vpass_kernel(x_hbm, off_ref, o_ref, xwin, sem, *, band: int, w: int, win: int):
    """Banded vertical resample of one channel plane.

    out[r, x] = sum_k coeff_k(r, x) * xin[r + k - band, x], where coeff has
    the two bilinear taps at k = floor(off)+band and k+1. x_hbm rows are
    pre-padded by `band` zeros on top (plus alignment below)."""
    taps = 2 * band + 2
    ci = pl.program_id(0)
    i = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_hbm.at[ci, pl.ds(i * _TILE, win), :], xwin, sem
    )
    dma.start()

    off = off_ref[...]
    base = jnp.floor(off)
    w0 = 1.0 - (off - base)
    rel = base.astype(jnp.int32) + band  # first-tap index in [0, taps-1]
    # out-of-band flow must sample zero: the loop covers k in
    # [0, 8*ceil(taps/8)), so taps beyond the band are masked out explicitly
    rel1 = jnp.where((rel >= 0) & (rel <= taps - 1), rel, -(10**6))
    rel2 = jnp.where((rel >= -1) & (rel <= taps - 2), rel, -(10**6))

    dma.wait()

    n_blocks = -(-taps // 8)

    def body(kb, acc):
        kbase = pl.multiple_of(kb * 8, 8)
        blk = xwin[pl.ds(kbase, 16), :]
        for j in range(8):
            k = kb * 8 + j
            coeff = jnp.where(rel1 == k, w0, 0.0) + jnp.where(
                rel2 == k - 1, 1.0 - w0, 0.0
            )
            acc = acc + blk[j : j + _TILE, :] * coeff
        return acc

    o_ref[0] = jax.lax.fori_loop(
        0, n_blocks, body, jnp.zeros((_TILE, w), jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("band", "interpret"))
def _banded_vpass(planes, off, band: int, interpret: bool = False):
    """planes: (C, H + pad, W) with `band` zero rows on top and enough
    below; off: (H, W) vertical offsets. Returns (C, H, W)."""
    c, hp, w = planes.shape
    h = off.shape[0]
    taps = 2 * band + 2
    win = 8 * (-(-taps // 8)) + 8  # fori blocks read [kb*8, kb*8+16)
    kernel = functools.partial(_vpass_kernel, band=band, w=w, win=win)
    return pl.pallas_call(
        kernel,
        grid=(c, h // _TILE),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((_TILE, w), lambda ci, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE, w), lambda ci, i: (ci, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((win, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(planes, off)


def _vpass(img_chw, off, band: int, interpret: bool):
    """img_chw: (C, H, W); off: (H, W). One zero-OOB banded vertical pass."""
    c, h, w = img_chw.shape
    pad_rows = -h % _TILE
    pad_cols = -w % 128
    taps = 2 * band + 2
    win = 8 * (-(-taps // 8)) + 8
    planes = jnp.pad(
        img_chw, ((0, 0), (band, win - band + pad_rows), (0, pad_cols))
    )
    offp = jnp.pad(off, ((0, pad_rows), (0, pad_cols)), constant_values=1e9)
    out = _banded_vpass(planes, offp, band, interpret)
    return out[:, :h, :w]


def bilinear_warp_pallas(img, flow, band: int, interpret: bool = False):
    """img: (H, W, C) or (N, H, W, C); flow (..., H, W, 2) (dx, dy).
    Zero-OOB banded warp, numerically identical to
    ops.warp.bilinear_warp(..., band=band)."""
    if img.ndim == 4:
        if flow.ndim == 3:
            flow = jnp.broadcast_to(flow[None], img.shape[:3] + (2,))
        return jax.vmap(
            lambda a, f: bilinear_warp_pallas(a, f, band, interpret)
        )(img, flow)
    h, w, c = img.shape
    chw = jnp.transpose(img.astype(jnp.float32), (2, 0, 1))
    v = _vpass(chw, flow[..., 1].astype(jnp.float32), band, interpret)
    # horizontal pass == vertical pass of the transposed field
    vt = jnp.transpose(v, (0, 2, 1))
    ot = _vpass(vt, flow[..., 0].astype(jnp.float32).T, band, interpret)
    out = jnp.transpose(ot, (2, 1, 0))
    return out.astype(img.dtype)
