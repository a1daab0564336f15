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


# ---------------------------------------------------------------------------
# static separable-projective strip warp (the VR border-reprojection maps)
# ---------------------------------------------------------------------------

def _strip_kernel(s_ref, p_ref, ridx_ref, wlo_ref, whi_ref, lo_ref, o_ref,
                  a_scr, *, tile: int, span: int, d0: int, c: int,
                  woc: int, hs: int):
    """Grid step: 8-row output tile of the pre-aligned vertical resample.

    Step 0 builds A = sum_d P_d * laneshift(S, d*c) — the column stage
    (static per-column source alignment + horizontal bilinear mix) — into
    a VMEM scratch that persists across the sequential grid. Every step
    then computes, per output row, a 2-tap vertical resample of A with
    per-pixel integer rows (one-hot weight plane over a SPAN-row window
    whose 8-aligned start comes from SMEM)."""
    t = pl.program_id(0)
    sw = s_ref.shape[1]

    # both stages are fori_loops, NOT python loops: Mosaic stack-allocates
    # every unrolled iteration's (span x woc) temporaries simultaneously,
    # which blows the 16 MB scoped-vmem limit at production face sizes
    # (measured: 24 MB ask at 922-px faces)
    @pl.when(t == 0)
    def _():
        def cbody(k, acc):
            sh = ((d0 + k) * c) % sw
            rolled = pltpu.roll(s_ref[...], (sw - sh) % sw, 1)
            return acc + p_ref[pl.ds(k, 1)] * rolled[:, :woc]

        a_scr[...] = jax.lax.fori_loop(
            0, p_ref.shape[0], cbody, jnp.zeros((hs, woc), jnp.float32))

    def rbody(i, _):
        # lo is built 8-aligned at factory time ((min//8)*8); Mosaic needs
        # the static proof for the dynamic VMEM slice
        lo = pl.multiple_of(lo_ref[t * tile + i], 8)
        win = a_scr[pl.ds(lo, span)]
        rr = jax.lax.broadcasted_iota(jnp.int32, (span, woc), 0)
        ridx = ridx_ref[pl.ds(i, 1)]
        wpl = (jnp.where(rr == ridx, wlo_ref[pl.ds(i, 1)], 0.0)
               + jnp.where(rr == ridx + 1, whi_ref[pl.ds(i, 1)], 0.0))
        o_ref[pl.ds(i, 1)] = jnp.sum(wpl * win, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, tile, rbody, 0)


def make_static_strip_warp(map_np, sentinel: float = 9999.0, tile: int = _TILE,
                           interpret=None):
    """Pallas strip warp for SEPARABLE-PROJECTIVE static maps — the VR
    border-reprojection maps (video/vr_geometry.py), whose projective
    structure makes one offset component constant along the other axis:
    the left/right edge maps have dx = f(column) exactly, the top/bottom
    maps dy = f(row) (verified at factory time; returns None when the
    structure is absent so callers fall back to ops.warp.make_static_warp).

    Exactly ops.warp.bilinear_warp(img, map) semantics (zero OOB taps), but
    gather-free: the column stage collapses to a handful of static masked
    lane shifts folded with the horizontal bilinear weights (P planes), and
    the row stage is a per-pixel 2-tap vertical resample executed as a
    one-hot-weighted reduction over an (aligned) source-row window — VPU
    work instead of the XLA gather that dominates the VR cross-face blend
    (24 strip gathers = 28.5 ms/frame at 922-px faces, BENCH_NOTES).
    Returns warp(img: (H, W, C)) -> (Ho, Wo, C) float32.
    """
    import numpy as np

    map_np = np.asarray(map_np, np.float64)
    ho_f, wo_f = map_np.shape[:2]
    mapped_f = np.all(np.abs(map_np) < sentinel / 2, axis=-1)
    if not mapped_f.any():
        return None
    rows_any = np.where(mapped_f.any(axis=1))[0]
    cols_any = np.where(mapped_f.any(axis=0))[0]
    y0, y1 = int(rows_any[0]), int(rows_any[-1]) + 1
    x0, x1 = int(cols_any[0]), int(cols_any[-1]) + 1
    sub = map_np[y0:y1, x0:x1]
    mapped = mapped_f[y0:y1, x0:x1]
    yy, xx = np.mgrid[y0:y1, x0:x1].astype(np.float64)
    asx = np.where(mapped, xx + sub[..., 0], np.nan)  # absolute source col
    asy = np.where(mapped, yy + sub[..., 1], np.nan)  # absolute source row

    def col_constant(a):
        with np.errstate(invalid="ignore"):
            rng = np.nanmax(a, axis=0) - np.nanmin(a, axis=0)
        return np.nanmax(rng) < 1e-3 if np.isfinite(rng).any() else False

    transposed = False
    if not col_constant(asx):
        if not col_constant(asy.T):
            return None
        # top/bottom structure: work in the transposed frame (src = img.T,
        # vertical <-> horizontal), transpose the strip back at the end
        transposed = True
        asx, asy = asy.T, asx.T
        mapped = mapped.T

    ho, wo = mapped.shape
    gsx, gsy = asx[mapped], asy[mapped]
    sx0 = int(np.floor(gsx.min()))
    sx1 = int(np.floor(gsx.max())) + 2
    sy0 = int(np.floor(gsy.min()))
    sy1 = int(np.floor(gsy.max())) + 2

    # column stage (static per column): source col index + horizontal frac
    with np.errstate(invalid="ignore"):
        colv = np.nanmax(asx, axis=0)  # col-constant where mapped
    col_ok = np.isfinite(colv)
    sxi = np.where(col_ok, np.floor(np.where(col_ok, colv, 0.0)), sx0).astype(np.int64) - sx0
    fx = np.where(col_ok, np.where(col_ok, colv, 0.0) - np.floor(np.where(col_ok, colv, 0.0)), 0.0)
    d = sxi - np.arange(wo)
    dmin, dmax = int(d[col_ok].min()), int(d[col_ok].max())
    nd = dmax - dmin + 2  # +1 for the right tap
    pmat = np.zeros((nd, wo), np.float64)
    for j in range(wo):
        if not col_ok[j]:
            continue
        pmat[d[j] - dmin, j] += 1.0 - fx[j]
        pmat[d[j] + 1 - dmin, j] += fx[j]

    # row stage (per pixel): source row index + vertical frac, with an
    # 8-aligned per-row window start so the in-kernel dynamic slice is legal
    syi = np.where(mapped, np.floor(np.where(mapped, asy, 0.0)), 0).astype(np.int64) - sy0
    fy = np.where(mapped, np.where(mapped, asy, 0.0)
                  - np.floor(np.where(mapped, asy, 0.0)), 0.0)
    lo8 = np.zeros(ho, np.int64)
    hi = np.ones(ho, np.int64)
    for i in range(ho):
        if mapped[i].any():
            v = syi[i][mapped[i]]
            lo8[i] = (v.min() // 8) * 8
            hi[i] = v.max() + 2 - lo8[i]
    span = int(-(-hi.max() // 8) * 8)
    ridx = np.clip(syi - lo8[:, None], 0, span - 2)
    wlo = np.where(mapped, 1.0 - fy, 0.0)
    whi = np.where(mapped, fy, 0.0)

    hop = -(-ho // tile) * tile
    hs_min = int((lo8.max() + span))
    lo8 = np.pad(lo8, (0, hop - ho))
    ridx = np.pad(ridx, ((0, hop - ho), (0, 0)))
    wlo = np.pad(wlo, ((0, hop - ho), (0, 0)))
    whi = np.pad(whi, ((0, hop - ho), (0, 0)))

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"

    def warp(img):
        h, w = img.shape[0], img.shape[1]
        c = img.shape[2]
        woc = wo * c
        wocp = -(-woc // 128) * 128
        wec = (wo + dmax + 2) * c
        wecp = -(-wec // 128) * 128
        hs = max(sy1 - sy0, hs_min)
        src = jnp.transpose(img, (1, 0, 2)) if transposed else img
        sh, sw = (w, h) if transposed else (h, w)
        # clip the source bbox to the image; zero-pad back so relative
        # indices hold and OOB taps read zero
        ya, yb = max(sy0, 0), max(min(sy1, sh), max(sy0, 0))
        xa, xb = max(sx0, 0), max(min(sx1, sw), max(sx0, 0))
        crop = jax.lax.slice(src.astype(jnp.float32), (ya, xa, 0),
                             (yb, xb, c))
        crop = jnp.pad(crop, ((ya - sy0, hs - (ya - sy0) - (yb - ya)),
                              (xa - sx0, (sx1 - sx0) - (xa - sx0) - (xb - xa)),
                              (0, 0)))
        s2 = jnp.pad(crop.reshape(hs, (sx1 - sx0) * c), ((0, 0), (0, wecp - (sx1 - sx0) * c)))
        pm = jnp.asarray(np.pad(np.repeat(pmat, c, axis=1).astype(np.float32),
                                ((0, 0), (0, wocp - woc))))
        rj = jnp.asarray(np.pad(np.repeat(ridx, c, axis=1).astype(np.int32),
                                ((0, 0), (0, wocp - woc))))
        wl = jnp.asarray(np.pad(np.repeat(wlo, c, axis=1).astype(np.float32),
                                ((0, 0), (0, wocp - woc))))
        wh = jnp.asarray(np.pad(np.repeat(whi, c, axis=1).astype(np.float32),
                                ((0, 0), (0, wocp - woc))))
        lo = jnp.asarray(lo8.astype(np.int32))
        kernel = functools.partial(
            _strip_kernel, tile=tile, span=span, d0=dmin, c=c,
            woc=wocp, hs=hs)
        out = pl.pallas_call(
            kernel,
            grid=(hop // tile,),
            in_specs=[
                pl.BlockSpec((hs, wecp), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nd, wocp), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, wocp), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, wocp), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, wocp), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((tile, wocp), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hop, wocp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((hs, wocp), jnp.float32)],
            interpret=interpret,
        )(s2, pm, rj, wl, wh, lo)
        strip = out[:ho, :woc].reshape(ho, wo, c)
        if transposed:
            strip = jnp.transpose(strip, (1, 0, 2))
        return jnp.pad(strip, ((y0, ho_f - y1), (x0, wo_f - x1), (0, 0)))

    return warp
