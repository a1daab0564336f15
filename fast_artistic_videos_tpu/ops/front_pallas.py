"""Pallas TPU kernels for the stylizer's phase-domain FRONT END.

Round-3 floor-corrected profiling (BENCH_NOTES) moved the target: the
residual chain was already near roofline under XLA, while the front end —
the s2d'd first conv (5x5 28->128 @540p) and the phased stride-2 conv
(2x2 128->64) — ran 5-14x off the MXU roofline under XLA's conv lowering
(small contraction dims at large spatial extents lower badly). These
kernels rewrite both as single big-K im2col MXU dots:

    window (T + kh - 1 rows)            (double-buffered HBM DMA)
    optional eff-affine + ReLU          (the previous conv's instance norm)
    kw column shifts via f32 pltpu.roll (border taps re-zeroed by masks)
    lane-concat of kh*kw taps           (rows are free dim-0 slices)
    ONE (T*W, kh*kw*C) x (K, Cout) dot  (K = 700 / 512 for the canonical
                                         front: dense MXU work)
    masked instance-norm statistics     (valid logical rows only)

Zero-padding (SAME) semantics with no physical resize: the producer
places `in_margin` rows of REAL zeros above the logical origin, and
border column taps are masked to zero after the roll (a roll wraps the
opposite edge in). `out_row_shift` lets a kernel write its output with
the top margin the NEXT kernel needs (F1 emits logical row -1 — zeroed —
so F2's u=0 tap needs no clamping at all).

Reference semantics: the first two layers of the canonical net
(models_video.lua + train_video.lua padding patch), computed in the exact
phase domain of models/stylizer.py `_phase_front` (the s2d index algebra
is `_phase_level_kernel` / `_phase_stride2_kernel`; this module only
replaces HOW the two convs are executed, not their math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 4


def _kernel(*refs, tile: int, w: int, cin: int, cout: int, kh: int, kw: int,
            pad_left: int, out_row_shift: int, in_margin: int, hv: int,
            wv: int, has_eff: bool, relu: bool):
    it = iter(refs)
    x_hbm = next(it)
    w_ref = next(it)
    b_ref = next(it)
    eff_ref = next(it) if has_eff else None
    o_ref = next(it)
    stats_ref = next(it)
    xwin = next(it)
    sem = next(it)

    t = pl.program_id(0)
    nt = pl.num_programs(0)
    wh = tile + kh - 1  # window height

    def dma(step, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(step * tile, wh)], xwin.at[slot], sem.at[slot])

    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    @pl.when(t == 0)
    def _():
        dma(t, slot).start()

    @pl.when(t + 1 < nt)
    def _():
        dma(t + 1, nxt).start()

    dma(t, slot).wait()
    win = xwin[slot]
    cdtype = win.dtype

    if has_eff:
        win32 = (win.astype(jnp.float32) * eff_ref[0, :] + eff_ref[1, :])
        if relu:
            win32 = jnp.maximum(win32, 0.0)
        # the input's zero margin rows must STAY zero through the affine
        # (they are the conv's zero padding, applied post-normalization) —
        # and so must the zero columns right of the valid width (the
        # sublane-alignment padding synthesized by `same_conv`)
        gr = t * tile + jax.lax.broadcasted_iota(jnp.int32, win32.shape, 0)
        win32 = jnp.where(gr < in_margin, 0.0, win32)
        if wv < w:
            gc = jax.lax.broadcasted_iota(jnp.int32, win32.shape, 1)
            win32 = jnp.where(gc >= wv, 0.0, win32)
        win = win32.astype(cdtype)

    # one f32 roll per column tap (Mosaic rotate is 32-bit only), border
    # wrap re-zeroed; row taps are free dim-0 slices of the rolled window
    cols = jax.lax.broadcasted_iota(jnp.int32, (wh, w, cin), 1)
    shifted = []
    for v in range(kw):
        c = v - pad_left  # tap column offset
        if c == 0:
            shifted.append(win)
        else:
            r32 = pltpu.roll(win.astype(jnp.float32), (-c) % w, 1)
            if c < 0:
                r32 = jnp.where(cols < -c, 0.0, r32)
            else:
                r32 = jnp.where(cols >= w - c, 0.0, r32)
            shifted.append(r32.astype(cdtype))

    parts = [shifted[v][u:u + tile] for u in range(kh) for v in range(kw)]
    xcat = jnp.concatenate(parts, axis=2)
    y32 = jnp.dot(xcat.reshape(tile * w, kh * kw * cin), w_ref[...],
                  preferred_element_type=jnp.float32)
    y32 = y32 + b_ref[0, :].astype(jnp.float32)
    y32 = y32.reshape(tile, w, cout)

    # rows emitted above the logical origin (out_row_shift < 0) are the
    # NEXT kernel's zero padding — force them to actual zeros
    rows3 = t * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, w, cout), 0)
    if out_row_shift < 0:
        y32 = jnp.where(rows3 + out_row_shift < 0, 0.0, y32)
    yst = y32.astype(cdtype)
    o_ref[...] = yst

    # instance-norm stats over logical rows [0, hv) and columns [0, wv) only
    lmask = ((rows3 + out_row_shift >= 0) & (rows3 + out_row_shift < hv))
    if wv < w:
        cols3 = jax.lax.broadcasted_iota(jnp.int32, (tile, w, cout), 1)
        lmask = lmask & (cols3 < wv)
    sel = jnp.where(lmask, yst.astype(jnp.float32), 0.0)
    upd = jnp.stack([jnp.sum(sel, axis=(0, 1)),
                     jnp.sum(sel * sel, axis=(0, 1))])

    @pl.when(t == 0)
    def _():
        stats_ref[...] = upd

    @pl.when(t > 0)
    def _():
        stats_ref[...] = stats_ref[...] + upd


@functools.partial(
    jax.jit,
    static_argnames=("kh", "kw", "pad_left", "out_row_shift", "in_margin",
                     "hv", "wv", "relu", "tile", "interpret"))
def _same_conv(x, wmat, b, eff, kh, kw, pad_left, out_row_shift, in_margin,
               hv, wv, relu, tile, interpret):
    hp, w, cin = x.shape
    cout = wmat.shape[1]
    nt = (hp - (kh - 1)) // tile  # floor: trailing rows only feed windows
    kernel = functools.partial(
        _kernel, tile=tile, w=w, cin=cin, cout=cout, kh=kh, kw=kw,
        pad_left=pad_left, out_row_shift=out_row_shift, in_margin=in_margin,
        hv=hv, wv=wv, has_eff=eff is not None, relu=relu)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    inputs = [x, wmat, b]
    if eff is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(eff)
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile, w, cout), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cout), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((nt * tile, w, cout), x.dtype),
                   jax.ShapeDtypeStruct((2, cout), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((2, tile + kh - 1, w, cin), x.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(*inputs)


def same_conv(x, w, b, pad_top: int, pad_left: int, valid_h: int,
              out_row_shift: int = 0, eff=None, relu: bool = False,
              tile: int = _TILE, valid_w: int = None, interpret=None):
    """Zero-padded (SAME-style) conv on a top-margined tensor.

    x: (Hp, W, C) with `in_margin = pad_top - out_row_shift` rows of REAL
    zeros above the logical origin (logical row r at physical
    r + in_margin) and at least `pad_top` rows of zeros below logical row
    `valid_h`; W fully valid (column padding is synthesized by masked
    rolls). w: (kh, kw, C, Cout); column taps span
    [-pad_left, kw - 1 - pad_left].

    Output (nt*tile, W, Cout): logical out row r at physical
    r + out_row_shift... i.e. out_row_shift=-1 writes logical row -1
    (zeroed) at physical row 0, giving the output a 1-row zero top margin
    for a following pads-(1,0) conv. eff (2, C) float32 + relu: fused
    previous-norm prologue (margin zeros preserved). stats (2, Cout):
    masked [sum; sumsq] over logical rows [0, valid_h) x cols [0, valid_w).

    Widths that are not sublane-aligned (multiples of 8) are zero-padded on
    the right here — Mosaic requires 8-aligned VMEM slices along the
    second-to-minor dim (this FAULTS on hardware, invisible in interpret
    mode). The pad columns are exactly the conv's SAME zero padding
    (prologue re-zeroes them, stats mask them out); the output keeps the
    padded width so chained stages stay aligned — callers crop to
    [:valid_h, :valid_w] at the end of the chain. valid_w defaults to this
    input's width (pass it explicitly on pre-padded chained inputs).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    kh, kw = w.shape[0], w.shape[1]
    cin, cout = w.shape[2], w.shape[3]
    hp, ww, _ = x.shape
    if valid_w is None:
        valid_w = ww
    wpad = (-ww) % 8
    if wpad:
        x = jnp.pad(x, ((0, 0), (0, wpad), (0, 0)))
    in_margin = pad_top - out_row_shift
    nt = (hp - (kh - 1)) // tile
    if nt * tile < valid_h - out_row_shift:
        raise ValueError(f"physical height {hp} cannot cover {valid_h} "
                         f"valid output rows (shift {out_row_shift})")
    # taps below the last valid row must land on real zeros
    if hp < valid_h + in_margin + (kh - 1 - pad_top):
        raise ValueError("not enough zero rows below the valid region")
    wmat = w.reshape(kh * kw * cin, cout).astype(x.dtype)
    b2 = b.reshape(1, -1).astype(x.dtype)
    if eff is not None:
        eff = eff.astype(jnp.float32)
    return _same_conv(x, wmat, b2, eff, kh, kw, pad_left, out_row_shift,
                      in_margin, valid_h, valid_w, relu, tile, interpret)


def chain_plan(valid_h: int, stages):
    """Plan physical heights for a chain of `same_conv` kernels feeding
    each other (the full-pallas front end: C1 -> C2 -> C3 on the
    quarter-res phase grid).

    stages: sequence of (kh, pad_top, tile) top-down. Stage i's output is
    stage i+1's input, so stage i must emit exactly stage i+1's zero top
    margin: out_row_shift[i] = out_row_shift[i+1] - pad_top[i+1], with the
    last stage emitting at the logical origin (shift 0). Every stage but
    the first must have zero bottom padding (kh - 1 == pad_top): a
    producer only zeroes rows ABOVE the logical origin, never below
    valid_h, so a consumer needing bottom zeros would read junk.

    Returns (shifts, heights): the per-stage out_row_shift and the minimal
    physical INPUT height per stage. heights[0] is how tall the chain's
    input must be zero-padded; heights[i > 0] are guaranteed by
    construction (stage i-1's nt*tile output covers them).
    """
    n = len(stages)
    for kh, pad_top, _tile in stages[1:]:
        if kh - 1 != pad_top:
            raise ValueError("inner chain stages must have zero bottom pad")
    shifts = [0] * n
    for i in range(n - 2, -1, -1):
        shifts[i] = shifts[i + 1] - stages[i + 1][1]
    heights = [0] * n
    req_out = 0  # physical rows the NEXT stage needs from this output
    for i in range(n - 1, -1, -1):
        kh, pad_top, tile = stages[i]
        sh = shifts[i]
        nt = max(-(-(valid_h - sh) // tile), -(-req_out // tile), 1)
        need = valid_h + (pad_top - sh) + (kh - 1 - pad_top)
        while nt * tile + kh - 1 < need:
            nt += 1
        heights[i] = nt * tile + kh - 1
        req_out = heights[i]
    return shifts, heights


def front_geometry(valid_h: int, kh: int, pad_top: int,
                   out_row_shift: int = 0, tile: int = _TILE) -> int:
    """Minimal physical input height for a `same_conv`: top margin + valid
    rows + bottom zero rows, rounded up so the floor'd grid still covers
    every valid output row."""
    in_margin = pad_top - out_row_shift
    need_rows = valid_h + in_margin + (kh - 1 - pad_top)
    nt = -(-(valid_h - out_row_shift) // tile)
    return max(need_rows, nt * tile + kh - 1)
