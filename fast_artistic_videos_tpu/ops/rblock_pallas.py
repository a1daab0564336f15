"""Pallas TPU kernels for the stylizer's residual-block chain on ALIGNED
constant physical shapes.

Why this exists (the round-2 negative result, BENCH_NOTES "Pallas conv
experiments"): the canonical net's reflect-start residual blocks run VALID
3x3 convs on per-block SHRINKING odd widths (500 -> 496 -> ... at 1080p),
so a straight per-conv Pallas kernel pays full-tensor pad-to-alignment and
crop copies at every layer boundary and loses to XLA's native conv in the
full graph (37.6 -> 30.2 fps).

The fix implemented here: the whole chain runs on ONE constant physical
shape (Hp, Wp, C), padded once before the first block.  A VALID conv on a
garbage-margined tensor produces valid data anchored at (0, 0) with the
valid extent shrinking logically by 2 per conv — no physical resize, no
copies.  Instance-norm statistics are masked to the valid extent inside the
kernel (the margins never contaminate them), and the tensor is cropped once
after the last block.

One kernel covers every conv in the chain via optional prologue fusions:

    xw = input window                     (HBM -> VMEM async copy)
    xw = eff_scale * xw + eff_bias        (pre_eff: previous conv's IN)
    xw = relu(xw)                         (pre_relu)
    xw = xw + skip[+2, +2]                (skip: residual add of the
                                           PREVIOUS block -> materializes
                                           this block's true input, which
                                           is also emitted for the next
                                           block's skip)
    y  = conv3x3_VALID(xw) + b            (9 accumulated MXU dots, f32 acc)
    stats += masked (sum, sum(sq)) of y   (valid-extent instance-norm stats)

so a residual block is exactly two kernel launches, with the block-output
affine+skip of block k fused into the conv1 launch of block k+1, and only
the LAST block's epilogue runs in XLA.

Reference semantics: models_video.lua:10-53 build the res blocks
(`build_res_block`, total-variation trailing layers excluded); the VALID/
shave behavior is the `reflect-start` padding mode of train_video.lua:319-325.
Numerics match models/stylizer.py `_block_apply` to conv-accumulation-order
rounding (both accumulate the MXU products in f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 8  # output rows per grid step


def chain_geometry(h0: int, w0: int, dtype, tile: int = _TILE) -> tuple:
    """Physical (Hp, Wp) for a chain whose first block sees valid (h0, w0).

    Hp: a `tile` multiple with one trailing garbage tile, so every DMA row
    window [t*T, t*T+T+2) fits after clamping and clamped (junk) rows stay
    >= the valid extent. Wp: compute width Wc = Wp - 8 must cover wv + 2
    tap columns; sublane-aligned for the dtype (16 for bf16, 8 for f32).
    """
    align = 16 if dtype == jnp.bfloat16 else 8
    hp = (-(-h0 // tile) + 1) * tile
    wp = -(-(w0 + 10) // align) * align
    return hp, wp


def _kernel(*refs, tile: int, wp: int, cin: int, cout: int, hv: int, wv: int,
            hp: int, has_eff: bool, pre_relu: bool, has_skip: bool,
            emit_input: bool):
    """One grid step: DMA window(s), fused prologue, 3 K=3C dots, stats.

    Input windows overlap (tile + 2 rows per tile output rows), so they are
    hand-DMA'd from HBM with DOUBLE BUFFERING: step t kicks off step t+1's
    copies before computing, hiding the window loads behind the MXU work
    (the blocked outputs are pipelined by the pallas grid machinery
    already). The column taps are materialized ONCE as a 3-shift concat
    (T+2, Wc, 3C); the row taps are then free dim-0 slices of it, and the
    conv collapses to 3 dense (T*Wc, 3C) x (3C, Cout) dots — the 9
    per-tap unaligned slice+reshape form cost ~3x the VPU copies and ran
    no faster than XLA's conv.
    """
    it = iter(refs)
    x_hbm = next(it)
    skip_hbm = next(it) if has_skip else None
    w_ref = next(it)
    b_ref = next(it)
    eff_ref = next(it) if has_eff else None
    o_ref = next(it)
    stats_ref = next(it)
    a_ref = next(it) if emit_input else None
    xwin = next(it)
    sem = next(it)
    swin = next(it) if has_skip else None
    sem2 = next(it) if has_skip else None

    t = pl.program_id(0)
    nt = pl.num_programs(0)
    wc = wp - 8

    def x_dma(step, slot):
        s = jnp.minimum(step * tile, hp - (tile + 2))
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(s, tile + 2)], xwin.at[slot], sem.at[slot])

    def s_dma(step, slot):
        s2 = jnp.minimum(step * tile + 2, hp - (tile + 2))
        return pltpu.make_async_copy(
            skip_hbm.at[pl.ds(s2, tile + 2)], swin.at[slot], sem2.at[slot])

    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    @pl.when(t == 0)
    def _():
        x_dma(t, slot).start()
        if has_skip:
            s_dma(t, slot).start()

    @pl.when(t + 1 < nt)
    def _():
        x_dma(t + 1, nxt).start()
        if has_skip:
            s_dma(t + 1, nxt).start()

    x_dma(t, slot).wait()
    xw = xwin[slot]
    cdtype = xw.dtype
    if has_eff:
        xw = (xw.astype(jnp.float32) * eff_ref[0, :]
              + eff_ref[1, :]).astype(cdtype)
    if pre_relu:
        xw = jnp.maximum(xw, jnp.zeros((), cdtype))
    if has_skip:
        s_dma(t, slot).wait()
        sw = swin[slot]
        # skip[+2 cols]: garbage beyond the valid extent absorbs the pad
        sw = jnp.concatenate(
            [sw[:, 2:, :], jnp.zeros((tile + 2, 2, cin), cdtype)], axis=1)
        xw = xw + sw
    if emit_input:
        a_ref[...] = xw[0:tile]

    # one 3-shift concat; rows then slice for free along dim 0. The shifts
    # use pltpu.roll (wrapped columns land in the garbage margin): Mosaic
    # cannot lane-concat slices with mismatched sublane offsets.
    # Mosaic rotate is 32-bit only: roll in f32, cast back for the dot
    xw32 = xw.astype(jnp.float32)
    xsh = jnp.concatenate(
        [xw[:, 0:wc, :],
         pltpu.roll(xw32, wp - 1, 1)[:, 0:wc, :].astype(cdtype),
         pltpu.roll(xw32, wp - 2, 1)[:, 0:wc, :].astype(cdtype)], axis=2)
    acc = jnp.zeros((tile * wc, cout), jnp.float32)
    for dy in range(3):
        tap = xsh[dy:dy + tile].reshape(tile * wc, 3 * cin)
        acc = acc + jnp.dot(tap, w_ref[dy],
                            preferred_element_type=jnp.float32)
    y32 = acc + b_ref[0, :].astype(jnp.float32)
    yst = y32.reshape(tile, wc, cout).astype(cdtype)
    o_ref[...] = jnp.concatenate(
        [yst, jnp.zeros((tile, 8, cout), cdtype)], axis=1)

    # Instance-norm statistics over the VALID extent only, computed from the
    # STORED (dtype-rounded) values so they match what a reader of the
    # output tensor would compute (stylizer.instance_norm semantics).
    # mask built in 3D (32-bit iota): Mosaic cannot insert a minor dim on
    # sub-32-bit operands (a 2D bool mask[..., None] fails to compile)
    rows = t * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, wc, cout), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, wc, cout), 1)
    mask = (rows < hv) & (cols < wv)
    sel = jnp.where(mask, yst.astype(jnp.float32), 0.0)
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
    static_argnames=("valid_hw", "pre_relu", "emit_input", "interpret",
                     "tile"))
def _chain_conv(x, w9, b, eff, skip, valid_hw, pre_relu: bool,
                emit_input: bool, interpret: bool, tile: int):
    hp, wp, cin = x.shape
    cout = w9.shape[2]
    hv, wv = valid_hw
    nt = hp // tile
    dtype = x.dtype

    has_eff = eff is not None
    has_skip = skip is not None
    kernel = functools.partial(
        _kernel, tile=tile, wp=wp, cin=cin, cout=cout, hv=hv, wv=wv, hp=hp,
        has_eff=has_eff, pre_relu=pre_relu, has_skip=has_skip,
        emit_input=emit_input)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    inputs = [x]
    if has_skip:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(skip)
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM),
                 pl.BlockSpec(memory_space=pltpu.VMEM)]
    inputs += [w9, b]
    if has_eff:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(eff)

    out_shape = [jax.ShapeDtypeStruct((hp, wp, cout), dtype),
                 jax.ShapeDtypeStruct((2, cout), jnp.float32)]
    out_specs = [
        pl.BlockSpec((tile, wp, cout), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, cout), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if emit_input:
        out_shape.append(jax.ShapeDtypeStruct((hp, wp, cin), dtype))
        out_specs.append(pl.BlockSpec((tile, wp, cin), lambda t: (t, 0, 0),
                                      memory_space=pltpu.VMEM))

    scratch = [pltpu.VMEM((2, tile + 2, wp, cin), dtype),
               pltpu.SemaphoreType.DMA((2,))]
    if has_skip:
        scratch += [pltpu.VMEM((2, tile + 2, wp, cin), dtype),
                    pltpu.SemaphoreType.DMA((2,))]

    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)


def chain_conv(x, w, b, valid_hw, eff=None, pre_relu: bool = False,
               skip=None, emit_input: bool = False, interpret=None,
               tile: int = _TILE):
    """VALID 3x3 conv on a constant-physical-shape chain tensor.

    x: (Hp, Wp, C) — physical chain shape from `chain_geometry`, valid data
    anchored at (0, 0) with extent `valid_hw` = extent of the OUTPUT's
    valid region (input valid extent + 2 each axis).
    w: (3, 3, C, Cout); b: (Cout,).
    eff: optional (2, C) float32 [eff_scale; eff_bias] — a previous conv's
    instance-norm affine applied to the input window before the conv.
    pre_relu: apply ReLU after `eff`.
    skip: optional (Hp, Wp, C) tensor; skip[i+2, j+2] is added after
    eff/relu (the residual add of the PREVIOUS block; combined with `eff`
    this materializes the current block's true input).
    emit_input: also return the post-prologue input (the materialized block
    input, needed as the next block's `skip`).

    Returns (y, stats[, a]): y (Hp, Wp, Cout) in x.dtype, stats (2, Cout)
    float32 [sum; sum of squares] over the valid extent of y, a (Hp, Wp, C).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    hp, wp, cin = x.shape
    if hp % tile or wp % 8:
        raise ValueError(f"physical shape {(hp, wp)} not aligned")
    hv, wv = valid_hw
    if hv > hp - tile or wv > wp - 10:
        raise ValueError(f"valid {(hv, wv)} exceeds chain margins of "
                         f"physical {(hp, wp)}")
    # (3, 3*cin, cout): dy-major, dx flattened into the contraction dim in
    # the same order the kernel's 3-shift concat lays out channels
    w9 = w.reshape(3, 3 * cin, w.shape[3]).astype(x.dtype)
    b2 = b.reshape(1, -1).astype(x.dtype)
    if eff is not None:
        eff = eff.astype(jnp.float32)
    return _chain_conv(x, w9, b2, eff, skip, (hv, wv), pre_relu,
                       emit_input, interpret, tile)


def eff_affine(stats, scale, bias, count: int, eps: float = 1e-5):
    """Fold instance-norm statistics into a per-channel (scale, bias) pair:
    normalized = eff[0] * y + eff[1], matching stylizer.instance_norm
    (float32 stats, biased variance)."""
    mean = stats[0] / count
    var = jnp.maximum(stats[1] / count - mean * mean, 0.0)
    es = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    eb = bias.astype(jnp.float32) - mean * es
    return jnp.stack([es, eb])
