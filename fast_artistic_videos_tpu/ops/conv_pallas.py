"""Pallas TPU kernel: 3x3 stride-1 conv as 9 accumulated MXU dots.

Why: XLA's conv_general_dilated on the stylizer's residual-block shapes
(270 x 480 x 128 -> 128 at 1080p input) runs at ~3% MXU utilization
(~0.64 ms for a 3.8-GFLOP conv) — the spatial-major convolution lowering
never feeds the systolic array a dense 128x128 contraction. This kernel
rewrites the conv as

    y[p, :] = sum_{dy, dx} x[p + (dy, dx), :] @ W[dy, dx]      (9 dots)

over row tiles: each grid step DMAs a (TILE+2)-row window of the
pre-padded input into VMEM once and issues 9 (TILE*W, C) @ (C, Cout)
matmuls with a float32 accumulator — dense lane-width contractions, the
shape the MXU is built for. Bias and an optional ReLU fuse into the
epilogue.

Semantics: VALID 3x3 conv over an input already padded by 1 (callers keep
their own padding mode: zero / reflect / replicate, models/stylizer.py
_block_apply). Matches ``lax.conv_general_dilated`` output to bf16/f32
accumulation tolerance (both accumulate the MXU products in f32; the tap
ORDER differs, so the last-ulp rounding can differ).

Reference analog: the stnbdhw CUDA kernels are the reference's "native
fast path" (stnbdhw/BilinearSamplerBDHW.cu); this plays that role for the
conv stack on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 16  # output rows per grid step (also the bf16 sublane minimum)


def _conv3x3_kernel(x_hbm, w_ref, b_ref, o_ref, xwin, sem, *,
                    wout: int, wpad: int, cin: int, cout: int, relu: bool):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * _TILE, _TILE + 2), :, :], xwin, sem)
    dma.start()
    dma.wait()

    # im2col along K: the 9 shifted windows concatenate into one
    # (TILE*W, 9*C) operand and the conv is a single dense dot with
    # K = 9*C — a far better MXU shape than 9 accumulated K=C dots
    # (measured ~1.4x on the K=128 accumulate form at R-block shapes)
    parts = [
        xwin[dy : dy + _TILE, dx : dx + wout, :].reshape(_TILE * wout, cin)
        for dy in range(3) for dx in range(3)
    ]
    x9 = jnp.concatenate(parts, axis=1)
    y = jnp.dot(x9, w_ref[...], preferred_element_type=jnp.float32)
    y = y + b_ref[0].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[...] = y.reshape(_TILE, wout, cout).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("wout", "relu", "out_dtype", "interpret"))
def _conv3x3_padded(xp, w9, bias, wout: int, relu: bool, out_dtype,
                    interpret: bool):
    """xp: (Hp, Wp, C) — +1 halo each side, rows padded below to a TILE
    multiple, W padded so both `wout` and Wp are 8-multiples (aligned DMA
    windows and sublane slices); w9: (9*C, Cout); bias (1, Cout)."""
    hp, wpad, cin = xp.shape
    cout = w9.shape[1]
    hout = hp - 2
    kernel = functools.partial(
        _conv3x3_kernel, wout=wout, wpad=wpad, cin=cin, cout=cout, relu=relu)
    return pl.pallas_call(
        kernel,
        grid=(hout // _TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, wout, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hout, wout, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((_TILE + 2, wpad, cin), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w9, bias)


def conv3x3_pallas(x, w, b, relu: bool = False, interpret: bool = False):
    """Drop-in for ``conv2d(x, w, b, stride=1, pad=1)`` (+ optional fused
    ReLU) for 3x3 kernels with MXU-friendly channel counts.

    x: (N, H, W, C); w: (3, 3, C, Cout) HWIO; b: (Cout,). Zero padding 1
    (SAME). Use `conv3x3_pallas_valid` for pre-padded inputs (reflect /
    replicate block padding).
    """
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return conv3x3_pallas_valid(xp, w, b, relu=relu, interpret=interpret)


def conv3x3_pallas_valid(xp, w, b, relu: bool = False,
                         interpret: bool = False):
    """VALID 3x3 conv on an already-padded input xp (N, H+2, W+2, C)."""
    if not interpret and jax.devices()[0].platform == "cpu":
        interpret = True  # tests / CPU drives run the interpreter
    n, hp, wp, cin = xp.shape
    cout = w.shape[3]
    hout, wout = hp - 2, wp - 2
    dtype = xp.dtype
    # rows: pad below to a TILE multiple. cols: pad so the COMPUTE width
    # (wout_k) and the WINDOW width (wpad) are both 8-multiples — an
    # unaligned DMA window width faulted the TPU worker.
    row_pad = -hout % _TILE
    wout_k = wout + (-wout % 8)
    col_pad = (wout_k + 8) - wp
    xp = jnp.pad(xp, ((0, 0), (0, row_pad), (0, col_pad), (0, 0)))

    w9 = w.reshape(9 * cin, cout).astype(dtype)
    b2 = b.reshape(1, cout).astype(dtype)

    def one(item):
        return _conv3x3_padded(item, w9, b2, wout_k, relu, dtype, interpret)

    out = jax.vmap(one)(xp) if n > 1 else one(xp[0])[None]
    return out[:, :hout, :wout, :]
