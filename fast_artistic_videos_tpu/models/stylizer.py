"""The feed-forward stylizer network: arch-spec -> pure init/apply functions.

TPU-native re-design of the reference transformer net (models_video.lua):
  * NHWC layout, convs via lax.conv_general_dilated (MXU path).
  * Parameters are a flat dict {layer_name: {'w': ..., 'b': ...}} pytree —
    trivially shardable with jax.sharding and serializable with orbax.
  * InstanceNorm implemented directly (mean/var over H,W per sample+channel,
    biased variance, eps 1e-5) instead of the reference's BatchNorm-reshape
    trick (InstanceNormalization.lua:33-53). Stats are computed in float32
    regardless of compute dtype.
  * 'reflect-start' padding is applied statically at the input (the
    reference patches the net lazily at train time, train_video.lua:319-325).
  * The forward returns VGG-space output (tanh * tanh_constant). The
    reference's trailing TotalVariation layer is identity at forward time;
    its training gradient is reproduced by adding ops.tv.tv_loss to the
    training objective.

Weight init matches Torch defaults so that from-scratch training behaves the
same: conv W,b ~ U(-k, k) with k = 1/sqrt(fan_in); instance norm scale
~ U(0, 1), bias 0 (InstanceNormalization.lua:26-27).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .arch_dsl import LayerSpec, ModelSpec, parse_arch  # noqa: F401 (re-export)

Params = Dict[str, Any]

_DN = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------------------
# primitive layers
# ---------------------------------------------------------------------------

def _pad2d(x, pad: int, mode: str):
    if pad == 0:
        return x
    cfg = [(0, 0), (pad, pad), (pad, pad), (0, 0)]
    return jnp.pad(x, cfg, mode="reflect" if mode == "reflect" else "edge")


def conv2d(x, w, b, stride: int = 1, pad: int = 0):
    """Plain conv, zero padding `pad`, kernel HWIO."""
    # preferred_element_type matches the compute dtype: the MXU still
    # accumulates in f32 internally, and a float32 preference on bfloat16
    # operands breaks the autodiff transpose (bf16 lhs vs f32 cotangent)
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=_DN,
        preferred_element_type=x.dtype,
    )
    return y + b.astype(x.dtype)


def conv_transpose2d(x, w, b, stride: int, pad: int, out_adjust: int):
    """Torch SpatialFullConvolution semantics: out = (in-1)*s - 2p + k + a.

    Kernel is stored pre-flipped in HWIO so this lowers to a single dilated
    conv (input dilation = stride). The t7 importer performs the flip when
    converting Torch weights.
    """
    k = w.shape[0]
    lo = k - 1 - pad
    hi = k - 1 - pad + out_adjust
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((lo, hi), (lo, hi)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DN,
        preferred_element_type=x.dtype,
    )
    return y + b.astype(x.dtype)


def instance_norm(x, scale, bias, eps: float = 1e-5):
    """IN with learned affine; statistics accumulated in float32, biased
    variance. Written to avoid materializing a float32 copy of x (the naive
    form costs ~2 GB of HBM traffic per full-res layer at 1080p): reductions
    upcast inside the fused reduce, and the normalization collapses to one
    fused multiply-add with per-(n, c) scalars."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    mean_sq = jnp.mean(
        jnp.square(x.astype(jnp.float32)), axis=(1, 2), keepdims=True, dtype=jnp.float32
    )
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    eff_scale = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    eff_bias = bias.astype(jnp.float32) - mean * eff_scale
    return (x.astype(jnp.float32) * eff_scale + eff_bias).astype(x.dtype)


def upsample_nearest(x, scale: int):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, scale, w, scale, c))
    return x.reshape(n, h * scale, w * scale, c)


# ---------------------------------------------------------------------------
# space-to-depth (phase-domain) machinery
#
# Convs whose channel counts sit far below the 128-lane MXU width (the 7-in
# front conv, the 3-out tail conv) waste most of the systolic array. Each
# space-to-depth level trades 2x2 spatial for 4x channels EXACTLY: a stride-1
# size-preserving conv becomes a conv on the phased tensor with a re-indexed
# (roughly half-sized) kernel. The helpers below implement one level of that
# index algebra; they compose, so two levels give 16x the channels at 1/16th
# the positions.
# ---------------------------------------------------------------------------


def _s2d(x):
    """One space-to-depth level: (N, H, W, C) -> (N, H/2, W/2, 4C), channel
    blocks indexed (row_parity*2 + col_parity)."""
    n, h, w, c = x.shape
    xs = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return xs.reshape(n, h // 2, w // 2, 4 * c)


def _d2s(y, co: int):
    """Inverse of _s2d for phase-MAJOR channel blocks of width co."""
    n, h, w, _ = y.shape
    y = y.reshape(n, h, w, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, 2 * h, 2 * w, co)


def _d2s_level2(y, co: int):
    """Two depth-to-space levels in ONE transpose: (N, h, w, 16*co) ->
    (N, 4h, 4w, co), requiring channel blocks ordered (row_phase(4),
    col_phase(4), co) — i.e. ch = rp*4*co + cp*co + c.

    Two chained `_d2s` calls materialize an intermediate tensor whose channel
    count is tiny (e.g. 12 then 3 for the canonical tail), and XLA's layout
    assignment for those transposes is catastrophic (measured 15.1 ms at
    270p->1080p vs 2.4 ms for this single coarse-block transpose: the (w,
    col_phase, co) trailing group is already contiguous, so only row phases
    move)."""
    n, h, w, _ = y.shape
    y = y.reshape(n, h, w, 4, 4 * co).transpose(0, 1, 3, 2, 4)
    return y.reshape(n, 4 * h, 4 * w, co)


def _tail_phase_perm(o: int) -> np.ndarray:
    """Channel permutation taking the composite two-level phase order
    produced by _phase_level_kernel-over-_folded_upsample_conv blocks —
    ch = (muh*2+muw)*4o + (a*2+b)*o + c, where (muh, muw) are the 270p->540p
    parities and (a, b) the 540p->full parities — to the (row_phase(4),
    col_phase(4), c) order _d2s_level2 wants, with row_phase = 2*muh + a."""
    perm = np.empty(16 * o, np.int64)
    for muh in range(2):
        for muw in range(2):
            for a in range(2):
                for b in range(2):
                    old = (muh * 2 + muw) * 4 * o + (a * 2 + b) * o
                    rp, cp = 2 * muh + a, 2 * muw + b
                    new = (rp * 4 + cp) * o
                    perm[new : new + o] = np.arange(old, old + o)
    return perm


def _kbuf(shape, like):
    """Accumulation buffer for build-time kernel transforms. When `like` is a
    CONCRETE array (inference: params closed over in the jit), build in host
    numpy so the transformed kernel enters the graph as one literal — XLA's
    constant folder gives up on long .at[].add chains, which would otherwise
    re-run the whole transform on device EVERY dispatch (measured ~5 ms/frame
    at 1080p). Under tracing (training), fall back to traced jnp ops."""
    if isinstance(like, jax.core.Tracer):
        zeros = jnp.zeros(shape, like.dtype)
        return zeros, (lambda buf, idx, val: buf.at[idx].add(val)), like, jnp.asarray
    arr = np.asarray(like)
    zeros = np.zeros(shape, arr.dtype)

    def add(buf, idx, val):
        buf[idx] += val
        return buf

    # stay in NUMPY on the concrete path: under an active trace jnp.asarray
    # would lift the constant into a const-tracer, which downstream
    # build-time transforms (e.g. the flat->nested channel permutation of
    # the pre-phased front) can no longer index host-side
    return zeros, add, arr, (lambda a: a)


def _phase_level_kernel(w, pads):
    """One s2d level of a stride-1 size-preserving conv.

    Given kernel w (kh, kw, CI, CO) and pads ((plh, phh), (plw, phw)) with
    pl+ph = k-1, returns (w2, pads2) such that
      conv(x, w, pads) == d2s(conv(s2d(x), w2, pads2), 4*CO-blocks)
    exactly. Index algebra per axis: output phase mu, tap u ->
    t = mu + u - pl; block shift S = t >> 1, input phase nu = t & 1.
    Output channel blocks are phase-major (mu_h*2 + mu_w)."""
    kh, kw, ci, co = w.shape
    (plh, phh), (plw, phw) = pads
    sh = [(mu + u - plh) >> 1 for mu in range(2) for u in range(kh)]
    sw = [(mu + v - plw) >> 1 for mu in range(2) for v in range(kw)]
    shmin, shmax = min(sh), max(sh)
    swmin, swmax = min(sw), max(sw)
    w2, add, wsrc, done = _kbuf(
        (shmax - shmin + 1, swmax - swmin + 1, 4 * ci, 4 * co), w)
    for muh in range(2):
        for muw in range(2):
            for u in range(kh):
                for v in range(kw):
                    th, tw = muh + u - plh, muw + v - plw
                    nu = ((th & 1) * 2 + (tw & 1)) * ci
                    mu = (muh * 2 + muw) * co
                    idx = ((th >> 1) - shmin, (tw >> 1) - swmin,
                           slice(nu, nu + ci), slice(mu, mu + co))
                    w2 = add(w2, idx, wsrc[u, v])
    return done(w2), ((-shmin, shmax), (-swmin, swmax))


def _phase_stride2_kernel(w, in_levels: int):
    """A 3x3 stride-2 pad-1 conv consuming an `in_levels`-phased input and
    producing an (in_levels-1)-phased output (in_levels=1: true grid), as a
    2x2 conv with block pads (1, 0).

    Per axis with P = 2**in_levels: output phase mu (in_levels-1 bits),
    tap u -> t = 2*mu + u - 1; input phase nu = t mod P, shift S = t >> L
    (always in {-1, 0}). Channel blocks phase-major per level (outer bit
    first), matching repeated _s2d nesting."""
    ci, co = w.shape[2], w.shape[3]
    L = in_levels
    P = 1 << L
    Q = 1 << (L - 1)

    def blk(vh, vw, levels):
        idx = 0
        for level in range(levels - 1, -1, -1):
            idx = idx * 4 + ((vh >> level) & 1) * 2 + ((vw >> level) & 1)
        return idx

    k, add, wsrc, done = _kbuf((2, 2, P * P * ci, Q * Q * co), w)
    for muh in range(Q):
        for muw in range(Q):
            for u in range(3):
                for v in range(3):
                    th, tw = 2 * muh + u - 1, 2 * muw + v - 1
                    nu = blk(th % P, tw % P, L) * ci
                    mu = blk(muh, muw, L - 1) * co if L > 1 else 0
                    idx = ((th >> L) + 1, (tw >> L) + 1,
                           slice(nu, nu + ci), slice(mu, mu + co))
                    k = add(k, idx, wsrc[u, v])
    return done(k)


def _fold_vgg_preprocess_kernel(w, b):
    """Fold VGG preprocessing of content AND prior into the first conv's
    weights (build-time, exact linear algebra — preprocess.lua:57-71 is
    affine per channel and the certainty mask distributes onto the prior).

    Raw-channel input contract (the engine's phase-resident step) — EIGHT
    channels (16 phases x 8 = exactly 128 MXU lanes):
      0-2  content RGB at 0..255 scale (uint8 values, unpreprocessed)
      3-5  warped-prior RGB in [0,1], PRE-multiplied by certainty
      6    certainty in [0,1]
      7    ones (in-bounds indicator; the conv's zero padding zeroes it
           outside the frame exactly like the reference's preprocessed
           input is zero there — folding the content means into the BIAS
           instead would wrongly apply them at the zero-pad ring)
    The folded conv equals the original conv on the reference input
    [vgg_pre(content), vgg_pre(prior)*cert + 0, cert] with the default
    'vgg-mean' occlusion fill (core.lua:161-171):
      vgg content ch i = content_bgr_raw_i - mean_i            (raw 0..255)
      vgg prior   ch i = 255*prior_rgb_bgr_i*cert - mean_i*cert
    so the mean*cert term folds into the certainty column and the content
    means into the ones column. Inference-only (params must be concrete)."""
    from ..ops.preprocess import VGG_MEAN_BGR

    w = np.asarray(w)
    b = np.asarray(b)
    if w.shape[2] != 7:
        raise ValueError("fold_preprocess needs the 7-channel video input")
    m = VGG_MEAN_BGR
    wf = np.empty(w.shape[:2] + (8, w.shape[3]), w.dtype)
    wf[:, :, 0] = w[:, :, 2]          # c_r feeds vgg content channel R
    wf[:, :, 1] = w[:, :, 1]
    wf[:, :, 2] = w[:, :, 0]
    wf[:, :, 3] = 255.0 * w[:, :, 5]  # p_r feeds vgg prior channel R
    wf[:, :, 4] = 255.0 * w[:, :, 4]
    wf[:, :, 5] = 255.0 * w[:, :, 3]
    wf[:, :, 6] = w[:, :, 6] - (
        m[0] * w[:, :, 3] + m[1] * w[:, :, 4] + m[2] * w[:, :, 5])
    wf[:, :, 7] = -(m[0] * w[:, :, 0] + m[1] * w[:, :, 1]
                    + m[2] * w[:, :, 2])
    return wf, b


def supports_phase_io(spec: ModelSpec) -> bool:
    """True when ``apply`` accepts phase_input/phase_output for this arch:
    the level-2 phase front must apply (conv s1 SAME + two 3x3 s2 pad-1
    convs, instance norm) and the input reflect pad must be block-aligned.
    The caller must also ensure the padded H, W are multiples of 4."""
    if len(spec.layers) < 3 or not spec.use_instance_norm:
        return False
    if spec.input_pad % 4 != 0:
        return False
    l0, l1, l2 = spec.layers[0], spec.layers[1], spec.layers[2]
    return (
        l0.kind == "conv" and l0.stride == 1 and l0.pad_mode is None
        and l0.pad == (l0.ksize - 1) // 2 and l0.norm_after and l0.relu_after
        and l1.kind == "conv" and l1.stride == 2 and l1.ksize == 3
        and l1.pad == 1 and l1.pad_mode is None
        and l1.norm_after and l1.relu_after
        and l2.kind == "conv" and l2.stride == 2 and l2.ksize == 3
        and l2.pad == 1 and l2.pad_mode is None
    )


def _grouped_instance_norm(y, scale, bias, phases: int, eps: float = 1e-5):
    """Instance norm over a phase-major phased tensor with statistics grouped
    across the phases — exactly the full-resolution statistics, since the
    phases partition the pixels."""
    n, h, w, _ = y.shape
    o = y.shape[-1] // phases
    yg = y.reshape(n, h, w, phases, o)
    mean = jnp.mean(yg, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
    mean_sq = jnp.mean(jnp.square(yg.astype(jnp.float32)), axis=(1, 2, 3),
                       keepdims=True, dtype=jnp.float32)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    eff_scale = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    eff_bias = bias.astype(jnp.float32) - mean * eff_scale
    yg = (yg.astype(jnp.float32) * eff_scale + eff_bias).astype(y.dtype)
    return yg.reshape(n, h, w, phases * o)


def _fold_span(ksize: int, pad: int) -> int:
    """Tap span of the phase kernel `_folded_upsample_conv` builds."""
    offsets = [(a + u - pad) // 2 for a in range(2) for u in range(ksize)]
    return max(offsets) - min(offsets) + 1


def _folded_upsample_conv(x, w, b, ksize: int, pad: int,
                          phase_in: bool = False, phase_out: bool = False,
                          skip_d2s: bool = False):
    """Exact rewrite of [nearest-upsample x2 -> k x k stride-1 zero-pad conv]
    as one phase conv at LOW resolution + depth-to-space.

    y[2i+a, 2j+b] = sum_{u,v} w[u,v] * x[(2i+a+u-pad)//2, (2j+b+v-pad)//2]
    so each of the 4 output phases is a small conv over x with taps
    s = (phase+u-pad)//2; duplicated-pixel taps collapse by summing weights.
    Cuts the conv's MXU work ~4x and skips materializing the upsampled
    tensor — the dominant cost of the canonical arch's full-res tail
    (measured: 9x9 64->3 @1080p goes ~35 ms -> ~4 ms).

    phase_out=True: return the conv result in the phase domain — (n, h, w,
    4*o) with phase-MAJOR channel blocks, i.e. exactly `_s2d` of the logical
    (n, 2h, 2w, o) output — without materializing it. phase_in=True: `x` IS
    the phase-major form of the logical input (from a previous phase_out,
    norm/relu'd grouped); requires the small-channel level-2 branch
    (4*o <= 16, `_fold_span` >= 4). Chaining the canonical tail's two folds
    this way skips an exact `_d2s`/`_s2d` inverse pair at the mid
    resolution (BENCH_NOTES round 3).
    """
    n, h, ww, _ = x.shape
    c, o = w.shape[2], w.shape[-1]  # logical channels (x may be phase-major)
    offsets = [(a + u - pad) // 2 for a in range(2) for u in range(ksize)]
    smin, smax = min(offsets), max(offsets)
    ks = smax - smin + 1
    k, add, wsrc, done = _kbuf((ks, ks, c, 4 * o), w)
    for a in range(2):
        for bb in range(2):
            for u in range(ksize):
                for v in range(ksize):
                    si = (a + u - pad) // 2 - smin
                    sj = (bb + v - pad) // 2 - smin
                    idx = (si, sj, slice(None), slice((a * 2 + bb) * o, (a * 2 + bb) * o + o))
                    k = add(k, idx, wsrc[u, v])
    k = done(k)
    pads = ((-smin, smax), (-smin, smax))
    if phase_out:
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), pads,
            dimension_numbers=_DN, preferred_element_type=x.dtype,
        ) + jnp.tile(b.astype(x.dtype), 4)
    if phase_in:
        assert 4 * o <= 16 and ks >= 4, "phase_in needs the level-2 branch"
        k2, pads2 = _phase_level_kernel(k, pads)
        perm = _tail_phase_perm(o)
        if isinstance(k2, jax.core.Tracer):
            k2 = k2[..., jnp.asarray(perm)]
        else:
            k2 = jnp.asarray(np.asarray(k2)[..., perm])
        y = jax.lax.conv_general_dilated(
            x, k2.astype(x.dtype), (1, 1), pads2,
            dimension_numbers=_DN, preferred_element_type=x.dtype,
        ) + jnp.tile(b.astype(x.dtype), 16)
        # skip_d2s: the (row_phase, col_phase, o) flat-order channels are
        # exactly ops.phase.s2d2_flat's layout — the phase-resident engine
        # keeps the recurrence there and never materializes full res
        return y if skip_d2s else _d2s_level2(y, o)
    if 4 * o <= 16 and ks >= 4 and h % 2 == 0 and ww % 2 == 0:
        # output channels still starve the MXU (e.g. the canonical 9x9 64->3
        # tail folds to a 5x5 64->12): take one more s2d level — a ~3x3 conv
        # with 4x channels on both sides at quarter resolution. The kernel's
        # output channels are permuted at build time to (row_phase, col_phase,
        # c) so both d2s levels collapse into one coarse transpose.
        k2, pads2 = _phase_level_kernel(k, pads)
        perm = _tail_phase_perm(o)
        if isinstance(k2, jax.core.Tracer):
            k2 = k2[..., jnp.asarray(perm)]
        else:
            k2 = jnp.asarray(np.asarray(k2)[..., perm])
        y = jax.lax.conv_general_dilated(
            _s2d(x), k2.astype(x.dtype), (1, 1), pads2,
            dimension_numbers=_DN, preferred_element_type=x.dtype,
        ) + jnp.tile(b.astype(x.dtype), 16)
        return _d2s_level2(y, o)
    else:
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), pads,
            dimension_numbers=_DN, preferred_element_type=x.dtype,
        ) + jnp.tile(b.astype(x.dtype), 4)
    # depth-to-space: channel blocks are phase-major (a*2+b)
    return _d2s(y, o)


def _phase_front(x, p0, layer0, norm0, p1, spec, levels: int = 1,
                 norm1=None, p2=None, pre_phased: bool = False,
                 fold_preprocess: bool = False):
    """Exact phase-domain front end: [conv k s1 (SAME) -> IN -> ReLU ->
    3x3 s2 conv (-> IN -> ReLU -> 3x3 s2 conv)] computed entirely in
    space-to-depth domain.

    The full-resolution convs dominate the canonical net at 1080p (the 7-in
    front conv runs at a few percent of MXU peak). levels=1: one s2d level;
    the first conv becomes a (k+1)/2-sized 4-phase kernel, instance norm
    groups its statistics across the 4 phases (the phases partition the
    pixels, so grouped stats == full-res stats exactly), and the stride-2
    conv is a 2x2 phase kernel — returns the true half-res grid.
    levels=2 (H, W % 4 == 0): two s2d levels (16 phases, ~quarter-sized
    kernel, 16x channels on both sides of the MXU), the first stride-2 conv
    produces a 4-phase half-res tensor, its norm/relu run grouped
    (norm1), and the SECOND stride-2 conv (p2, e.g. the canonical d128) is
    absorbed too — returns the true quarter-res grid and no resolution above
    it is ever materialized."""
    k0, pad0 = layer0.ksize, layer0.pad
    o0 = p0["w"].shape[-1]
    w0, b0, pads = p0["w"], p0["b"], ((pad0, pad0), (pad0, pad0))
    if fold_preprocess:
        # inference-only (concrete params): raw-channel input contract,
        # see _fold_vgg_preprocess_kernel
        w0, b0 = _fold_vgg_preprocess_kernel(w0, b0)
    xs = x
    if pre_phased:
        # x is ALREADY the two-level phased input in FLAT channel order
        # (ops.phase.s2d2_flat of the reflect-padded full-res input); the
        # phase kernels below index nested-order channels, so the
        # flat->nested permutation folds into the kernel at build time.
        assert levels == 2, "pre_phased input is the two-level flat layout"
        from ..ops.phase import flat_to_nested_perm

        cin = np.asarray(w0).shape[2]  # 8 when preprocess-folded, else 7
        for _ in range(2):
            w0, pads = _phase_level_kernel(w0, pads)
        w0 = np.asarray(w0)[:, :, flat_to_nested_perm(cin), :]
    else:
        for _ in range(levels):
            w0, pads = _phase_level_kernel(w0, pads)
            xs = _s2d(xs)
    P = 4 ** levels
    y = jax.lax.conv_general_dilated(
        xs, jnp.asarray(w0).astype(x.dtype), (1, 1), pads,
        dimension_numbers=_DN, preferred_element_type=x.dtype,
    ) + jnp.tile(jnp.asarray(b0).astype(x.dtype), P)
    y = _grouped_instance_norm(y, norm0["scale"], norm0["bias"], P)
    y = jax.nn.relu(y)
    # --- stride-2 3x3 pad-1 conv: 2x2 phase kernel, block pad (1, 0)
    k1 = _phase_stride2_kernel(p1["w"], levels)
    z = jax.lax.conv_general_dilated(
        y, k1.astype(x.dtype), (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=_DN, preferred_element_type=x.dtype,
    ) + jnp.tile(p1["b"].astype(x.dtype), 4 ** (levels - 1))
    if levels == 1:
        return z
    # levels == 2: z is the 4-phase half-res grid; finish the first strided
    # layer's norm/relu with grouped stats, then absorb the second strided
    # conv, landing on the true quarter-res grid
    z = _grouped_instance_norm(z, norm1["scale"], norm1["bias"], 4)
    z = jax.nn.relu(z)
    k2 = _phase_stride2_kernel(p2["w"], 1)
    return jax.lax.conv_general_dilated(
        z, k2.astype(x.dtype), (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=_DN, preferred_element_type=x.dtype,
    ) + p2["b"].astype(x.dtype)


def _phase_front_pallas(x, p0, layer0, norm0, p1, interpret=None):
    """`_phase_front(levels=1)` with the 2x2 phased stride-2 conv executed
    by an ops.front_pallas im2col MXU kernel (XLA runs that conv ~14x off
    roofline, BENCH_NOTES round 3) and the grouped instance norm + ReLU
    fused into its prologue. The 5x5-ish phased first conv stays on XLA
    for now: its 28-channel input cannot be window-DMA'd (Mosaic requires
    128-aligned lane extents) and lane-padding it to 128 wastes 4.5x MXU.

    Measured in-graph (round 3): REGRESSES 13.5 -> 19.8 ms @1080p — the
    pallas consumer makes XLA re-lay-out the whole upstream (s2d picks
    T(2,128) transpose forms, F1 falls back to a slow conv emitter), the
    same boundary disease as fused_rblocks. Default OFF; kept as the
    parity-tested base of the planned full-pallas front end.

    Returns (z, stats, count): z (1, H/2, W/2, C1) as `_phase_front` would
    (before layer 1's own norm/relu), plus the kernel's masked statistics
    over z so the caller's instance norm needs no extra reduction pass.
    """
    from ..ops import front_pallas as fp

    pad0 = layer0.pad
    o0 = p0["w"].shape[-1]
    w0, pads = _phase_level_kernel(p0["w"], ((pad0, pad0), (pad0, pad0)))
    xs = _s2d(x)
    hv, wv = xs.shape[1], xs.shape[2]
    y1 = jax.lax.conv_general_dilated(
        xs, jnp.asarray(w0, x.dtype), (1, 1), pads,
        dimension_numbers=_DN, preferred_element_type=x.dtype,
    )[0] + jnp.tile(p0["b"].astype(x.dtype), 4)
    # grouped IN statistics (phases partition the full-res pixels) in XLA;
    # the affine + ReLU apply inside the F2 kernel prologue
    y32sum = jnp.sum(y1.reshape(hv, wv, 4, o0), axis=(0, 1, 2),
                     dtype=jnp.float32)
    y32sq = jnp.sum(jnp.square(y1.astype(jnp.float32)).reshape(hv, wv, 4, o0),
                    axis=(0, 1, 2))
    count = 4 * hv * wv
    mean = y32sum / count
    var = jnp.maximum(y32sq / count - mean * mean, 0.0)
    es = jax.lax.rsqrt(var + 1e-5) * norm0["scale"].astype(jnp.float32)
    eb = norm0["bias"].astype(jnp.float32) - mean * es
    eff1 = jnp.stack([jnp.tile(es, 4), jnp.tile(eb, 4)])

    k1 = _phase_stride2_kernel(p1["w"], 1)
    hp2 = fp.front_geometry(hv, 2, 1)
    y1p = jnp.pad(y1, ((1, hp2 - hv - 1), (0, 0), (0, 0)))
    z, st2 = fp.same_conv(y1p, jnp.asarray(k1, x.dtype), p1["b"], 1, 1, hv,
                          eff=eff1, relu=True, interpret=interpret)
    return z[None, :hv, :wv], st2, hv * wv


def _grouped_eff(st, norm, phases: int, o: int, count: int, eps: float = 1e-5):
    """Effective per-channel affine of a grouped instance norm computed from
    a front kernel's masked [sum; sumsq] statistics (2, phases*o).

    The phases partition the full-resolution pixels, so summing the phase
    blocks gives exactly the full-res per-channel statistics; the affine is
    broadcast back to all phase blocks for the next kernel's prologue."""
    s = st.reshape(2, phases, o).sum(axis=1)
    n = count * phases
    mean = s[0] / n
    var = jnp.maximum(s[1] / n - mean * mean, 0.0)
    es = jax.lax.rsqrt(var + eps) * norm["scale"].astype(jnp.float32)
    eb = norm["bias"].astype(jnp.float32) - mean * es
    return jnp.stack([jnp.tile(es, phases), jnp.tile(eb, phases)])


def _phase_front_pallas2(x, p0, layer0, norm0, p1, norm1, p2, interpret=None):
    """`_phase_front(levels=2)` with all three composed phase convs executed
    by ops.front_pallas `same_conv` MXU kernels — the full-pallas front end.

    Round-3 BENCH_NOTES localized the fused-kernel regressions to XLA
    layout conversions at XLA-conv -> pallas boundaries (the custom call
    forces default layouts while XLA's conv picks another for its output).
    Here NO XLA conv sits between the input s2d^2 and the residual blocks:
    C1 (the first conv as a 16-phase 3x3-ish kernel, K = 9*128 after lane
    padding), C2 (the first strided conv as a 4-phase kernel, C1's grouped
    instance norm + ReLU fused into its prologue) and C3 (the second
    strided conv, C2's grouped IN + ReLU fused) all run on the quarter-res
    grid with 128-multiple lane extents, chained so each kernel's output
    rows double as the next kernel's zero top margin (chain_plan).

    Semantics: layers 0-2 of the canonical net (models_video.lua:5-9,
    conv9 -> d64 -> d128) exactly as `_phase_front(levels=2)` computes
    them. Returns (z, stats, count): z (1, H/4, W/4, C2) — the true
    quarter-res grid BEFORE layer 2's norm/relu — plus the kernel's masked
    [sum; sumsq] over it, so the caller fuses layer 2's instance norm into
    whatever consumes z (the fused residual chain's first prologue).
    """
    from ..ops import front_pallas as fp

    pad0 = layer0.pad
    o0 = p0["w"].shape[-1]
    o1 = p1["w"].shape[-1]
    w0, pads = p0["w"], ((pad0, pad0), (pad0, pad0))
    xs = x
    for _ in range(2):
        w0, pads = _phase_level_kernel(w0, pads)
        xs = _s2d(xs)
    xs = xs[0]
    hv, wv, c16 = xs.shape
    (pt0, pb0), (pl0, pr0) = pads
    kh0, kw0 = w0.shape[0], w0.shape[1]
    assert pb0 == kh0 - 1 - pt0 and pr0 == kw0 - 1 - pl0
    cpad = (-c16) % 128

    shifts, heights = fp.chain_plan(hv, [(kh0, pt0, 4), (2, 1, 2), (2, 1, 4)])
    m0 = pt0 - shifts[0]
    xp = jnp.pad(xs, ((m0, heights[0] - hv - m0), (0, 0), (0, cpad)))
    w0p = jnp.pad(w0, ((0, 0), (0, 0), (0, cpad), (0, 0)))
    y1, st1 = fp.same_conv(
        xp, jnp.asarray(w0p, x.dtype), jnp.tile(p0["b"], 16), pt0, pl0, hv,
        out_row_shift=shifts[0], tile=4, interpret=interpret)
    eff1 = _grouped_eff(st1, norm0, 16, o0, hv * wv)

    k1 = _phase_stride2_kernel(p1["w"], 2)
    y2, st2 = fp.same_conv(
        y1, jnp.asarray(k1, x.dtype), jnp.tile(p1["b"], 4), 1, 1, hv,
        out_row_shift=shifts[1], eff=eff1, relu=True, tile=2, valid_w=wv,
        interpret=interpret)
    eff2 = _grouped_eff(st2, norm1, 4, o1, hv * wv)

    k2 = _phase_stride2_kernel(p2["w"], 1)
    z, st3 = fp.same_conv(
        y2, jnp.asarray(k2, x.dtype), p2["b"], 1, 1, hv,
        out_row_shift=0, eff=eff2, relu=True, tile=4, valid_w=wv,
        interpret=interpret)
    return z[None, :hv, :wv], st3, hv * wv


def shave(x, s: int):
    return x[:, s:-s, s:-s, :]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_conv(key, ksize, in_ch, out_ch):
    k1, k2 = jax.random.split(key)
    stdv = 1.0 / (ksize * ksize * in_ch) ** 0.5
    w = jax.random.uniform(k1, (ksize, ksize, in_ch, out_ch), jnp.float32, -stdv, stdv)
    b = jax.random.uniform(k2, (out_ch,), jnp.float32, -stdv, stdv)
    return {"w": w, "b": b}


def _init_norm(key, ch, use_instance_norm: bool):
    if use_instance_norm:
        scale = jax.random.uniform(key, (ch,), jnp.float32, 0.0, 1.0)
    else:
        scale = jnp.ones((ch,), jnp.float32)
    return {"scale": scale, "bias": jnp.zeros((ch,), jnp.float32)}


def init_params(key, spec: ModelSpec) -> Params:
    params: Params = {}
    in_ch = spec.in_channels
    use_in = spec.use_instance_norm
    for i, layer in enumerate(spec.layers):
        name = f"layer{i:02d}"
        key, *ks = jax.random.split(key, 6)
        if layer.kind in ("conv", "full_conv"):
            params[name] = _init_conv(ks[0], layer.ksize, in_ch, layer.out_channels)
            in_ch = layer.out_channels
        elif layer.kind in ("conv_block", "res_block"):
            d = layer.out_channels
            params[name] = {
                "conv1": _init_conv(ks[0], 3, d, d),
                "norm1": _init_norm(ks[1], d, use_in),
                "conv2": _init_conv(ks[2], 3, d, d),
                "norm2": _init_norm(ks[3], d, use_in),
            }
            in_ch = d
        if layer.norm_after:
            params[name + "_norm"] = _init_norm(ks[4], in_ch, use_in)
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _norm_apply(x, p, use_instance_norm: bool):
    if use_instance_norm:
        return instance_norm(x, p["scale"], p["bias"])
    # Batch norm (use_instance_norm=0 parity): evaluation uses stored
    # running statistics when the checkpoint carries them (t7 BN imports);
    # freshly initialized models fall back to batch statistics.
    if "running_mean" in p:
        mean = p["running_mean"].astype(jnp.float32)
        var = p["running_var"].astype(jnp.float32)
    else:
        mean = x.astype(jnp.float32).mean(axis=(0, 1, 2))
        var = x.astype(jnp.float32).var(axis=(0, 1, 2))
    eff_scale = jax.lax.rsqrt(var + 1e-5) * p["scale"].astype(jnp.float32)
    eff_bias = p["bias"].astype(jnp.float32) - mean * eff_scale
    return (x.astype(jnp.float32) * eff_scale + eff_bias).astype(x.dtype)


def _block_conv(h, pw, pb, pad: int, pallas_conv: bool):
    """Block conv dispatch: the Pallas im2col-K kernel for 3x3 stride-1
    convs at MXU-friendly widths (inference path), XLA conv otherwise."""
    if (pallas_conv and pw.shape[0] == 3 and pw.shape[1] == 3
            and pw.shape[2] % 128 == 0 and pw.shape[3] % 128 == 0):
        from ..ops import conv_pallas

        if pad == 1:
            return conv_pallas.conv3x3_pallas(h, pw, pb)
        # pad == 0: caller already applied the block's reflect/replicate
        # halo, so h is (N, H+2, W+2, C) and the conv is VALID
        return conv_pallas.conv3x3_pallas_valid(h, pw, pb)
    return conv2d(h, pw, pb, 1, pad)


def _block_apply(x, p, layer: LayerSpec, use_in: bool, residual: bool,
                 pallas_conv: bool = False):
    pt = layer.block_padding
    inner_pad = 1 if pt == "zero" else 0
    h = x
    if pt in ("reflect", "replicate"):
        h = _pad2d(h, 1, pt)
    h = _block_conv(h, p["conv1"]["w"], p["conv1"]["b"], inner_pad, pallas_conv)
    h = _norm_apply(h, p["norm1"], use_in)
    h = jax.nn.relu(h)
    if pt in ("reflect", "replicate"):
        h = _pad2d(h, 1, pt)
    h = _block_conv(h, p["conv2"]["w"], p["conv2"]["b"], inner_pad, pallas_conv)
    h = _norm_apply(h, p["norm2"], use_in)
    if not residual:
        return h
    skip = shave(x, 2) if pt in ("none", "reflect-start") else x
    return h + skip


def _fused_res_chain(params, x, idxs, pre_eff=None, pre_relu=False,
                     interpret=None):
    """Run a maximal chain of VALID (reflect-start / none padding) residual
    blocks through ops.rblock_pallas on one constant aligned physical shape.

    x: (1, H, W, C) valid tensor -> (1, H-4k, W-4k, C) for k blocks. The
    block-output affine+skip of block n is fused into the conv1 launch of
    block n+1; only the last block's epilogue runs in XLA. See
    ops/rblock_pallas.py for why (round-2 shrinking-shape negative result).

    pre_eff/pre_relu: the PRODUCER's pending instance-norm affine + ReLU
    (the full-pallas front hands the raw d128 output plus its stats), fused
    into the first conv launch; the fused-in true block input is emitted by
    the kernel and becomes block 1's residual skip.
    """
    from ..ops import rblock_pallas as rbp

    h0, w0, _ = x.shape[1:]
    dtype = x.dtype
    hp, wp = rbp.chain_geometry(h0, w0, dtype)
    a = jnp.pad(x[0], ((0, hp - h0), (0, wp - w0), (0, 0)))
    hv, wv = h0, w0
    y2 = eff2 = None
    for n, i in enumerate(idxs):
        p = params[f"layer{i:02d}"]
        if n == 0:
            if pre_eff is not None or pre_relu:
                y1, st1, a = rbp.chain_conv(
                    a, p["conv1"]["w"], p["conv1"]["b"], (hv - 2, wv - 2),
                    eff=pre_eff, pre_relu=pre_relu, emit_input=True,
                    interpret=interpret)
            else:
                y1, st1 = rbp.chain_conv(
                    a, p["conv1"]["w"], p["conv1"]["b"], (hv - 2, wv - 2),
                    interpret=interpret)
        else:
            y1, st1, a = rbp.chain_conv(
                y2, p["conv1"]["w"], p["conv1"]["b"], (hv - 2, wv - 2),
                eff=eff2, skip=a, emit_input=True, interpret=interpret)
        eff1 = rbp.eff_affine(st1, p["norm1"]["scale"], p["norm1"]["bias"],
                              (hv - 2) * (wv - 2))
        y2, st2 = rbp.chain_conv(
            y1, p["conv2"]["w"], p["conv2"]["b"], (hv - 4, wv - 4),
            eff=eff1, pre_relu=True, interpret=interpret)
        eff2 = rbp.eff_affine(st2, p["norm2"]["scale"], p["norm2"]["bias"],
                              (hv - 4) * (wv - 4))
        hv, wv = hv - 4, wv - 4
    out = (y2[:hv, :wv].astype(jnp.float32) * eff2[0] + eff2[1]).astype(dtype)
    out = out + a[2:2 + hv, 2:2 + wv]
    return out[None]


def _fused_chain_idxs(spec: ModelSpec, params, x, fused_rblocks):
    """Indices of the first maximal res_block run eligible for the fused
    Pallas chain; () when disabled or ineligible.

    fused_rblocks=None currently means OFF: the chain alone beats the XLA
    blocks (2.6 vs 2.8 ms at canonical 1080p shapes), but embedded mid-net
    XLA inserts a ~6 ms layout-conversion copy at the XLA->pallas boundary
    (the custom call forces default operand layouts; measured via the
    independent-input coexistence probe, BENCH_NOTES round 3). Auto-enable
    returns when the front kernels make the producer pallas too. Training
    always takes the XLA path (the chain has no custom VJP)."""
    if fused_rblocks is None:
        return ()
    mxu_only = False  # explicit opt-in (tests): any channel count
    if not fused_rblocks or not spec.use_instance_norm or x.shape[0] != 1:
        return ()
    run = []
    for i, layer in enumerate(spec.layers):
        ok = (layer.kind == "res_block"
              and layer.block_padding in ("none", "reflect-start")
              and not layer.norm_after and not layer.relu_after
              and (layer.out_channels % 128 == 0 or not mxu_only))
        if ok:
            run.append(i)
        elif run:
            break
    return tuple(run)


def _s2d_conv(x, w, b, ksize: int, pad: int):
    """Exact rewrite of a stride-1 zero-pad conv with few input or output
    channels as a space-to-depth phase conv at half resolution + d2s.

    Convs with C_in or C_out far below the 128-lane MXU width waste the
    systolic array; packing 2x2 pixel phases into channels both quadruples
    the channel dims and quarters the positions. Requires even H, W (the
    engine pads frames to the model's stride multiple).
    """
    n, h, ww, c = x.shape
    o = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    hp, wp = xp.shape[1], xp.shape[2]
    xs = xp.reshape(n, hp // 2, 2, wp // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(n, hp // 2, wp // 2, 4 * c)
    ks = (ksize + 1) // 2
    k, add, wsrc, done = _kbuf((ks, ks, 4 * c, 4 * o), w)
    for a in range(2):
        for bb in range(2):
            for u in range(ksize):
                for v in range(ksize):
                    pi, qi = (a + u) // 2, (a + u) % 2
                    pj, qj = (bb + v) // 2, (bb + v) % 2
                    idx = (pi, pj,
                           slice((qi * 2 + qj) * c, (qi * 2 + qj) * c + c),
                           slice((a * 2 + bb) * o, (a * 2 + bb) * o + o))
                    k = add(k, idx, wsrc[u, v])
    k = done(k)
    y = jax.lax.conv_general_dilated(
        xs,
        k.astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=_DN,
        preferred_element_type=x.dtype,
    )
    y = y + jnp.tile(b.astype(x.dtype), 4)
    hh, wh = y.shape[1], y.shape[2]
    y = y.reshape(n, hh, wh, 2, 2, o).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, 2 * hh, 2 * wh, o)


def apply(params: Params, spec: ModelSpec, x, *, dtype=None, optimize: bool = True,
          stop_after=None, start_at: int = 0, pallas_conv: bool = False,
          fused_rblocks=None, fused_front=None, phase_input: bool = False,
          phase_output: bool = False, fold_preprocess: bool = False):
    """Run the stylizer. x: (N, H, W, in_channels) in preprocessed (VGG)
    space; returns (N, H, W, 3) in VGG space (pre-deprocess).

    start_at=i resumes the net at layer i: x is then the INTERMEDIATE
    activation after layer i-1 (e.g. a value previously returned with
    stop_after=i-1) — input reflect-pad and the phase-domain front
    rewrites are skipped. apply(start_at=k, x=apply(..., stop_after=k-1))
    composes to the exact full forward (same traced ops), which is what
    the engine's feature-reuse mode splits on (video/engine.py).

    optimize=True enables exact-math graph rewrites for TPU throughput
    (currently: folding nearest-upsample x2 into the following conv —
    instance norm and ReLU commute with nearest duplication, so they run at
    low resolution too).

    fused_rblocks routes the VALID residual-block chain through the fused
    Pallas kernels (ops.rblock_pallas): constant aligned physical shapes,
    conv+prologue fusion, masked instance-norm stats — INFERENCE ONLY (no
    custom VJP). None (default) is currently OFF (see _fused_chain_idxs:
    the XLA->pallas boundary layout conversion eats the win mid-net);
    True forces it on. Numerics match the XLA path to
    conv-accumulation-order rounding (tests/test_rblock_pallas.py).

    pallas_conv=True routes MXU-width 3x3 stride-1 convs (the residual
    blocks) through ops.conv_pallas (per-conv im2col-K kernel) — the
    round-2 predecessor of fused_rblocks, kept for A/B measurement; it
    LOSES in-graph on the canonical net (37.6 -> 30.2 fps, BENCH_NOTES)
    because of pad/crop copies on the net's shrinking odd shapes, which is
    exactly what fused_rblocks' constant-shape chain fixes.

    fused_front="full" (inference, batch 1) runs layers 0-2 as the
    level-2 phase-domain full-pallas front (_phase_front_pallas2) and —
    unless overridden — turns fused_rblocks ON so the whole mid-net is
    pallas with no XLA conv at any kernel boundary. fused_front=True is
    the round-3 F2-only experiment (REGRESSES in-graph, see
    _phase_front_pallas); both default OFF pending hardware wins.
    """
    if dtype is not None:
        x = x.astype(dtype)
    use_in = spec.use_instance_norm
    start = start_at
    pre_eff, pre_relu = None, False
    tail_phased = False
    if phase_input:
        # x is the flat-order 16-phase layout of the ALREADY reflect-padded
        # full-res input (ops.phase.s2d2_flat); the level-2 phase front
        # consumes it with no s2d relayout — the phase-resident engine's
        # front path (BENCH_NOTES round 4).
        if start_at or not supports_phase_io(spec):
            raise ValueError("phase_input needs start_at=0 and a "
                             "supports_phase_io(spec) architecture")
        x = _phase_front(
            x, params["layer00"], spec.layers[0], params["layer00_norm"],
            params["layer01"], spec, levels=2,
            norm1=params["layer01_norm"], p2=params["layer02"],
            pre_phased=True, fold_preprocess=fold_preprocess)
        l2 = spec.layers[2]
        if l2.norm_after:
            x = _norm_apply(x, params["layer02_norm"], use_in)
        if l2.relu_after:
            x = jax.nn.relu(x)
        start = 3
    elif fold_preprocess:
        raise ValueError("fold_preprocess is part of the phase_input "
                         "raw-channel contract")
    if spec.input_pad and not start_at and not phase_input:
        x = _pad2d(x, spec.input_pad, "reflect")
    if not phase_input and not start_at and (
        optimize
        and use_in
        and len(spec.layers) >= 2
        and spec.layers[0].kind == "conv"
        and spec.layers[0].stride == 1
        and spec.layers[0].pad_mode is None
        and spec.layers[0].pad == (spec.layers[0].ksize - 1) // 2
        and spec.layers[0].norm_after and spec.layers[0].relu_after
        and spec.layers[1].kind == "conv"
        and spec.layers[1].stride == 2
        and spec.layers[1].ksize == 3
        and spec.layers[1].pad == 1
        and spec.layers[1].pad_mode is None
        and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
    ):
        # NOTE: a 2-level front (16 phases, absorbing the second strided conv
        # too — levels=2 path of _phase_front) is implemented and exact, but
        # measured SLOWER at 1080p UNDER XLA: the extra s2d relayout costs
        # ~1.1 ms and the 16-phase stride-2 kernel is 8x zero-padded (2x2x16
        # dense taps for 9 logical), so one level is the XLA optimum
        # (BENCH_NOTES.md). fused_front="full" runs the 2-level front on
        # the ops.front_pallas MXU kernels instead, where the dense-K
        # im2col dot makes the 16-phase form the fast one.
        if (fused_front in (2, "full") and x.shape[0] == 1
                and spec.layers[1].norm_after and spec.layers[1].relu_after
                and len(spec.layers) >= 3
                and spec.layers[2].kind == "conv"
                and spec.layers[2].stride == 2
                and spec.layers[2].ksize == 3
                and spec.layers[2].pad == 1
                and spec.layers[2].pad_mode is None
                and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0
                and (stop_after is None or stop_after >= 3)):
            x, st3, cnt = _phase_front_pallas2(
                x, params["layer00"], spec.layers[0], params["layer00_norm"],
                params["layer01"], params["layer01_norm"], params["layer02"])
            if spec.layers[2].norm_after:
                n2 = params["layer02_norm"]
                mean = st3[0] / cnt
                var = jnp.maximum(st3[1] / cnt - mean * mean, 0.0)
                es = jax.lax.rsqrt(var + 1e-5) * n2["scale"].astype(jnp.float32)
                eb = n2["bias"].astype(jnp.float32) - mean * es
                pre_eff = jnp.stack([es, eb])
            pre_relu = spec.layers[2].relu_after
            if fused_rblocks is None:
                # the producer is pallas: the XLA->pallas layout boundary
                # that kept the fused chain off cannot occur here
                fused_rblocks = True
            start = 3
        elif fused_front and fused_front not in (2, "full") and x.shape[0] == 1:
            x, st2, cnt = _phase_front_pallas(
                x, params["layer00"], spec.layers[0], params["layer00_norm"],
                params["layer01"])
            if spec.layers[1].norm_after:
                n1 = params["layer01_norm"]
                mean = st2[0] / cnt
                var = jnp.maximum(st2[1] / cnt - mean * mean, 0.0)
                es = jax.lax.rsqrt(var + 1e-5) * n1["scale"].astype(jnp.float32)
                eb = n1["bias"].astype(jnp.float32) - mean * es
                x = (x.astype(jnp.float32) * es + eb).astype(x.dtype)
            if spec.layers[1].relu_after:
                x = jax.nn.relu(x)
        else:
            x = _phase_front(
                x, params["layer00"], spec.layers[0], params["layer00_norm"],
                params["layer01"], spec,
            )
            if spec.layers[1].norm_after:
                x = _norm_apply(x, params["layer01_norm"], use_in)
            if spec.layers[1].relu_after:
                x = jax.nn.relu(x)
        start = max(start, 2)
    if stop_after is not None and stop_after < start:
        return x
    chain = _fused_chain_idxs(spec, params, x, fused_rblocks)
    if stop_after is not None and chain and chain[-1] > stop_after:
        chain = ()
    if chain and not (x.shape[1] > 4 * len(chain) + 2
                      and x.shape[2] > 4 * len(chain) + 2):
        chain = ()  # shrinks 4 px/block: too small for the fused chain
    if (pre_eff is not None or pre_relu) and not (chain and chain[0] == start):
        # layer 2's pending norm/relu could not fuse into a pallas chain
        if pre_eff is not None:
            x = (x.astype(jnp.float32) * pre_eff[0] + pre_eff[1]).astype(x.dtype)
        if pre_relu:
            x = jax.nn.relu(x)
        pre_eff, pre_relu = None, False
    skip_next_conv = False
    skip_until = -1
    for i, layer in enumerate(spec.layers):
        if i < start or i <= skip_until:
            continue
        if stop_after is not None and i > stop_after:
            return x
        if chain and i in chain:
            if i != chain[0]:
                continue
            x = _fused_res_chain(params, x, chain,
                                 pre_eff=pre_eff, pre_relu=pre_relu)
            continue
        name = f"layer{i:02d}"
        p = params.get(name)
        if skip_next_conv:
            skip_next_conv = False
            if layer.norm_after:
                x = _norm_apply(x, params[name + "_norm"], use_in)
            if layer.relu_after:
                x = jax.nn.relu(x)
            continue
        if layer.kind == "upsample" and optimize and layer.scale == 2:
            nxt = spec.layers[i + 1] if i + 1 < len(spec.layers) else None
            if (
                nxt is not None
                and nxt.kind == "conv"
                and nxt.stride == 1
                and nxt.pad_mode is None
                and nxt.pad == (nxt.ksize - 1) // 2
            ):
                # upsample's own norm/relu run at low res (exact: nearest
                # duplication leaves per-channel mean/var unchanged)
                if layer.norm_after:
                    x = _norm_apply(x, params[name + "_norm"], use_in)
                if layer.relu_after:
                    x = jax.nn.relu(x)
                pn = params[f"layer{i+1:02d}"]
                # Whole-tail phase fusion: when the NEXT pair of layers is a
                # second foldable [U2 -> small-out conv], fold1's _d2s and
                # fold2's _s2d are exact inverses — keep fold1's result in
                # the phase domain, run the mid norm/relu GROUPED there
                # (phases partition the pixels, so grouped IN stats equal
                # full-res stats exactly), and feed fold2's level-2 branch
                # directly. The mid-resolution tensor is never materialized.
                l2 = spec.layers[i + 2] if i + 2 < len(spec.layers) else None
                l3 = spec.layers[i + 3] if i + 3 < len(spec.layers) else None
                o1, o3 = pn["w"].shape[-1], (
                    l3 is not None and l3.kind == "conv"
                    and params[f"layer{i+3:02d}"]["w"].shape[-1])
                if (
                    l2 is not None and l3 is not None
                    and l2.kind == "upsample" and l2.scale == 2
                    and not l2.norm_after and not l2.relu_after
                    and l3.kind == "conv" and l3.stride == 1
                    and l3.pad_mode is None
                    and l3.pad == (l3.ksize - 1) // 2
                    and 4 * o1 > 16 and 4 * o3 <= 16
                    and _fold_span(l3.ksize, l3.pad) >= 4
                    and (use_in or not nxt.norm_after)
                    and (stop_after is None or stop_after > i + 3)
                ):
                    y = _folded_upsample_conv(
                        x, pn["w"], pn["b"], nxt.ksize, nxt.pad,
                        phase_out=True)
                    if nxt.norm_after:
                        n1 = params[f"layer{i+1:02d}_norm"]
                        y = _grouped_instance_norm(
                            y, n1["scale"], n1["bias"], 4)
                    if nxt.relu_after:
                        y = jax.nn.relu(y)
                    p3 = params[f"layer{i+3:02d}"]
                    skip_d2s = phase_output and (use_in or not l3.norm_after)
                    x = _folded_upsample_conv(
                        y, p3["w"], p3["b"], l3.ksize, l3.pad, phase_in=True,
                        skip_d2s=skip_d2s)
                    if l3.norm_after:
                        if skip_d2s:
                            n3 = params[f"layer{i+3:02d}_norm"]
                            x = _grouped_instance_norm(
                                x, n3["scale"], n3["bias"], 16)
                        else:
                            x = _norm_apply(
                                x, params[f"layer{i+3:02d}_norm"], use_in)
                    if l3.relu_after:
                        x = jax.nn.relu(x)
                    tail_phased = skip_d2s
                    skip_until = i + 3
                    continue
                x = _folded_upsample_conv(x, pn["w"], pn["b"], nxt.ksize, nxt.pad)
                skip_next_conv = True
                continue
        if layer.kind == "conv":
            if layer.pad_mode:
                x = _pad2d(x, (layer.ksize - 1) // 2, layer.pad_mode)
            in_ch, out_ch = p["w"].shape[2], p["w"].shape[3]
            if (
                optimize
                and layer.stride == 1
                and layer.pad_mode is None
                and layer.pad == (layer.ksize - 1) // 2
                and out_ch <= 16 and in_ch > 16
                and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0
            ):
                x = _s2d_conv(x, p["w"], p["b"], layer.ksize, layer.pad)
            else:
                x = conv2d(x, p["w"], p["b"], layer.stride, layer.pad)
        elif layer.kind == "full_conv":
            x = conv_transpose2d(x, p["w"], p["b"], layer.stride, layer.pad, layer.out_adjust)
        elif layer.kind == "upsample":
            x = upsample_nearest(x, layer.scale)
        elif layer.kind == "conv_block":
            x = _block_apply(x, p, layer, use_in, residual=False,
                             pallas_conv=pallas_conv)
        elif layer.kind == "res_block":
            x = _block_apply(x, p, layer, use_in, residual=True,
                             pallas_conv=pallas_conv)
        if layer.norm_after:
            x = _norm_apply(x, params[name + "_norm"], use_in)
        if layer.relu_after:
            x = jax.nn.relu(x)
    # tail stays in the compute dtype (bf16 tanh costs ~1.5 ms less than an
    # f32 upcast at 1080p; output quantization ~0.6/255 is inside the parity
    # budget); callers cast as needed
    y = jnp.tanh(x) * jnp.asarray(spec.tanh_constant, x.dtype)
    if phase_output and not tail_phased:
        # tail could not stay phased (non-foldable arch / small shapes):
        # honor the contract with an explicit transpose (tanh commutes)
        from ..ops.phase import s2d2_flat

        y = s2d2_flat(y)
    return y


def build(arch: str = "canonical", in_channels: int = 7, **kw):
    """Convenience: (spec, init_fn, apply_fn)."""
    spec = parse_arch(arch, in_channels=in_channels, **kw)

    def init_fn(key):
        return init_params(key, spec)

    def apply_fn(params, x, **akw):
        return apply(params, spec, x, **akw)

    return spec, init_fn, apply_fn


def count_params(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def reuse_split_plan(spec: ModelSpec):
    """(front_tap, resume_at, crop_per_side) for the engine's feature-reuse
    mode, or None when the arch doesn't support it.

    The split brackets the maximal contiguous run of residual blocks — the
    expensive mid-net whose OUTPUT-minus-INPUT delta the reuse mode advects
    by low-res flow (video/engine.py). crop_per_side is how much the VALID
    blocks shave the feature grid (2 px/side per reflect-start block), i.e.
    how to align the front tap with the block output:
    f_blocks ~= shave(f_front, crop) + delta. Requires front_tap >= 2 so
    the tap lands after the phase-domain front rewrite (layers 0-1)."""
    idxs = [i for i, l in enumerate(spec.layers) if l.kind == "res_block"]
    if not idxs or idxs != list(range(idxs[0], idxs[-1] + 1)):
        return None
    if idxs[0] - 1 < 2:
        return None
    crop = sum(2 for i in idxs
               if spec.layers[i].block_padding in ("none", "reflect-start"))
    return idxs[0] - 1, idxs[-1] + 1, crop
