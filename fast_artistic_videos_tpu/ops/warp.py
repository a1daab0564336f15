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

import numpy as np

import jax
import jax.numpy as jnp


def _warp_single(img, flow):
    """img: (H, W, C); flow: (Ho, Wo, 2) (dx, dy). Returns (Ho, Wo, C) — the
    output grid is the flow's grid (usually H=Ho, W=Wo; the VR equirect map
    samples a 6-face strip into a differently-sized panorama)."""
    h, w = img.shape[0], img.shape[1]
    ho, wo = flow.shape[0], flow.shape[1]
    compute_dtype = jnp.promote_types(img.dtype, jnp.float32)

    xs = jax.lax.broadcasted_iota(compute_dtype, (ho, wo), 1)
    ys = jax.lax.broadcasted_iota(compute_dtype, (ho, wo), 0)
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
        vals = jnp.take(img_flat, idx.reshape(-1), axis=0).reshape(ho, wo, -1)
        return vals * (weight * valid.astype(compute_dtype))[..., None]

    out = (
        tap(y0i, x0i, wy0 * wx0)
        + tap(y0i, x0i + 1, wy0 * (1.0 - wx0))
        + tap(y0i + 1, x0i, (1.0 - wy0) * wx0)
        + tap(y0i + 1, x0i + 1, (1.0 - wy0) * (1.0 - wx0))
    )
    return out.astype(img.dtype)


# Bands at or below this unroll the tap ladder to static slices; larger
# bands ride a fori_loop (full-res path only — see _warp_banded_phased for
# why the phased form must always unroll). Module-level so the hardware
# form sweep (tools/profile_warp_forms.py) can measure both forms at every
# band; the default is set from that sweep's data (BENCH_NOTES round 5).
_UNROLL_LIMIT = 16

# ... but only BELOW this pixel area: the round-2 unroll win was measured
# inside the flow refine program at pyramid-level grids, and at frame
# scale the sweep shows the opposite (1080p band 16: unrolled 4.33 ms vs
# fori 2.89 — the 34-tap unrolled ladder's fused kernel loses to the
# serial dynamic-slice chain once each tap pass streams megabytes). At
# 544x960 and below the two forms are within noise, so the refine-program
# fusion result decides there (BENCH_NOTES round 5 form sweep).
_UNROLL_AREA = 600_000

# Phased bands at or above this dispatch to d2s -> full-res warp -> s2d
# inside the same program: the unrolled phased ladder's per-tap cost grows
# linearly with band while the hybrid's layout-roundtrip tax is constant —
# measured crossover at 1080p band 48 (ladder 11.68 vs hybrid 11.74 ms, a
# tie, with the ladder pulling ahead below and the hybrid above;
# tools/profile_warp_forms.py, BENCH_NOTES r5).
_PHASED_HYBRID_BAND = 48


def _warp_banded_single(img, flow, band: int):
    """Gather-free warp for |flow| <= band (exclusive of the +1 bilinear tap).

    TPU gathers are catastrophically slow (~48 ms for one 1080p warp vs
    ~3-5 ms for this path); real video flow is bounded, so the warp is
    reformulated as two banded shift-and-accumulate passes (vertical then
    horizontal), each a loop over 2*band+2 zero-padded static shifts with
    <=2 nonzero bilinear weights per pixel.

    APPROXIMATION (deliberate, documented): the second pass samples the
    vertical result at horizontally displaced columns, so the effective
    vertical offset is dy(y, x+dx_tap) instead of dy(y, x). The result is
    exact wherever dy is locally constant over the two horizontal tap
    columns (smooth flow — i.e. everywhere except motion discontinuities,
    which the consistency mask marks occluded anyway). The gather path
    (band=None) keeps exact reference semantics; drivers expose
    `exact_warp` to select it.

    Pixels whose flow exceeds `band` sample as zero; callers size the band
    from the actual flow range (see `flow_band`).
    """
    h, w = img.shape[0], img.shape[1]
    cdt = jnp.promote_types(img.dtype, jnp.float32)
    taps = 2 * band + 2
    # Small bands on SMALL grids unroll to static slices: fori_loop's
    # dynamic_slice chain serializes on device (each tap a dependent tiny
    # op), while the unrolled form lets XLA fuse all taps into one kernel —
    # measured 18% faster inside the flow refine program at band 8. At
    # frame scale the economics invert (see _UNROLL_AREA) and large bands
    # always keep the loop (130+ unrolled taps balloon compile time).
    unroll = band <= _UNROLL_LIMIT and h * w <= _UNROLL_AREA

    def banded_pass(x, off, axis):
        """x: (H, W, C); off: per-pixel fractional offset along `axis`."""
        base = jnp.floor(off)
        w0 = (1.0 - (off - base)).astype(cdt)
        rel = base.astype(jnp.int32) + band  # first-tap shift index in [0, taps-1]
        pad = [(0, 0)] * 3
        pad[axis] = (band, band + 1)
        xp = jnp.pad(x, pad)

        def tap(k, acc):
            coeff = jnp.where(rel == k, w0, 0.0) + jnp.where(rel == k - 1, 1.0 - w0, 0.0)
            if unroll:
                start = [0, 0, 0]
                start[axis] = k
                lim = list(xp.shape)
                lim[axis] = k + x.shape[axis]
                shifted = jax.lax.slice(xp, start, lim)
            else:
                shifted = jax.lax.dynamic_slice_in_dim(xp, k, x.shape[axis], axis=axis)
            return acc + shifted.astype(cdt) * coeff[..., None]

        acc0 = jnp.zeros(x.shape, cdt)
        if unroll:
            acc = acc0
            for k in range(taps):
                acc = tap(k, acc)
            return acc
        return jax.lax.fori_loop(0, taps, tap, acc0)

    v = banded_pass(img, flow[..., 1].astype(cdt), axis=0)
    out = banded_pass(v, flow[..., 0].astype(cdt), axis=1)
    return out.astype(img.dtype)


def _warp_banded_phased(img, flow, band: int):
    """Banded warp computed entirely in the flat-order 16-phase layout
    (ops.phase.s2d2_flat): img (hq, wq, 16*co), flow (hq, wq, 16, 2) in
    (dx, dy) FULL-RES pixel units. Returns the phased warp result —
    ``s2d2_flat(_warp_banded_single(full_img, full_flow, band))`` to
    within 1-2 ULP (<=2 nonzero taps per pixel; only the compiler's FMA
    fusion of the tap products differs between the two formulations).

    A full-res shift by m maps output phase q to source phase (q+m)%4 at
    block shift (q+m)//4 — a cyclic CHANNEL-GROUP rotation whose wrapped
    groups read one extra block over. Per residue u = m%4 the rotation is
    FIXED, so each pass precomputes 4 rotated copies Y_u (a one-hot
    16co x 16co matmul — the MXU moves channels at full speed where lane
    shuffles/slices stall the VPU) and then accumulates plain same-axis
    block shifts of Y_u exactly like the fast full-res banded pass. Two
    earlier formulations lost to the full-res warp (BENCH_NOTES round 4):
    per-(shift, phase) slices on a (hq, wq, 4, 4, co) view (tiny minor
    dims tile-padded to full lanes) and unaligned lane slices + selects
    on the flat 2-D view (cross-lane rotates that refuse to fuse)."""
    hq, wq = img.shape[0], img.shape[1]
    C = img.shape[2]
    co = C // 16
    cdt = jnp.promote_types(img.dtype, jnp.float32)
    if flow.ndim == 4:
        flow = flow.reshape(hq, wq, 32)
    if band >= _PHASED_HYBRID_BAND:
        # very large bands: the unrolled phased ladder's per-tap cost
        # overtakes the full d2s -> full-res fori warp -> s2d roundtrip
        # (1080p band 48: 14.5 vs 11.5 ms, tools/profile_warp_forms.py);
        # numerically this IS the parity definition of the phased warp
        from . import phase as phase_ops

        full = phase_ops.d2s2_flat(img[None], co)[0]
        ffull = phase_ops.d2s2_flat(flow[None], 2)[0]
        y = _warp_banded_single(full, ffull, band)
        return phase_ops.s2d2_flat(y[None])[0]
    f4 = flow.reshape(hq, wq, 16, 2)
    dx = f4[..., 0].astype(cdt)
    dy = f4[..., 1].astype(cdt)

    # Expand the per-phase offsets 16 -> 16co ONCE per pass (a one-hot
    # matmul — the 16->48 broadcast+reshape done per tap was the dominant
    # cost of the whole warp: 10.4 vs 2.1 ms per 66-tap pass, BENCH_NOTES
    # round 4); per-tap coefficients are then plain elementwise ops on the
    # aligned (hq, wq, 16co) shape.
    expand = np.zeros((16, C), np.float32)
    for p in range(16):
        expand[p, p * co:(p + 1) * co] = 1.0
    expand = jnp.asarray(expand, cdt)

    # narrow tap indices: rel spans [-1, 2*band+1]; int8 when that fits
    # (band <= 62) makes the tap-mask compares stream 1/4 the int traffic
    # — measured -2.1 ms at band 32 (tools/profile_phased_warp_variants.py)
    rdt = jnp.int8 if 2 * band + 2 <= 127 else jnp.int32

    def prep_off(off):
        off48 = jnp.matmul(off, expand, precision="highest")
        base = jnp.floor(off48)
        w0 = (1.0 - (off48 - base)).astype(cdt)
        rel = jnp.clip(base.astype(jnp.int32) + band, -2, 2 * band + 2)
        return w0, rel.astype(rdt)

    def coeff(w0, rel, m):
        k = m + band
        return (jnp.where(rel == rdt(k), w0, 0.0)
                + jnp.where(rel == rdt(k - 1), 1.0 - w0, 0.0))

    def rot_perms(u, vertical):
        """One-hot (C, C) matrices: out ch (q, cp, c) <- src ch with the
        moving phase advanced by u; `wrap` marks outputs whose source sits
        one block further along the pass axis."""
        pk = np.zeros((C, C), np.float32)
        pw = np.zeros((C, C), np.float32)
        for q in range(4):
            for cp in range(4):
                for c in range(co):
                    j = (q * 4 + cp) * co + c
                    if vertical:
                        src, wrap = ((q + u) % 4) * 4 + cp, q + u >= 4
                    else:
                        src, wrap = q * 4 + (cp + u) % 4, cp + u >= 4
                    (pw if wrap else pk)[src * co + c, j] = 1.0
        return jnp.asarray(pk, cdt), jnp.asarray(pw, cdt)

    # The phased form ALWAYS unrolls. A fori_loop over the block shifts of
    # each residue (rotation matmuls hoisted) was tried and is pathological
    # on TPU: 46.5 / 60.4 ms at 1080p band 24/32 vs 9.7/11.2 unrolled —
    # the dynamic-slice chain serializes ~17 dependent full-tensor passes
    # per residue AND breaks the coeff/accumulate fusion that makes the
    # unrolled ladder viable (hardware sweep, BENCH_NOTES round 5). The
    # full-res fori form does not suffer this (3.1-3.8 ms at band 24/32);
    # large-band phased steps should instead warp at full res through a
    # d2s/s2d pair (see StylizerEngine._next_phased_impl's dispatch).

    def banded_pass(x, off, axis, vertical):
        n = x.shape[axis]
        P = band // 4 + 2
        pad = [(0, 0)] * 3
        pad[axis] = (P, P + 1)
        xp = jnp.pad(x.astype(cdt), pad)  # index 0 <-> original -P
        base = jax.lax.slice_in_dim(xp, 0, n + 2 * P, axis=axis)
        shift1 = jax.lax.slice_in_dim(xp, 1, n + 2 * P + 1, axis=axis)
        w0, rel = prep_off(off)
        acc = jnp.zeros((hq, wq, C), cdt)
        for u in range(4):
            if u == 0:
                y = base  # still carries the P-wide halo
            else:
                pk, pw = rot_perms(u, vertical)
                # one-hot matmuls are exact in f32 (each output is a
                # single product by 1.0); precision=highest keeps the TPU
                # from bf16-splitting the values
                y = (jnp.matmul(base, pk, precision="highest")
                     + jnp.matmul(shift1, pw, precision="highest"))
            ms = [m for m in range(-band, band + 2) if m % 4 == u]
            for m in ms:
                sm = (m - u) // 4
                g = jax.lax.slice_in_dim(y, P + sm, P + sm + n, axis=axis)
                acc = acc + g * coeff(w0, rel, m)
        return acc

    v = banded_pass(img, dy, axis=0, vertical=True)
    out = banded_pass(v, dx, axis=1, vertical=False)
    return out.astype(img.dtype)


@functools.partial(jax.jit, static_argnames=("band",))
def bilinear_warp_phased(img, flow, band: int):
    """Phase-resident counterpart of ``bilinear_warp(..., band=band)``:
    both the image and the flow stay in the flat 16-phase layout
    (ops.phase.s2d2_flat). img: (hq, wq, 16*co); flow: (hq, wq, 16, 2) or
    (hq, wq, 32) flat, channels (dx, dy), full-res pixel units."""
    if flow.ndim == 3 and flow.shape[-1] == 32:
        flow = flow.reshape(flow.shape[0], flow.shape[1], 16, 2)
    return _warp_banded_phased(img, flow, band)


@functools.partial(jax.jit, static_argnames=("band",))
def bilinear_warp(img, flow, band: int | None = None):
    """Warp ``img`` by absolute-offset ``flow`` with zero out-of-bounds taps.

    img:  (H, W, C) or (N, H, W, C)
    flow: (H, W, 2) or (N, H, W, 2), channels (dx, dy)
    band: static bound on |flow| selecting the fast banded TPU path; None
          uses the general gather implementation.
    """
    single = _warp_single if band is None else functools.partial(
        _warp_banded_single, band=band
    )
    if img.ndim == 3:
        return single(img, flow)
    if img.ndim == 4:
        if flow.ndim == 3:
            flow = jnp.broadcast_to(flow[None], img.shape[:3] + (2,))
        return jax.vmap(single)(img, flow)
    raise ValueError(f"img must be HWC or NHWC, got shape {img.shape}")


def make_static_warp(map_np, sentinel: float = 9999.0):
    """Specialize ``bilinear_warp`` for a PRECOMPUTED offset map (a host
    numpy array, known before tracing) that maps only a sub-rectangle of
    the output — the shape of every VR border-reprojection map
    (video/vr_geometry.py: sentinel offsets everywhere except an
    overlap-wide strip, vr_helper.lua:3-92).

    The factory computes, once on the host: the output bounding box of
    mapped pixels, and the source bounding box their four bilinear taps
    can touch. The returned jittable ``warp(img)`` gathers ONLY the
    strip-from-strip region and zero-pads back to the full frame — on a
    922-px face with a 128-px overlap that is ~7x fewer gathered elements
    than warping the full frame, and TPU gathers are the VR driver's
    dominant cost. Exact same results as ``bilinear_warp(img, map)``
    (taps outside the source image still contribute zero).
    """
    import numpy as np

    map_np = np.asarray(map_np, np.float32)
    ho, wo = map_np.shape[:2]
    mapped = np.all(np.abs(map_np) < sentinel / 2, axis=-1)
    if not mapped.any():
        zero_like = map_np  # degenerate: nothing mapped

        def warp_none(img):
            if img.ndim == 4:
                return jnp.zeros((img.shape[0], ho, wo) + img.shape[3:],
                                 img.dtype)
            return jnp.zeros((ho, wo) + img.shape[2:], img.dtype)

        return warp_none
    rows = np.where(mapped.any(axis=1))[0]
    cols = np.where(mapped.any(axis=0))[0]
    y0, y1 = int(rows[0]), int(rows[-1]) + 1
    x0, x1 = int(cols[0]), int(cols[-1]) + 1
    sub = map_np[y0:y1, x0:x1]
    sub_mapped = mapped[y0:y1, x0:x1]
    # absolute source coordinates of the mapped pixels' top-left taps
    gy = np.arange(y0, y1, dtype=np.float64)[:, None] + sub[..., 1]
    gx = np.arange(x0, x1, dtype=np.float64)[None, :] + sub[..., 0]
    gy = gy[sub_mapped]
    gx = gx[sub_mapped]
    sy0 = int(np.floor(gy.min()))
    sy1 = int(np.floor(gy.max())) + 2  # +1 tap, exclusive end
    sx0 = int(np.floor(gx.min()))
    sx1 = int(np.floor(gx.max())) + 2
    # shifted map: offsets relative to the cropped source / cropped output
    adj = sub.copy()
    adj[..., 0] += (x0 - sx0)
    adj[..., 1] += (y0 - sy0)
    adj_j = jnp.asarray(adj)

    def warp(img):
        """img: (H, W, C) or (N, H, W, C) — a batch shares the map (the VR
        cross-face blend warps 6 faces per edge map in one batched gather)."""
        batched = img.ndim == 4
        h, w = img.shape[-3], img.shape[-2]
        # clip the source crop to the image (sentinel taps stay far out of
        # bounds after the shift and keep sampling zero)
        ya, yb = max(sy0, 0), min(sy1, h)
        xa, xb = max(sx0, 0), min(sx1, w)
        m = adj_j
        if (ya, xa) != (sy0, sx0):
            m = m + jnp.asarray([sx0 - xa, sy0 - ya], m.dtype)
        if batched:
            src = jax.lax.slice(img, (0, ya, xa, 0),
                                (img.shape[0], yb, xb, img.shape[3]))
            strip = jax.vmap(lambda s: _warp_single(s, m))(src)
            return jnp.pad(strip,
                           ((0, 0), (y0, ho - y1), (x0, wo - x1), (0, 0)))
        src = jax.lax.slice(img, (ya, xa, 0), (yb, xb, img.shape[2]))
        strip = _warp_single(src, m)
        return jnp.pad(strip, ((y0, ho - y1), (x0, wo - x1), (0, 0)))

    return warp


def flow_band(max_abs_flow: float, minimum: int = 8) -> int:
    """Static band bucket covering `max_abs_flow`, so a video triggers at
    most a few recompilations as its flow range grows. Buckets are
    multiples of 8 up to 64 then powers of two: warp cost is linear in
    the band (2*band+2 taps), and the old power-of-two ladder wasted up
    to ~1.6x taps right where it hurts (a ~19 px flow ran band 32; it
    now runs band 24). Multiples of 8 keep the phased warp's block
    decomposition and the Pallas kernel's 8-row windows aligned."""
    b = minimum
    while b < max_abs_flow:
        b = b + 8 if b < 64 else b * 2
    return b


def warp_weight_map(flow, h: int, w: int):
    """Total bilinear tap weight landing in-bounds for each output pixel —
    i.e. warp of an all-ones image. Used by ``fix_occlusions``
    (fast_artistic_video.lua:79-86) to find unmapped regions."""
    ones = jnp.ones(flow.shape[:-1] + (1,), dtype=flow.dtype)
    return bilinear_warp(ones, flow)[..., 0]
