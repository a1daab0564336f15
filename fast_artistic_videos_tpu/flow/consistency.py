"""Forward/backward flow consistency check — on-device (JAX) implementation.

Produces the per-pixel flow-reliability ("certainty") mask the engine
consumes, with the same decision rules as the reference's native
consistencyChecker binary (consistencyChecker/consistencyChecker.cpp:80-134):

  reliable(x) = 0    if any bilinear corner of x + f1(x) is out of bounds
  reliable(x) = 0    if |x + f1(x) + f2(x + f1(x)) - x|^2
                        >= 0.01*(|f1(x)|^2 + |f2_w(x)|^2) + structure_term + 0.5
  reliable(x) = MB   if |∇f1(x)|^2 > 0.01*|f1(x)|^2 + 0.002   (motion boundary)
  reliable(x) = 255  otherwise

where f1 is the flow being checked (e.g. backward flow of the frame pair),
f2 the reverse flow, derivatives are central differences ([-1/2, 0, 1/2])
with symmetric boundary, and the optional structure term
4/avg * max(0, avg/2 - ev_min(x)) relaxes the check in homogeneous regions
(ev_min = smallest eigenvalue of the smoothed structure tensor,
consistencyChecker.cpp:39-78).

Divergence (documented): the reference smooths the structure tensor with a
recursive (IIR) Gaussian approximation; IIR scans are hostile to TPU
vectorization, so this implementation uses a truncated FIR Gaussian with the
same sigma. The C++ CLI (tools/consistencyChecker) reproduces the reference
exactly for file-level parity.

All functions take flow as (H, W, 2) float32 with channels (dx, dy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MOTION_BOUNDARY_VALUE = 255.0


def central_diff(x, axis: int):
    """[-1/2, 0, 1/2] derivative with symmetric (half-sample) boundary,
    matching NFilter::filter + CDerivative(3) (CFilter.h:600-611,1499-1532)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad, mode="symmetric")
    lo = jax.lax.slice_in_dim(xp, 2, xp.shape[axis], axis=axis)
    hi = jax.lax.slice_in_dim(xp, 0, xp.shape[axis] - 2, axis=axis)
    return 0.5 * (lo - hi)


def gaussian_kernel(sigma: float, radius: int | None = None):
    if radius is None:
        radius = max(1, int(3.0 * sigma + 0.5))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def gaussian_smooth(img, sigma: float):
    """Separable FIR Gaussian with symmetric boundary; img (H, W)."""
    k = gaussian_kernel(sigma)
    r = (k.shape[0] - 1) // 2
    xp = jnp.pad(img, ((r, r), (0, 0)), mode="symmetric")
    out = jnp.zeros_like(img)
    for i in range(2 * r + 1):
        out = out + k[i] * jax.lax.slice_in_dim(xp, i, i + img.shape[0], axis=0)
    xp = jnp.pad(out, ((0, 0), (r, r)), mode="symmetric")
    out = jnp.zeros_like(img)
    for i in range(2 * r + 1):
        out = out + k[i] * jax.lax.slice_in_dim(xp, i, i + img.shape[1], axis=1)
    return out


def structure_smallest_eigenvalue(image, rho: float = 3.0):
    """Smallest eigenvalue of the smoothed structure (second-moment) tensor,
    normalized to [0, 1] (consistencyChecker.cpp:39-78 + main:158-159).
    image: (H, W, C) float in [0, 255] scale (the reference reads raw PPM)."""
    dx = central_diff(image, 1)
    dy = central_diff(image, 0)
    dxx = jnp.sum(dx * dx, axis=-1)
    dyy = jnp.sum(dy * dy, axis=-1)
    dxy = jnp.sum(dx * dy, axis=-1)
    dxx = gaussian_smooth(dxx, rho)
    dyy = gaussian_smooth(dyy, rho)
    dxy = gaussian_smooth(dxy, rho)
    half_trace = 0.5 * (dxx + dyy)
    disc = half_trace * half_trace + dxy * dxy - dxx * dyy
    ev = jnp.where(disc < 0, 0.0, half_trace - jnp.sqrt(jnp.maximum(disc, 0.0)))
    lo, hi = ev.min(), ev.max()
    return (ev - lo) / jnp.maximum(hi - lo, 1e-12)


def _sample_flow_strict(flow2, bx, by):
    """Bilinear-sample flow2 at (bx, by); returns (u, v, in_bounds) where
    in_bounds requires ALL four corners inside the image (the reference
    marks the pixel unreliable otherwise, consistencyChecker.cpp:104-109)."""
    h, w = flow2.shape[0], flow2.shape[1]
    x1 = jnp.floor(bx)
    y1 = jnp.floor(by)
    in_bounds = (x1 >= 0) & (x1 + 1 <= w - 1) & (y1 >= 0) & (y1 + 1 <= h - 1)
    ax = bx - x1
    ay = by - y1
    x1i = jnp.clip(x1.astype(jnp.int32), 0, w - 2)
    y1i = jnp.clip(y1.astype(jnp.int32), 0, h - 2)
    flat = flow2.reshape(h * w, 2)
    idx = y1i * w + x1i

    def take(offset):
        return jnp.take(flat, (idx + offset).reshape(-1), axis=0).reshape(idx.shape + (2,))

    f11 = take(0)
    f21 = take(1)
    f12 = take(w)
    f22 = take(w + 1)
    top = f11 * (1 - ax)[..., None] + f21 * ax[..., None]
    bot = f12 * (1 - ax)[..., None] + f22 * ax[..., None]
    uv = top * (1 - ay)[..., None] + bot * ay[..., None]
    return uv, in_bounds


@functools.partial(jax.jit, static_argnames=("use_structure", "band", "rho",
                                              "warp_limit",
                                              "with_rel_maxabs"))
def _consistency_impl(flow1, flow2, image, use_structure: bool, band=None,
                      rho: float = 3.0, warp_limit=None,
                      with_rel_maxabs: bool = False):
    # the structure tensor runs INSIDE the jit: eager, its ~40 elementwise /
    # slice ops each paid a dispatch round trip (380 ms at 1080p through the
    # axon tunnel vs ~15 ms compiled)
    if use_structure:
        structure = structure_smallest_eigenvalue(image * 255.0, rho)
    else:
        structure = None
    h, w = flow1.shape[0], flow1.shape[1]
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)

    bx = xs + flow1[..., 0]
    by = ys + flow1[..., 1]
    if band is None:
        uv, in_bounds = _sample_flow_strict(flow2, bx, by)
    else:
        # fast path: the strict in-bounds test is analytic in flow1, and the
        # in-bounds sample equals the banded warp of flow2 by flow1 (same
        # smooth-flow caveat as ops.warp's banded path — fine for the
        # streaming provider; the exact path serves file-parity tools)
        from ..ops import warp as warp_ops

        x1 = jnp.floor(bx)
        y1 = jnp.floor(by)
        in_bounds = (x1 >= 0) & (x1 + 1 <= w - 1) & (y1 >= 0) & (y1 + 1 <= h - 1)
        uv = warp_ops.bilinear_warp(flow2, flow1, band=band)
    cx = bx + uv[..., 0]
    cy = by + uv[..., 1]
    roundtrip = (cx - xs) ** 2 + (cy - ys) ** 2
    mag = jnp.sum(flow1 * flow1, axis=-1) + jnp.sum(uv * uv, axis=-1)

    if use_structure:
        avg = structure.mean()
        structure_term = 4.0 / avg * jnp.maximum(0.0, avg / 2.0 - structure)
    else:
        structure_term = jnp.zeros((h, w), jnp.float32)

    inconsistent = roundtrip >= 0.01 * mag + structure_term + 0.5

    dx = central_diff(flow1, 1)
    dy = central_diff(flow1, 0)
    motion_edge = jnp.sum(dx * dx, axis=-1) + jnp.sum(dy * dy, axis=-1)
    f1_mag = jnp.sum(flow1 * flow1, axis=-1)
    is_boundary = motion_edge > 0.01 * f1_mag + 0.002

    reliable = jnp.full((h, w), 255.0, jnp.float32)
    reliable = jnp.where(is_boundary, MOTION_BOUNDARY_VALUE, reliable)
    reliable = jnp.where(inconsistent, 0.0, reliable)
    reliable = jnp.where(in_bounds, reliable, 0.0)
    rel_max = None
    if with_rel_maxabs:
        # band-sizing signal: max |flow1| over pixels that PASS the check
        # (computed BEFORE the warp_limit backstop, so genuine motion that
        # outgrew the previous band still grows the next one). The raw max
        # is hostage to border/occlusion garbage — new content entering the
        # frame gets arbitrary flow that fails the round trip; sizing the
        # warp band by it ran 1080p pans at band 32 where the true motion
        # needs 16 (BENCH_NOTES round 5). Escape hatch: when almost nothing
        # passes (scene cut / motion beyond the consistency band's own
        # coverage), fall back to the raw max so the bucket recovers on the
        # next pair instead of deadlocking small.
        ok = (reliable > 0.0).astype(jnp.float32)
        absf = jnp.maximum(jnp.abs(flow1[..., 0]), jnp.abs(flow1[..., 1]))
        rel_max = jnp.where(jnp.mean(ok) < 0.05, jnp.max(absf),
                            jnp.max(absf * ok))
    if warp_limit is not None:
        # warp-band backstop: the engine's banded warp only covers
        # |flow| <= warp_limit (in flow1's own pixel units); pixels beyond
        # it would sample garbage, so mark them unreliable — they fall
        # back to occlusion fill, the conservative direction (same story
        # as flow overshooting the consistency band). Lets the provider
        # size the ENGINE band to the actual flow bucket instead of the
        # 2x round-trip coverage this check needs.
        over = jnp.maximum(jnp.abs(flow1[..., 0]),
                           jnp.abs(flow1[..., 1])) > warp_limit
        reliable = jnp.where(over, 0.0, reliable)
    out = jnp.clip(reliable, 0.0, 255.0)
    if with_rel_maxabs:
        return out, rel_max
    return out


def _minpool_axis(x, lo: int, hi: int, axis: int):
    """min over window [i+lo, i+hi] with border clamping (edge padding is
    idempotent under min) — mirrors ops.phase._minpool_1d."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (max(0, -lo), max(0, hi))
    xp = jnp.pad(x, pad, mode="edge")
    out = None
    for d in range(lo, hi + 1):
        start = [0] * x.ndim
        start[axis] = d - lo
        lim = list(xp.shape)
        lim[axis] = d - lo + x.shape[axis]
        t = jax.lax.slice(xp, start, lim)
        out = t if out is None else jnp.minimum(out, t)
    return out


def _eroded_nearest_up(mask, fh: int, fw: int, window: int):
    """EXACTLY min_filter(nearest_upsample(mask, (fh, fw)), window),
    computed at LOW resolution: full-res row y = fh*i + v sees low rows
    [(v-k)//fh, (v+k)//fh] around i, so there are only fh (fw) distinct
    row (col) erosion variants; the full-res result interleaves them by
    output parity. At 4K this replaces a full-res 7x7 min filter (~10 ms)
    with a few low-res shifted mins and one fused interleave
    (BENCH_NOTES round 4: the erosion was part of the 44 ms of non-net
    full-res work)."""
    k = window // 2
    hs, ws = mask.shape
    row_var = {}
    for v in range(fh):
        key = ((v - k) // fh, (v + k) // fh)
        if key not in row_var:
            row_var[key] = _minpool_axis(mask, key[0], key[1], axis=0)
    col_cache = {}

    def field(vr, vc):
        rkey = ((vr - k) // fh, (vr + k) // fh)
        ckey = (rkey, (vc - k) // fw, (vc + k) // fw)
        if ckey not in col_cache:
            col_cache[ckey] = _minpool_axis(
                row_var[rkey], ckey[1], ckey[2], axis=1)
        return col_cache[ckey]

    # col-interleave per row variant (virtual nearest-up + parity select,
    # fused), then row-interleave via a middle-axis stack (contiguous)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, ws, fw), 2)
    rows = []
    for vr in range(fh):
        up = None
        for vc in range(fw):
            f = jnp.broadcast_to(field(vr, vc)[:, :, None], (hs, ws, fw))
            up = f if up is None else jnp.where(lane == vc, f, up)
        rows.append(up.reshape(hs, ws * fw))
    return jnp.stack(rows, axis=1).reshape(hs * fh, ws * fw)


@functools.partial(jax.jit,
                   static_argnames=("out_hw", "use_structure", "band", "rho",
                                    "erode_window", "warp_limit",
                                    "with_rel_maxabs"))
def _consistency_streaming_impl(flow1, flow2, image, out_hw,
                                use_structure: bool, band, rho: float,
                                erode_window=None, warp_limit=None,
                                with_rel_maxabs: bool = False):
    hs, ws = flow1.shape[0], flow1.shape[1]
    h, w = out_hw
    if image.dtype == jnp.uint8:
        # uint8 frames upload 4x less; [0,1] scale in-program (free: the
        # cast fuses into the resize/structure ops)
        image = image.astype(jnp.float32) / 255.0
    if use_structure and image.shape[:2] != (hs, ws):
        image = jax.image.resize(image, (hs, ws, image.shape[2]), "bilinear")
    rel_max = None
    if with_rel_maxabs:
        mask, rel_max = _consistency_impl(flow1, flow2, image, use_structure,
                                          band, rho, with_rel_maxabs=True)
    else:
        mask = _consistency_impl(flow1, flow2, image, use_structure, band,
                                 rho)
    if warp_limit is not None:
        # warp-band backstop at flow res (see _consistency_impl): the
        # engine's FULL-RES flow is a bilinear upsample of flow1, so a
        # full-res pixel mixes up to 2x2 flow-res neighbors — a violating
        # neighbor can push it past the band while its nearest-up cert
        # comes from a compliant one; dilating violations by one flow-res
        # pixel (min-pool of compliance) covers that exactly.
        ok = (jnp.maximum(jnp.abs(flow1[..., 0]), jnp.abs(flow1[..., 1]))
              <= warp_limit).astype(jnp.float32)
        mask = mask * _minpool_axis(_minpool_axis(ok, -1, 1, 0), -1, 1, 1)
    if (hs, ws) != (h, w):
        fh, fw = h // hs, w // ws
        if (fh * hs, fw * ws) == (h, w):
            if erode_window:
                mask = _eroded_nearest_up(mask, fh, fw, erode_window)
            else:
                mask = jnp.broadcast_to(
                    mask[:, None, :, None], (hs, fh, ws, fw)).reshape(h, w)
        else:
            mask = jax.image.resize(mask, (h, w), "nearest")
            if erode_window:
                k = erode_window // 2
                mask = _minpool_axis(_minpool_axis(mask, -k, k, 0), -k, k, 1)
    elif erode_window:
        k = erode_window // 2
        mask = _minpool_axis(_minpool_axis(mask, -k, k, 0), -k, k, 1)
    if with_rel_maxabs:
        return mask, rel_max
    return mask


def consistency_mask_streaming(flow1, flow2, image=None, out_hw=None,
                               rho: float = 3.0, band=None,
                               erode_window=None, warp_limit=None,
                               with_rel_maxabs: bool = False):
    """Consistency check at the flow's NATIVE resolution, mask upsampled
    (nearest) to `out_hw`.

    erode_window: also apply the engine's occlusion min-filter HERE, at
    flow resolution (exact — see _eroded_nearest_up), so the engine can
    skip its full-res erosion (StylizerEngine pre_eroded).

    warp_limit: engine warp band in flow1's OWN pixel units; pixels whose
    flow exceeds it (dilated by one flow-res pixel for the bilinear
    upsample) are marked unreliable so the engine's banded warp never
    samples out-of-band (see _consistency_streaming_impl).

    The streaming provider estimates flow at `flow_scale` resolution; running
    the check there instead of on the upsampled full-res flow costs ~4x/16x
    less (the structure tensor included — the full-res image is resized
    down internally) and is what the file pipeline would produce had the
    video been that size. flow1/flow2 are in THEIR OWN pixel units (so are
    the decision thresholds — same property as the reference checking
    whatever resolution the .flo has). Documented streaming divergence, like
    the banded sample (README faithful-vs-fixed).
    """
    out_hw = tuple(out_hw) if out_hw is not None else flow1.shape[:2]
    if warp_limit is not None:
        warp_limit = float(warp_limit)
    use_structure = image is not None
    if image is None:
        image = jnp.zeros(flow1.shape[:2] + (1,), jnp.float32)
    out = _consistency_streaming_impl(
        flow1, flow2, image, out_hw, use_structure, band,
        float(rho), erode_window, warp_limit,
        with_rel_maxabs=with_rel_maxabs)
    if with_rel_maxabs:
        return out[0] / 255.0, out[1]
    return out / 255.0


@functools.partial(jax.jit,
                   static_argnames=("out_hw", "use_structure", "band", "rho",
                                    "warp_limit", "with_rel_maxabs"))
def _consistency_streaming_batch_impl(flow1, flow2, image, out_hw,
                                      use_structure: bool, band, rho: float,
                                      warp_limit=None,
                                      with_rel_maxabs: bool = False):
    def one(a, b, im):
        return _consistency_streaming_impl(a, b, im, out_hw, use_structure,
                                           band, rho,
                                           warp_limit=warp_limit,
                                           with_rel_maxabs=with_rel_maxabs)

    out = jax.vmap(one)(flow1, flow2, image)
    if with_rel_maxabs:
        # one band bucket serves all streams: reduce over the batch here so
        # the provider reads back a single scalar
        return out[0], jnp.max(out[1])
    return out


def consistency_mask_streaming_batch(flow1, flow2, images=None, out_hw=None,
                                     rho: float = 3.0, band=None,
                                     warp_limit=None,
                                     with_rel_maxabs: bool = False):
    """Batched `consistency_mask_streaming`: flow1/flow2 (N, H, W, 2),
    images (N, H, W, C) or None. One program checks all N pairs (the VR
    driver's 6 faces); per-item structure normalization matches N
    independent calls exactly. with_rel_maxabs: also return the scalar
    max |flow1| over check-passing pixels across the WHOLE batch (the
    shared band-sizing signal — see _consistency_impl)."""
    out_hw = tuple(out_hw) if out_hw is not None else flow1.shape[1:3]
    if warp_limit is not None:
        warp_limit = float(warp_limit)
    use_structure = images is not None
    if images is None:
        images = jnp.zeros(flow1.shape[:3] + (1,), jnp.float32)
    out = _consistency_streaming_batch_impl(
        flow1, flow2, images, out_hw, use_structure, band, float(rho),
        warp_limit, with_rel_maxabs=with_rel_maxabs)
    if with_rel_maxabs:
        return out[0] / 255.0, out[1]
    return out / 255.0


def consistency_mask(flow1, flow2, image=None, rho: float = 3.0, band=None,
                     warp_limit=None, with_rel_maxabs: bool = False):
    """Reliability of flow1 cross-checked against flow2.

    flow1/flow2: (H, W, 2) float32 (dx, dy). image: optional (H, W, C) in
    [0, 1] (converted to the reference's 0-255 scale internally). band:
    static |flow| bound enabling the banded (gather-free) sample — ~6x
    faster on TPU, used by the streaming provider; None keeps the exact
    reference semantics for file-parity tools. warp_limit: engine warp
    band; |flow1| beyond it is marked unreliable (see _consistency_impl).
    with_rel_maxabs: also return max |flow1| over check-passing pixels
    (band-sizing signal, see _consistency_impl).
    Returns float32 (H, W) in [0, 1] — divide-by-255 of the reference PGM.
    """
    if warp_limit is not None:
        warp_limit = float(warp_limit)
    use_structure = image is not None
    if image is None:
        image = jnp.zeros(flow1.shape[:2] + (1,), jnp.float32)
    out = _consistency_impl(flow1, flow2, image, use_structure, band,
                            float(rho), warp_limit=warp_limit,
                            with_rel_maxabs=with_rel_maxabs)
    if with_rel_maxabs:
        return out[0] / 255.0, out[1]
    return out / 255.0
