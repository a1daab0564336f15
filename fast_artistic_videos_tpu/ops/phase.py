"""Two-level phase-domain (space-to-depth) layout helpers.

The canonical stylizer's 1080p cost is dominated by layout work on
small-channel full-resolution tensors (BENCH_NOTES round 4: the s2d
transpose, the 7/3-channel assembly, the tail depth-to-space). The
phase-resident pipeline keeps every full-resolution tensor in the
16-phase quarter-resolution layout instead — channels are
(row_phase(4), col_phase(4), c), the "flat" order that
``models.stylizer._d2s_level2`` consumes — so the per-frame recurrence
never materializes a lane-sparse full-res array and the MXU sees
112-512-wide contractions from the first conv on.

This module holds the layout algebra shared by the engine, the warp and
the stylizer: the flat-order s2d/d2s pair, the flat<->nested channel
permutations (the stylizer's phase-kernel builders use the nested
``_s2d``-composition order), reflect padding computed directly in phase
space, and the phased form of [nearest-upsample -> 7x7 erode] for the
certainty mask.

Reference semantics being preserved: input reflect padding
(models_video.lua:55-140 reflect-start), certainty min-filter
(fast_artistic_video_core.lua:207, utils.lua:161-169).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def s2d2_flat(x):
    """(N, H, W, C) -> (N, H/4, W/4, 16C), channels (row_phase(4),
    col_phase(4), c): out[..., (rp*4+cp)*C + c] = x[n, 4B+rp, 4D+cp, c]."""
    n, h, w, c = x.shape
    xs = x.reshape(n, h // 4, 4, w // 4, 4, c).transpose(0, 1, 3, 2, 4, 5)
    return xs.reshape(n, h // 4, w // 4, 16 * c)


def d2s2_flat(y, co: int):
    """Inverse of :func:`s2d2_flat` (same transpose as
    ``stylizer._d2s_level2``)."""
    n, h, w, _ = y.shape
    y = y.reshape(n, h, w, 4, 4 * co).transpose(0, 1, 3, 2, 4)
    return y.reshape(n, 4 * h, 4 * w, co)


def s2d2_flat_np(x: np.ndarray) -> np.ndarray:
    """Host (numpy) :func:`s2d2_flat` for one frame: (H, W, C) ->
    (H/4, W/4, 16C). The streaming drivers run this on the prefetch
    thread so the device never pays the lane-relayout transpose for the
    content frame (~3-4 ms/frame at 1080p, BENCH_NOTES round 4) — the
    upload is the same bytes either way."""
    h, w, c = x.shape
    xs = x.reshape(h // 4, 4, w // 4, 4, c).transpose(0, 2, 1, 3, 4)
    return np.ascontiguousarray(xs).reshape(h // 4, w // 4, 16 * c)


def d2s2_flat_np(y: np.ndarray, co: int) -> np.ndarray:
    """Host (numpy) inverse of :func:`s2d2_flat_np` for one frame:
    (hq, wq, 16co) -> (4hq, 4wq, co). Runs on the writer thread so the
    device-side output depth-to-space disappears from the frame loop."""
    hq, wq = y.shape[0], y.shape[1]
    y4 = y.reshape(hq, wq, 4, 4 * co).transpose(0, 2, 1, 3)
    return np.ascontiguousarray(y4).reshape(4 * hq, 4 * wq, co)


def flat_to_nested_perm(c: int) -> np.ndarray:
    """Channel permutation P with flat[j] == nested[P[j]].

    "Nested" is the order two chained ``stylizer._s2d`` calls produce:
    ch = (coarse_rp*2 + coarse_cp)*4c + (fine_rp*2 + fine_cp)*c + i with
    coarse = (row//2, col//2 parities) and fine = (row%2, col%2); "flat"
    is (rp*4 + cp)*c + i with rp = row%4. A kernel built for nested
    input consumes flat input after indexing its in-channel dim with P
    (w_flat = w_nested[..., P, :] at build time — free)."""
    perm = np.empty(16 * c, np.int64)
    for rp in range(4):
        for cp in range(4):
            flat = (rp * 4 + cp) * c
            nested = (((rp >> 1) * 2 + (cp >> 1)) * 4
                      + ((rp & 1) * 2 + (cp & 1))) * c
            perm[flat : flat + c] = np.arange(nested, nested + c)
    return perm


def reflect_pad_phased(x, blocks: int):
    """Reflect-pad a flat-order phased tensor by ``blocks`` blocks per side
    — exactly ``s2d2_flat(jnp.pad(full, 4*blocks, mode='reflect'))`` without
    leaving phase space.

    Reflect (edge-excluded, Torch SpatialReflectionPadding semantics)
    maps virtual row -i to +i; in block/phase terms the padded top block
    -j takes row-phase 0 from block j and row-phases 1..3 from block j-1
    phases 3..1 (virtual row -4j+rp = -(4j-rp) -> source 4(j-1)+(4-rp)
    for rp>0), and symmetrically at the bottom/right edges."""
    n, h, w, c16 = x.shape
    co = c16 // 16
    if blocks <= 0:
        return x
    if blocks >= h or blocks >= w:
        raise ValueError(f"reflect pad of {blocks} blocks needs h,w > blocks")
    x5 = x.reshape(n, h, w, 4, 4 * co)

    def pad_rows(v, hb):
        # v: (n, hb, w, 4, 4co); returns (n, hb + 2*blocks, w, 4, 4co)
        a = v[:, 1 : blocks + 1]        # blocks j = 1..blocks
        bsrc = v[:, 0:blocks]           # blocks j-1
        top = jnp.stack(
            [a[..., 0, :], bsrc[..., 3, :], bsrc[..., 2, :], bsrc[..., 1, :]],
            axis=3,
        )[:, ::-1]                      # virtual blocks -1..-blocks -> flip
        # bottom block hb+J: rp0 <- (hb-1-J, ph2); rp1 <- (hb-1-J, ph1);
        # rp2 <- (hb-1-J, ph0); rp3 <- (hb-2-J, ph3)
        src_a = v[:, hb - blocks : hb][:, ::-1]       # hb-1-J, J=0..blocks-1
        src_b = v[:, hb - blocks - 1 : hb - 1][:, ::-1]  # hb-2-J
        bot = jnp.stack(
            [src_a[..., 2, :], src_a[..., 1, :], src_a[..., 0, :],
             src_b[..., 3, :]],
            axis=3,
        )
        return jnp.concatenate([top, v, bot], axis=1)

    x5 = pad_rows(x5, h)
    # columns: same algebra on the col-phase dim after a transpose-free
    # reshape (col phases live inside the trailing 4co group)
    x6 = x5.reshape(n, h + 2 * blocks, w, 4, 4, co).transpose(0, 2, 4, 1, 3, 5)
    x6 = x6.reshape(n, w, 4, -1)  # (n, w_blocks, col_phase, rest)
    v = x6

    a = v[:, 1 : blocks + 1]
    bsrc = v[:, 0:blocks]
    left = jnp.stack(
        [a[:, :, 0], bsrc[:, :, 3], bsrc[:, :, 2], bsrc[:, :, 1]], axis=2
    )[:, ::-1]
    src_a = v[:, w - blocks : w][:, ::-1]
    src_b = v[:, w - blocks - 1 : w - 1][:, ::-1]
    right = jnp.stack(
        [src_a[:, :, 2], src_a[:, :, 1], src_a[:, :, 0], src_b[:, :, 3]],
        axis=2,
    )
    v = jnp.concatenate([left, v, right], axis=1)
    wp = w + 2 * blocks
    v = v.reshape(n, wp, 4, h + 2 * blocks, 4, co).transpose(0, 3, 1, 4, 2, 5)
    return v.reshape(n, h + 2 * blocks, wp, 16 * co)


def _bilinear_phase_taps(p: int, r: int):
    """Vertical/horizontal taps of the half-pixel-centers bilinear x r
    upsample (jax.image.resize semantics) for full-res phase p, as
    (offset, weight) pairs relative to low row (4 // r) * B."""
    off = (p + 0.5) / r - 0.5
    lo = int(np.floor(off))
    frac = off - lo
    return [(lo, 1.0 - frac), (lo + 1, frac)]


def upsample_flow_phased(low, r: int, gain: float = 1.0):
    """[bilinear upsample x r -> * gain -> s2d2_flat] for a low-res flow
    field, computed as ONE tiny constant-weight conv in phase space — the
    full-res (H, W, 2) tensor is never materialized (its s2d transpose is
    lane-sparse layout work, ~1.4 ms/frame at 1080p: BENCH_NOTES round 5
    "refine_pair phased_up tax").

    low: (hs, ws, 2) flow at estimation resolution (est-res pixel units);
    r in {2, 4} with full res H = r*hs, W = r*ws and H, W % 4 == 0; gain
    folds the 1/flow_scale unit rescale into the conv weights. Returns
    (hq, wq, 16, 2), hq = H // 4 — exactly
    ``s2d2_flat((jax.image.resize(low, (H, W, 2), "bilinear") * gain)[None])
    [0].reshape(hq, wq, 16, 2)`` (resize's renormalized edge taps equal
    index clamping for the 2-tap bilinear kernel; the padding below
    replicates that clamping exactly)."""
    if r not in (2, 4):
        raise ValueError("upsample_flow_phased supports r in {2, 4}")
    hs, ws = low.shape[0], low.shape[1]
    cdt = jnp.promote_types(low.dtype, jnp.float32)

    if r == 4:
        # low rows ARE the block grid; 3x3 edge-padded conv, 2 -> 32 ch
        ci = 2
        xp = jnp.pad(low.astype(cdt), ((1, 1), (1, 1), (0, 0)), mode="edge")
    else:
        # r == 2: one-level s2d (block 2) then a 3x3 conv over block space;
        # channels ch = (py*2 + px)*2 + c
        ci = 8
        x2 = low.astype(cdt).reshape(hs // 2, 2, ws // 2, 2, 2)
        x2 = x2.transpose(0, 2, 1, 3, 4).reshape(hs // 2, ws // 2, 8)
        # index-clamped padding: the virtual block -1 duplicates ROW 0 (not
        # block 0 reversed) in both its phase slots — plain mode='edge'
        # would put row 1 in the second slot
        top = x2[:1, :, jnp.asarray([0, 1, 2, 3, 0, 1, 2, 3])]
        bot = x2[-1:, :, jnp.asarray([4, 5, 6, 7, 4, 5, 6, 7])]
        x2 = jnp.concatenate([top, x2, bot], axis=0)
        left = x2[:, :1, jnp.asarray([0, 1, 0, 1, 4, 5, 4, 5])]
        right = x2[:, -1:, jnp.asarray([2, 3, 2, 3, 6, 7, 6, 7])]
        xp = jnp.concatenate([left, x2, right], axis=1)

    kern = np.zeros((3, 3, ci, 32), np.float32)
    for rp in range(4):
        for dv, wv in _bilinear_phase_taps(rp, r):
            for cp in range(4):
                for dh, wh in _bilinear_phase_taps(cp, r):
                    if r == 4:
                        ky, py = dv + 1, None
                        kx, px = dh + 1, None
                        cin0 = 0
                    else:
                        by, py = divmod(dv + 2, 2)
                        bx, px = divmod(dh + 2, 2)
                        ky, kx = by, bx  # dv in {-2..3} -> block {-1,0,1}+1
                        cin0 = (py * 2 + px) * 2
                    for c in range(2):
                        kern[ky, kx, cin0 + c, (rp * 4 + cp) * 2 + c] += (
                            wv * wh * gain)
    out = jax.lax.conv_general_dilated(
        xp[None], jnp.asarray(kern, cdt), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)[0]
    return out.reshape(out.shape[0], out.shape[1], 16, 2)


def _minpool_1d(x, lo: int, hi: int, axis: int):
    """min over window [i+lo, i+hi] (inclusive) with index clamping at the
    borders — the clamped duplicates are idempotent under min, so this
    equals filters.min_filter's border-clipped windows exactly. Static
    shifted slices of an edge-padded copy (no gathers)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (max(0, -lo), max(0, hi))
    xp = jnp.pad(x, pad, mode="edge")
    out = None
    size = x.shape[axis]
    for d in range(lo, hi + 1):
        start = [0] * x.ndim
        start[axis] = d - lo
        lim = list(xp.shape)
        lim[axis] = d - lo + size
        t = jax.lax.slice(xp, start, lim)
        out = t if out is None else jnp.minimum(out, t)
    return out


def eroded_cert_phased(cert_low, r: int, window: int):
    """Phased form of [nearest-upsample x r -> ``window`` min-filter] for a
    flow-resolution certainty mask.

    cert_low: (hl, wl) at flow resolution; r in {2, 4} is the nearest
    upsample ratio to full resolution; window is the odd min-filter size
    (the engine's occlusions_min_filter, default 7). Returns
    (hq, wq, 16) flat-order phased certainty at the quarter grid
    (hq = hl*r/4) — exactly
    ``s2d2_flat(min_filter(nearest_upsample(cert_low, r), window))``.

    Full-res row y covers low cells (y+d)//r for d in [-(window//2),
    window//2]; the cell window depends only on y % r, so per row-phase
    the erosion is a (window//2*2//r+1)-ish tap min at LOW resolution —
    the full-resolution mask is never materialized."""
    if r not in (2, 4):
        raise ValueError("eroded_cert_phased supports r in {2, 4}")
    k = window // 2
    hl, wl = cert_low.shape

    # per full-res phase v (v = y % r) the low-cell window is
    # [(v-k)//r, (v+k)//r]; distinct row variants share one 1-D min pass
    row_variants = {}
    for v in range(r):
        lo, hi = (v - k) // r, (v + k) // r
        if (lo, hi) not in row_variants:
            row_variants[(lo, hi)] = _minpool_1d(cert_low, lo, hi, axis=0)
    col_cache = {}

    def eroded(vy, vx):
        rl, rh = (vy - k) // r, (vy + k) // r
        cl, ch = (vx - k) // r, (vx + k) // r
        key = (rl, rh, cl, ch)
        if key not in col_cache:
            col_cache[key] = _minpool_1d(row_variants[(rl, rh)], cl, ch, axis=1)
        return col_cache[key]

    # full-res phase (rp, cp) of the quarter grid: full row y = 4B + rp maps
    # to low cell (4B + rp)//r with erosion variant rp % r
    if r == 4:
        # low cell is the block itself: channel (rp, cp) = E_{rp, cp}
        return jnp.stack([eroded(rp, cp) for rp in range(4) for cp in range(4)],
                         axis=-1)
    # r == 2 (the 1080p flow@0.5 path): every intermediate here must stay
    # 2-D — any rank-3 tensor with a tiny minor dim (3/4/16) gets its lane
    # dim padded to 128 by the TPU tiler, which is where the previous
    # transpose-and-pick formulation lost ~6 ms (BENCH_NOTES round 4).
    # Rows first: the half-res row window for full row y = 4B + rp is
    # [(vy-k)//2, (vy+k)//2] around half-row 2B*2+... (vy = rp % 2), an
    # ordinary clamped 1-D minpool with <=2 distinct variants.
    row_var = {}
    for vy in range(2):
        key = ((vy - k) // 2, (vy + k) // 2)
        if key not in row_var:
            row_var[key] = _minpool_1d(cert_low, key[0], key[1], axis=0)
    rows = {vy: row_var[((vy - k) // 2, (vy + k) // 2)] for vy in range(2)}

    # Columns: decompose each half-col window [2xq + a, 2xq + b] into
    # column PAIRS of the edge-padded row result, so the only per-variant
    # ops are contiguous pair-axis shifts and size-2 minor reductions
    # (whole-pair min / even lane / odd lane via masked min) — no strided
    # lane picks. Edge padding in half-col space reproduces _minpool_1d's
    # clamped-window semantics exactly (border duplicates are idempotent
    # under min).
    pad_half = 2 * ((k + 3) // 2)
    wq = wl // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2), 2)
    inf = jnp.asarray(jnp.inf, cert_low.dtype)

    def pair_aggregates(r2d):
        rp2 = jnp.pad(r2d, ((0, 0), (pad_half, pad_half)), mode="edge")
        r3 = rp2.reshape(hl, (wl + 2 * pad_half) // 2, 2)
        pm = r3.min(-1)
        pe = jnp.where(lane == 0, r3, inf).min(-1)
        po = jnp.where(lane == 1, r3, inf).min(-1)
        return pm, pe, po

    aggs = {id(v): pair_aggregates(v) for v in row_var.values()}
    col_cache = {}

    def col_variant(vy, a, b):
        key = (id(rows[vy]), a, b)
        if key not in col_cache:
            pm, pe, po = aggs[id(rows[vy])]
            ta, tb = a + pad_half, b + pad_half
            pa, pb = ta // 2, tb // 2
            terms = []
            if ta % 2 == 1:
                terms.append((po, pa))
                pa += 1
            if tb % 2 == 0:
                terms.append((pe, pb))
                pb -= 1
            terms.extend((pm, p) for p in range(pa, pb + 1))
            out = None
            for t, p in terms:
                sl = jax.lax.slice(t, (0, p), (hl, p + wq))
                out = sl if out is None else jnp.minimum(out, sl)
            col_cache[key] = out  # (hl, wq)
        return col_cache[key]

    picks = []
    for rp in range(4):
        vy, gy = rp % 2, rp // 2
        for cp in range(4):
            vx, gx = cp % 2, cp // 2
            d = col_variant(vy, gx + (vx - k) // 2, gx + (vx + k) // 2)
            picks.append(d.reshape(hl // 2, 2, wq)[:, gy])
    return jnp.stack(picks, axis=-1)
