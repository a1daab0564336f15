"""Hardware A/B of phased banded-warp reformulations (1080p shapes).

The phased warp loses 3x to the full-res banded warp at band 32
(11.83 vs 3.84 ms, tools/profile_phased_breakdown.py) — the only stage
still holding the phase-resident pipeline below the plain one at 1080p.
Variants measured here (all bit-identical to the incumbent by
construction; the winner is promoted into ops/warp.py):

  v0  incumbent: 4 hoisted rotations + 66 unrolled masked taps / pass
  v1  per-rotation fori_loop over block shifts (dynamic_slice chain,
      mirrors the full-res band>16 structure)
  v2  one fori_loop over all taps, rotated copies stacked on axis 0
  v3  v0 with int8 rel (tap-mask compares at 1/4 the int traffic)
  v4  v0 with both passes' coeff masks computed from a fused
      half-lane (hq, wq, 16) rel and a single hoisted expand per pass

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_phased_warp_variants.py [BAND ...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from fast_artistic_videos_tpu.ops import phase as phase_ops, warp

H, W = 1080, 1920
HQ, WQ = H // 4, W // 4
N = 20


def timeit(fn, sync, n=N):
    fn()
    sync()
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        for _ in range(n):
            fn()
        sync()
        best = min(best, (time.monotonic() - t0) / n)
    return best * 1e3


def _common(img, flow, band, rel_dtype=jnp.int32):
    hq, wq = img.shape[0], img.shape[1]
    C = img.shape[2]
    co = C // 16
    cdt = jnp.promote_types(img.dtype, jnp.float32)
    f4 = flow.reshape(hq, wq, 16, 2)
    dx = f4[..., 0].astype(cdt)
    dy = f4[..., 1].astype(cdt)
    expand = np.zeros((16, C), np.float32)
    for p in range(16):
        expand[p, p * co:(p + 1) * co] = 1.0
    expand = jnp.asarray(expand, cdt)

    def prep_off(off):
        off48 = jnp.matmul(off, expand, precision="highest")
        base = jnp.floor(off48)
        w0 = (1.0 - (off48 - base)).astype(cdt)
        rel = (base.astype(jnp.int32) + band).astype(rel_dtype)
        return w0, rel

    def coeff(w0, rel, m):
        k = m + band
        return (jnp.where(rel == k, w0, 0.0)
                + jnp.where(rel == k - 1, 1.0 - w0, 0.0))

    def rot_perms(u, vertical):
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

    return hq, wq, C, cdt, dx, dy, prep_off, coeff, rot_perms


def warp_v1(img, flow, band):
    """Per-rotation fori_loop over block shifts."""
    hq, wq, C, cdt, dx, dy, prep_off, coeff, rot_perms = _common(
        img, flow, band)

    def banded_pass(x, off, axis, vertical):
        n = x.shape[axis]
        P = band // 4 + 2
        pad = [(0, 0)] * 3
        pad[axis] = (P, P + 1)
        xp = jnp.pad(x.astype(cdt), pad)
        base = jax.lax.slice_in_dim(xp, 0, n + 2 * P, axis=axis)
        shift1 = jax.lax.slice_in_dim(xp, 1, n + 2 * P + 1, axis=axis)
        w0, rel = prep_off(off)
        acc = jnp.zeros((hq, wq, C), cdt)
        for u in range(4):
            if u == 0:
                y = base
            else:
                pk, pw = rot_perms(u, vertical)
                y = (jnp.matmul(base, pk, precision="highest")
                     + jnp.matmul(shift1, pw, precision="highest"))
            ms = [m for m in range(-band, band + 2) if m % 4 == u]
            sm0 = (ms[0] - u) // 4

            def tap(i, a, y=y, u=u, sm0=sm0):
                m = u + 4 * (sm0 + i)
                g = jax.lax.dynamic_slice_in_dim(
                    y, P + sm0 + i, n, axis=axis)
                k = m + band
                cf = (jnp.where(rel == k, w0, 0.0)
                      + jnp.where(rel == k - 1, 1.0 - w0, 0.0))
                return a + g * cf

            acc = jax.lax.fori_loop(0, len(ms), tap, acc)
        return acc

    v = banded_pass(img, dy, axis=0, vertical=True)
    return banded_pass(v, dx, axis=1, vertical=False).astype(img.dtype)


def warp_v2(img, flow, band):
    """Single fori_loop over taps; rotated copies stacked on axis 0."""
    hq, wq, C, cdt, dx, dy, prep_off, coeff, rot_perms = _common(
        img, flow, band)

    def banded_pass(x, off, axis, vertical):
        n = x.shape[axis]
        P = band // 4 + 2
        pad = [(0, 0)] * 3
        pad[axis] = (P, P + 1)
        xp = jnp.pad(x.astype(cdt), pad)
        base = jax.lax.slice_in_dim(xp, 0, n + 2 * P, axis=axis)
        shift1 = jax.lax.slice_in_dim(xp, 1, n + 2 * P + 1, axis=axis)
        ys = [base]
        for u in range(1, 4):
            pk, pw = rot_perms(u, vertical)
            ys.append(jnp.matmul(base, pk, precision="highest")
                      + jnp.matmul(shift1, pw, precision="highest"))
        ys = jnp.stack(ys)  # (4, ..., C)
        w0, rel = prep_off(off)
        taps = 2 * band + 2

        def tap(t, a):
            m = t - band
            u = jnp.mod(m, 4)
            sm = (m - u) // 4
            y = jax.lax.dynamic_index_in_dim(ys, u, keepdims=False)
            g = jax.lax.dynamic_slice_in_dim(y, P + sm, n, axis=axis)
            cf = (jnp.where(rel == t, w0, 0.0)
                  + jnp.where(rel == t - 1, 1.0 - w0, 0.0))
            return a + g * cf

        return jax.lax.fori_loop(0, taps, tap,
                                 jnp.zeros((hq, wq, C), cdt))

    v = banded_pass(img, dy, axis=0, vertical=True)
    return banded_pass(v, dx, axis=1, vertical=False).astype(img.dtype)


def warp_v3(img, flow, band):
    """Incumbent structure with int8 rel."""
    hq, wq, C, cdt, dx, dy, prep_off, coeff, rot_perms = _common(
        img, flow, band, rel_dtype=jnp.int8)

    def banded_pass(x, off, axis, vertical):
        n = x.shape[axis]
        P = band // 4 + 2
        pad = [(0, 0)] * 3
        pad[axis] = (P, P + 1)
        xp = jnp.pad(x.astype(cdt), pad)
        base = jax.lax.slice_in_dim(xp, 0, n + 2 * P, axis=axis)
        shift1 = jax.lax.slice_in_dim(xp, 1, n + 2 * P + 1, axis=axis)
        w0, rel = prep_off(off)
        acc = jnp.zeros((hq, wq, C), cdt)
        for u in range(4):
            if u == 0:
                y = base
            else:
                pk, pw = rot_perms(u, vertical)
                y = (jnp.matmul(base, pk, precision="highest")
                     + jnp.matmul(shift1, pw, precision="highest"))
            for m in range(-band, band + 2):
                if m % 4 != u:
                    continue
                sm = (m - u) // 4
                g = jax.lax.slice_in_dim(y, P + sm, P + sm + n, axis=axis)
                k = m + band
                cf = (jnp.where(rel == jnp.int8(k), w0, 0.0)
                      + jnp.where(rel == jnp.int8(k - 1), 1.0 - w0, 0.0))
                acc = acc + g * cf
        return acc

    v = banded_pass(img, dy, axis=0, vertical=True)
    return banded_pass(v, dx, axis=1, vertical=False).astype(img.dtype)


def main(argv=None):
    bands = [int(b) for b in (argv or sys.argv[1:])] or [16, 32]
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    prev_p = phase_ops.s2d2_flat(prev[None])[0]

    for band in bands:
        flow = jnp.asarray(
            np.clip(rng.normal(size=(H, W, 2)) * band / 3, -band + 1,
                    band - 1), jnp.float32)
        flow_p = phase_ops.s2d2_flat(flow[None])[0]
        state = {}

        jf = jax.jit(lambda p, f: warp.bilinear_warp(p, f, band=band))
        state["r"] = jf(prev, flow)
        print(f"band={band} full-res      : "
              f"{timeit(lambda: state.update(r=jf(prev + state['r'] * 0, flow)), lambda: float(jnp.sum(state['r']))):7.2f} ms",
              flush=True)

        want = phase_ops.s2d2_flat(np.asarray(state["r"])[None])[0]
        variants = {
            "v0 incumbent   ": lambda p, f, band: warp.bilinear_warp_phased(
                p, f, band=band),
            "v1 fori-per-rot": warp_v1,
            "v2 fori-stacked": warp_v2,
            "v3 int8 rel    ": warp_v3,
        }
        for name, fn in variants.items():
            jv = jax.jit(lambda p, f, fn=fn: fn(p, f, band))
            got = jv(prev_p, flow_p)
            err = float(jnp.max(jnp.abs(got - jnp.asarray(want))))
            state["p"] = got
            ms = timeit(
                lambda: state.update(p=jv(prev_p + state["p"] * 0, flow_p)),
                lambda: float(jnp.sum(state["p"])))
            print(f"band={band} {name}: {ms:7.2f} ms   maxerr {err:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
