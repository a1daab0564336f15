"""XLA-level rewrite experiments for the two bad front convs + the s2d.

profile_front_breakdown.py measured (floor-corrected, 1080p bf16):
s2d 1.6 ms, conv0p (5x5 28->128 @540p) 2.3 ms, d64p (2x2 128->64) 2.16 ms,
d128 0.52 ms. Rooflines: 0.0x / 0.46 / 0.17 / 0.10. Before reaching for
Pallas (layout-boundary risk), try pure-XLA reformulations:

  d64p_mm    2x2 conv as 4-shift concat + one (HW, 512)x(512, 64) dot
  d64p_mm2   same but summing 4 separate (HW,128)x(128,64) dots (no concat)
  conv0_mm   5x5 conv as 25-tap dot accumulation (K=28 each)
  s2d_slices s2d as 4 strided slices + concat (vs reshape/transpose pair)
  s2d_fused  s2d composed with an elementwise producer (does it fuse?)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_front_xla_rewrites.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from fast_artistic_videos_tpu.models import arch_dsl, stylizer

H, W = 1080, 1920
N = 30


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


def bench(name, f, *args, out, check=None):
    state = {}

    def run():
        state["y"] = f(*args)

    ms = timeit(run, lambda: float(jnp.sum(state["y"])))
    out[name] = ms
    err = ""
    if check is not None:
        err = f"  maxerr {float(jnp.max(jnp.abs(state['y'].astype(jnp.float32) - check.astype(jnp.float32)))):.2e}"
    print(f"{name:14s} {ms:8.3f} ms{err}", flush=True)
    return state["y"]


def main():
    rng = np.random.default_rng(0)
    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    out = {}

    bench("floor", jax.jit(lambda v: v + 1.0), jnp.ones((8, 128), jnp.float32),
          out=out)

    # ---- d64p rewrites --------------------------------------------------
    y = jnp.asarray(rng.random((1, 540, 960, 128)), jnp.bfloat16)
    k1 = jnp.asarray(
        stylizer._phase_stride2_kernel(np.asarray(params["layer01"]["w"]), 1),
        jnp.bfloat16)
    b1 = jnp.asarray(np.asarray(params["layer01"]["b"]), jnp.bfloat16)

    def d64p_conv(v):
        return jax.lax.conv_general_dilated(
            v, k1, (1, 1), ((1, 0), (1, 0)), dimension_numbers=stylizer._DN,
            preferred_element_type=v.dtype) + b1

    ref = bench("d64p_conv", jax.jit(d64p_conv), y, out=out)

    kmat = k1.reshape(4 * 128, 64)  # (s, t, c) raveled

    def d64p_mm(v):
        vp = jnp.pad(v, ((0, 0), (1, 0), (1, 0), (0, 0)))
        taps = [vp[:, s:s + 540, t:t + 960, :] for s in range(2)
                for t in range(2)]
        x4 = jnp.concatenate(taps, axis=-1)
        z = jnp.dot(x4.reshape(-1, 512), kmat,
                    preferred_element_type=jnp.bfloat16)
        return z.reshape(1, 540, 960, 64) + b1

    bench("d64p_mm", jax.jit(d64p_mm), y, out=out, check=ref)

    def d64p_mm2(v):
        vp = jnp.pad(v, ((0, 0), (1, 0), (1, 0), (0, 0)))
        acc = None
        for s in range(2):
            for t in range(2):
                tap = vp[:, s:s + 540, t:t + 960, :].reshape(-1, 128)
                z = jnp.dot(tap, k1[s, t], preferred_element_type=jnp.float32)
                acc = z if acc is None else acc + z
        return acc.astype(v.dtype).reshape(1, 540, 960, 64) + b1

    bench("d64p_mm2", jax.jit(d64p_mm2), y, out=out, check=ref)

    # dot_general without the reshape (batch over rows)
    def d64p_mm3(v):
        vp = jnp.pad(v, ((0, 0), (1, 0), (1, 0), (0, 0)))
        taps = [vp[:, s:s + 540, t:t + 960, :] for s in range(2)
                for t in range(2)]
        x4 = jnp.concatenate(taps, axis=-1)
        z = jax.lax.dot_general(
            x4, kmat, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16)
        return z + b1

    bench("d64p_mm3", jax.jit(d64p_mm3), y, out=out, check=ref)

    # ---- conv0p rewrites ------------------------------------------------
    xs = jnp.asarray(rng.random((1, 540, 960, 28)), jnp.bfloat16)
    l0 = spec.layers[0]
    w0, pads = stylizer._phase_level_kernel(
        np.asarray(params["layer00"]["w"]), ((l0.pad, l0.pad), (l0.pad, l0.pad)))
    w0 = jnp.asarray(w0, jnp.bfloat16)
    b0 = jnp.asarray(np.tile(np.asarray(params["layer00"]["b"]), 4), jnp.bfloat16)
    kh, kw = w0.shape[0], w0.shape[1]
    (pt, pb), (plft, pr) = pads

    def conv0p(v):
        return jax.lax.conv_general_dilated(
            v, w0, (1, 1), pads, dimension_numbers=stylizer._DN,
            preferred_element_type=v.dtype) + b0

    ref0 = bench("conv0p_conv", jax.jit(conv0p), xs, out=out)

    def conv0_mm(v):
        vp = jnp.pad(v, ((0, 0), (pt, pb), (plft, pr), (0, 0)))
        acc = None
        for u in range(kh):
            for vv in range(kw):
                tap = vp[:, u:u + 540, vv:vv + 960, :].reshape(-1, 28)
                z = jnp.dot(tap, w0[u, vv], preferred_element_type=jnp.float32)
                acc = z if acc is None else acc + z
        return (acc.reshape(1, 540, 960, 128) + b0.astype(jnp.float32)).astype(v.dtype)

    bench("conv0_mm", jax.jit(conv0_mm), xs, out=out, check=ref0)

    # im2col over columns only: K = kw*28 = 140
    def conv0_mmcol(v):
        vp = jnp.pad(v, ((0, 0), (pt, pb), (plft, pr), (0, 0)))
        cols = jnp.concatenate([vp[:, :, vv:vv + 960, :] for vv in range(kw)],
                               axis=-1)
        acc = None
        wc = w0.transpose(0, 1, 2, 3).reshape(kh, kw * 28, 128)
        for u in range(kh):
            tap = cols[:, u:u + 540].reshape(-1, kw * 28)
            z = jnp.dot(tap, wc[u], preferred_element_type=jnp.float32)
            acc = z if acc is None else acc + z
        return (acc.reshape(1, 540, 960, 128) + b0.astype(jnp.float32)).astype(v.dtype)

    bench("conv0_mmcol", jax.jit(conv0_mmcol), xs, out=out, check=ref0)

    # ---- s2d rewrites ---------------------------------------------------
    x = jnp.asarray(rng.random((1, H, W, 7)), jnp.bfloat16)
    refs = bench("s2d_reshape", jax.jit(stylizer._s2d), x, out=out)

    def s2d_slices(v):
        return jnp.concatenate(
            [v[:, a::2, b::2, :] for a in range(2) for b in range(2)], axis=-1)

    bench("s2d_slices", jax.jit(s2d_slices), x, out=out, check=refs)

    # fused with an elementwise producer (as in the engine's assembly)
    def s2d_fused(v):
        v = v * jnp.asarray(2.5, v.dtype) - jnp.asarray(1.0, v.dtype)
        return stylizer._s2d(v)

    bench("s2d_fused", jax.jit(s2d_fused), x, out=out)

    def s2d_slices_fused(v):
        v = v * jnp.asarray(2.5, v.dtype) - jnp.asarray(1.0, v.dtype)
        return s2d_slices(v)

    bench("s2d_slices_f", jax.jit(s2d_slices_fused), x, out=out)

    # two-level s2d (the L2 front's input form)
    def s2d2(v):
        return stylizer._s2d(stylizer._s2d(v))

    refs2 = bench("s2d2_reshape", jax.jit(s2d2), x, out=out)

    def s2d2_slices(v):
        return jnp.concatenate(
            [v[:, a::4, b::4, :]
             for ah in range(2) for aw in range(2)
             for bh in range(2) for bw in range(2)
             for a, b in [(2 * ah + bh, 2 * aw + bw)]], axis=-1)

    bench("s2d2_slices", jax.jit(s2d2_slices), x, out=out, check=refs2)

    floor = out["floor"]
    print("\nfloor-corrected:")
    for k, v in out.items():
        if k != "floor":
            print(f"{k:14s} {v - floor:8.3f} ms")


if __name__ == "__main__":
    main()
