"""Warp formulation sweep: {full-res x {unroll, fori}, phased, hybrid,
pallas} x band, on the real 1080p shapes.

Round-5 questions this answers (BENCH_NOTES round 5):
1. The unroll-at-band<=16 threshold was chosen in round 2 from a
   measurement INSIDE the flow refine program at small grids; at 1080p the
   breakdown shows full-res unrolled band 16 at 4.69 ms while the band-24
   fori form runs 3.07 ms — is the threshold simply wrong at frame scale?
2. The phased warp must unroll (the fori form is pathological: 46/60 ms at
   band 24/32). At which band does "d2s -> full-res warp -> s2d inside one
   jit" (hybrid) overtake the unrolled phased ladder, if ever? That sets
   the engine-level dispatch for large-band phased steps.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_warp_forms.py [H W]
(default 1080 1920; pass e.g. 136 240 for the flow-refine grid scale)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from fast_artistic_videos_tpu.ops import phase as phase_ops
from fast_artistic_videos_tpu.ops import warp as wm

H, W = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
    else (1080, 1920)
N = 30


def timeit(step, sync, n=N):
    step()
    sync()
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        for _ in range(n):
            step()
        sync()
        best = min(best, (time.monotonic() - t0) / n)
    return best * 1e3


def chain(jf, *args):
    """Time jf(img, *rest) with a device-side dependency chain (the next
    step consumes the previous output) and ONE final scalar sync — the
    axon tunnel's block_until_ready is a no-op, so sync via readback."""
    state = {"y": jf(*args)}

    def step():
        img = args[0] + (state["y"] * 0 if state["y"].shape == args[0].shape
                         else 0)
        state["y"] = jf(img, *args[1:])

    return timeit(step, lambda: float(jnp.sum(
        state["y"].astype(jnp.float32))))


def main():
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    prev_p = phase_ops.s2d2_flat(prev[None])[0]
    platform = jax.devices()[0].platform
    print(f"platform {platform}  {H}x{W}  n={N}", flush=True)

    for band in (8, 16, 24, 32, 48):
        # flow bounded inside the band so every form is numerically valid
        flow_np = rng.normal(size=(H, W, 2)).astype(np.float32)
        flow_np *= 0.7 * band / max(1e-6, np.abs(flow_np).max())
        flow = jnp.asarray(flow_np)
        flow_p = phase_ops.s2d2_flat(flow[None])[0].reshape(
            H // 4, W // 4, 16, 2)
        rows = []

        for form, limit in (("unroll", 10_000), ("fori", 0)):
            wm._UNROLL_LIMIT = limit
            wm._UNROLL_AREA = 10 ** 12  # force the band rule to decide
            jf = jax.jit(lambda p, f, band=band: wm._warp_banded_single(
                p, f, band))
            rows.append((f"full {form}", chain(jf, prev, flow)))
        wm._UNROLL_LIMIT, wm._UNROLL_AREA = 16, 600_000

        jp = jax.jit(lambda p, f, band=band: wm._warp_banded_phased(
            p, f, band))
        rows.append(("phased unroll", chain(jp, prev_p, flow_p)))

        # hybrid: layout roundtrip + the best full-res form, one jit —
        # what an engine-level large-band phased dispatch would pay
        wm._UNROLL_LIMIT = 0

        def hybrid(p, f, band=band):
            full = phase_ops.d2s2_flat(p[None], 3)[0]
            ffull = phase_ops.d2s2_flat(f.reshape(H // 4, W // 4, 32)[None],
                                        2)[0]
            y = wm._warp_banded_single(full, ffull, band)
            return phase_ops.s2d2_flat(y[None])[0]

        rows.append(("hybrid d2s/s2d", chain(jax.jit(hybrid), prev_p,
                                             flow_p)))
        wm._UNROLL_LIMIT = 16

        if platform != "cpu":
            from fast_artistic_videos_tpu.ops import warp_pallas

            jpl = jax.jit(lambda p, f, band=band:
                          warp_pallas.bilinear_warp_pallas(p, f, band=band))
            rows.append(("pallas", chain(jpl, prev, flow)))

        print(f"=== band {band} ===", flush=True)
        for name, ms in rows:
            print(f"  {name:16s} {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
