"""Stage breakdown of the feature-reuse step on the real chip.

Times the three pieces separately in bf16 (defaults to 1080p, resolution
parameterizable): front (layers 0-2), tail (layers 8-11), and the
128-channel quarter-grid delta warp at several bands and dtypes —
localizes why reuse (19.2 ms) lost to exact (15.9 ms) at 1080p.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_reuse_stages.py [H W [N]]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from fast_artistic_videos_tpu.models import arch_dsl, stylizer
from fast_artistic_videos_tpu.ops import warp

if len(sys.argv) == 2 or len(sys.argv) > 4:
    sys.exit("usage: profile_reuse_stages.py [H W [N]]  (H and W together)")
H = int(sys.argv[1]) if len(sys.argv) > 2 else 1080
W = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
N = int(sys.argv[3]) if len(sys.argv) > 3 else 20


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


def main():
    rng = np.random.default_rng(0)
    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.random((1, H, W, 7)), jnp.float32)

    seg = {
        "full": dict(),
        "front (0-2)": dict(stop_after=2),
    }
    vals = {}
    out = {}
    for name, kw in seg.items():
        f = jax.jit(lambda v, kw=kw: stylizer.apply(
            params, spec, v, dtype=jnp.bfloat16, **kw))
        y = f(x)
        vals[name] = y
        state = {"y": y}

        def run(f=f, state=state):
            state["y"] = f(x)

        out[name] = timeit(run, lambda s=state: float(jnp.sum(s["y"].astype(jnp.float32))))
        print(f"{name:22s} {out[name]:7.2f} ms  out{tuple(y.shape)}", flush=True)

    f2 = vals["front (0-2)"]
    crop = 10
    fc = f2[:, crop:f2.shape[1] - crop, crop:f2.shape[2] - crop, :]
    print("fc", fc.shape, flush=True)

    fb = jax.jit(lambda v: stylizer.apply(params, spec, v, dtype=jnp.bfloat16,
                                          start_at=3, stop_after=7))(f2)
    tail = jax.jit(lambda v: stylizer.apply(params, spec, v,
                                            dtype=jnp.bfloat16, start_at=8))
    blocks = jax.jit(lambda v: stylizer.apply(
        params, spec, v, dtype=jnp.bfloat16, start_at=3, stop_after=7))
    state = {"y": tail(fb)}
    out["tail (8-11)"] = timeit(lambda: state.update(y=tail(fb)),
                                lambda: float(jnp.sum(state["y"])))
    print(f"{'tail (8-11)':22s} {out['tail (8-11)']:7.2f} ms", flush=True)
    state = {"y": blocks(f2)}
    out["blocks (3-7)"] = timeit(lambda: state.update(y=blocks(f2)),
                                 lambda: float(jnp.sum(state["y"])))
    print(f"{'blocks (3-7)':22s} {out['blocks (3-7)']:7.2f} ms", flush=True)

    hq, wq = fc.shape[1], fc.shape[2]
    fq = jnp.asarray(rng.normal(size=(hq, wq, 2)) * 1.5, jnp.float32)
    for dt, dname in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        delta = jnp.asarray(rng.standard_normal((hq, wq, 128)), dt)
        for band in (8, 4, 2):
            wfn = jax.jit(lambda d, f, b=band: warp.bilinear_warp(d, f, band=b))
            state = {"y": wfn(delta, fq)}
            ms = timeit(lambda: state.update(y=wfn(delta, fq)),
                        lambda: float(jnp.sum(state["y"].astype(jnp.float32))))
            out[f"delta warp {dname} band={band}"] = ms
            print(f"delta warp {dname} band={band:<2d}  {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
