"""Fine-grained hardware breakdown of the canonical stylizer FRONT.

Round-3 localized the remaining perf gap to layers 0-2 (6.83 of 13.5 ms,
~11x off the ~0.6 ms roofline) but never split that 6.83 into its pieces.
This measures, device-side at 1080p bf16, each stage of the level-1 phase
front (the shipped default) in isolation and fused:

    s2d        (1,1080,1920,7) -> (1,540,960,28)        transpose
    conv0p     5x5 28->128 @540p (phased first conv)
    gin+relu   grouped instance norm, 4 phases
    d64p       2x2 128->64 pads(1,0) (phased stride-2)
    n1+relu    instance norm @ (540,960,64)
    d128       3x3 s2 64->128 (native XLA conv)
    front      layers 0-2 as ONE jit (stop_after=2)

plus a dispatch-floor jit to correct the standalone numbers
(BENCH_NOTES floor-correction convention).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_front_breakdown.py
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


def bench(name, f, *args, out):
    state = {}

    def run():
        state["y"] = f(*args)

    ms = timeit(run, lambda: float(jnp.sum(state["y"])))
    out[name] = ms
    print(f"{name:18s} {ms:8.3f} ms", flush=True)
    return state["y"]


def main():
    rng = np.random.default_rng(0)
    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.random((1, H, W, 7)), jnp.bfloat16)
    out = {}

    # dispatch floor
    bench("floor", jax.jit(lambda v: v + 1.0), jnp.ones((8, 128), jnp.float32),
          out=out)

    p0, n0 = params["layer00"], params["layer00_norm"]
    p1, n1 = params["layer01"], params["layer01_norm"]
    p2 = params["layer02"]
    l0 = spec.layers[0]

    xs = bench("s2d", jax.jit(lambda v: stylizer._s2d(v)), x, out=out)

    w0, pads = stylizer._phase_level_kernel(
        np.asarray(p0["w"]), ((l0.pad, l0.pad), (l0.pad, l0.pad)))
    w0 = jnp.asarray(w0, jnp.bfloat16)
    b0 = jnp.asarray(np.tile(np.asarray(p0["b"]), 4), jnp.bfloat16)

    def conv0p(v):
        return jax.lax.conv_general_dilated(
            v, w0, (1, 1), pads, dimension_numbers=stylizer._DN,
            preferred_element_type=v.dtype) + b0

    y = bench("conv0p", jax.jit(conv0p), xs, out=out)

    y = bench("gin_relu", jax.jit(lambda v: jax.nn.relu(
        stylizer._grouped_instance_norm(v, n0["scale"], n0["bias"], 4))),
        y, out=out)

    k1 = jnp.asarray(stylizer._phase_stride2_kernel(np.asarray(p1["w"]), 1),
                     jnp.bfloat16)
    b1 = jnp.asarray(np.asarray(p1["b"]), jnp.bfloat16)

    def d64p(v):
        return jax.lax.conv_general_dilated(
            v, k1, (1, 1), ((1, 0), (1, 0)), dimension_numbers=stylizer._DN,
            preferred_element_type=v.dtype) + b1

    z = bench("d64p", jax.jit(d64p), y, out=out)

    z = bench("n1_relu", jax.jit(lambda v: jax.nn.relu(
        stylizer.instance_norm(v, n1["scale"], n1["bias"]))), z, out=out)

    w2 = jnp.asarray(np.asarray(p2["w"]), jnp.bfloat16)
    b2 = jnp.asarray(np.asarray(p2["b"]), jnp.bfloat16)

    def d128(v):
        return jax.lax.conv_general_dilated(
            v, w2, (2, 2), ((1, 1), (1, 1)), dimension_numbers=stylizer._DN,
            preferred_element_type=v.dtype) + b2

    bench("d128", jax.jit(d128), z, out=out)

    # the front as ONE jit, exactly as the shipped default runs it
    bench("front_jit", jax.jit(lambda v: stylizer.apply(
        params, spec, v, dtype=jnp.bfloat16, stop_after=2)), x, out=out)

    # and the full forward for reference
    bench("forward", jax.jit(lambda v: stylizer.apply(
        params, spec, v, dtype=jnp.bfloat16)), x, out=out)

    floor = out["floor"]
    print("\nfloor-corrected:")
    tot = 0.0
    for k, v in out.items():
        if k == "floor":
            continue
        c = v - floor
        if k not in ("front_jit", "forward"):
            tot += c
        print(f"{k:18s} {c:8.3f} ms")
    print(f"{'sum(stages)':18s} {tot:8.3f} ms")


if __name__ == "__main__":
    main()
