"""A/B the full-pallas front end on the real chip.

Measures the canonical stylizer forward @1080p (batch 1, bf16) under:
  - default XLA path (fused_front=None)
  - fused residual chain only (fused_rblocks=True)
  - level-2 full-pallas front (fused_front="full", rblocks default ON)
then the full streaming chain fps with the best stylizer config.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_pallas_front.py
Axon tunnel rules: chained dispatch, one scalar readback per timing.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from fast_artistic_videos_tpu.flow import consistency, estimator as fest
from fast_artistic_videos_tpu.models import arch_dsl, stylizer
from fast_artistic_videos_tpu.ops import filters, warp
from fast_artistic_videos_tpu.ops.preprocess import vgg_deprocess, vgg_preprocess

H, W = 1080, 1920
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


def main():
    rng = np.random.default_rng(0)
    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.random((1, H, W, 7)), jnp.float32)

    configs = {
        "xla": {},
        "rblocks": {"fused_rblocks": True},
        "full_front": {"fused_front": "full"},
    }
    out = {}
    fwd = {}
    ref = None
    for name, kw in configs.items():
        f = jax.jit(lambda x, kw=kw: stylizer.apply(
            params, spec, x, dtype=jnp.bfloat16, **kw))
        t0 = time.monotonic()
        y = f(x)
        s = float(jnp.sum(y))
        print(f"{name}: compile+first {time.monotonic()-t0:.1f}s sum={s:.4f}",
              flush=True)
        if ref is None:
            ref = np.asarray(y, np.float32)
        else:
            err = float(np.max(np.abs(np.asarray(y, np.float32) - ref)))
            print(f"  max|{name}-xla| = {err:.3e}", flush=True)
        state = {"y": y}

        def run(f=f, state=state):
            state["y"] = f(x)

        fwd[name] = timeit(run, lambda state=state: float(jnp.sum(state["y"])))
        out[f"forward/{name}"] = fwd[name]
        print(f"  forward {fwd[name]:.2f} ms", flush=True)

    best = min(fwd, key=fwd.get)
    print(f"best stylizer config: {best}", flush=True)

    # full streaming chain fps with best config vs xla
    frame = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    frame2 = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    fparams = fest.init_params(jax.random.PRNGKey(1))
    est = fest.FlowEstimator(fparams, dtype=jnp.bfloat16)

    for name in {"xla", best}:
        kw = configs[name]

        def step(content, prev, flow, cert, kw=kw):
            c2 = filters.min_filter(cert, 7)
            prior = warp.bilinear_warp(prev, flow, band=32)
            c = vgg_preprocess(content)[None]
            p = vgg_preprocess(prior)[None] * c2[None, :, :, None]
            xx = jnp.concatenate([c, p, c2[None, :, :, None]], -1)
            y = stylizer.apply(params, spec, xx, dtype=jnp.bfloat16, **kw)
            return jnp.clip(vgg_deprocess(y[0]), 0.0, 1.0).astype(jnp.float32)

        jstep = jax.jit(step)
        fs = 0.5
        feats_prev = est.prep(frame, fs)
        state = {"y": jstep(frame, frame,
                            jnp.zeros((H, W, 2), jnp.float32),
                            jnp.ones((H, W), jnp.float32))}

        def full(state=state, jstep=jstep, feats_prev=feats_prev):
            feats = est.prep(frame2, fs)
            bwd, fwdf, _ = est.refine_pair(feats, feats_prev, (H, W), fs)
            c = consistency.consistency_mask(bwd, fwdf, frame2, band=32)
            state["y"] = jstep(frame2, state["y"], bwd, c)

        ms = timeit(full, lambda state=state: float(jnp.sum(state["y"])))
        out[f"full_chain@0.5/{name}"] = ms
        print(f"full_chain@0.5/{name}: {ms:.2f} ms = {1000/ms:.2f} fps",
              flush=True)

    print()
    for k, v in out.items():
        print(f"{k:32s} {v:8.2f} ms")


if __name__ == "__main__":
    main()
