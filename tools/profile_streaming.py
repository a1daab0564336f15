"""Profile the streaming per-frame device stages on the real chip.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_streaming.py
Timings use chained dispatch + one scalar readback (axon tunnel rules).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

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
    frame = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    frame2 = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    fparams = fest.init_params(jax.random.PRNGKey(1))
    est = fest.FlowEstimator(fparams, dtype=jnp.bfloat16)

    out = {}
    for fs in (0.5, 0.25):
        feats1 = est.prep(frame, fs)
        feats2 = est.prep(frame2, fs)
        out[f"prep@{fs}"] = timeit(
            lambda: est.prep(frame, fs),
            lambda: float(jnp.sum(est.prep(frame, fs)[0])))
        r = est.refine_pair(feats1, feats2, (H, W), fs)
        out[f"refine_pair@{fs}"] = timeit(
            lambda: est.refine_pair(feats1, feats2, (H, W), fs),
            lambda: float(est.refine_pair(feats1, feats2, (H, W), fs)[2]))
        bwd, fwd, _ = r
        m = consistency.consistency_mask(bwd, fwd, frame, band=32)
        out[f"consistency_struct_fullres@{fs}"] = timeit(
            lambda: consistency.consistency_mask(bwd, fwd, frame, band=32),
            lambda: float(jnp.sum(
                consistency.consistency_mask(bwd, fwd, frame, band=32))))

    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)

    def step(content, prev, flow, cert):
        c2 = filters.min_filter(cert, 7)
        prior = warp.bilinear_warp(prev, flow, band=32)
        c = vgg_preprocess(content)[None]
        p = vgg_preprocess(prior)[None] * c2[None, :, :, None]
        x = jnp.concatenate([c, p, c2[None, :, :, None]], -1)
        y = stylizer.apply(params, spec, x, dtype=jnp.bfloat16)
        return jnp.clip(vgg_deprocess(y[0]), 0.0, 1.0).astype(jnp.float32)

    jstep = jax.jit(step)
    flow = jnp.asarray(rng.normal(size=(H, W, 2)) * 8, jnp.float32)
    cert = jnp.ones((H, W), jnp.float32)
    y = jstep(frame, frame, flow, cert)
    state = {"y": y}

    def run_step():
        state["y"] = jstep(frame, state["y"], flow, cert)

    out["stylize_step"] = timeit(run_step, lambda: float(jnp.sum(state["y"])))

    # chained full pipeline (prep + refine + consistency + stylize), flow@0.5
    for fs in (0.5, 0.25):
        feats_prev = est.prep(frame, fs)

        def full():
            feats = est.prep(frame2, fs)
            bwd, fwd, _ = est.refine_pair(feats, feats_prev, (H, W), fs)
            c = consistency.consistency_mask(bwd, fwd, frame2, band=32)
            state["y"] = jstep(frame2, state["y"], bwd, c)

        out[f"full_chain@{fs}"] = timeit(full, lambda: float(jnp.sum(state["y"])))

    for k, v in out.items():
        print(f"{k:36s} {v:8.2f} ms")
    print(f'{"full@0.5 fps":36s} {1000/out["full_chain@0.5"]:8.2f}')
    print(f'{"full@0.25 fps":36s} {1000/out["full_chain@0.25"]:8.2f}')


if __name__ == "__main__":
    main()
