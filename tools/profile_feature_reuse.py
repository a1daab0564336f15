"""Measure the feature-reuse (lossy high-fps) mode on the real chip.

Times the ACTUAL engine steps at 1080p bf16 with streaming flow:
exact step, keyframe step (stylize_next_full), reuse step
(stylize_next_reuse), and the effective streaming fps at keyframe
intervals K in {2, 4, 8} (chain = flow + consistency + engine step).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_feature_reuse.py [H W [N [FS]]]

Defaults to 1080p; pass e.g. `2160 3840` to locate the reuse-vs-exact
crossover at 4K (ROADMAP round-4 lever: blocks scale with area, the
delta warp with area/16).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from fast_artistic_videos_tpu.flow import consistency, estimator as fest
from fast_artistic_videos_tpu.models import arch_dsl, stylizer
from fast_artistic_videos_tpu.video.engine import EngineConfig, StylizerEngine

if len(sys.argv) == 2 or len(sys.argv) > 5:
    sys.exit("usage: profile_feature_reuse.py [H W [N [FS]]]  (H and W together)")
H = int(sys.argv[1]) if len(sys.argv) > 2 else 1080
W = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
N = int(sys.argv[3]) if len(sys.argv) > 3 else 20
FS = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
BAND = 32


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
    plan = stylizer.reuse_split_plan(spec)
    eng = StylizerEngine(
        lambda p, x: stylizer.apply(p, spec, x, dtype=jnp.bfloat16),
        params_vid=params,
        stride_multiple=spec.total_stride,
        config=EngineConfig(dtype="bfloat16"),
        apply_vid_split=lambda p, x, **kw: stylizer.apply(
            p, spec, x, dtype=jnp.bfloat16, **kw),
        reuse_plan=plan,
    )

    frame = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    frame2 = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    flow = jnp.asarray(rng.normal(size=(H, W, 2)) * 8, jnp.float32)
    cert = jnp.ones((H, W), jnp.float32)
    fparams = fest.init_params(jax.random.PRNGKey(1))
    est = fest.FlowEstimator(fparams, dtype=jnp.bfloat16)

    out = {}
    state = {"y": eng.stylize_first(frame)}

    def exact():
        state["y"] = eng.stylize_next(frame2, state["y"], flow, cert, BAND)

    out["engine step exact"] = timeit(exact, lambda: float(jnp.sum(state["y"])))

    def full():
        state["y"], state["d"] = eng.stylize_next_full(
            frame2, state["y"], flow, cert, BAND)

    out["engine step keyframe"] = timeit(
        full, lambda: float(jnp.sum(state["y"])))

    def reuse():
        state["y"], state["d"] = eng.stylize_next_reuse(
            frame2, state["y"], flow, cert, state["d"], BAND)

    out["engine step reuse"] = timeit(
        reuse, lambda: float(jnp.sum(state["y"])))

    # chained flow + consistency + engine step (the product path)
    fs = FS
    feats_prev = est.prep(frame, fs)

    def chain(step):
        feats = est.prep(frame2, fs)
        bwd, fwd, _ = est.refine_pair(feats, feats_prev, (H, W), fs)
        c = consistency.consistency_mask(bwd, fwd, frame2, band=BAND)
        step(bwd, c)

    def chain_exact():
        chain(lambda f, c: state.update(
            y=eng.stylize_next(frame2, state["y"], f, c, BAND)))

    out["chain exact"] = timeit(
        chain_exact, lambda: float(jnp.sum(state["y"])))

    def chain_full():
        chain(lambda f, c: state.update(zip(
            ("y", "d"),
            eng.stylize_next_full(frame2, state["y"], f, c, BAND))))

    out["chain keyframe"] = timeit(
        chain_full, lambda: float(jnp.sum(state["y"])))

    def chain_reuse():
        chain(lambda f, c: state.update(zip(
            ("y", "d"),
            eng.stylize_next_reuse(frame2, state["y"], f, c, state["d"],
                                   BAND))))

    out["chain reuse"] = timeit(
        chain_reuse, lambda: float(jnp.sum(state["y"])))

    for k, v in out.items():
        print(f"{k:24s} {v:8.2f} ms", flush=True)
    ck, cr = out["chain keyframe"], out["chain reuse"]
    print(f"{'chain exact fps':24s} {1000/out['chain exact']:8.2f}")
    for K in (2, 4, 8):
        eff = (ck + (K - 1) * cr) / K
        print(f"chain fps @ K={K:<2d}         {1000/eff:8.2f} "
              f"({eff:.2f} ms avg)")
    print(f"{'chain fps @ K=inf':24s} {1000/cr:8.2f}")


if __name__ == "__main__":
    main()
