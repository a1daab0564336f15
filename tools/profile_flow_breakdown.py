"""Stage breakdown of the streaming flow side at 1080p flow@0.5 bf16.

The shipped chain spends ~11 ms/frame on flow (prep + refine_pair +
consistency) vs ~16 ms on the stylizer step — this isolates where, and
what the opt-in cheaper modes (fast_check, coarse_backward) buy.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_flow_breakdown.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from fast_artistic_videos_tpu.flow import consistency, estimator as fest

H, W, FS, N = 1080, 1920, 0.5, 20


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
    est = fest.FlowEstimator(fest.init_params(jax.random.PRNGKey(1)),
                             dtype=jnp.bfloat16)
    frames = [jnp.asarray(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
              for _ in range(2)]
    out = {}
    state = {"i": 0, "f": None}

    def prep():
        state["f"] = est.prep(frames[state["i"] % 2], FS)
        state["i"] += 1

    prep()
    out["prep (pyramid, u8 in)"] = timeit(
        prep, lambda: float(jnp.sum(state["f"][0].astype(jnp.float32))))

    a, b = est.prep(frames[0], FS), est.prep(frames[1], FS)
    for label, kw in (
        ("refine_pair lowres", {}),
        ("refine_pair lowres fast_check", dict(fast_check=True)),
        ("refine_pair lowres coarse_bwd", dict(coarse_backward=True)),
        ("refine_pair fullres both", None),
    ):
        if kw is None:
            r = est.refine_pair(a, b, (H, W), FS)
            out[label] = timeit(
                lambda: est.refine_pair(a, b, (H, W), FS),
                lambda: float(est.refine_pair(a, b, (H, W), FS)[2]))
            continue
        r = est.refine_pair(a, b, (H, W), FS, with_lowres=True, **kw)
        out[label] = timeit(
            lambda: est.refine_pair(a, b, (H, W), FS, with_lowres=True, **kw),
            lambda: float(est.refine_pair(
                a, b, (H, W), FS, with_lowres=True, **kw)[3]))

    _, bwd_low, fwd_low, _ = est.refine_pair(a, b, (H, W), FS,
                                             with_lowres=True)
    img = frames[0]
    jc = lambda: consistency.consistency_mask_streaming(  # noqa: E731
        bwd_low, fwd_low, img, out_hw=None, band=16)
    c = jc()
    out["consistency (flow-res, u8 img)"] = timeit(
        jc, lambda: float(jnp.sum(jc())))

    for k, v in out.items():
        print(f"{k:34s} {v:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
