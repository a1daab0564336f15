"""Stage breakdown of the phase-resident step vs the plain step (1080p bf16).

Isolates where stylize_next_phased's 43 ms goes (vs plain 29 ms,
tools/profile_phased.py): net forward (plain vs phase-io), banded warp
(full-res vs phased), certainty erosion (full-res min_filter vs phased),
content s2d (uint8), output conversion, the full engine jits, and the
provider's refine_pair with/without phased_up.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_phased_breakdown.py [BAND]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from fast_artistic_videos_tpu.flow import estimator as fest
from fast_artistic_videos_tpu.models import arch_dsl, stylizer
from fast_artistic_videos_tpu.ops import filters, phase as phase_ops, warp
from fast_artistic_videos_tpu.video.engine import EngineConfig, StylizerEngine

H, W = 1080, 1920
HQ, WQ = H // 4, W // 4
N = 20
BAND = int(sys.argv[1]) if len(sys.argv) > 1 else 32


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
    out = {}

    # --- net forward: plain vs phase-io -------------------------------
    x7 = jnp.asarray(rng.random((1, H, W, 7)), jnp.float32)
    ap_plain = jax.jit(lambda x: stylizer.apply(params, spec, x,
                                                dtype=jnp.bfloat16))
    state = {"y": ap_plain(x7)}
    out["net plain"] = timeit(lambda: state.update(y=ap_plain(
        x7 + state["y"][:, :H, :W, :3].mean() * 0)),
        lambda: float(jnp.sum(state["y"].astype(jnp.float32))))

    xp = jnp.asarray(rng.random((1, HQ, WQ, 128)), jnp.bfloat16)
    pad_blocks = spec.input_pad // 4
    ap_ph = jax.jit(lambda x: stylizer.apply(
        params, spec, phase_ops.reflect_pad_phased(x, pad_blocks),
        dtype=jnp.bfloat16, phase_input=True, phase_output=True,
        fold_preprocess=True))
    state["p"] = ap_ph(xp)
    out["net phased (incl pad)"] = timeit(
        lambda: state.update(p=ap_ph(xp + state["p"].mean() * 0)),
        lambda: float(jnp.sum(state["p"].astype(jnp.float32))))

    # --- banded warp ---------------------------------------------------
    prev = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    flow = jnp.asarray(rng.normal(size=(H, W, 2)) * 8, jnp.float32)
    jw = jax.jit(lambda p, f: warp.bilinear_warp(p, f, band=BAND))
    state["w"] = jw(prev, flow)
    out[f"warp full-res band={BAND}"] = timeit(
        lambda: state.update(w=jw(prev + state["w"] * 0, flow)),
        lambda: float(jnp.sum(state["w"])))

    prev_p = phase_ops.s2d2_flat(prev[None])[0]
    flow_p = phase_ops.s2d2_flat(flow[None])[0]
    jwp = jax.jit(lambda p, f: warp.bilinear_warp_phased(p, f, band=BAND))
    state["wp"] = jwp(prev_p, flow_p)
    out[f"warp phased band={BAND}"] = timeit(
        lambda: state.update(wp=jwp(prev_p + state["wp"] * 0, flow_p)),
        lambda: float(jnp.sum(state["wp"])))

    # --- certainty erosion ----------------------------------------------
    cert = jnp.asarray(rng.random((H, W)), jnp.float32)
    jm = jax.jit(lambda c: filters.min_filter(c, 7))
    state["c"] = jm(cert)
    out["min_filter full-res k=7"] = timeit(
        lambda: state.update(c=jm(cert + state["c"] * 0)),
        lambda: float(jnp.sum(state["c"])))

    cert_low = jnp.asarray(rng.random((H // 2, W // 2)), jnp.float32)
    jcp = jax.jit(lambda c: phase_ops.eroded_cert_phased(c, 2, 7))
    state["cp"] = jcp(cert_low)
    out["eroded_cert_phased r=2 k=7"] = timeit(
        lambda: state.update(cp=jcp(cert_low + state["cp"].mean() * 0)),
        lambda: float(jnp.sum(state["cp"])))

    # --- content s2d (uint8) + output conversions ------------------------
    content_u8 = jnp.asarray(
        rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
    js = jax.jit(lambda u: phase_ops.s2d2_flat(u[None])[0])
    state["s"] = js(content_u8)
    out["content s2d2 uint8"] = timeit(
        lambda: state.update(s=js(content_u8 + state["s"][0, 0, 0] * 0)),
        lambda: float(jnp.sum(state["s"].astype(jnp.float32))))

    yph = jnp.asarray(rng.random((HQ, WQ, 48)), jnp.float32)
    jq = jax.jit(lambda y: phase_ops.d2s2_flat(
        jnp.clip(jnp.round(y * 255.0), 0, 255).astype(jnp.uint8)[None], 3)[0])
    state["q"] = jq(yph)
    out["phased->u8 out"] = timeit(
        lambda: state.update(q=jq(yph + state["q"][0, 0, 0] * 0)),
        lambda: float(jnp.sum(state["q"].astype(jnp.float32))))

    yfull = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    ju = jax.jit(lambda y: jnp.clip(
        jnp.round(y * 255.0), 0, 255).astype(jnp.uint8))
    state["u"] = ju(yfull)
    out["full f32->u8 out"] = timeit(
        lambda: state.update(u=ju(yfull + state["u"][0, 0, 0] * 0)),
        lambda: float(jnp.sum(state["u"].astype(jnp.float32))))

    # --- full engine jits -------------------------------------------------
    apply_vid = lambda p, x: stylizer.apply(p, spec, x, dtype=jnp.bfloat16)  # noqa: E731
    apply_ph = lambda p, x: stylizer.apply(  # noqa: E731
        p, spec, x, dtype=jnp.bfloat16, phase_input=True, phase_output=True,
        fold_preprocess=True)
    eng = StylizerEngine(
        apply_vid, params, stride_multiple=spec.total_stride,
        config=EngineConfig(dtype="bfloat16"),
        apply_vid_phased=apply_ph, phase_pad_blocks=spec.input_pad // 4)

    contentf = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    certf = jnp.ones((H, W), jnp.float32)
    state["e"] = eng.stylize_next(contentf, prev, flow, certf, band_hint=BAND)
    out["engine plain step"] = timeit(
        lambda: state.update(e=eng.stylize_next(
            contentf, state["e"], flow, certf, band_hint=BAND)),
        lambda: float(jnp.sum(state["e"])))

    state["ep"] = eng.to_phased(contentf)
    out["engine phased step"] = timeit(
        lambda: state.update(ep=eng.stylize_next_phased(
            content_u8, state["ep"], flow_p, cert_low, BAND)),
        lambda: float(jnp.sum(state["ep"])))

    # --- provider refine: phased_up on/off --------------------------------
    est = fest.FlowEstimator(fest.init_params(jax.random.PRNGKey(1)),
                             dtype=jnp.bfloat16)
    f1 = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    f2 = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    a, b = est.prep(f1, 0.5), est.prep(f2, 0.5)
    for ph in (False, True):
        r = est.refine_pair(a, b, (H, W), 0.5, with_lowres=True, phased_up=ph)
        out[f"refine_pair phased_up={ph}"] = timeit(
            lambda: est.refine_pair(a, b, (H, W), 0.5, with_lowres=True,
                                    phased_up=ph),
            lambda: float(est.refine_pair(
                a, b, (H, W), 0.5, with_lowres=True, phased_up=ph)[3]))

    for k, v in out.items():
        print(f"{k:32s} {v:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
