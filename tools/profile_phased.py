"""A/B the SHIPPED streaming classes: plain vs phase-resident mode.

Drives flow.provider.StreamingFlowProvider + video.engine.StylizerEngine —
the exact per-frame device path of `cli/stylize_video --flow_model` — in
both layouts, at 1080p (flow 0.5) and 4K (flow 0.25).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_phased.py [1080|4k|all]

Timing rules (axon tunnel): chained dispatch, one scalar readback per
trial, output-path u8 conversion included in both modes (it is device work
in the frame loop either way).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from fast_artistic_videos_tpu.flow import estimator as fest
from fast_artistic_videos_tpu.flow.provider import StreamingFlowProvider
from fast_artistic_videos_tpu.models import arch_dsl, stylizer
from fast_artistic_videos_tpu.video.engine import EngineConfig, StylizerEngine

_u8_to_f32 = jax.jit(lambda u: u.astype(jnp.float32) / 255.0)
_f32_to_u8 = jax.jit(
    lambda x: jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8))


def build_engine(spec, params, phased: bool) -> StylizerEngine:
    apply_vid = lambda p, x: stylizer.apply(p, spec, x, dtype=jnp.bfloat16)  # noqa: E731
    kw = {}
    if phased:
        kw = dict(
            apply_vid_phased=lambda p, x: stylizer.apply(
                p, spec, x, dtype=jnp.bfloat16, phase_input=True,
                phase_output=True, fold_preprocess=True),
            phase_pad_blocks=spec.input_pad // 4,
        )
    return StylizerEngine(
        apply_vid, params, stride_multiple=spec.total_stride,
        config=EngineConfig(dtype="bfloat16"), **kw)


def run_mode(phased: bool, H: int, W: int, flow_scale: float, n: int):
    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    est = fest.FlowEstimator(fest.init_params(jax.random.PRNGKey(1)),
                             dtype=jnp.bfloat16)
    eng = build_engine(spec, params, phased)
    if phased:
        assert eng.supports_phase_resident
    provider = StreamingFlowProvider(
        flow_estimator=est, flow_scale=flow_scale, phased=phased)

    rng = np.random.default_rng(0)
    frames_u8 = [jnp.asarray(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
                 for _ in range(2)]
    frames_f32 = [_u8_to_f32(f) for f in frames_u8]

    provider(frames_f32[0])
    y0 = eng.stylize_first(frames_f32[0])
    state = {"y": eng.to_phased(y0) if phased else y0, "i": 1, "u8": None}

    def step():
        i = state["i"]
        f32, u8 = frames_f32[i % 2], frames_u8[i % 2]
        flow, cert = provider(f32)
        band = provider.last_band
        if phased:
            state["y"] = eng.stylize_next_phased(u8, state["y"], flow, cert, band)
            state["u8"] = eng.phased_to_u8(state["y"])
        else:
            state["y"] = eng.stylize_next(f32, state["y"], flow, cert,
                                          band_hint=band)
            state["u8"] = _f32_to_u8(state["y"])
        state["i"] = i + 1

    def sync():
        return float(jnp.sum(state["u8"].astype(jnp.float32)))

    # warm: band buckets stabilize + all programs compile before timing
    for _ in range(4):
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


def main(argv=None):
    which = (argv or sys.argv[1:] or ["all"])[0]
    cases = []
    if which in ("1080", "all"):
        cases.append(("1080p", 1080, 1920, 0.5, 30))
    if which in ("4k", "all"):
        cases.append(("4k", 2160, 3840, 0.25, 10))
    if not cases:
        sys.exit(f"usage: {sys.argv[0]} [1080|4k|all]")
    for name, H, W, fs, n in cases:
        for phased in (False, True):
            ms = run_mode(phased, H, W, fs, n)
            tag = "phased" if phased else "plain "
            print(f"{name} {tag} flow@{fs}: {ms:8.2f} ms/frame "
                  f"({1000.0 / ms:6.2f} fps)", flush=True)


if __name__ == "__main__":
    main()
