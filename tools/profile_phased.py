"""A/B the SHIPPED streaming classes: plain vs phase-resident mode.

Drives flow.provider.StreamingFlowProvider + video.engine.StylizerEngine —
the exact per-frame device path of `cli/stylize_video --flow_model` — in
both layouts, at 1080p (flow 0.5) and 4K (flow 0.25).

Round-4 update: both modes now use the fused-u8 engine IO (uint8 content
converted in-program, quantized u8 output emitted by the step program);
the phased mode feeds HOST-phased content (prefetch-thread s2d2_flat_np)
and takes the phased u8 output for a writer-thread host d2s — the device
never relayouts a full-res tensor.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_phased.py [1080|4k|all]

Timing rules (axon tunnel): chained dispatch, one scalar readback per
trial; frames pre-staged on device (uploads overlap with compute in the
real driver and are environment artifacts of the tunnel).
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
from fast_artistic_videos_tpu.ops import phase as phase_ops
from fast_artistic_videos_tpu.video.engine import EngineConfig, StylizerEngine


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
    frames_np = [rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
                 for _ in range(2)]
    frames_u8 = [jnp.asarray(f) for f in frames_np]
    # host-phased uploads (prefetch-thread work in the real driver)
    frames_ph = [jnp.asarray(phase_ops.s2d2_flat_np(f)) for f in frames_np]

    provider(frames_u8[0])
    y0 = eng.stylize_first(frames_u8[0])
    state = {"y": eng.to_phased(y0) if phased else y0, "i": 1, "u8": None}

    def step():
        i = state["i"]
        u8 = frames_u8[i % 2]
        flow, cert = provider(u8)
        band = provider.last_band
        if phased:
            state["y"], state["u8"] = eng.stylize_next_phased(
                frames_ph[i % 2], state["y"], flow, cert, band, emit_u8=True)
        else:
            state["y"], state["u8"] = eng.stylize_next(
                u8, state["y"], flow, cert, band_hint=band, emit_u8=True)
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
