"""Benchmark: streaming video stylization throughput on one chip.

Round-4 rewrite: drives the SHIPPED streaming classes — the exact code
path of `cli/stylize_video --flow_model` — instead of a hand-inlined
copy of the loop (the two had drifted by ~2 ms/frame in round 3):

  flow.provider.StreamingFlowProvider   (pyramid + refine_pair +
                                         consistency + flow-res erosion)
  video.engine.StylizerEngine           (warp + mask/fill + 7-channel
                                         assembly + canonical stylizer,
                                         bf16, uint8 in / uint8 out fused)

Frames are chained through the temporal recurrence like real video.
Prints one JSON line per scenario; the FIRST is the headline BASELINE.md
metric (>= 30 fps at 1080p on one TPU v5e chip):

  {"metric": "streaming_fps_1080p", ...,  "vs_baseline": fps/30}
  {"metric": "streaming_fps_4k", ...,     "vs_baseline": fps/8}   (round-4 target)
  {"metric": "vr_fps_922px_faces", ...,   "vs_baseline": fps/10}  (round-4 target)

Timing uses chained dispatch with a single scalar readback per trial
(block_until_ready is a no-op on the axon transport). On CPU only the
1080p line runs (the driver's capture environment is the TPU).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# XLA for the axon backend compiles CLIENT-side on a 1-core host; the disk
# cache makes reruns (and the driver's capture run) skip the ~minutes-long
# cold compile of the streaming-set jits.
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from fast_artistic_videos_tpu.flow import estimator as fest
from fast_artistic_videos_tpu.flow.provider import (
    BatchedStreamingFlowProvider, StreamingFlowProvider)
from fast_artistic_videos_tpu.models import arch_dsl, stylizer
from fast_artistic_videos_tpu.video.engine import EngineConfig, StylizerEngine

OCC_WINDOW = 7  # EngineConfig.occlusions_min_filter default


def _canonical_engine(spec, params):
    return StylizerEngine(
        lambda p, x: stylizer.apply(p, spec, x, dtype=jnp.bfloat16),
        params, stride_multiple=spec.total_stride,
        config=EngineConfig(dtype="bfloat16"))


def run_2d(H, W, flow_scale, n, trials=3):
    """ms/frame for the shipped 2D streaming chain (uint8 frames staged on
    device; uploads overlap with compute in the real driver and are
    artifacts of the axon tunnel)."""
    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    eng = _canonical_engine(spec, params)
    est = fest.FlowEstimator(fest.init_params(jax.random.PRNGKey(1)),
                             dtype=jnp.bfloat16)
    provider = StreamingFlowProvider(
        flow_estimator=est, flow_scale=flow_scale, erode_window=OCC_WINDOW)

    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
              for _ in range(2)]
    provider(frames[0])
    state = {"y": eng.stylize_first(frames[0]), "i": 1, "u8": None}

    def step():
        i = state["i"]
        u8 = frames[i % 2]
        flow, cert = provider(u8)
        state["y"], state["u8"] = eng.stylize_next(
            u8, state["y"], flow, cert, band_hint=provider.last_band,
            emit_u8=True, pre_eroded=True)
        state["i"] = i + 1

    def sync():
        return float(jnp.sum(state["u8"].astype(jnp.float32)))

    for _ in range(4):  # band buckets stabilize + all programs compile
        step()
    sync()
    best = float("inf")
    for _ in range(trials):
        t0 = time.monotonic()
        for _ in range(n):
            step()
        sync()
        best = min(best, (time.monotonic() - t0) / n)
    return best * 1e3


def run_vr(face, flow_scale, n):
    """ms/frame for the VR per-frame device path at production face sizes:
    batched 6-face flow + 6 face steps (erode + border prior + temporal
    blend + stylize) + cross-face blend + median — the VRDriver's real
    stage functions (reference production setup: 768-px cube edges,
    expand 1.2 -> ~922-px faces, transformVRVideo.sh:14-15,27-32)."""
    from fast_artistic_videos_tpu.ops import filters
    from fast_artistic_videos_tpu.video.driver_vr import (
        VRDriver, VROptions, _Geometry)

    overlap = 128 if face >= 256 else max(12, round(face * 128 / 922))
    opt = VROptions(overlap_pixel_w=overlap, overlap_pixel_h=overlap,
                    dtype="bfloat16", flow_scale=flow_scale)
    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    engine = _canonical_engine(spec, params)
    est = fest.FlowEstimator(fest.init_params(jax.random.PRNGKey(1)),
                             dtype=jnp.bfloat16)
    driver = VRDriver(engine, opt,
                      batched_flow_provider=BatchedStreamingFlowProvider(
                          flow_scale=flow_scale, flow_estimator=est))
    driver.geo = _Geometry(face, face, opt)

    rng = np.random.default_rng(0)
    faces = [jnp.asarray(rng.random((face, face, 3)), jnp.float32)
             for _ in range(6)]
    driver.segments = list(faces)
    driver.prev_segments = list(faces)
    stacks = [jnp.stack(faces), jnp.stack(faces[::-1])]
    bfn = driver._border_fn(4)
    bc = driver._border_cert(4)
    ero = jax.jit(lambda c: filters.min_filter(
        jnp.maximum(c, bc), opt.occlusions_min_filter))
    tfn = driver._temporal_fn(4, band=16)
    med = jax.jit(lambda x: filters.median_filter(x, 3))
    driver.batched_flow(stacks[1])  # prime: first call only caches pyramids
    state = {"i": 0, "y": None}

    def frame():
        i = state["i"]
        streamed = driver.batched_flow(stacks[i % 2])
        for k in range(6):
            f, c = streamed[k]
            c_er = ero(c)
            b = bfn(*faces[:4])
            prior = tfn(faces[4], f, b, c_er)
            state["y"] = engine.stylize_with_prior(
                faces[k], prior, c_er, erode_cert=False)
        driver.blend_other_sides()
        for s in faces:
            state["y"] = med(s)
        state["i"] = i + 1

    frame()
    float(jnp.sum(state["y"]))
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        for _ in range(n):
            frame()
        float(jnp.sum(state["y"]))
        best = min(best, (time.monotonic() - t0) / n)
    return best * 1e3


def emit(metric, ms, target):
    fps = 1000.0 / ms
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / target, 3),
    }), flush=True)


def main():
    platform = jax.devices()[0].platform
    on_tpu = platform != "cpu"
    ms = run_2d(1080, 1920, 0.5, 30 if on_tpu else 3,
                trials=3 if on_tpu else 1)
    emit("streaming_fps_1080p", ms, 30.0)  # BASELINE.md headline
    if not on_tpu:
        return
    emit("streaming_fps_4k", run_2d(2160, 3840, 0.25, 10), 8.0)
    emit("vr_fps_922px_faces", run_vr(922, 0.5, 4), 10.0)


if __name__ == "__main__":
    main()
