"""Benchmark: fully-streaming 1080p video stylization throughput on one chip.

Measures the complete per-frame device pipeline of BASELINE.md's target
metric — "flow + warp + mask + stylize at 1080p" — with the canonical
pretrained-model architecture:

  frame pyramid (PWC-lite, flow at 540p)            [estimator.prep]
  both flow directions                              [estimator.refine_pair]
  consistency mask w/ structure tensor @ flow res   [consistency_mask_streaming]
  certainty erosion + flow warp + masking/fill +
  7-channel assembly + stylizer forward + deprocess [engine step, bf16]

Frames are chained through the temporal recurrence like real video (each
step consumes the previous step's stylized output and shares the previous
frame's feature pyramid, exactly like flow.provider.StreamingFlowProvider).
Prints ONE JSON line:

  {"metric": "streaming_fps_1080p", "value": N, "unit": "frames/sec",
   "vs_baseline": N/30}

Baseline: >= 30 fps at 1080p on one TPU v5e chip (BASELINE.md build target).
Timing uses chained dispatch with a single scalar readback per trial
(block_until_ready is a no-op on the axon transport).
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

from fast_artistic_videos_tpu.flow import consistency, estimator as fest
from fast_artistic_videos_tpu.models import arch_dsl, stylizer
from fast_artistic_videos_tpu.ops import filters, warp
from fast_artistic_videos_tpu.ops.preprocess import vgg_deprocess, vgg_preprocess

FLOW_SCALE = 0.5  # the streaming default for 1080p input (cli/stylize_video)


def main():
    platform = jax.devices()[0].platform
    H, W = 1080, 1920
    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    fparams = fest.init_params(jax.random.PRNGKey(1))
    # bf16 features (flow accumulates f32): ~10% faster refine_pair with
    # held-out EPE/pass-rates indistinguishable from f32 (README)
    est = fest.FlowEstimator(fparams, dtype=jnp.bfloat16)

    def step(content, prev, flow, cert):
        c2 = filters.min_filter(cert, 7)
        prior = warp.bilinear_warp(prev, flow, band=32)
        c = vgg_preprocess(content)[None]
        p = vgg_preprocess(prior)[None] * c2[None, :, :, None]
        x = jnp.concatenate([c, p, c2[None, :, :, None]], -1)
        y = stylizer.apply(params, spec, x, dtype=jnp.bfloat16)
        return jnp.clip(vgg_deprocess(y[0]), 0.0, 1.0).astype(jnp.float32)

    jstep = jax.jit(step)
    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.random((H, W, 3)), jnp.float32) for _ in range(2)]

    feats = [est.prep(f, FLOW_SCALE) for f in frames]
    state = {"y": jstep(frames[0], frames[0], jnp.zeros((H, W, 2), jnp.float32),
                        jnp.ones((H, W), jnp.float32)), "i": 0}

    def frame_step():
        # one full streaming step: pyramid for the incoming frame is the one
        # computed on the previous iteration (provider caching); here both
        # pyramids are prebuilt and alternate, which costs the same compute
        i = state["i"]
        cur, prev = feats[i % 2], feats[(i + 1) % 2]
        f = frames[i % 2]
        _ = est.prep(f, FLOW_SCALE)  # pay the per-frame pyramid cost
        bwd, bwd_low, fwd_low, _max = est.refine_pair(
            cur, prev, (H, W), FLOW_SCALE, with_lowres=True)
        cert = consistency.consistency_mask_streaming(
            bwd_low, fwd_low, f, out_hw=(H, W), band=16)
        state["y"] = jstep(f, state["y"], bwd, cert)
        state["i"] = i + 1

    frame_step()
    _ = float(jnp.sum(state["y"]))  # compile + sync

    n = 30 if platform != "cpu" else 3
    best = float("inf")
    for _trial in range(3 if platform != "cpu" else 1):
        t0 = time.monotonic()
        for _ in range(n):
            frame_step()
        _ = float(jnp.sum(state["y"]))  # chain sync (block_until_ready is a
        # no-op on the axon transport; a scalar readback forces completion)
        best = min(best, (time.monotonic() - t0) / n)

    fps = 1.0 / best
    print(json.dumps({
        "metric": "streaming_fps_1080p",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
