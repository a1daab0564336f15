"""Benchmark: end-to-end 1080p video stylization throughput on one chip.

Measures the full per-frame device step of the canonical pretrained-model
architecture (certainty erosion + flow warp + masking/fill + 7-channel
assembly + stylizer forward + deprocess) in bf16, frames chained through the
temporal recurrence like real video. Prints ONE JSON line:

  {"metric": "stylize_fps_1080p", "value": N, "unit": "frames/sec",
   "vs_baseline": N/30}

Baseline: >= 30 fps at 1080p on one TPU v5e chip (BASELINE.md build target).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from fast_artistic_videos_tpu.models import arch_dsl, stylizer
from fast_artistic_videos_tpu.ops import filters, warp
from fast_artistic_videos_tpu.ops.preprocess import vgg_deprocess, vgg_preprocess


def main():
    platform = jax.devices()[0].platform
    H, W = 1080, 1920
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
    rng = np.random.default_rng(0)
    content = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    flow = jnp.asarray(rng.normal(size=(H, W, 2)) * 8, jnp.float32)
    cert = jnp.ones((H, W), jnp.float32)

    out = jstep(content, content, flow, cert)
    _ = float(jnp.sum(out))  # compile + sync

    n = 30 if platform != "cpu" else 3
    best = float("inf")
    for _trial in range(3 if platform != "cpu" else 1):
        t0 = time.monotonic()
        for _ in range(n):
            out = jstep(content, out, flow, cert)
        _ = float(jnp.sum(out))  # chain sync (block_until_ready is a no-op
        # on the axon transport; a scalar readback forces completion)
        best = min(best, (time.monotonic() - t0) / n)

    fps = 1.0 / best
    print(json.dumps({
        "metric": "stylize_fps_1080p",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
