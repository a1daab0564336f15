"""Profile the VR per-face device pipeline at production face sizes.

The reference's production VR setup is 768-px cube edges with expand_coef
1.2 -> ~922-px overlapping faces and 128-px overlaps
(transformVRVideo.sh:14-15,27-32; stylizeVRVideo_flownet.sh:81-82). This
tool drives the REAL VRDriver stages (border prior, temporal blend,
certainty erosion, engine step, streaming flow, cross-face blend) with
synthetic device-resident faces and reports per-stage and steady-state
per-face/per-frame times.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_vr.py [face_px]
Timings use chained dispatch + one scalar readback (axon tunnel rules).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from fast_artistic_videos_tpu.flow import estimator as fest
from fast_artistic_videos_tpu.flow.provider import (
    BatchedStreamingFlowProvider, StreamingFlowProvider)
from fast_artistic_videos_tpu.models import arch_dsl, stylizer
from fast_artistic_videos_tpu.ops import filters
from fast_artistic_videos_tpu.video.driver_vr import VRDriver, VROptions, _Geometry
from fast_artistic_videos_tpu.video.engine import EngineConfig, StylizerEngine

N = 12


def timeit(fn, sync, n=N, trials=3):
    fn()
    sync()
    best = float("inf")
    for _ in range(trials):
        t0 = time.monotonic()
        for _ in range(n):
            fn()
        sync()
        best = min(best, (time.monotonic() - t0) / n)
    return best * 1e3


def main():
    face = int(sys.argv[1]) if len(sys.argv) > 1 else 922
    flow_scale = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    fast_check = len(sys.argv) > 3 and sys.argv[3] == "fast_check"
    platform = jax.devices()[0].platform
    n = N if platform != "cpu" else 2

    # production proportions: 128-px overlap on 922-px faces; scale for
    # smaller smoke-test sizes so the geometry stays valid
    overlap = 128 if face >= 256 else max(12, round(face * 128 / 922))
    opt = VROptions(overlap_pixel_w=overlap, overlap_pixel_h=overlap,
                    dtype="bfloat16", flow_scale=flow_scale)
    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    engine = StylizerEngine(
        lambda pp, x: stylizer.apply(pp, spec, x, dtype=jnp.bfloat16),
        params, stride_multiple=spec.total_stride,
        config=EngineConfig(dtype="bfloat16"))
    fparams = fest.init_params(jax.random.PRNGKey(1))
    shared_est = fest.FlowEstimator(fparams, dtype=jnp.bfloat16)

    driver = VRDriver(engine, opt, batched_flow_provider=
                      BatchedStreamingFlowProvider(
                          flow_scale=flow_scale, flow_estimator=shared_est,
                          fast_check=fast_check))
    driver.geo = _Geometry(face, face, opt)

    rng = np.random.default_rng(0)
    faces = [jnp.asarray(rng.random((face, face, 3)), jnp.float32)
             for _ in range(6)]
    driver.segments = list(faces)
    driver.prev_segments = list(faces)
    flow = jnp.asarray(rng.normal(scale=3.0, size=(face, face, 2)), jnp.float32)
    cert = jnp.asarray(rng.random((face, face)), jnp.float32)

    class _Out(dict):
        def __setitem__(self, k, v):
            print(f"{k:34s} {v:8.2f} ms", flush=True)
            super().__setitem__(k, v)

    out = _Out()
    sync = lambda x: float(jnp.sum(x))  # noqa: E731

    # stage: streaming flow (prep + refine_pair + consistency @ flow res)
    prov = StreamingFlowProvider(flow_scale=flow_scale,
                                 flow_estimator=shared_est)
    prov(faces[0])
    state = {"i": 0}

    def flow_step():
        state["i"] += 1
        return prov(faces[state["i"] % 6])

    out["flow provider step (1 face)"] = timeit(
        lambda: flow_step(), lambda: sync(prov(faces[0])[0]), n)

    # stage: batched flow — all 6 face flows in one program (the driver's
    # default streaming path)
    bprov = driver.batched_flow
    stack6 = jnp.stack(faces)
    stack6b = jnp.stack(faces[::-1])
    bprov(stack6)
    bstate = {"i": 0}

    def bflow_step():
        bstate["i"] += 1
        return bprov(stack6 if bstate["i"] % 2 else stack6b)

    out["batched flow (6 faces)"] = timeit(
        lambda: bflow_step(), lambda: sync(bprov(stack6)[0][0]), n)

    # stage: border prior build, worst-case face position 4 (4 warps + rots)
    bfn = driver._border_fn(4)
    out["border prior (pos 4)"] = timeit(
        lambda: bfn(*faces[:4]), lambda: sync(bfn(*faces[:4])), n)

    # stage: certainty max + erosion
    bc = driver._border_cert(4)
    ero = jax.jit(lambda c: filters.min_filter(
        jnp.maximum(c, bc), opt.occlusions_min_filter))
    out["cert max+erode"] = timeit(lambda: ero(cert), lambda: sync(ero(cert)), n)

    # stage: temporal blend (banded warp, the driver's streaming default;
    # band 16 covers the scale-3 synthetic flow + bilinear tap)
    tfn = driver._temporal_fn(4, band=16)
    border = bfn(*faces[:4])
    ce = ero(cert)
    out["temporal blend"] = timeit(
        lambda: tfn(faces[4], flow, border, ce),
        lambda: sync(tfn(faces[4], flow, border, ce)), n)

    # stage: engine step
    out["stylize_with_prior"] = timeit(
        lambda: engine.stylize_with_prior(faces[0], border, ce, erode_cert=False),
        lambda: sync(engine.stylize_with_prior(faces[0], border, ce,
                                               erode_cert=False)), n)

    # steady-state face step WITHOUT flow (flow is batched per frame now):
    # erode + border prior + temporal blend + stylize
    streamed6 = bprov(stack6)

    def face_step(k):
        img = faces[k % 6]
        f, c = streamed6[k % 6]
        c_er = ero(c)
        b = bfn(*faces[:4])
        prior = tfn(faces[4], f, b, c_er)
        return engine.stylize_with_prior(img, prior, c_er, erode_cert=False)

    state2 = {"i": 0, "y": None}

    def chained_face():
        state2["y"] = face_step(state2["i"])
        state2["i"] += 1

    chained_face()
    sync(state2["y"])
    out["face step (no flow)"] = timeit(chained_face, lambda: sync(state2["y"]), n)

    # per frame: cross-face blend + median filter (once per 6 faces)
    blend = lambda: driver.blend_other_sides()  # noqa: E731
    out["blend_other_sides (per frame)"] = timeit(
        blend, lambda: sync(blend()[0]), max(2, n // 2))
    med = jax.jit(lambda x: filters.median_filter(x, 3))
    out["median x6 (per frame)"] = timeit(
        lambda: [med(s) for s in faces],
        lambda: sync(med(faces[0])), max(2, n // 2))

    per_frame = (out["batched flow (6 faces)"]
                 + 6 * out["face step (no flow)"]
                 + out["blend_other_sides (per frame)"]
                 + out["median x6 (per frame)"])
    print(f"{'VR frame (6 faces + blend + median)':34s} {per_frame:8.2f} ms "
          f"= {1000.0 / per_frame:.2f} VR fps @ {face}px faces, "
          f"flow@{flow_scale}")


if __name__ == "__main__":
    main()
