"""CLI: stylize a spherical (360°) video given as 6 overlapping cube faces —
flag-level parity with ``th fast_artistic_video_vr.lua``
(fast_artistic_video_vr.lua:20-74).

Input pattern takes two integers (frame, face), e.g. ``frames/f%04d_%d.ppm``;
flow/occlusion patterns use the [%d]/{%d} frame placeholders plus a trailing
%d for the face, e.g. ``flow/backward_[%d]_{%d}_%d.flo``.
"""

from __future__ import annotations

import argparse
import dataclasses

from ..models import checkpoint, stylizer
from ..video.driver_vr import VRDriver, VROptions
from ..video.engine import EngineConfig, StylizerEngine


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    defaults = VROptions()
    for f in dataclasses.fields(VROptions):
        flag = "--" + f.name
        default = getattr(defaults, f.name)
        if isinstance(default, bool):
            p.add_argument(flag, action="store_true", default=default)
        else:
            p.add_argument(flag, type=type(default), default=default)
    args = p.parse_args(argv)
    kw = {f.name: getattr(args, f.name) for f in dataclasses.fields(VROptions)}
    opt = VROptions(**kw)
    if not opt.input_pattern:
        p.error("--input_pattern is required")
    if (not opt.create_inconsistent and not opt.flow_model
            and (not opt.flow_pattern or not opt.occlusions_pattern)):
        p.error("--flow_pattern and --occlusions_pattern are required "
                "(or pass --flow_model for on-TPU flow, or --create_inconsistent)")

    spec_v, params_v, _ = checkpoint.load_model(opt.model_vid)
    apply_vid = lambda pp, x: stylizer.apply(pp, spec_v, x)  # noqa: E731
    apply_img = params_img = None
    stride = spec_v.total_stride
    if opt.model_img not in ("", "self"):
        spec_i, params_img, _ = checkpoint.load_model(opt.model_img)
        apply_img = lambda pp, x: stylizer.apply(pp, spec_i, x)  # noqa: E731
        stride = max(stride, spec_i.total_stride)
    engine = StylizerEngine(
        apply_vid, params_v, apply_img, params_img, stride_multiple=stride,
        config=EngineConfig(
            fill_occlusions=opt.fill_occlusions,
            occlusions_min_filter=opt.occlusions_min_filter,
            dtype=opt.dtype,
            exact_warp=opt.exact_warp,
        ),
    )
    eval_fn = None
    if opt.evaluate:
        from ..video.evaluation import VREvaluator

        eval_fn = VREvaluator(opt).__call__
    batched_flow = None
    if opt.flow_model:
        from ..flow import estimator as flow_estimator
        from ..flow.provider import BatchedStreamingFlowProvider

        import jax.numpy as jnp

        # all 6 face flows of a frame in ONE program (the faces are
        # independent temporal streams; batching the pyramid/refine is
        # ~1.6x cheaper than 6 sequential dispatches, BENCH_NOTES)
        flow_params = flow_estimator.load_params(opt.flow_model)
        batched_flow = BatchedStreamingFlowProvider(
            flow_params, flow_scale=opt.flow_scale,
            dtype=jnp.bfloat16 if opt.dtype == "bfloat16" else None,
            fast_check=opt.fast_check)
    driver = VRDriver(engine, opt, eval_fn=eval_fn,
                      batched_flow_provider=batched_flow)
    n = driver.run()
    print(f"processed {n} faces ({n // 6} full frames)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
