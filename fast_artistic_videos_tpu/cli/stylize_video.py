"""CLI: stylize a frame sequence into a temporally consistent stylized
sequence — flag-level parity with ``th fast_artistic_video.lua``
(fast_artistic_video.lua:21-67). GPU/backend flags are replaced by JAX
device handling; ``--dtype bfloat16`` selects the fast TPU compute path.

Example (frames + precomputed flow like the reference shell pipeline):

  python -m fast_artistic_videos_tpu.cli.stylize_video \\
      --model_vid candy-video.npz --model_img candy-image.npz \\
      --input_pattern frames/frame_%05d.ppm \\
      --flow_pattern flow/backward_[%d]_{%d}.flo \\
      --occlusions_pattern flow/reliable_[%d]_{%d}.pgm \\
      --output_prefix out/out
"""

from __future__ import annotations

import argparse
import dataclasses

from ..core.config import StylizeOptions
from ..models import checkpoint, stylizer
from ..video.engine import EngineConfig, StylizerEngine
from ..video.driver_video import VideoDriver


def add_stylize_flags(p: argparse.ArgumentParser) -> None:
    defaults = StylizeOptions()
    for f in dataclasses.fields(StylizeOptions):
        flag = "--" + f.name
        default = getattr(defaults, f.name)
        if f.type == "bool" or isinstance(default, bool):
            p.add_argument(flag, action="store_true", default=default)
        else:
            p.add_argument(flag, type=type(default), default=default)


def options_from_args(args) -> StylizeOptions:
    kw = {f.name: getattr(args, f.name) for f in dataclasses.fields(StylizeOptions)}
    return StylizeOptions(**kw)


def build_engine(opt: StylizeOptions) -> StylizerEngine:
    spec_v, params_v, _ = checkpoint.load_model(opt.model_vid)
    apply_vid = lambda p, x: stylizer.apply(p, spec_v, x)  # noqa: E731
    apply_img = params_img = None
    stride = spec_v.total_stride
    if opt.model_img not in ("", "self"):
        spec_i, params_img, _ = checkpoint.load_model(opt.model_img)
        apply_img = lambda p, x: stylizer.apply(p, spec_i, x)  # noqa: E731
        stride = max(stride, spec_i.total_stride)
    cfg = EngineConfig(
        fill_occlusions=opt.fill_occlusions,
        occlusions_min_filter=opt.occlusions_min_filter,
        dtype=opt.dtype,
        exact_warp=opt.exact_warp,
    )
    # segment-capable apply + split plan enable --feature_reuse (the lossy
    # high-fps keyframe mode); harmless to wire even when unused
    plan = stylizer.reuse_split_plan(spec_v)
    split = None
    if plan is not None:
        split = lambda p, x, **kw: stylizer.apply(p, spec_v, x, **kw)  # noqa: E731
    phased_kw = {}
    if opt.phase_resident:
        if not stylizer.supports_phase_io(spec_v):
            raise SystemExit(
                "--phase_resident: this architecture does not support "
                "phase-io (needs stride-4 with 4-aligned input padding)")
        phased_kw = dict(
            apply_vid_phased=lambda p, x: stylizer.apply(  # noqa: E731
                p, spec_v, x, phase_input=True, phase_output=True,
                fold_preprocess=True),
            phase_pad_blocks=spec_v.input_pad // 4,
        )
    return StylizerEngine(
        apply_vid, params_v, apply_img, params_img, stride_multiple=stride,
        config=cfg, apply_vid_split=split, reuse_plan=plan, **phased_kw,
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_stylize_flags(p)
    args = p.parse_args(argv)
    opt = options_from_args(args)
    if not opt.input_pattern:
        p.error("--input_pattern is required")
    if (not opt.create_inconsistent and not opt.flow_model
            and (not opt.flow_pattern or not opt.occlusions_pattern)):
        p.error("--flow_pattern and --occlusions_pattern are required "
                "(or pass --flow_model for on-TPU flow, or --create_inconsistent)")
    if opt.phase_resident:
        if not opt.flow_model or not (0 < opt.flow_scale < 1.0):
            p.error("--phase_resident needs --flow_model with "
                    "0 < --flow_scale < 1 (the provider emits phased flow "
                    "at estimation resolution)")
        if (opt.scale_factor != 1.0 or opt.feature_reuse > 1
                or opt.exact_warp or opt.fill_occlusions != "vgg-mean"
                or opt.create_inconsistent):
            p.error("--phase_resident is incompatible with --scale_factor, "
                    "--feature_reuse, --exact_warp, --create_inconsistent "
                    "and non-default --fill_occlusions")
    engine = build_engine(opt)
    flow_provider = None
    if opt.flow_model:
        from ..flow import estimator as flow_estimator
        from ..flow.provider import StreamingFlowProvider

        import jax

        device = None
        if opt.flow_device >= 0 and opt.flow_device < len(jax.devices()):
            device = jax.devices()[opt.flow_device]
        import jax.numpy as jnp

        # flow_scale < 1: the provider also applies the occlusion erosion
        # at flow resolution (exact, consistency._eroded_nearest_up) so the
        # engine skips its full-res min-filter — at 4K that filter alone is
        # ~10 ms/frame (BENCH_NOTES round 4)
        erode_window = (opt.occlusions_min_filter
                        if (0 < opt.flow_scale < 1.0
                            and opt.scale_factor == 1.0
                            and opt.feature_reuse <= 1
                            and not opt.phase_resident) else None)
        flow_provider = StreamingFlowProvider(
            flow_estimator.load_params(opt.flow_model),
            device=device,
            flow_scale=opt.flow_scale,
            dtype=jnp.bfloat16 if opt.dtype == "bfloat16" else None,
            coarse_backward=opt.coarse_backward,
            fast_check=opt.fast_check,
            erode_window=erode_window,
            # phased provider: flow comes back in the flat 16-phase layout
            # and the certainty stays at flow res (the engine erodes it in
            # phase space — exact, ops.phase.eroded_cert_phased)
            phased=opt.phase_resident,
        )
    eval_fn = None
    if opt.evaluate:
        from ..video.evaluation import VideoEvaluator

        eval_fn = VideoEvaluator(opt).__call__
    driver = VideoDriver(engine, opt, eval_fn=eval_fn, flow_provider=flow_provider)
    results = driver.run()
    if results:
        total = sum(r.seconds for r in results)
        print(f"{len(results)} frames in {total:.2f}s "
              f"({len(results)/max(total,1e-9):.2f} fps device-side)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
