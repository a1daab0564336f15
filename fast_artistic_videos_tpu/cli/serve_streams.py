"""CLI: stylize SEVERAL frame sequences concurrently, one stream per device.

The serving entry point for multi-clip throughput (video/serving.py
StreamPool): each clip's temporal recurrence is pinned to one local
device; different clips' device programs overlap. On a single chip this
degrades gracefully to interleaved streams (still one compile, shared).

Example (two clips over the local devices):

  python -m fast_artistic_videos_tpu.cli.serve_streams \\
      --model_vid demo --flow_model bundled \\
      --inputs clipA/frame_%05d.ppm,clipB/frame_%05d.ppm \\
      --output_dir out/

Outputs land in out/stream<i>-<frame>.png. No reference equivalent (the
reference is one process per video).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..core import io
from ..flow import estimator as flow_estimator
from ..models import checkpoint
from ..utils import pipeline


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_vid", required=True)
    p.add_argument("--flow_model", required=True,
                   help="flow weights (.npz) or 'bundled'")
    p.add_argument("--inputs", required=True,
                   help="comma-separated frame patterns, one per stream")
    p.add_argument("--output_dir", default="out")
    p.add_argument("--num_frames", type=int, default=9999)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--flow_scale", type=float, default=1.0)
    args = p.parse_args(argv)

    from ..video.serving import StreamPool

    patterns = [s for s in args.inputs.split(",") if s]
    spec, params, _ = checkpoint.load_model(args.model_vid)
    fpath = args.flow_model
    if fpath == "bundled":
        from ..models import registry

        fpath = registry.bundled_flow_weights()
    pool = StreamPool(spec, params,
                      flow_params=flow_estimator.load_params(fpath),
                      n_streams=len(patterns), dtype=args.dtype,
                      flow_scale=args.flow_scale)

    os.makedirs(args.output_dir, exist_ok=True)
    writer = pipeline.AsyncWriter()
    live = {s: True for s in range(len(patterns))}
    n_out = 0
    try:
        t = 1
        while any(live.values()) and t <= args.num_frames:
            for s, pat in enumerate(patterns):
                if not live[s]:
                    continue
                path = pat % t
                if not os.path.exists(path):
                    live[s] = False
                    continue
                out = pool.process(s, io.load_image(path))
                dst = os.path.join(args.output_dir, f"stream{s}-{t:05d}.png")
                writer.put(lambda d=dst, o=out: io.save_image(
                    d, np.asarray(o)))
                n_out += 1
            t += 1
    finally:
        writer.close()
    print(f"{n_out} frames across {len(patterns)} streams -> {args.output_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
