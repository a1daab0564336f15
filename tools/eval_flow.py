"""Evaluate trained flow weights on held-out protocols.

Thin CLI over fast_artistic_videos_tpu.flow.train.evaluate_heldout —
see its docstring for the protocol definitions and metric semantics.
Runs each protocol on BOTH image sources: procedural textures
(random_texture_image) and the bundled natural-statistics fixtures
(natural_image: photographic + terrain, assets/eval/).

Usage: PYTHONPATH=/root/repo python tools/eval_flow.py [weights.npz] [size]
"""

import sys

sys.path.insert(0, "/root/repo")

from fast_artistic_videos_tpu.flow import estimator
from fast_artistic_videos_tpu.flow.train import (
    evaluate_heldout, natural_image, random_texture_image)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/repo/fast_artistic_videos_tpu/assets/flow_pwclite.npz"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    params = estimator.load_params(path)
    for label, source in (("procedural", random_texture_image),
                          ("natural", natural_image)):
        for name, (e_mean, e_max, p_mean, p_min) in evaluate_heldout(
                params, size=size, image_source=source).items():
            print(f"{label:10s} {name:8s} EPE mean {e_mean:6.3f} "
                  f"max {e_max:6.3f}   "
                  f"consistency-pass mean {p_mean:5.3f} min {p_min:5.3f}",
                  flush=True)


if __name__ == "__main__":
    main()
