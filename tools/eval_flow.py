"""Evaluate trained flow weights on held-out synthetic protocols.

Protocols (none drawn from the training image pool; eval seeds disjoint):
  smooth   — in-distribution smooth fields (max_shift 12)
  large    — LARGER displacements than training (max_shift 20)
  discont  — occluding piecewise motion (max_shift 12)

For each: mean EPE (px) and the consistency self-pass rate — the fraction
of pixels whose estimated fwd/bwd pair passes the reference consistency
inequality, over the pixels where the GROUND-TRUTH pair passes it
(non-occluded by construction).

Usage: PYTHONPATH=/root/repo python tools/eval_flow.py [weights.npz] [size]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from fast_artistic_videos_tpu.flow import consistency, estimator, train as flow_train
from fast_artistic_videos_tpu.ops import warp as warp_ops


def protocol_fields(name, rng, h, w):
    if name == "smooth":
        return flow_train.random_flow_field(rng, h, w, max_shift=12)
    if name == "large":
        return flow_train.random_flow_field(rng, h, w, max_shift=20)
    return flow_train.random_flow_field_discontinuous(rng, h, w, max_shift=12)


def evaluate(params, size=192, n_cases=8, seed=555):
    results = {}
    for name in ("smooth", "large", "discont"):
        rng = np.random.default_rng(seed + hash(name) % 1000)
        epes, passrates = [], []
        for k in range(n_cases):
            img2 = flow_train.random_texture_image(rng, size, size)[None]
            gt = protocol_fields(name, rng, size, size)[None]
            img1 = np.asarray(warp_ops.bilinear_warp(
                jnp.asarray(img2), jnp.asarray(gt)))
            fwd = estimator.apply(params, jnp.asarray(img1), jnp.asarray(img2))[0]
            bwd = estimator.apply(params, jnp.asarray(img2), jnp.asarray(img1))[0]
            epes.append(flow_train.epe(fwd, gt[0]))
            est_mask = np.asarray(consistency.consistency_mask(
                jnp.asarray(np.asarray(fwd)), jnp.asarray(np.asarray(bwd))))
            # ground-truth mask: where the true fwd/bwd pair is consistent
            gt_bwd = np.asarray(warp_ops.bilinear_warp(
                jnp.asarray(-gt), jnp.asarray(gt)))[0]
            gt_mask = np.asarray(consistency.consistency_mask(
                jnp.asarray(gt[0]), jnp.asarray(gt_bwd)))
            valid = gt_mask > 0
            passrates.append((est_mask[valid] > 0).mean() if valid.any() else 0.0)
        results[name] = (float(np.mean(epes)), float(np.max(epes)),
                         float(np.mean(passrates)), float(np.min(passrates)))
    return results


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/repo/fast_artistic_videos_tpu/assets/flow_pwclite.npz"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    params = estimator.load_params(path)
    for name, (e_mean, e_max, p_mean, p_min) in evaluate(params, size).items():
        print(f"{name:8s} EPE mean {e_mean:6.3f} max {e_max:6.3f}   "
              f"consistency-pass mean {p_mean:5.3f} min {p_min:5.3f}")


if __name__ == "__main__":
    main()
