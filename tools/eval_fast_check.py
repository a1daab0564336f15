"""Quality ledger for refine_pair(fast_check=True) — the fast cross-check.

For each held-out protocol (flow/train.py EVAL_PROTOCOLS): compare the
consistency mask produced by the full fwd/bwd pair vs the fast_check pair
(same warp flow by construction — asserted; cross-check direction from a
single-level refinement of the negated-self-warped primary). Reports mask
identity %, and each variant's pass rate over GROUND-TRUTH non-occluded
pixels (higher = fewer good pixels wrongly discarded).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/eval_fast_check.py [size]
"""

import sys
import zlib

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from fast_artistic_videos_tpu.flow import consistency, estimator
from fast_artistic_videos_tpu.flow.train import (EVAL_PROTOCOLS,
                                                 _protocol_field,
                                                 random_texture_image)
from fast_artistic_videos_tpu.models import registry
from fast_artistic_videos_tpu.ops import warp as warp_ops


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    n_cases = 8
    params = estimator.load_params(registry.bundled_flow_weights())
    est = estimator.FlowEstimator(params)

    for name in EVAL_PROTOCOLS:
        rng = np.random.default_rng(555 + zlib.crc32(name.encode()) % 1000)
        idents, pr_full, pr_fast, fp_full, fp_fast = [], [], [], [], []
        for _ in range(n_cases):
            img2 = random_texture_image(rng, size, size)
            gt = _protocol_field(name, rng, size, size)[None]
            img1 = np.asarray(warp_ops.bilinear_warp(
                jnp.asarray(img2)[None], jnp.asarray(gt)))[0]
            f1 = est.prep(img1, 1.0)
            f2 = est.prep(img2, 1.0)
            bwd, fwd, _ = est.refine_pair(f1, f2, (size, size), 1.0)
            bwd_f, fwd_f, _ = est.refine_pair(f1, f2, (size, size), 1.0,
                                              fast_check=True)
            np.testing.assert_allclose(np.asarray(bwd), np.asarray(bwd_f),
                                       atol=1e-5)  # warp flow untouched
            m_full = np.asarray(consistency.consistency_mask(bwd, fwd))
            m_fast = np.asarray(consistency.consistency_mask(bwd_f, fwd_f))
            gt_bwd = np.asarray(warp_ops.bilinear_warp(
                jnp.asarray(-gt), jnp.asarray(gt)))[0]
            gt_mask = np.asarray(consistency.consistency_mask(
                jnp.asarray(gt[0]), jnp.asarray(gt_bwd)))
            valid = gt_mask > 0
            occ = ~valid
            idents.append(float((m_full == m_fast).mean()))
            pr_full.append(float(m_full[valid].mean()))
            pr_fast.append(float(m_fast[valid].mean()))
            fp_full.append(float(m_full[occ].mean()) if occ.any() else 0.0)
            fp_fast.append(float(m_fast[occ].mean()) if occ.any() else 0.0)
        print(f"{name:8s} mask identity {np.mean(idents):.3f} "
              f"(min {np.min(idents):.3f})  pass full {np.mean(pr_full):.3f} "
              f"-> fast {np.mean(pr_fast):.3f}  "
              f"FALSE-pass (GT-occluded wrongly kept) full "
              f"{np.mean(fp_full):.3f} -> fast {np.mean(fp_fast):.3f}",
              flush=True)


if __name__ == "__main__":
    main()
