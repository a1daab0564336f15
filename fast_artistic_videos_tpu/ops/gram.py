"""Gram matrix (channel covariance) for style features, NHWC.

Matches nn.GramMatrix (fast_artistic_video/GramMatrix.lua:31-51):
G = X · Xᵀ / (C*H*W) with X the (C, H*W) feature matrix. Differentiable by
construction (XLA autodiff replaces the hand-written Torch backward).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gram_matrix(feats, normalize: bool = True):
    """feats: (N, H, W, C) or (H, W, C) -> (N, C, C) or (C, C)."""
    single = feats.ndim == 3
    if single:
        feats = feats[None]
    n, h, w, c = feats.shape
    x = feats.reshape(n, h * w, c)
    gram = jnp.einsum(
        "npc,npd->ncd",
        x,
        x,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(feats.dtype)
    if normalize:
        gram = gram / (c * h * w)
    return gram[0] if single else gram


def mean_aggregate(feats):
    """Spatial mean aggregation for the 'mean' style target type
    (StyleLoss.lua:19-22): (N, H, W, C) -> (N, C)."""
    single = feats.ndim == 3
    if single:
        feats = feats[None]
    out = feats.mean(axis=(1, 2))
    return out[0] if single else out
