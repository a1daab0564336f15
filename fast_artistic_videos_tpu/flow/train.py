"""Supervised training of the PWC-lite flow estimator on synthetic warps.

The reference sidesteps flow training entirely (external binaries); here the
estimator is trained from any single-image corpus: sample an image, draw a
smooth random motion field (affine + low-frequency residual), synthesize
frame1 = warp(frame2, field), and supervise with the exact field — the same
analytic-ground-truth idea as the reference's fake data loader
(DataLoader_video_fake.lua:114-180), extended to dense fields.

Loss: multiscale endpoint error (L1) against the downsampled ground truth,
coarse levels downweighted (PWC-Net style).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import warp as warp_ops
from . import estimator


def random_flow_field(rng: np.random.Generator, h: int, w: int,
                      max_shift: float = 12.0) -> np.ndarray:
    """Smooth random motion: affine + blurred noise, |flow| <~ 2*max_shift."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    cx, cy = (w - 1) / 2, (h - 1) / 2
    tx, ty = rng.uniform(-max_shift, max_shift, 2)
    rot = rng.uniform(-0.05, 0.05)
    scale = rng.uniform(-0.08, 0.08)
    fx = tx + scale * (xs - cx) - rot * (ys - cy)
    fy = ty + scale * (ys - cy) + rot * (xs - cx)
    # low-frequency residual
    gh, gw = 4, 4
    coarse = rng.normal(0, max_shift / 4, (gh, gw, 2)).astype(np.float32)
    import jax.image

    fine = np.asarray(jax.image.resize(jnp.asarray(coarse), (h, w, 2), "bicubic"))
    return np.stack([fx, fy], -1) + fine


def make_pair(images: np.ndarray, rng: np.random.Generator):
    """images: (N, H, W, 3). Returns (img1, img2, gt_flow) with
    img1(x) = img2(x + gt(x))."""
    n, h, w = images.shape[:3]
    flows = np.stack([random_flow_field(rng, h, w) for _ in range(n)])
    img2 = images
    img1 = np.asarray(
        warp_ops.bilinear_warp(jnp.asarray(img2), jnp.asarray(flows))
    )
    return img1.astype(np.float32), img2.astype(np.float32), flows.astype(np.float32)


def _downsample_flow(flow, factor: int):
    n, h, w, _ = flow.shape
    f = flow.reshape(n, h // factor, factor, w // factor, factor, 2).mean(axis=(2, 4))
    return f / factor


def multiscale_loss(params, img1, img2, gt_flow):
    outs = estimator.apply_multiscale(params, img1, img2)
    weights = [0.32, 0.08, 0.02, 0.01][: len(outs)][::-1]  # coarse .. fine
    total = 0.0
    n_levels = len(estimator.PYRAMID_CHANNELS)
    for i, flow_l in enumerate(outs):  # coarsest first
        lvl = n_levels - 1 - i
        factor = 2 ** (lvl + 1)
        gt_l = _downsample_flow(gt_flow, factor)
        total = total + weights[i] * jnp.mean(jnp.abs(flow_l - gt_l))
    return total


def train_flow(
    image_source,
    iterations: int = 2000,
    learning_rate: float = 1e-4,
    seed: int = 0,
    params=None,
    log_fn=print,
    log_every: int = 50,
):
    """image_source: callable -> (N, H, W, 3) float32 batches (H, W divisible
    by the pyramid stride). Returns trained params."""
    key = jax.random.PRNGKey(seed)
    if params is None:
        params = estimator.init_params(key)
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)
    rng = np.random.default_rng(seed)

    @jax.jit
    def step(params, opt_state, img1, img2, gt):
        loss, grads = jax.value_and_grad(multiscale_loss)(params, img1, img2, gt)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for it in range(1, iterations + 1):
        images = image_source()
        img1, img2, gt = make_pair(images, rng)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(gt)
        )
        if it % log_every == 0:
            log_fn(f"flow iter {it}/{iterations} loss {float(loss):.4f}")
    return params


def epe(flow, gt) -> float:
    """Mean endpoint error in pixels."""
    return float(np.mean(np.linalg.norm(np.asarray(flow) - np.asarray(gt), axis=-1)))
