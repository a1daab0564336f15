"""Total-variation regularizer as a pure loss function.

The reference implements TV as a loss-as-layer with an identity forward and a
hand-written backward (fast_artistic_video/TotalVariation.lua:19-35). That
backward is exactly the gradient of

    L(x) = 0.5 * strength * sum(x_diff^2 + y_diff^2)

with x_diff = x[:, :-1, :-1] - x[:, :-1, 1:] and
     y_diff = x[:, :-1, :-1] - x[:, 1:, :-1]

so here TV is that scalar loss, and JAX autodiff reproduces the reference
gradient bit-for-bit in structure.
"""

from __future__ import annotations

import jax.numpy as jnp


def tv_loss(x, strength: float = 1.0):
    """x: (..., H, W, C). Returns scalar 0.5*strength*sum of squared diffs."""
    x_diff = x[..., :-1, :-1, :] - x[..., :-1, 1:, :]
    y_diff = x[..., :-1, :-1, :] - x[..., 1:, :-1, :]
    return 0.5 * strength * (jnp.sum(jnp.square(x_diff)) + jnp.sum(jnp.square(y_diff)))
