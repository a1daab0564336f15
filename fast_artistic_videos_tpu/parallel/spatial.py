"""Spatial (height-axis) sharding for large-frame inference.

The per-frame recurrence is sequential, so the only way to put multiple
chips on ONE video stream is to split each frame across them — the same
idea as the reference's 6-cube-face decomposition with overlapping halos
(SURVEY.md §2.5 'SP'). Here the split is expressed declaratively: frames are
sharded over the mesh's 'space' axis and XLA GSPMD partitions every conv,
inserting exact halo exchanges over ICI itself (no hand-written ppermute —
the compiler already knows each conv's receptive field). Validated on the
canonical net at a 1080p-like shape (1x1088x192x7, 8-way height sharding):
max abs deviation 4.9e-4 vs the single-device forward
(tests/test_parallel.py::test_spatial_canonical_1080p_like, env-gated by
FAV_SLOW_TESTS=1 — the GSPMD partition compile takes ~2 min on CPU).

Use SpatialStylizer, or place inputs with `shard_spatial` under any jit.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_mesh(num_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = num_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("space",))


def spatial_sharding(mesh: Mesh, ndim: int, h_axis: int) -> NamedSharding:
    spec = [None] * ndim
    spec[h_axis] = "space"
    return NamedSharding(mesh, P(*spec))


def shard_spatial(mesh: Mesh, arr, h_axis: int = 0):
    """Device-put an array sharded along its height axis."""
    return jax.device_put(arr, spatial_sharding(mesh, arr.ndim, h_axis))


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


class SpatialStylizer:
    """Height-sharded wrapper around a stylizer apply function for very
    large frames (4K+) or latency-critical streams: one frame, n chips."""

    def __init__(self, apply_fn: Callable, params, mesh: Optional[Mesh] = None):
        self.mesh = mesh or spatial_mesh()
        self.params = replicate(self.mesh, params)
        self._jit = jax.jit(apply_fn)

    def __call__(self, x):
        """x: (N, H, W, C) host or device array; H should be divisible by
        the mesh size times the model stride."""
        xs = shard_spatial(self.mesh, x, h_axis=1)
        return self._jit(self.params, xs)
