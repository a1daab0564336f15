"""Device mesh construction and sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2.5); here
parallelism is expressed once, declaratively:

  * training: batch ('data') axis sharded over the mesh — XLA inserts the
    gradient psum over ICI (no NCCL/MPI analog needed).
  * inference at large resolutions: spatial sharding with halo exchange
    lives in parallel.spatial.

All helpers degrade gracefully to a 1-device mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    n = num_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Device-put every array in `tree` with its batch axis sharded."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def put_global_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Assemble batch-sharded GLOBAL arrays from per-process local rows.

    Single-process: identical to shard_batch (plain device_put). Multi-host
    SPMD: every process passes only ITS rows (a train.data source built
    with num_shards=process_count serves exactly those) and
    jax.make_array_from_process_local_data stitches the global array across
    hosts — the multi-host analog of the reference's single-GPU batch load
    (train_video.lua:245-260), with input IO spread over DCN-attached
    hosts instead of one disk."""
    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sh, x, global_shape)

    return jax.tree_util.tree_map(put, tree)


def prime_collectives(mesh: Mesh) -> None:
    """Rendezvous the cross-process communicators while processes are
    still aligned from ``jax.distributed.initialize``.

    XLA's gloo CPU backend (and the TPU runtime's DCN fallback) creates
    each communicator clique lazily at its first collective, under a hard
    30 s key-value-store deadline. On a loaded host the processes' first
    ORGANIC collectives can skew past that — client-side compiles
    serialize on the CPU, and rank 0 additionally hosts the coordination
    service — killing the world at startup (measured: a 4-process trainer
    died in `device_put -> multihost assert_equal -> allgather` with
    `GetKeyValue() timed out ... 29.99s` before iteration 1). Touching

      * the one-device-per-process clique (process_allgather /
        assert_equal use it for every cross-process device_put), and
      * the all-device clique (the gradient psum uses it)

    here, microseconds past initialize(), makes the rendezvous skew-free;
    both contexts are cached for the real work. No-op single-process."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec

    multihost_utils.process_allgather(np.zeros((), np.float32))
    n = int(mesh.devices.size)
    sharded = NamedSharding(mesh, PartitionSpec(tuple(mesh.axis_names)))
    x = jax.device_put(np.zeros((n,), np.float32), sharded)
    out = jax.jit(lambda v: v.sum(), out_shardings=replicated(mesh))(x)
    np.asarray(out.addressable_data(0))  # force the all-reduce to run


# -- 2D (data x space) mesh: joint batch + spatial sharding -----------------

def make_mesh_2d(data: int, space: int) -> Mesh:
    """A (data, space) mesh for joint batch + height sharding — 4K-frame
    training where one frame alone saturates a chip's HBM: each batch shard
    is further split over 'space' with XLA inserting the conv halo
    exchanges, and gradients psum over BOTH axes (ICI)."""
    devs = jax.devices()
    if data * space > len(devs):
        raise ValueError(f"requested {data}x{space} devices, have {len(devs)}")
    return Mesh(np.array(devs[: data * space]).reshape(data, space),
                ("data", "space"))


def batch_space_sharding(mesh: Mesh, ndim: int, h_axis: int = 1) -> NamedSharding:
    """Batch axis over 'data', height axis over 'space', rest replicated."""
    spec = [None] * ndim
    spec[0] = "data"
    spec[h_axis] = "space"
    return NamedSharding(mesh, P(*spec))


def shard_batch_space(mesh: Mesh, tree, h_axis: int = 1):
    """Device-put arrays with (batch, height) jointly sharded; arrays with
    fewer than h_axis+1 dims get batch-only sharding."""
    def put(x):
        if x.ndim > h_axis:
            return jax.device_put(x, batch_space_sharding(mesh, x.ndim, h_axis))
        return jax.device_put(x, NamedSharding(mesh, P("data")))

    return jax.tree_util.tree_map(put, tree)
