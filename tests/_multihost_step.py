"""Subprocess body for the real multi-process DP test.

Run as:  python tests/_multihost_step.py <process_id> <num_processes> <port>

Each process owns 8//num_processes virtual CPU devices and ONLY its own
shard of the global batch rows; `put_global_batch` assembles the global
batch-sharded arrays across processes (jax.make_array_from_process_local_data
over the distributed runtime), then one DP train step runs with gradients
psum'd across all 8 global devices — the first genuine `process_count() > 1`
execution of the multi-host input path (SURVEY §2.5 collective-backend row;
VERDICT r2 missing #3).

Prints one JSON line with the loss (exact float32 bit pattern) and a
param-update checksum so the parent can compare single- vs multi-process
runs bit-for-bit.
"""

import json
import sys

import jax

# Order matters: platform must be pinned before any backend init (the
# sitecustomize already imported jax and registered the TPU plugin; touching
# the TPU backend here could wedge the axon tunnel for the whole session).
jax.config.update("jax_platforms", "cpu")


def main(argv):
    pid, nproc, port = int(argv[0]), int(argv[1]), int(argv[2])
    n_local = 8 // nproc
    jax.config.update("jax_num_cpu_devices", n_local)
    if nproc > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc,
            process_id=pid,
        )
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 8, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    import optax

    from fast_artistic_videos_tpu.models import arch_dsl, stylizer
    from fast_artistic_videos_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh(8)
    spec = arch_dsl.parse_arch("c3s1-8,d16,R16,U2,c3s1-3", in_channels=3)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    rep = pmesh.replicated(mesh)
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)

    # Global row i is a pure function of i — every process can synthesize
    # its own shard without any cross-process data exchange.
    def row(i):
        r = np.random.default_rng(100 + i)
        return r.random((16, 16, 3)).astype(np.float32)

    lo = pid * (8 // nproc)
    local = np.stack([row(i) for i in range(lo, lo + 8 // nproc)])
    target = np.stack([np.roll(r, 2, axis=1) for r in local])

    batch = pmesh.put_global_batch(mesh, {"x": local, "y": target})
    assert len(batch["x"].sharding.device_set) == 8

    def loss_fn(p, x, y):
        out = stylizer.apply(p, spec, x)
        return jnp.mean((out - y) ** 2)

    @jax.jit
    def step(p, s, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    params, opt_state, loss = step(params, opt_state, batch["x"], batch["y"])
    loss32 = np.float32(loss)
    leaves = jax.tree_util.tree_leaves(params)
    checksum = np.float64(sum(float(jnp.sum(jnp.abs(l))) for l in leaves))
    print(json.dumps({
        "pid": pid,
        "loss_bits": int(loss32.view(np.uint32)),
        "loss": float(loss32),
        "checksum": checksum,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
