import jax
import jax.numpy as jnp
import numpy as np

from fast_artistic_videos_tpu.parallel import mesh as pmesh


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8  # conftest forces the virtual CPU mesh


def test_batch_sharding_roundtrip(rng):
    m = pmesh.make_mesh(8)
    x = rng.random((16, 4, 4, 3)).astype(np.float32)
    xs = pmesh.shard_batch(m, jnp.asarray(x))
    assert len(xs.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_data_parallel_train_matches_single_device():
    """Same batch, 1-device vs 8-device mesh: identical loss and grads —
    the multi-device contract (SURVEY.md §4 'multi-device' tests)."""
    from fast_artistic_videos_tpu.models import arch_dsl, stylizer
    from fast_artistic_videos_tpu.ops import warp
    from fast_artistic_videos_tpu.train import losses

    rng = np.random.default_rng(0)
    spec = arch_dsl.parse_arch("c3s1-4,d8,R8,U2,c3s1-3", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    imgs = rng.normal(size=(8, 16, 16, 7)).astype(np.float32)
    target = rng.normal(size=(8, 16, 16, 3)).astype(np.float32)

    def loss_fn(p, x, t):
        out = stylizer.apply(p, spec, x)
        return losses.pixel_loss("L2", out, t)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    # single device
    l1, g1 = grad_fn(params, jnp.asarray(imgs), jnp.asarray(target))

    # 8-device data parallel: shard batch, replicate params
    m = pmesh.make_mesh(8)
    xs = pmesh.shard_batch(m, jnp.asarray(imgs))
    ts = pmesh.shard_batch(m, jnp.asarray(target))
    ps = pmesh.replicate(m, params)
    l8, g8 = grad_fn(ps, xs, ts)

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    # cross-device psum reduction order shifts float32 results slightly
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-4)


def test_trainer_multidevice_smoke(tmp_path):
    """Full trainer step on an 8-way data mesh."""
    import h5py

    from fast_artistic_videos_tpu.core.config import TrainOptions
    from fast_artistic_videos_tpu.train.trainer import Trainer

    path = str(tmp_path / "coco.h5")
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        for split in ("train2014", "val2014"):
            f.create_dataset(
                f"/{split}/images",
                data=rng.integers(0, 256, size=(16, 3, 16, 16), dtype=np.uint8),
            )
    opt = TrainOptions(
        arch="c3s1-4,d8,R8,U2,c3s1-3",
        h5_file=path,
        data_mix="shift:1",
        train_img_size="16:16",
        batch_size=8,
        num_iterations=2,
        percep_loss_weight=0.0,
        images_every=0,
        checkpoint_every=10**9,
        print_every=10**9,
        num_data_devices=8,
    )
    tr = Trainer(opt)
    tr.train(log_fn=lambda *a: None)
    assert tr.iteration == 2
    assert all(np.isfinite(x) for x in jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda a: float(jnp.sum(a)), tr.params)))


def test_spatial_sharded_stylizer_matches_single_device(rng):
    """GSPMD height-sharding of the canonical net: XLA inserts the conv halo
    exchanges; results must match the unsharded forward."""
    from fast_artistic_videos_tpu.models import arch_dsl, stylizer
    from fast_artistic_videos_tpu.parallel import spatial

    spec = arch_dsl.parse_arch("c3s1-8,d16,R16,U2,c3s1-3", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.random((1, 64, 64, 7)), jnp.float32)
    ref = np.asarray(stylizer.apply(params, spec, x))

    sp = spatial.SpatialStylizer(
        lambda p, a: stylizer.apply(p, spec, a), params,
        mesh=spatial.spatial_mesh(8),
    )
    out = sp(x)
    assert len(out.sharding.device_set) == 8  # stayed distributed
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3)
