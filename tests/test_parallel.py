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


def test_2d_mesh_batch_space_training_matches_single_device(rng):
    """Joint (data x space) sharding: batch over 'data', frame height over
    'space'. Loss and grads must match the unsharded computation — XLA
    inserts both the conv halo exchanges and the two-axis gradient psum."""
    from fast_artistic_videos_tpu.models import arch_dsl, stylizer
    from fast_artistic_videos_tpu.train import losses

    spec = arch_dsl.parse_arch("c3s1-4,d8,R8,U2,c3s1-3", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    imgs = rng.normal(size=(4, 32, 16, 7)).astype(np.float32)
    target = rng.normal(size=(4, 32, 16, 3)).astype(np.float32)

    def loss_fn(p, x, t):
        out = stylizer.apply(p, spec, x)
        return losses.pixel_loss("L2", out, t)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    l1, g1 = grad_fn(params, jnp.asarray(imgs), jnp.asarray(target))

    m = pmesh.make_mesh_2d(data=4, space=2)
    xs = pmesh.shard_batch_space(m, jnp.asarray(imgs))
    ts = pmesh.shard_batch_space(m, jnp.asarray(target))
    ps = pmesh.replicate(m, params)
    l2, g2 = grad_fn(ps, xs, ts)

    assert len(xs.sharding.device_set) == 8
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    # two collective axes -> larger f32 reduction-order drift than pure DP
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-3)


def test_flow_stylize_two_device_pipeline(rng):
    """Flow stage pinned to device 1, stylizer on device 0 — the in-process
    analog of the reference's concurrent background flow job
    (stylizeVideo_deepflow.sh:80-82), exercised across two mesh devices.

    Asserts (a) each stage's outputs live on its assigned device, (b) the
    two-device pipeline is numerically identical to the single-device run,
    and (c) dispatch is asynchronous: enqueueing a stylizer step while the
    next pair's flow is in flight returns well before the synced result —
    i.e. the stages actually overlap in the runtime's queues."""
    import time

    from fast_artistic_videos_tpu.flow import estimator as fest
    from fast_artistic_videos_tpu.flow.provider import StreamingFlowProvider
    from fast_artistic_videos_tpu.models import arch_dsl, stylizer
    from fast_artistic_videos_tpu.ops import warp

    dev0, dev1 = jax.devices()[0], jax.devices()[1]
    fparams = fest.init_params(jax.random.PRNGKey(1))
    spec = arch_dsl.parse_arch("c3s1-8,d16,R16,U2,c3s1-3", in_channels=7)
    sparams = jax.device_put(
        stylizer.init_params(jax.random.PRNGKey(0), spec), dev0)

    def stylize(frame, prior_src, flow, cert):
        prior = warp.bilinear_warp(prior_src, flow) * cert[..., None]
        x = jnp.concatenate([frame, prior, cert[..., None]], -1)[None]
        return stylizer.apply(sparams, spec, x)[0]

    _jst = jax.jit(stylize)

    def jstylize(*xs):  # commit inputs to dev0 (jit(device=) is deprecated)
        return _jst(*(jax.device_put(x, dev0) for x in xs))

    frames = [rng.random((64, 64, 3)).astype(np.float32) for _ in range(4)]

    def run(device):
        prov = StreamingFlowProvider(fparams, use_structure=False,
                                     device=device)
        run.last_provider = prov
        outs, flows = [], []
        prev = jnp.zeros((64, 64, 3), jnp.float32)
        for f in frames:
            fc = prov(f)
            if fc is None:
                flow = jnp.zeros((64, 64, 2), jnp.float32)
                cert = jnp.zeros((64, 64), jnp.float32)
            else:
                flow, cert = fc
            flows.append(flow)
            prev = jstylize(jnp.asarray(f), prev, jnp.asarray(flow),
                            jnp.asarray(cert))
            outs.append(prev)
        return outs, flows

    # warm the compile caches, then the measured single-device reference
    run(None)
    ref_outs, _ = run(None)
    outs, flows = run(dev1)

    # (a) stage placement
    assert all(dev1 in f.sharding.device_set for f in flows[1:])
    assert all(dev0 in o.sharding.device_set for o in outs)
    # (b) numerics: identical math, different queues
    for a, b in zip(outs, ref_outs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    # (c) async overlap: on the warmed provider (compiles cached, band
    # readback keyed off the previous pair), enqueue the next flow pair on
    # dev1 and a stylize on dev0 back-to-back; the dispatch must return
    # before either completes.
    prov = run.last_provider  # device=dev1, steady state
    # warm the EXACT timed calls (a shifted flow-band bucket would compile
    # inside the timed region and serialize the measurement)
    fc = prov(frames[0])
    out = jstylize(jnp.asarray(frames[0]), outs[-1], *map(jnp.asarray, fc))
    float(jnp.sum(out)), float(jnp.sum(fc[0]))
    # host scheduling on the 1-core CI box is noisy: pass if ANY of a few
    # rounds shows dispatch returning well before the synced completion
    ratios = []
    for _ in range(3):
        t0 = time.monotonic()
        fc = prov(frames[0])
        out = jstylize(jnp.asarray(frames[0]), outs[-1], *map(jnp.asarray, fc))
        t_dispatch = time.monotonic() - t0
        float(jnp.sum(out)), float(jnp.sum(fc[0]))  # force completion
        t_total = time.monotonic() - t0
        ratios.append(t_dispatch / t_total)
        if t_dispatch < 0.8 * t_total:
            break
    else:
        raise AssertionError(
            f"dispatch/total ratios {ratios} — stages serialized instead "
            "of overlapping")


def test_spatial_canonical_reduced(rng):
    """Canonical arch, 8-way height sharding — the configuration that
    matters for multi-chip single-stream inference — at a reduced shape so
    the GSPMD partitioning compile fits the default suite (~49 s on this
    host; the 1080p-like shape below costs the same compile but is gated
    for history). Round-2 review flagged that only a toy arch ran
    ungated."""
    from fast_artistic_videos_tpu.models import arch_dsl, stylizer
    from fast_artistic_videos_tpu.parallel import spatial

    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.random((1, 256, 96, 7)), jnp.float32)
    ref = np.asarray(stylizer.apply(params, spec, x))
    sp = spatial.SpatialStylizer(
        lambda p, a: stylizer.apply(p, spec, a), params,
        mesh=spatial.spatial_mesh(8),
    )
    out = sp(x)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3)


def test_spatial_canonical_1080p_like(rng):
    """Canonical arch, 8-way height sharding at a 1080p-like shape.

    Gated behind FAV_SLOW_TESTS=1: the GSPMD partitioning compile of the
    full canonical net takes ~2 min on the 1-core CPU host. Last verified
    max abs deviation vs the single-device forward: 4.9e-4."""
    import os

    if not os.environ.get("FAV_SLOW_TESTS"):
        import pytest

        pytest.skip("set FAV_SLOW_TESTS=1 to run (GSPMD compile ~2 min on CPU)")
    from fast_artistic_videos_tpu.models import arch_dsl, stylizer
    from fast_artistic_videos_tpu.parallel import spatial

    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.random((1, 1088, 192, 7)), jnp.float32)
    ref = np.asarray(stylizer.apply(params, spec, x))
    sp = spatial.SpatialStylizer(
        lambda p, a: stylizer.apply(p, spec, a), params,
        mesh=spatial.spatial_mesh(8),
    )
    out = sp(x)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3)


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


def test_elastic_failure_drill_restore_on_different_mesh(tmp_path):
    """Mid-epoch failure drill (SURVEY §5 elasticity; ROADMAP 'elastic
    drills'): train on an 8-device data mesh with checkpoints every 3
    iterations, 'lose' the process at the UNCHECKPOINTED iteration 4, and
    restore the latest saved state

      (a) onto the SAME 8-device mesh  -> continue to 6: params must be
          BIT-IDENTICAL to an uninterrupted 8-device 6-iteration run;
      (b) onto a SMALLER 2-device mesh -> continue to 6: training must
          CONTINUE (loss continuity) with params tracking the uninterrupted
          run to a calibrated tolerance. Bit-identity is not the contract
          here: a 2-device mesh reduces gradients in a different order and
          XLA:CPU picks different per-shard conv schedules, and adam
          amplifies that float noise per step. Measured 2026-08: a FRESH
          uninterrupted 2-device run drifts up to 4e-3 abs from the
          8-device run by iteration 6; the restored run tracked to 1.1e-3.

    The reference has no analog — its continue_with restart drops optimizer
    state entirely (README.md:270)."""
    import h5py

    from fast_artistic_videos_tpu.core.config import TrainOptions
    from fast_artistic_videos_tpu.train.trainer import Trainer

    path = str(tmp_path / "coco.h5")
    rng = np.random.default_rng(3)
    with h5py.File(path, "w") as f:
        for split in ("train2014", "val2014"):
            f.create_dataset(
                f"/{split}/images",
                data=rng.integers(0, 256, size=(16, 3, 32, 32), dtype=np.uint8),
            )

    def opts(name, iters, ndev, ckpt_every=3):
        return TrainOptions(
            arch="c3s1-4,d8,R8,U2,c3s1-3",
            h5_file=path,
            data_mix="shift:1,zoom_out:1",
            train_img_size="32:32",
            batch_size=8,
            num_iterations=iters,
            percep_loss_weight=0.0,
            images_every=0,
            checkpoint_every=ckpt_every,
            print_every=10**9,
            num_data_devices=ndev,
            checkpoint_name=str(tmp_path / name),
        )

    # Uninterrupted reference run (8-device mesh). Same checkpoint cadence
    # as the failing run: the periodic validation sweep consumes RNG, so a
    # never-checkpointing run follows a different data/key stream.
    tr_ref = Trainer(opts("ref", 6, 8))
    tr_ref.train(log_fn=lambda *a: None)
    ref_leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(tr_ref.params)]

    # The failing run: dies at iteration 4; last checkpoint is iteration 3.
    tr_fail = Trainer(opts("fail", 4, 8))
    tr_fail.train(log_fn=lambda *a: None)
    state = str(tmp_path / "fail") + "_state"

    # (a) same-size restore: bit identity.
    tr_a = Trainer(opts("resume_a", 6, 8))
    tr_a.restore_train_state(state)
    assert tr_a.iteration == 3  # iteration 4 was lost, as designed
    tr_a.train(log_fn=lambda *a: None)
    for a, b in zip(ref_leaves, jax.tree_util.tree_leaves(tr_a.params)):
        np.testing.assert_array_equal(a, np.asarray(b))

    # (b) smaller-mesh restore: elastic shrink 8 -> 2 devices.
    tr_b = Trainer(opts("resume_b", 6, 2))
    tr_b.restore_train_state(state)
    assert tr_b.iteration == 3
    tr_b.train(log_fn=lambda *a: None)
    for a, b in zip(ref_leaves, jax.tree_util.tree_leaves(tr_b.params)):
        b = np.asarray(b)
        assert np.isfinite(b).all()
        np.testing.assert_allclose(a, b, atol=1e-2)
