import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_artistic_videos_tpu.core.config import TrainOptions
from fast_artistic_videos_tpu.models import vgg
from fast_artistic_videos_tpu.ops.preprocess import vgg_preprocess
from fast_artistic_videos_tpu.train import data as data_mod
from fast_artistic_videos_tpu.train import losses
from fast_artistic_videos_tpu.train.trainer import Trainer

ARCH = "c3s1-4,d8,R8,U2,c3s1-3"
HW = 32


@pytest.fixture(scope="module")
def coco_h5(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "coco.h5")
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        for split in ("train2014", "val2014"):
            imgs = rng.integers(0, 256, size=(8, 3, HW, HW), dtype=np.uint8)
            f.create_dataset(f"/{split}/images", data=imgs)
    return path


@pytest.fixture(scope="module")
def video_h5(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "video.h5")
    rng = np.random.default_rng(1)
    seq = 5
    with h5py.File(path, "w") as f:
        for split in ("train", "val"):
            f.create_dataset(
                f"/{split}/frames1",
                data=rng.integers(0, 256, size=(6, seq, 3, HW, HW), dtype=np.uint8),
            )
            f.create_dataset(
                f"/{split}/flow",
                data=rng.normal(size=(6, seq - 1, 2, HW, HW)).astype(np.float32),
            )
            f.create_dataset(
                f"/{split}/cert",
                data=rng.integers(0, 256, size=(6, seq - 1, HW, HW), dtype=np.uint8),
            )
    return path


def _opts(coco, video="", **kw):
    base = dict(
        arch=ARCH,
        h5_file=coco,
        h5_file_video=video,
        data_mix="shift:1,zoom_out:1" + (",video:2" if video else ""),
        train_img_size=f"{HW}:{HW}",
        batch_size=2,
        style_layers="4,9",
        style_weights="10.0",
        content_layers="9",
        content_weights="1.0",
        print_every=1000,
        history_every=2,
        checkpoint_every=10**9,
        images_every=0,
        num_val_batches=1,
    )
    base.update(kw)
    return TrainOptions(**base)


# ---------------------------------------------------------------------------
# data sources
# ---------------------------------------------------------------------------

def test_shift_batch_flow_is_exact(rng):
    """The shift source's flow must exactly displace frame i+1 onto frame i
    in the certain region (SURVEY.md §4: analytic ground truth)."""
    from fast_artistic_videos_tpu.ops import warp

    images = rng.random((2, HW, HW, 3)).astype(np.float32)
    imgs, flows, certs = data_mod.shift_batch(images, 2, np.random.default_rng(7))
    assert len(imgs) == 3 and len(flows) == 2
    prev, nxt = imgs[0], imgs[1]
    warped = np.asarray(warp.bilinear_warp(jnp.asarray(prev), jnp.asarray(flows[0])))
    mask = certs[0]
    err = np.abs(warped - nxt) * mask
    assert err.max() < 1e-3


def test_zoom_batch_shapes(rng):
    images = rng.random((2, HW, HW, 3)).astype(np.float32)
    imgs, flows, certs = data_mod.zoom_out_batch(images, 2, np.random.default_rng(3))
    assert all(x.shape == (2, HW, HW, 3) for x in imgs)
    assert flows[0].shape == (2, HW, HW, 2)


def test_single_image_batch(rng):
    images = rng.random((2, HW, HW, 3)).astype(np.float32)
    imgs, flows, certs = data_mod.single_image_batch(images, 1)
    np.testing.assert_array_equal(imgs[0], 0.0)
    np.testing.assert_array_equal(certs[0], 0.0)


def test_h5_sources(coco_h5, video_h5):
    src = data_mod.H5ImageSource(coco_h5, 3, out_hw=(HW, HW))
    a = src.next_images("train")
    assert a.shape == (3, HW, HW, 3) and a.max() <= 1.0
    vsrc = data_mod.H5VideoSource(video_h5, 2)
    imgs, flows, certs = vsrc.get_batch("train", 2)
    assert len(imgs) == 3 and imgs[0].shape == (2, HW, HW, 3)
    assert flows[0].shape == (2, HW, HW, 2)
    assert certs[0].shape == (2, HW, HW, 1) and certs[0].max() <= 1.0
    with pytest.raises(ValueError):
        vsrc.get_batch("train", 99)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def test_perceptual_loss_zero_for_matching_style_and_content(rng):
    params = vgg.init_params(jax.random.PRNGKey(0))
    cfg = losses.PerceptualConfig(
        style_layers=(4, 9), style_weights=(1.0, 1.0),
        content_layers=(9,), content_weights=(1.0,),
    )
    img = jnp.asarray(rng.random((1, HW, HW, 3)).astype(np.float32))
    pre = vgg_preprocess(img)
    tgts = losses.style_targets(params, pre, cfg)
    loss, per_layer = losses.perceptual_loss(params, pre, pre, tgts, cfg)
    assert float(loss) < 1e-6
    assert set(per_layer) == {"style-4", "style-9", "content-9"}


def test_perceptual_loss_batch_broadcast(rng):
    params = vgg.init_params(jax.random.PRNGKey(0))
    cfg = losses.PerceptualConfig(style_layers=(4,), style_weights=(2.0,),
                                  content_layers=(4,), content_weights=(1.0,))
    style = vgg_preprocess(jnp.asarray(rng.random((1, HW, HW, 3)).astype(np.float32)))
    tgts = losses.style_targets(params, style, cfg)
    x = vgg_preprocess(jnp.asarray(rng.random((3, HW, HW, 3)).astype(np.float32)))
    loss, _ = losses.perceptual_loss(params, x, x, tgts, cfg)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_pixel_losses():
    a = jnp.asarray([[0.0, 2.0]])
    b = jnp.asarray([[0.0, 0.0]])
    assert float(losses.pixel_loss("L2", a, b)) == 2.0
    assert float(losses.pixel_loss("L1", a, b)) == 1.0
    assert float(losses.pixel_loss("SmoothL1", a, b)) == 0.75
    with pytest.raises(ValueError):
        losses.pixel_loss("wat", a, b)


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------

def test_trainer_loss_decreases(coco_h5):
    opt = _opts(coco_h5, data_mix="shift:1", num_iterations=12, learning_rate="1e-2",
                pixel_loss_weight=50.0, percep_loss_weight=0.0)
    tr = Trainer(opt)
    logs = []
    tr.train(log_fn=logs.append)
    losses_hist = tr.train_loss_history
    assert len(losses_hist) == 6
    assert losses_hist[-1] < losses_hist[0]  # pixel loss optimizes quickly


def test_trainer_with_all_sources_and_styles(coco_h5, video_h5, tmp_path):
    opt = _opts(
        coco_h5, video_h5,
        num_iterations=4,
        style_image="/root/reference/styles/candy.jpg",
        style_image_size=64,
        num_frame_steps="0:1,2:2",
        checkpoint_name=str(tmp_path / "ckpt"),
        checkpoint_every=4,
    )
    tr = Trainer(opt)
    tr.train(log_fn=lambda *a: None)
    # multi-frame schedule kicked in (iteration 3+ uses 2 steps)
    assert (1, "self") in tr._step_cache or (1, "zeros") in tr._step_cache
    assert os.path.exists(str(tmp_path / "ckpt") + ".json")
    assert os.path.exists(str(tmp_path / "ckpt") + "_2.npz")


def test_trainer_resume(coco_h5, tmp_path):
    opt = _opts(coco_h5, data_mix="shift:1", num_iterations=3,
                checkpoint_name=str(tmp_path / "c"), checkpoint_every=3,
                percep_loss_weight=0.0)
    tr = Trainer(opt)
    tr.train(log_fn=lambda *a: None)
    p_before = jax.tree_util.tree_leaves(tr.params)[0]

    tr2 = Trainer(opt)
    tr2.restore_train_state(str(tmp_path / "c") + "_state")
    assert tr2.iteration == 3
    p_after = jax.tree_util.tree_leaves(tr2.params)[0]
    np.testing.assert_array_equal(np.asarray(p_before), np.asarray(p_after))


def test_elastic_resume_matches_uninterrupted(coco_h5, tmp_path):
    """Elastic drill: kill training at iteration 3, restore into a FRESH
    process-equivalent trainer, continue to 6 — the final params must be
    BIT-IDENTICAL to an uninterrupted 6-iteration run. Requires the
    checkpoint to carry the PRNG key, the data-RNG stream, and the dataset
    cursors, not just params/optimizer (the reference's continue_with
    restart has no such guarantee — it drops optimizer state entirely,
    README.md:270)."""
    kw = dict(data_mix="shift:1,zoom_out:1", percep_loss_weight=0.0,
              checkpoint_name=str(tmp_path / "c"), checkpoint_every=3)

    tr_full = Trainer(_opts(coco_h5, num_iterations=6, **kw))
    tr_full.train(log_fn=lambda *a: None)
    ref = jax.tree_util.tree_leaves(tr_full.params)

    tr_a = Trainer(_opts(coco_h5, num_iterations=3,
                         **{**kw, "checkpoint_name": str(tmp_path / "d")}))
    tr_a.train(log_fn=lambda *a: None)
    tr_b = Trainer(_opts(coco_h5, num_iterations=6,
                         **{**kw, "checkpoint_name": str(tmp_path / "d")}))
    tr_b.restore_train_state(str(tmp_path / "d") + "_state")
    assert tr_b.iteration == 3
    tr_b.train(log_fn=lambda *a: None)
    for a, b in zip(ref, jax.tree_util.tree_leaves(tr_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gradient_only_through_last_step(coco_h5):
    """Reference semantics: earlier unrolled steps are forward-only
    (train_video.lua:371-373). With full_bptt the gradients must differ."""
    opt = _opts(coco_h5, data_mix="shift:1", num_frame_steps="0:2",
                percep_loss_weight=0.0)
    tr = Trainer(opt)
    images = tr.image_source.next_images("train")
    imgs, flows, certs = data_mod.shift_batch(images, 2, np.random.default_rng(0))
    stacked = (np.stack(imgs), np.stack(flows), np.stack(certs))
    key = jax.random.PRNGKey(0)

    def grad_norm(full_bptt):
        tr.opt.full_bptt = full_bptt
        g = jax.grad(
            lambda p: tr._loss_fn(p, *map(jnp.asarray, stacked), key, 2, "self")[0]
        )(tr.params)
        return float(
            sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))
        )

    n_last = grad_norm(False)
    n_full = grad_norm(True)
    assert n_last > 0
    assert abs(n_last - n_full) / max(n_last, 1e-9) > 1e-4


def test_vr_data_source(rng):
    from fast_artistic_videos_tpu.train import data_vr

    images = rng.random((2, 96, 96, 3)).astype(np.float32)
    imgs, flows, certs = data_vr.vr_batch(images, np.random.default_rng(0), (256, 256))
    assert len(imgs) == 2 and len(flows) == 1 and len(certs) == 1
    strip, full = imgs
    assert full.shape == (2, 256, 256, 3)
    assert strip.shape[0] == 2 and strip.shape[3] == 3
    # one strip dimension is the 64-wide border
    assert 64 in (strip.shape[1], strip.shape[2])
    assert flows[0].shape == (2, 256, 256, 2)
    assert certs[0].shape == (2, 256, 256, 1)
    # certainty is partial: the strip covers only a border region
    assert 0.0 < certs[0].mean() < 0.9
    # vr geometry needs the reference's >=256 training size
    with pytest.raises(ValueError):
        data_vr.vr_batch(images, np.random.default_rng(0), (64, 64))


def test_trainer_with_vr_source(coco_h5):
    opt = _opts(coco_h5, data_mix="vr:1", num_iterations=2,
                train_img_size="256:256",
                percep_loss_weight=0.0)
    tr = Trainer(opt)
    tr.train(log_fn=lambda *a: None)
    assert tr.iteration == 2
    leaves = jax.tree_util.tree_leaves(tr.params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_deepdream_loss_gradient_matches_reference():
    """autodiff of deepdream_loss must reproduce DeepDreamLoss.updateGradInput:
    grad = -strength * clamp(x, -max, max) (DeepDreamLoss.lua:22-27)."""
    x = jnp.asarray(np.linspace(-200, 200, 32, dtype=np.float32))
    strength, mx = 1e-3, 100.0
    g = np.asarray(jax.grad(lambda a: losses.deepdream_loss(a, strength, mx))(x))
    ref = -strength * np.clip(np.asarray(x), -mx, mx)
    np.testing.assert_allclose(g, ref, atol=1e-6)


def test_perceptual_loss_deepdream_and_smoothl1(rng):
    params = vgg.init_params(jax.random.PRNGKey(0))
    cfg = losses.PerceptualConfig(
        style_layers=(4,), style_weights=(1.0,),
        content_layers=(4,), content_weights=(1.0,),
        deepdream_layers=(4,), deepdream_weights=(1e-5,),
        loss_type="SmoothL1",
    )
    x = vgg_preprocess(jnp.asarray(rng.random((1, HW, HW, 3)).astype(np.float32)))
    tgts = losses.style_targets(params, x, cfg)
    loss, per_layer = losses.perceptual_loss(params, x, x, tgts, cfg)
    assert "deepdream-4" in per_layer
    assert float(per_layer["deepdream-4"]) < 0  # activation maximization


def test_rgb_pyramid_extractor_and_loss():
    """The deterministic in-tree loss net (--loss_network rgb-pyramid):
    feature shapes halve per level (9 channels: RGB + finite diffs), the
    style/content losses are zero at the target and differentiable, and a
    gradient step moves an image's multi-scale gram toward the style's."""
    from fast_artistic_videos_tpu.train import losses

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 64, 48, 3)), jnp.float32) * 255 - 128
    feats = losses.extract_features_rgb_pyramid(None, x, (0, 1, 2))
    assert feats[0].shape == (1, 63, 47, 9)
    assert feats[1].shape == (1, 31, 23, 9)
    assert feats[2].shape == (1, 15, 11, 9)
    # level-0 RGB channels are the (cropped) input itself
    np.testing.assert_allclose(np.asarray(feats[0][..., :3]),
                               np.asarray(x[:, :-1, :-1]), atol=1e-6)

    cfg = losses.PerceptualConfig(
        style_layers=(0, 1, 2), style_weights=(1.0,) * 3,
        content_layers=(1,), content_weights=(1.0,),
        extractor="rgb-pyramid")
    tgts = losses.style_targets(None, x, cfg)
    loss0, _ = losses.perceptual_loss(None, x, x, tgts, cfg)
    assert float(loss0) < 1e-3  # self-distance is zero

    style = jnp.asarray(rng.random((1, 64, 48, 3)), jnp.float32) * 255 - 128
    tgts = losses.style_targets(None, style, cfg)

    def style_only(v):
        c = losses.PerceptualConfig(style_layers=(0, 1, 2),
                                    style_weights=(1.0,) * 3,
                                    content_layers=(), content_weights=(),
                                    extractor="rgb-pyramid")
        return losses.perceptual_loss(None, v, v, tgts, c)[0]

    l0 = float(style_only(x))
    g = jax.grad(style_only)(x)
    x2 = x - 1e-2 * g
    assert float(style_only(x2)) < l0  # descent direction is real
