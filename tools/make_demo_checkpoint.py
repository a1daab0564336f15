"""Train the bundled zero-download demo checkpoint, reproducibly.

The demo model (assets/demo-candy-video.npz) must actually STYLIZE — the
round-2 checkpoint (random-VGG loss) produced saturated output, flagged by
the round-2 review. This script trains the canonical video arch on a
procedural image corpus (flow.train.random_texture_image) against the
bundled candy style fixture with the deterministic in-tree rgb-pyramid
loss (train/losses.py extract_features_rgb_pyramid: multi-scale color
covariance + oriented-edge grams), then prints the quality metrics the CI
gate asserts (tests/test_cli_stylize.py).

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/make_demo_checkpoint.py \
      [--iterations 3000] [--out fast_artistic_videos_tpu/assets/demo-candy-video.npz]
"""

import argparse
import os
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from fast_artistic_videos_tpu.core import io as core_io
from fast_artistic_videos_tpu.core.config import TrainOptions
from fast_artistic_videos_tpu.flow.train import random_texture_image
from fast_artistic_videos_tpu.models import registry


def make_corpus(path: str, n_train: int = 240, n_val: int = 16,
                size: int = 256, seed: int = 0) -> None:
    import h5py

    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        for group, n in (("train2014", n_train), ("val2014", n_val)):
            d = f.create_dataset(f"/{group}/images", (n, 3, size, size),
                                 dtype=np.uint8)
            for i in range(n):
                img = random_texture_image(rng, size, size)
                d[i] = (img.transpose(2, 0, 1) * 255).astype(np.uint8)


def demo_quality(model_path: str):
    """The CI gate's metrics: stylize a fixed synthetic photo with zero
    prior and report RGB-gram distance to the candy fixture + change."""
    from fast_artistic_videos_tpu.models import checkpoint, stylizer
    from fast_artistic_videos_tpu.ops.gram import gram_matrix
    from fast_artistic_videos_tpu.ops.preprocess import (vgg_deprocess,
                                                         vgg_preprocess)

    spec, params, _ = checkpoint.load_model(model_path)
    style = core_io.load_image(registry.style_fixture("candy")).astype(np.float32)
    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    content = np.stack([
        0.3 + 0.5 * xx / w,
        0.4 + 0.4 * yy / h,
        0.5 + 0.3 * np.sin(xx / 17.0) * np.cos(yy / 13.0),
    ], -1).clip(0, 1)
    content[20:50, 30:70] = np.array([0.15, 0.35, 0.12])
    content[60:85, 80:115] = np.array([0.7, 0.6, 0.2])

    c = vgg_preprocess(jnp.asarray(content))[None]
    x = jnp.concatenate([c, jnp.zeros_like(c), jnp.zeros((1, h, w, 1))], -1)
    y = stylizer.apply(params, spec, x)
    out = np.asarray(jnp.clip(vgg_deprocess(y[0]), 0, 1))

    def gd(a, b):
        return float(np.linalg.norm(
            np.asarray(gram_matrix(jnp.asarray(a)))
            - np.asarray(gram_matrix(jnp.asarray(b)))))

    stats = {
        "gram_in_to_style": gd(content, style),
        "gram_out_to_style": gd(out, style),
        "mean_abs_change": float(np.abs(out - content).mean()),
        "out_std": float(out.std()),
        "out_mean_rgb": out.mean((0, 1)).tolist(),
    }
    return stats


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iterations", type=int, default=3000)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--style_weight", type=float, default=0.3)
    p.add_argument("--content_weight", type=float, default=6.0)
    p.add_argument("--pixel_weight", type=float, default=50.0)
    p.add_argument("--lr", default="1e-3")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval_only", default="",
                   help="skip training; report quality of this checkpoint")
    p.add_argument("--out", default=os.path.join(
        "fast_artistic_videos_tpu", "assets", "demo-candy-video.npz"))
    args = p.parse_args()

    if args.eval_only:
        for k, v in demo_quality(args.eval_only).items():
            print(f"{k}: {v}")
        return 0

    from fast_artistic_videos_tpu.train.trainer import Trainer

    tmp = tempfile.mkdtemp(prefix="demo_train_")
    h5 = os.path.join(tmp, "corpus.h5")
    print("generating procedural corpus ->", h5, flush=True)
    make_corpus(h5, size=args.size, seed=args.seed)

    opt = TrainOptions(
        h5_file=h5,
        data_mix="shift:1,zoom_out:1",
        train_img_size=f"{args.size}:{args.size}",
        single_image_until=max(200, args.iterations // 6),
        loss_network="rgb-pyramid",
        style_image=registry.style_fixture("candy"),
        style_layers="0,1,2,3",
        style_weights=",".join([str(args.style_weight)] * 4),
        content_layers="1",
        content_weights=str(args.content_weight),
        pixel_loss_weight=args.pixel_weight,
        num_iterations=args.iterations,
        batch_size=args.batch_size,
        learning_rate=args.lr,
        dtype="bfloat16",
        checkpoint_name=os.path.join(tmp, "demo"),
        checkpoint_every=500,
        images_every=10 ** 9,
        num_val_batches=2,
        print_every=100,
        seed=args.seed,
    )
    trainer = Trainer(opt)
    trainer.train()
    from fast_artistic_videos_tpu.models import checkpoint as model_ckpt

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    model_ckpt.save_model(args.out, trainer.params, {
        "arch": opt.arch,
        "in_channels": 7,
        "padding_type": opt.padding_type,
        "use_instance_norm": opt.use_instance_norm,
        "tanh_constant": opt.tanh_constant,
        "iter": trainer.iteration,
        "loss_network": "rgb-pyramid",
    })
    print("saved", args.out, flush=True)
    for k, v in demo_quality(args.out).items():
        print(f"{k}: {v}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
