"""CLI: train a video style-transfer model — flag parity with
``th train_video.lua`` (train_video.lua:20-78).

Example:
  python -m fast_artistic_videos_tpu.cli.train \\
      --h5_file coco.h5 --h5_file_video video.h5 \\
      --style_image styles/candy.jpg --loss_network vgg16.npz \\
      --image_model candy-image.npz --checkpoint_name out/candy
"""

from __future__ import annotations

import argparse
import dataclasses

from ..core.config import TrainOptions
from ..models import checkpoint as model_ckpt
from ..train.trainer import Trainer


def add_train_flags(p: argparse.ArgumentParser) -> None:
    defaults = TrainOptions()
    for f in dataclasses.fields(TrainOptions):
        flag = "--" + f.name
        default = getattr(defaults, f.name)
        if isinstance(default, bool):
            p.add_argument(flag, type=lambda s: s not in ("0", "false", "False"),
                           default=default)
        else:
            p.add_argument(flag, type=type(default), default=default)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_train_flags(p)
    args = p.parse_args(argv)
    kw = {f.name: getattr(args, f.name) for f in dataclasses.fields(TrainOptions)}
    opt = TrainOptions(**kw)

    vgg_params = None
    if opt.loss_network and opt.loss_network != "rgb-pyramid":
        from ..video.evaluation import load_vgg_params

        vgg_params = load_vgg_params(opt.loss_network)

    image_model = None
    if opt.image_model and opt.image_model != "self":
        spec_i, params_i, _ = model_ckpt.load_model(opt.image_model)
        image_model = (spec_i, params_i)

    trainer = Trainer(opt, vgg_params=vgg_params, image_model=image_model)
    if opt.resume_from_checkpoint:
        trainer.restore_train_state(opt.resume_from_checkpoint)
    trainer.train()
    trainer.save_checkpoint()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
