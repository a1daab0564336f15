"""CLI: pack a directory of images into the MS-COCO-style single-image HDF5
used by the synthetic training sources (/{train2014,val2014}/images
(N, 3, H, W) uint8). The reference delegates this to fast-neural-style's
make_style_dataset.py; this makes the framework self-contained.
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np

from ..core import io

EXTS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp")


def _resize(img: np.ndarray, h: int, w: int) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    if img.shape[:2] == (h, w):
        return img
    return np.asarray(
        jax.image.resize(jnp.asarray(img), (h, w, img.shape[2]), method="bilinear")
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_file", default="images.h5")
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--max_images", type=int, default=-1)
    p.add_argument("--val_fraction", type=float, default=0.02)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import h5py

    files = [
        os.path.join(root, f)
        for root, _, names in os.walk(args.input_dir)
        for f in names
        if f.lower().endswith(EXTS) and not f.startswith(".")
    ]
    random.Random(args.seed).shuffle(files)
    if args.max_images > 0:
        files = files[: args.max_images]
    if not files:
        raise SystemExit(f"no images found under {args.input_dir}")
    n_val = max(1, int(len(files) * args.val_fraction)) if len(files) > 1 else 0
    splits = {"train2014": files[n_val:], "val2014": files[:n_val]}

    with h5py.File(args.output_file, "w") as f:
        for split, items in splits.items():
            if not items:
                continue
            d = f.create_dataset(
                f"/{split}/images", (len(items), 3, args.height, args.width), np.uint8
            )
            for i, path in enumerate(items):
                img = _resize(io.load_image(path), args.height, args.width)
                d[i] = np.clip(img * 255, 0, 255).astype(np.uint8).transpose(2, 0, 1)
            print(f"{split}: {len(items)} images")
    print(f"wrote {args.output_file}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
