"""CLI: pack frame/flow/certainty tuples into the training HDF5 — the
equivalent of video_dataset/make_video_dataset.py.

Layout (identical to the reference, :70-80, consumed by
train.data.H5VideoSource):
  /{train,val}/frames1  (N, seq, 3, H, W)  uint8
  /{train,val}/flow     (N, seq-1, 2, H, W) float32   (u, v) channels
  /{train,val}/cert     (N, seq-1, H, W)   uint8

Tuples are discovered from ``s_<i>_<j>.flo`` markers in each scene's flow
dir (sequence starts, make_video_dataset.py:56-62), shuffled, resized, and
split train/val.
"""

from __future__ import annotations

import argparse
import os
import random
import re

import numpy as np

from ..core import io

_START = re.compile(r"^s_(\d+)_(\d+)\.flo$")


def _resize(img: np.ndarray, h: int, w: int) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    if img.shape[:2] == (h, w):
        return img
    return np.asarray(
        jax.image.resize(jnp.asarray(img), (h, w) + img.shape[2:], method="bilinear")
    )


def collect_tuples(input_dir: str):
    tuples = []
    for scene in sorted(os.listdir(input_dir)):
        flow_dir = os.path.join(input_dir, scene, "flow")
        if not os.path.isdir(flow_dir):
            continue
        for name in os.listdir(flow_dir):
            m = _START.match(name)
            if m and int(m.group(1)) < int(m.group(2)):
                tuples.append((os.path.join(input_dir, scene), int(m.group(1))))
    return tuples


def load_tuple(scene_dir: str, start: int, seq: int, h: int, w: int):
    frames, flows, certs = [], [], []
    for k in range(seq):
        idx = start + k
        frame = io.load_image(os.path.join(scene_dir, f"frame_{idx:05d}.ppm"))
        fh, fw = frame.shape[:2]
        frames.append(_resize(frame, h, w))
        if k < seq - 1:
            prefix = "s_" if k == 0 else ""
            flow = io.read_flo(
                os.path.join(scene_dir, "flow", f"{prefix}{idx}_{idx+1}.flo")
            )
            # resize + rescale flow to the target resolution
            flow = _resize(flow, h, w)
            flow[..., 0] *= w / fw
            flow[..., 1] *= h / fh
            flows.append(flow)
            cert = io.load_image(
                os.path.join(scene_dir, "flow", f"reliable_{prefix}{idx}_{idx+1}.pgm"),
                num_channels=1,
            )[..., 0]
            certs.append(_resize(cert[..., None], h, w)[..., 0])
    return frames, flows, certs


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_file", default="video.h5")
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=384)
    p.add_argument("--sequence_length", type=int, default=2)
    p.add_argument("--max_images", type=int, default=-1)
    p.add_argument("--val_fraction", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import h5py

    tuples = collect_tuples(args.input_dir)
    random.Random(args.seed).shuffle(tuples)
    if args.max_images > 0:
        tuples = tuples[: args.max_images]
    if not tuples:
        raise SystemExit("no s_*.flo sequence markers found")
    n_val = max(1, int(len(tuples) * args.val_fraction)) if len(tuples) > 1 else 0
    splits = {"train": tuples[n_val:], "val": tuples[:n_val]}
    seq, h, w = args.sequence_length, args.height, args.width

    with h5py.File(args.output_file, "w") as f:
        for split, items in splits.items():
            if not items:
                continue
            n = len(items)
            d_frames = f.create_dataset(f"/{split}/frames1", (n, seq, 3, h, w), np.uint8)
            d_flow = f.create_dataset(f"/{split}/flow", (n, seq - 1, 2, h, w), np.float32)
            d_cert = f.create_dataset(f"/{split}/cert", (n, seq - 1, h, w), np.uint8)
            for idx, (scene, start) in enumerate(items):
                frames, flows, certs = load_tuple(scene, start, seq, h, w)
                d_frames[idx] = np.stack(
                    [np.clip(fr * 255, 0, 255).astype(np.uint8).transpose(2, 0, 1)
                     for fr in frames]
                )
                d_flow[idx] = np.stack([fl.transpose(2, 0, 1) for fl in flows])
                d_cert[idx] = np.stack(
                    [np.clip(c * 255, 0, 255).astype(np.uint8) for c in certs]
                )
            print(f"{split}: {n} tuples")
    print(f"wrote {args.output_file}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
