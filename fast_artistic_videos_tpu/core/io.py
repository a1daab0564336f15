"""File codecs: Middlebury .flo, PGM/PPM (netpbm), and general images.

Format parity targets (reference: manuelruder/fast-artistic-videos):
  * .flo     — magic float 202021.25, int32 width, int32 height, then
               interleaved float32 (u, v) pairs in row-major order
               (reference readers: flowFileLoader.lua:14-34,
               consistencyChecker/consistencyChecker.cpp:16-36).
  * .pgm     — binary P5, maxval 255, as written by the reference
               consistency checker (CMatrix.writeToPGM).
  * .ppm     — binary P6, maxval 255, as produced by ffmpeg frame dumps.

Flow arrays here are (H, W, 2) float32 with channel 0 = u = dx (horizontal
pixel offset) and channel 1 = v = dy (vertical) — i.e. the on-disk order.
The reference swaps to (y, x)-first internally; we do not.
"""

from __future__ import annotations

import os
import re
import struct
from typing import Tuple

import numpy as np

FLO_MAGIC = 202021.25
_FLO_MAGIC_BYTES = struct.pack("<f", FLO_MAGIC)


# ---------------------------------------------------------------------------
# Middlebury .flo
# ---------------------------------------------------------------------------

def read_flo(path: str) -> np.ndarray:
    """Read a Middlebury .flo file into an (H, W, 2) float32 array (dx, dy)."""
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _FLO_MAGIC_BYTES:
            raise ValueError(f"{path}: bad .flo magic {magic!r}")
        w, h = struct.unpack("<ii", f.read(8))
        if w <= 0 or h <= 0 or w * h > 10**9:
            raise ValueError(f"{path}: implausible .flo size {w}x{h}")
        data = np.fromfile(f, dtype="<f4", count=2 * w * h)
    if data.size != 2 * w * h:
        raise ValueError(f"{path}: truncated .flo (got {data.size} floats)")
    return data.reshape(h, w, 2)


def write_flo(path: str, flow: np.ndarray) -> None:
    """Write an (H, W, 2) float32 (dx, dy) array as a Middlebury .flo file."""
    flow = np.asarray(flow, dtype=np.float32)
    if flow.ndim != 3 or flow.shape[2] != 2:
        raise ValueError(f"flow must be (H, W, 2), got {flow.shape}")
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        f.write(_FLO_MAGIC_BYTES)
        f.write(struct.pack("<ii", w, h))
        flow.astype("<f4").tofile(f)


# ---------------------------------------------------------------------------
# netpbm (PGM / PPM)
# ---------------------------------------------------------------------------

_PNM_HEADER = re.compile(rb"^(P[256])\s")


def _read_pnm_tokens(f, n: int):
    """Read *n* whitespace-separated ASCII tokens, skipping '#' comments."""
    tokens = []
    while len(tokens) < n:
        line = f.readline()
        if not line:
            raise ValueError("truncated netpbm header")
        line = line.split(b"#", 1)[0]
        tokens.extend(line.split())
    return tokens[:n]


def read_pnm(path: str) -> np.ndarray:
    """Read a binary or ASCII PGM/PPM. Returns uint8/uint16 (H, W) or (H, W, 3)."""
    with open(path, "rb") as f:
        magic = f.read(2)
        f.readline()  # consume rest of the magic line
        if magic not in (b"P2", b"P5", b"P6"):
            raise ValueError(f"{path}: unsupported netpbm magic {magic!r}")
        w, h, maxval = (int(t) for t in _read_pnm_tokens(f, 3))
        channels = 3 if magic == b"P6" else 1
        count = w * h * channels
        if magic == b"P2":
            data = np.array([int(t) for t in _read_pnm_tokens(f, count)])
        else:
            dtype = np.dtype(">u2") if maxval > 255 else np.uint8
            data = np.fromfile(f, dtype=dtype, count=count)
        if data.size != count:
            raise ValueError(f"{path}: truncated netpbm payload")
    arr = data.reshape((h, w) if channels == 1 else (h, w, 3))
    return arr.astype(np.uint16 if maxval > 255 else np.uint8)


def write_pgm(path: str, img: np.ndarray) -> None:
    """Write an (H, W) array as binary P5 PGM, maxval 255 (clipped/rounded)."""
    img = np.asarray(img)
    if img.ndim != 2:
        raise ValueError(f"pgm image must be (H, W), got {img.shape}")
    if img.dtype != np.uint8:
        img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    h, w = img.shape
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (w, h))
        img.tofile(f)


def write_ppm(path: str, img: np.ndarray) -> None:
    """Write an (H, W, 3) array as binary P6 PPM, maxval 255."""
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"ppm image must be (H, W, 3), got {img.shape}")
    if img.dtype != np.uint8:
        img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        img.tofile(f)


# ---------------------------------------------------------------------------
# General images (PNG/JPEG via PIL; netpbm via the raw codecs above)
# ---------------------------------------------------------------------------

def load_image(path: str, num_channels: int = 3) -> np.ndarray:
    """Load an image as float32 in [0, 1], shape (H, W, C).

    Mirrors the role of Torch ``image.load(path, C)`` in the reference
    (fast_artistic_video.lua:95) but returns HWC.
    """
    ext = os.path.splitext(path)[1].lower()
    if ext in (".pgm", ".ppm", ".pnm"):
        arr = read_pnm(path)
        maxval = 65535.0 if arr.dtype == np.uint16 else 255.0
        arr = arr.astype(np.float32) / maxval
        if arr.ndim == 2:
            arr = arr[:, :, None]
    else:
        from PIL import Image

        with Image.open(path) as im:
            if num_channels == 1:
                im = im.convert("L")
            else:
                im = im.convert("RGB")
            arr = np.asarray(im, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[:, :, None]
    if num_channels == 3 and arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)
    elif num_channels == 1 and arr.shape[2] == 3:
        arr = arr.mean(axis=2, keepdims=True)
    return arr


def load_image_u8(path: str) -> np.ndarray:
    """Load an image as uint8 (H, W, 3) without the float conversion.

    The video drivers upload frames to the device in this form — 4x less
    host->device traffic than float32 (the tunnel moves ~60 MB/s; a 1080p
    frame is 6 MB as uint8 vs 25 MB as float32) — and divide by 255 on
    device."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".pgm", ".ppm", ".pnm"):
        arr = read_pnm(path)
        if arr.dtype == np.uint16:
            arr = (arr >> 8).astype(np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        if arr.shape[2] == 1:
            arr = np.repeat(arr, 3, axis=2)
        return arr
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def save_image(path: str, img: np.ndarray) -> None:
    """Save a float [0,1] or uint8 (H, W, C) / (H, W) array; format from the
    extension. uint8 input skips the scale/round pass (the video drivers
    quantize on device so only 6 MB/frame crosses the tunnel, not 25).
    PNGs use a fast compression level — frames are written once and read
    sequentially; zlib level 1 encodes ~4x faster than the default 6 for
    ~15% larger files."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    if img.dtype == np.uint8:
        u8 = img
    else:
        u8 = np.clip(np.round(np.asarray(img, dtype=np.float32) * 255.0), 0, 255).astype(np.uint8)
    ext = os.path.splitext(path)[1].lower()
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    if ext == ".pgm":
        write_pgm(path, u8)
    elif ext == ".ppm":
        write_ppm(path, u8)
    elif ext == ".png":
        from PIL import Image

        Image.fromarray(u8).save(path, compress_level=1)
    else:
        from PIL import Image

        Image.fromarray(u8).save(path)


def image_size(path: str) -> Tuple[int, int]:
    """Return (H, W) without decoding the full image where possible."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".pgm", ".ppm", ".pnm"):
        with open(path, "rb") as f:
            magic = f.read(2)
            f.readline()
            w, h, _ = (int(t) for t in _read_pnm_tokens(f, 3))
        return h, w
    from PIL import Image

    with Image.open(path) as im:
        w, h = im.size
    return h, w
