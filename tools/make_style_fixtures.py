"""Generate the bundled procedural style-image fixtures.

The reference ships six style JPEGs (candy, mosaic, picasso, schlief,
scream, WomenHat — /root/reference/styles/) that serve as training/eval
inputs. Those artworks cannot be redistributed or downloaded in this
environment, so the framework bundles procedural stand-ins with loosely
matching visual statistics (palette + stroke structure), generated
deterministically by this script into fast_artistic_videos_tpu/assets/styles/.

Re-run: PYTHONPATH=/root/repo python tools/make_style_fixtures.py
"""

import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "fast_artistic_videos_tpu", "assets", "styles")
SIZE = 384


def _grid(n=SIZE):
    ys, xs = np.mgrid[0:n, 0:n].astype(np.float32) / n
    return ys, xs


def _smooth_noise(rng, cells, n=SIZE, ch=1):
    import jax
    import jax.numpy as jnp

    coarse = rng.normal(size=(cells, cells, ch)).astype(np.float32)
    out = np.asarray(jax.image.resize(jnp.asarray(coarse), (n, n, ch), "bicubic"))
    return out[..., 0] if ch == 1 else out


def candy(rng):
    """Bright swirling color bands."""
    ys, xs = _grid()
    a = _smooth_noise(rng, 5) * 2.5
    b = _smooth_noise(rng, 7) * 2.5
    phase = np.sin(9 * xs + 4 * a) + np.cos(11 * ys + 4 * b)
    img = np.stack([
        0.5 + 0.5 * np.sin(3.0 * phase),
        0.5 + 0.5 * np.sin(3.0 * phase + 2.1),
        0.5 + 0.5 * np.sin(3.0 * phase + 4.2),
    ], -1)
    return 0.15 + 0.85 * img


def mosaic(rng):
    """Voronoi tiles with dark grout."""
    ys, xs = _grid()
    pts = rng.random((160, 2)).astype(np.float32)
    cols = 0.2 + 0.8 * rng.random((160, 3)).astype(np.float32)
    d = (xs[..., None] - pts[None, None, :, 0]) ** 2 + \
        (ys[..., None] - pts[None, None, :, 1]) ** 2
    order = np.argsort(d, axis=-1)
    nearest = order[..., 0]
    img = cols[nearest]
    d1 = np.take_along_axis(d, order[..., :1], -1)[..., 0]
    d2 = np.take_along_axis(d, order[..., 1:2], -1)[..., 0]
    grout = (np.sqrt(d2) - np.sqrt(d1)) < 0.004
    img[grout] *= 0.15
    return img


def picasso(rng):
    """Angular overlapping polygons, muted earth palette."""
    ys, xs = _grid()
    img = np.full((SIZE, SIZE, 3), 0.55, np.float32)
    palette = np.array([[0.72, 0.55, 0.35], [0.35, 0.42, 0.55],
                        [0.75, 0.68, 0.55], [0.45, 0.30, 0.28],
                        [0.60, 0.60, 0.50], [0.25, 0.25, 0.30]], np.float32)
    for k in range(26):
        nrm = rng.normal(size=2)
        nrm /= np.linalg.norm(nrm)
        off = rng.uniform(0.15, 0.85)
        half = (xs - off) * nrm[0] + (ys - rng.uniform(0.15, 0.85)) * nrm[1] > 0
        color = palette[k % len(palette)] * rng.uniform(0.7, 1.2)
        img[half] = 0.55 * img[half] + 0.45 * color.clip(0, 1)
    return img


def schlief(rng):
    """Marbled paint: domain-warped multi-octave noise."""
    ys, xs = _grid()
    wx = _smooth_noise(rng, 4) * 0.35
    wy = _smooth_noise(rng, 4) * 0.35
    t = np.sin(14 * (xs + wx)) + np.sin(14 * (ys + wy)) + _smooth_noise(rng, 12)
    img = np.stack([
        0.5 + 0.45 * np.tanh(t),
        0.45 + 0.40 * np.tanh(t + 0.8),
        0.35 + 0.35 * np.tanh(-t + 0.4),
    ], -1)
    return img


def scream(rng):
    """Wavy horizontal strokes, orange sky over dark blue water."""
    ys, xs = _grid()
    warp = 0.12 * np.sin(6 * xs + 3 * _smooth_noise(rng, 5))
    band = ys + warp
    sky = np.clip(1.6 - 2.2 * band, 0, 1)
    stroke = 0.5 + 0.5 * np.sin(60 * band + 6 * _smooth_noise(rng, 8))
    img = np.stack([
        0.15 + 0.75 * sky + 0.10 * stroke,
        0.12 + 0.35 * sky + 0.12 * stroke * (1 - sky),
        0.30 * (1 - sky) + 0.10 * stroke,
    ], -1)
    return np.clip(img, 0, 1)


def women_hat(rng):
    """Soft pastel blobs with gentle outlines."""
    ys, xs = _grid()
    img = np.full((SIZE, SIZE, 3), 0.9, np.float32)
    palette = np.array([[0.95, 0.75, 0.70], [0.70, 0.85, 0.80],
                        [0.95, 0.90, 0.60], [0.75, 0.70, 0.85],
                        [0.90, 0.80, 0.85]], np.float32)
    for k in range(18):
        cy, cx = rng.uniform(0.1, 0.9, 2)
        ry, rx = rng.uniform(0.05, 0.28, 2)
        r2 = ((xs - cx) / rx) ** 2 + ((ys - cy) / ry) ** 2
        blob = np.exp(-np.maximum(r2 - 1, 0) * 30)[..., None]
        img = img * (1 - 0.85 * blob) + palette[k % len(palette)] * 0.85 * blob
        edge = ((r2 > 0.9) & (r2 < 1.1))[..., None] * np.ones(3)
        img = np.where(edge > 0, img * 0.75, img)
    return np.clip(img, 0, 1)


STYLES = {
    "candy": candy, "mosaic": mosaic, "picasso": picasso,
    "schlief": schlief, "scream": scream, "WomenHat": women_hat,
}


def main():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from fast_artistic_videos_tpu.core import io

    os.makedirs(OUT, exist_ok=True)
    for i, (name, fn) in enumerate(sorted(STYLES.items())):
        rng = np.random.default_rng(100 + i)
        img = np.clip(fn(rng), 0.0, 1.0).astype(np.float32)
        path = os.path.join(OUT, f"{name}.png")
        io.save_image(path, img)
        print(f"wrote {path} ({os.path.getsize(path)//1024} KB)")


if __name__ == "__main__":
    main()
