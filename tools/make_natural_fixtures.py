"""Generate the bundled NATURAL-image eval fixtures (assets/eval/).

The flow estimator's held-out protocols (flow/train.evaluate_heldout) were
procedural-texture-only — VERDICT r3 flagged that nothing measured EPE or
mask quality on natural-image statistics. This no-egress environment has
no photo corpus, but matplotlib ships two public-domain US-government
datasets in mpl-data/sample_data:

  * grace_hopper.jpg — a real photograph (US Navy, public domain),
  * jacksboro_fault_dem.npz — a real terrain elevation model (USGS).

From these we derive six 256-px natural-statistics fixtures: three photo
crops at different scales (scene context / face / high-frequency detail)
and three hillshade renderings of the DEM under different light angles
(terrain texture: long-range correlated structure, ridges, smooth shading
— nothing a procedural-noise generator produces).

Re-run: PYTHONPATH=/root/repo python tools/make_natural_fixtures.py
"""

import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "fast_artistic_videos_tpu", "assets", "eval")
SIZE = 256


def _sample_dir():
    import matplotlib
    return os.path.join(os.path.dirname(matplotlib.__file__),
                        "mpl-data", "sample_data")


def _save(name, arr):
    from PIL import Image
    arr = np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(os.path.join(OUT, name))
    print(name, arr.shape)


def photo_fixtures():
    from PIL import Image
    im = Image.open(os.path.join(_sample_dir(), "grace_hopper.jpg"))
    full = np.asarray(im).astype(np.float32) / 255.0  # (600, 512, 3)
    # scene: whole frame downscaled to SIZE (global composition statistics)
    scene = np.asarray(
        im.resize((SIZE, SIZE), Image.LANCZOS)).astype(np.float32) / 255.0
    _save("photo_scene.png", scene)
    # face: central crop at native scale (skin gradients + sharp edges)
    cy, cx = 200, 256
    _save("photo_face.png",
          full[cy - SIZE // 2:cy + SIZE // 2, cx - SIZE // 2:cx + SIZE // 2])
    # detail: bottom-left crop (uniform + textured fabric regions)
    _save("photo_detail.png", full[600 - SIZE:, :SIZE])


def hillshade(z, azimuth_deg, altitude_deg=45.0):
    """Lambertian hillshade of an elevation grid — the classic natural
    terrain rendering (real long-range spatial correlations)."""
    az = np.radians(azimuth_deg)
    alt = np.radians(altitude_deg)
    gy, gx = np.gradient(z)
    slope = np.pi / 2.0 - np.arctan(np.hypot(gx, gy))
    aspect = np.arctan2(-gx, gy)
    shade = (np.sin(alt) * np.sin(slope)
             + np.cos(alt) * np.cos(slope) * np.cos((az - np.pi / 2.0) - aspect))
    return np.clip(shade, 0, 1)


def dem_fixtures():
    from PIL import Image
    dem = np.load(os.path.join(_sample_dir(), "jacksboro_fault_dem.npz"))
    z = dem["elevation"].astype(np.float32)  # (344, 403)
    z = (z - z.min()) / (z.max() - z.min() + 1e-9)
    # scale relief so gradients produce contrasty shading
    for i, (az, tint) in enumerate([(315, (1.0, 0.95, 0.85)),
                                    (135, (0.85, 0.92, 1.0)),
                                    (45, (0.95, 1.0, 0.9))]):
        sh = hillshade(z * 120.0, az)
        # elevation-tinted shade: natural color gradients over real terrain
        rgb = np.stack([sh * t * (0.35 + 0.65 * z) + 0.25 * z * (1 - t)
                        for t in tint], -1)
        rgb = np.clip(rgb, 0, 1)
        img = Image.fromarray(
            np.round(rgb * 255).astype(np.uint8)).resize(
                (SIZE, SIZE), Image.LANCZOS)
        _save(f"terrain_{i}.png", np.asarray(img).astype(np.float32) / 255.0)


def main():
    os.makedirs(OUT, exist_ok=True)
    photo_fixtures()
    dem_fixtures()


if __name__ == "__main__":
    main()
