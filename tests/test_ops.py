import jax
import numpy as np
import jax.numpy as jnp

from fast_artistic_videos_tpu import ops
from fast_artistic_videos_tpu.ops import filters, warp, gram, tv, preprocess


# ---------------------------------------------------------------------------
# preprocess
# ---------------------------------------------------------------------------

def test_vgg_preprocess_matches_reference_constants(rng):
    img = rng.random((1, 4, 5, 3)).astype(np.float32)
    out = np.asarray(ops.vgg_preprocess(jnp.asarray(img)))
    # channel 0 of output is B = img[..., 2]*255 - 103.939
    np.testing.assert_allclose(out[..., 0], img[..., 2] * 255 - 103.939, rtol=1e-5)
    np.testing.assert_allclose(out[..., 1], img[..., 1] * 255 - 116.779, rtol=1e-5)
    np.testing.assert_allclose(out[..., 2], img[..., 0] * 255 - 123.68, rtol=1e-5)


def test_preprocess_deprocess_inverse(rng):
    img = rng.random((2, 6, 7, 3)).astype(np.float32)
    for pre, de in (ops.vgg_preprocess, ops.vgg_deprocess), (
        ops.resnet_preprocess,
        ops.resnet_deprocess,
    ):
        out = np.asarray(de(pre(jnp.asarray(img))))
        np.testing.assert_allclose(out, img, atol=1e-5)


# ---------------------------------------------------------------------------
# filters
# ---------------------------------------------------------------------------

def _min_filter_ref(x, r):
    h, w = x.shape
    pad = r // 2
    out = np.empty_like(x)
    for y in range(h):
        for xx in range(w):
            y0, y1 = max(0, y - pad), min(h, y + pad + 1)
            x0, x1 = max(0, xx - pad), min(w, xx + pad + 1)
            out[y, xx] = x[y0:y1, x0:x1].min()
    return out


def test_min_filter_is_border_clipped_erosion(rng):
    x = rng.random((10, 12)).astype(np.float32)
    out = np.asarray(filters.min_filter(jnp.asarray(x), 7))
    np.testing.assert_allclose(out, _min_filter_ref(x, 7), rtol=1e-6)


def test_min_filter_channel_layout(rng):
    x = rng.random((2, 9, 9, 1)).astype(np.float32)
    out = np.asarray(filters.min_filter(jnp.asarray(x), 3))
    assert out.shape == x.shape
    ref = np.stack([_min_filter_ref(x[i, :, :, 0], 3) for i in range(2)])
    np.testing.assert_allclose(out[..., 0], ref, rtol=1e-6)


def test_median_filter_valid_windows(rng):
    x = rng.random((8, 9, 3)).astype(np.float32)
    out = np.asarray(filters.median_filter(jnp.asarray(x), 3))
    assert out.shape == (6, 7, 3)
    # check one window against numpy median (9 elements -> exact median)
    win = x[2:5, 3:6, 1].ravel()
    np.testing.assert_allclose(out[2, 3, 1], np.median(win), rtol=1e-6)


def test_flow_magnitude_mask():
    flow = np.zeros((4, 4, 2), np.float32)
    flow[0, 0] = (3.0, 4.0)  # magnitude 5
    out = np.asarray(filters.flow_magnitude_mask(jnp.asarray(flow), 10.0))
    np.testing.assert_allclose(out[0, 0], 0.5, rtol=1e-6)
    np.testing.assert_allclose(out[1, 1], 1.0)


def test_gradient_masks():
    m = np.asarray(filters.gradient_mask_h_inc(3, 2))
    np.testing.assert_allclose(m[:, 0], [1 / 4, 2 / 4, 3 / 4], rtol=1e-6)
    m = np.asarray(filters.gradient_mask_w_dec(2, 3))
    np.testing.assert_allclose(m[0], [3 / 4, 2 / 4, 1 / 4], rtol=1e-6)


# ---------------------------------------------------------------------------
# warp
# ---------------------------------------------------------------------------

def test_warp_identity_flow(rng):
    img = rng.random((6, 8, 3)).astype(np.float32)
    flow = np.zeros((6, 8, 2), np.float32)
    out = np.asarray(warp.bilinear_warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_warp_integer_shift(rng):
    img = rng.random((6, 8, 2)).astype(np.float32)
    flow = np.zeros((6, 8, 2), np.float32)
    flow[..., 0] = 2.0  # sample from x+2
    out = np.asarray(warp.bilinear_warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out[:, :-2], img[:, 2:], atol=1e-6)
    np.testing.assert_allclose(out[:, -2:], 0.0, atol=1e-6)  # zero OOB


def test_warp_fractional_bilinear():
    img = np.zeros((1, 4, 1), np.float32)
    img[0, :, 0] = [0.0, 1.0, 2.0, 3.0]
    flow = np.zeros((1, 4, 2), np.float32)
    flow[..., 0] = 0.25
    out = np.asarray(warp.bilinear_warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out[0, 0, 0], 0.25, atol=1e-6)
    np.testing.assert_allclose(out[0, 2, 0], 2.25, atol=1e-6)
    # x=3: xf=3.25, right tap OOB contributes zero -> 3*0.75
    np.testing.assert_allclose(out[0, 3, 0], 3 * 0.75, atol=1e-6)


def test_warp_negative_oob_zero():
    img = np.ones((3, 3, 1), np.float32)
    flow = np.zeros((3, 3, 2), np.float32)
    flow[..., 1] = -2.5  # yf = y - 2.5
    out = np.asarray(warp.bilinear_warp(jnp.asarray(img), jnp.asarray(flow)))
    # y=0 -> yf=-2.5 fully OOB; y=2 -> yf=-0.5: only bottom tap (y=0) in bounds, w=0.5
    np.testing.assert_allclose(out[0, :, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[2, :, 0], 0.5, atol=1e-6)


def test_warp_batched(rng):
    img = rng.random((2, 5, 5, 3)).astype(np.float32)
    flow = rng.normal(size=(2, 5, 5, 2)).astype(np.float32) * 2
    out = np.asarray(warp.bilinear_warp(jnp.asarray(img), jnp.asarray(flow)))
    for i in range(2):
        single = np.asarray(
            warp.bilinear_warp(jnp.asarray(img[i]), jnp.asarray(flow[i]))
        )
        np.testing.assert_allclose(out[i], single, atol=1e-6)


# ---------------------------------------------------------------------------
# gram / tv
# ---------------------------------------------------------------------------

def test_gram_matches_definition(rng):
    x = rng.random((2, 3, 4, 5)).astype(np.float32)
    g = np.asarray(gram.gram_matrix(jnp.asarray(x)))
    n, h, w, c = x.shape
    flat = x.reshape(n, h * w, c)
    ref = np.einsum("npc,npd->ncd", flat, flat) / (c * h * w)
    np.testing.assert_allclose(g, ref, rtol=1e-5)
    assert gram.gram_matrix(jnp.asarray(x[0])).shape == (5, 5)


def test_tv_loss_gradient_matches_reference_backward(rng):
    """The reference injects grad = strength * (hand-written diffs)
    (TotalVariation.lua:19-35); autodiff of tv_loss must reproduce it."""
    import jax

    x = rng.random((1, 5, 6, 3)).astype(np.float32)
    strength = 0.7
    g = np.asarray(jax.grad(lambda a: tv.tv_loss(a, strength))(jnp.asarray(x)))
    # reference backward
    x_diff = x[:, :-1, :-1] - x[:, :-1, 1:]
    y_diff = x[:, :-1, :-1] - x[:, 1:, :-1]
    ref = np.zeros_like(x)
    ref[:, :-1, :-1] += x_diff + y_diff
    ref[:, :-1, 1:] -= x_diff
    ref[:, 1:, :-1] -= y_diff
    ref *= strength
    np.testing.assert_allclose(g, ref, atol=1e-5)


def test_banded_warp_exact_for_constant_flow(rng):
    img = rng.random((20, 30, 3)).astype(np.float32)
    flow = np.zeros((20, 30, 2), np.float32)
    flow[..., 0] = 3.25
    flow[..., 1] = -2.5
    a = np.asarray(warp.bilinear_warp(jnp.asarray(img), jnp.asarray(flow)))
    b = np.asarray(warp.bilinear_warp(jnp.asarray(img), jnp.asarray(flow), band=8))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_banded_warp_exact_for_axis_separable_flow(rng):
    """dy varying only with y and dx only with x -> banded == gather."""
    img = rng.random((24, 24, 2)).astype(np.float32)
    flow = np.zeros((24, 24, 2), np.float32)
    flow[..., 0] = np.linspace(-3, 3, 24)[None, :]
    flow[..., 1] = np.linspace(2, -2, 24)[:, None]
    a = np.asarray(warp.bilinear_warp(jnp.asarray(img), jnp.asarray(flow)))
    b = np.asarray(warp.bilinear_warp(jnp.asarray(img), jnp.asarray(flow), band=8))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_banded_warp_close_on_smooth_flow_and_image(rng):
    """Banded-vs-gather deviation scales with image gradient x flow gradient;
    for smooth frames and smooth flow (the real-video case) it is sub-1e-3.
    (On white-noise images at motion edges it can be large - that's what the
    exact_warp option and the occlusion mask are for.)"""
    y = np.linspace(0, np.pi, 128)
    img = np.stack([np.outer(np.sin(y * k), np.cos(y)) for k in (1, 2, 3)], -1)
    img = (img * 0.5 + 0.5).astype(np.float32)
    smooth = np.sin(y)[:, None] * np.cos(y)[None, :]
    flow = np.stack([smooth * 4, smooth * 3], -1).astype(np.float32)
    a = np.asarray(warp.bilinear_warp(jnp.asarray(img), jnp.asarray(flow)))
    b = np.asarray(warp.bilinear_warp(jnp.asarray(img), jnp.asarray(flow), band=8))
    assert np.abs(a - b).mean() < 1e-3


def test_flow_band_buckets():
    assert warp.flow_band(0.0) == 8
    assert warp.flow_band(7.5) == 8
    assert warp.flow_band(8.5) == 16
    assert warp.flow_band(100.0) == 128


def test_static_warp_matches_gather_on_vr_border_maps(rng):
    """make_static_warp (strip-cropped gather for precomputed maps) must
    reproduce bilinear_warp exactly on every VR border-reprojection map
    (modulo f32 offset-shift association noise)."""
    from fast_artistic_videos_tpu.video import vr_geometry as vr

    img = jnp.asarray(rng.random((64, 64, 3)), jnp.float32)
    for maker in (vr.perspective_warp_map_left, vr.perspective_warp_map_right,
                  vr.perspective_warp_map_top, vr.perspective_warp_map_bottom):
        m = maker(64, 12, 64)
        ref = np.asarray(warp.bilinear_warp(img, jnp.asarray(m)))
        fast = np.asarray(jax.jit(warp.make_static_warp(m))(img))
        np.testing.assert_allclose(fast, ref, atol=2e-5)


def test_static_warp_batched_matches_per_item(rng):
    """The (N, H, W, C) batched form of a static warp must equal N
    independent single-image warps."""
    from fast_artistic_videos_tpu.video import vr_geometry as vr

    m = vr.perspective_warp_map_left(48, 10, 48)
    w = warp.make_static_warp(m)
    imgs = jnp.asarray(rng.random((3, 48, 48, 2)), jnp.float32)
    batched = np.asarray(jax.jit(w)(imgs))
    for k in range(3):
        np.testing.assert_allclose(batched[k], np.asarray(w(imgs[k])),
                                   atol=1e-6)


def test_static_warp_equirect_map_no_crop(rng):
    """A map with no sentinel region (every output pixel mapped, e.g. the
    cube->equirect map) must still work — the crop is the whole frame."""
    from fast_artistic_videos_tpu.video import vr_geometry as vr

    strip = jnp.asarray(rng.random((20, 120, 3)), jnp.float32)
    m = vr.cube_to_equirectangular_map(20, 20, 4, 4, 48, 24)
    ref = np.asarray(warp.bilinear_warp(strip, jnp.asarray(m)))
    fast = np.asarray(jax.jit(warp.make_static_warp(m))(strip))
    np.testing.assert_allclose(fast, ref, atol=2e-5)
