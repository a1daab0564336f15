"""Pallas banded-warp kernel vs the XLA banded reference (interpret mode —
compiled-mode bit-exactness is exercised on real TPU hardware by bench/CI
drives; on this CPU mesh the interpreter runs the same kernel logic)."""

import jax
import jax.numpy as jnp
import numpy as np

from fast_artistic_videos_tpu.ops import warp, warp_pallas


def _check(img, flow, band):
    ref = np.asarray(warp.bilinear_warp(jnp.asarray(img), jnp.asarray(flow), band=band))
    got = np.asarray(
        warp_pallas.bilinear_warp_pallas(
            jnp.asarray(img), jnp.asarray(flow), band=band, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_pallas_warp_random_flow(rng):
    img = rng.random((40, 136, 3)).astype(np.float32)
    flow = (rng.normal(size=(40, 136, 2)) * 5).astype(np.float32)
    _check(img, flow, band=8)


def test_pallas_warp_odd_sizes(rng):
    img = rng.random((37, 130, 2)).astype(np.float32)
    flow = (rng.normal(size=(37, 130, 2)) * 3).astype(np.float32)
    _check(img, flow, band=8)


def test_pallas_warp_out_of_band_flow_zeroes(rng):
    """|flow| > band must sample zero, exactly like the XLA banded path."""
    img = rng.random((16, 128, 1)).astype(np.float32)
    flow = np.zeros((16, 128, 2), np.float32)
    flow[:8, :, 0] = 50.0   # far out of band
    flow[8:, :, 1] = -50.0
    _check(img, flow, band=8)
    got = np.asarray(
        warp_pallas.bilinear_warp_pallas(
            jnp.asarray(img), jnp.asarray(flow), band=8, interpret=True
        )
    )
    np.testing.assert_allclose(got, 0.0, atol=1e-7)


def test_pallas_warp_batched(rng):
    img = rng.random((2, 16, 128, 3)).astype(np.float32)
    flow = (rng.normal(size=(2, 16, 128, 2)) * 4).astype(np.float32)
    ref = np.asarray(warp.bilinear_warp(jnp.asarray(img), jnp.asarray(flow), band=8))
    got = np.asarray(
        warp_pallas.bilinear_warp_pallas(
            jnp.asarray(img), jnp.asarray(flow), band=8, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_static_strip_warp_matches_bilinear_on_vr_maps():
    """make_static_strip_warp must reproduce bilinear_warp(img, map) exactly
    (zero-OOB semantics) on all four real VR border maps — the separable
    projective structure (dx column-constant for left/right, dy row-constant
    for top/bottom) it specializes for."""
    from fast_artistic_videos_tpu.ops import warp_pallas
    from fast_artistic_videos_tpu.video import vr_geometry as vr

    hplus = wplus = 64
    ow = 16
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((hplus, wplus, 3)), jnp.float32)
    maps = [vr.perspective_warp_map_left(hplus, ow, wplus),
            vr.perspective_warp_map_right(hplus, ow, wplus),
            vr.perspective_warp_map_top(wplus, ow, hplus),
            vr.perspective_warp_map_bottom(wplus, ow, hplus)]
    for i, m in enumerate(maps):
        fn = warp_pallas.make_static_strip_warp(m, interpret=True)
        assert fn is not None, f"map {i}: separable structure not detected"
        got = np.asarray(jax.jit(fn)(img))
        ref = np.asarray(warp.bilinear_warp(img, jnp.asarray(m, jnp.float32)))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5,
                                   err_msg=f"map {i}")


def test_static_strip_warp_rejects_nonseparable():
    """A generic swirl map has no separable structure: the factory must
    return None so callers fall back to the gather path."""
    from fast_artistic_videos_tpu.ops import warp_pallas

    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    m = np.stack([np.sin(yy / 5.0) * 3.0, np.cos(xx / 7.0) * 3.0], axis=-1)
    assert warp_pallas.make_static_strip_warp(m) is None


def test_static_strip_warp_oob_taps_zero():
    """Taps outside the source image must contribute zero (the VR maps'
    corners sample beyond the neighbor face edge)."""
    from fast_artistic_videos_tpu.ops import warp_pallas
    from fast_artistic_videos_tpu.video import vr_geometry as vr

    hplus = wplus = 48
    m = vr.perspective_warp_map_left(hplus, 12, wplus)
    fn = warp_pallas.make_static_strip_warp(m, interpret=True)
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((hplus, wplus, 3)), jnp.float32)
    got = np.asarray(fn(img))
    ref = np.asarray(warp.bilinear_warp(img, jnp.asarray(m, jnp.float32)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
