"""ops.phase: flat-order two-level space-to-depth layout algebra.

Each helper is checked against the full-resolution reference computation
it replaces (exact, not approximate — the phase-resident pipeline's
contract is bit-parity with the plain path modulo float summation
order)."""

import numpy as np
import jax
import jax.numpy as jnp

from fast_artistic_videos_tpu.ops import filters, phase


def _rng(seed=0):
    return np.random.default_rng(seed)


def test_s2d2_flat_indexing():
    x = _rng().random((1, 8, 12, 3)).astype(np.float32)
    y = np.asarray(phase.s2d2_flat(jnp.asarray(x)))
    for rp in range(4):
        for cp in range(4):
            for c in range(3):
                np.testing.assert_array_equal(
                    y[0, :, :, (rp * 4 + cp) * 3 + c], x[0, rp::4, cp::4, c])


def test_d2s2_flat_roundtrip():
    x = _rng(1).random((2, 16, 8, 5)).astype(np.float32)
    y = phase.s2d2_flat(jnp.asarray(x))
    back = np.asarray(phase.d2s2_flat(y, 5))
    np.testing.assert_array_equal(back, x)


def test_flat_to_nested_perm():
    from fast_artistic_videos_tpu.models import stylizer

    x = jnp.asarray(_rng(2).random((1, 8, 8, 3)).astype(np.float32))
    nested = stylizer._s2d(stylizer._s2d(x))
    flat = phase.s2d2_flat(x)
    perm = phase.flat_to_nested_perm(3)
    np.testing.assert_array_equal(np.asarray(flat),
                                  np.asarray(nested)[..., perm])


def test_reflect_pad_phased_matches_full_res():
    for blocks in (1, 2, 10):
        x = jnp.asarray(_rng(blocks).random((1, 48, 64, 2)).astype(np.float32))
        want = phase.s2d2_flat(jnp.pad(
            x, ((0, 0), (4 * blocks,) * 2, (4 * blocks,) * 2, (0, 0)),
            mode="reflect"))
        got = phase.reflect_pad_phased(phase.s2d2_flat(x), blocks)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_eroded_cert_phased_r2():
    cert = (_rng(5).random((14, 18)) > 0.3).astype(np.float32)
    up = np.repeat(np.repeat(cert, 2, 0), 2, 1)  # nearest x2 -> 28x36
    want = filters.min_filter(jnp.asarray(up), 7)
    wantp = phase.s2d2_flat(want[None, :, :, None])[0]
    got = phase.eroded_cert_phased(jnp.asarray(cert), 2, 7)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(wantp).reshape(7, 9, 16))


def test_eroded_cert_phased_r4():
    cert = (_rng(6).random((9, 11)) > 0.4).astype(np.float32)
    up = np.repeat(np.repeat(cert, 4, 0), 4, 1)  # nearest x4 -> 36x44
    want = filters.min_filter(jnp.asarray(up), 7)
    wantp = phase.s2d2_flat(want[None, :, :, None])[0]
    got = phase.eroded_cert_phased(jnp.asarray(cert), 4, 7)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(wantp).reshape(9, 11, 16))


def test_eroded_cert_phased_window3():
    cert = (_rng(7).random((10, 10)) > 0.5).astype(np.float32)
    up = np.repeat(np.repeat(cert, 2, 0), 2, 1)
    want = filters.min_filter(jnp.asarray(up), 3)
    wantp = phase.s2d2_flat(want[None, :, :, None])[0]
    got = phase.eroded_cert_phased(jnp.asarray(cert), 2, 3)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(wantp).reshape(5, 5, 16))


def test_bilinear_warp_phased_matches_full_res():
    from fast_artistic_videos_tpu.ops import warp

    rng = _rng(11)
    h, w, c = 24, 32, 3
    img = rng.random((h, w, c)).astype(np.float32)
    flow = (rng.random((h, w, 2)).astype(np.float32) - 0.5) * 10.0
    band = 8
    want = warp.bilinear_warp(jnp.asarray(img), jnp.asarray(flow), band=band)
    wantp = phase.s2d2_flat(want[None])[0]
    img_p = phase.s2d2_flat(jnp.asarray(img)[None])[0]
    flow_p = phase.s2d2_flat(jnp.asarray(flow)[None])[0]
    got = warp.bilinear_warp_phased(img_p, flow_p, band=band)
    # 1-2 ULP: the phased pass groups taps by shift residue, so the
    # compiler's FMA fusion differs from the full-res pass
    np.testing.assert_allclose(np.asarray(got), np.asarray(wantp),
                               rtol=0, atol=1e-6)


def test_bilinear_warp_phased_band_not_multiple_of_4():
    from fast_artistic_videos_tpu.ops import warp

    rng = _rng(12)
    h, w, c = 16, 16, 2
    img = rng.random((h, w, c)).astype(np.float32)
    flow = (rng.random((h, w, 2)).astype(np.float32) - 0.5) * 11.0
    band = 6
    want = warp.bilinear_warp(jnp.asarray(img), jnp.asarray(flow), band=band)
    wantp = phase.s2d2_flat(want[None])[0]
    got = warp.bilinear_warp_phased(
        phase.s2d2_flat(jnp.asarray(img)[None])[0],
        phase.s2d2_flat(jnp.asarray(flow)[None])[0], band=band)
    np.testing.assert_allclose(np.asarray(got), np.asarray(wantp),
                               rtol=0, atol=1e-6)


def test_bilinear_warp_phased_hybrid_large_band():
    """band >= _PHASED_HYBRID_BAND dispatches to d2s -> full-res warp ->
    s2d inside the same program (the unrolled phased ladder loses to the
    layout roundtrip at large bands on TPU, tools/profile_warp_forms.py);
    numerically that IS the phased warp's parity definition, so the match
    is exact."""
    from fast_artistic_videos_tpu.ops import warp

    rng = _rng(14)
    h, w, c = 64, 80, 3
    img = rng.random((h, w, c)).astype(np.float32)
    flow = (rng.random((h, w, 2)).astype(np.float32) - 0.5) * 80.0
    band = warp._PHASED_HYBRID_BAND
    want = warp.bilinear_warp(jnp.asarray(img), jnp.asarray(flow), band=band)
    wantp = phase.s2d2_flat(want[None])[0]
    got = warp.bilinear_warp_phased(
        phase.s2d2_flat(jnp.asarray(img)[None])[0],
        phase.s2d2_flat(jnp.asarray(flow)[None])[0], band=band)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(wantp))


def test_bilinear_warp_phased_integer_shift():
    from fast_artistic_videos_tpu.ops import warp

    rng = _rng(13)
    img = rng.random((16, 20, 3)).astype(np.float32)
    flow = np.zeros((16, 20, 2), np.float32)
    flow[..., 0], flow[..., 1] = 3.0, -5.0
    got = warp.bilinear_warp_phased(
        phase.s2d2_flat(jnp.asarray(img)[None])[0],
        phase.s2d2_flat(jnp.asarray(flow)[None])[0], band=8)
    full = np.asarray(phase.d2s2_flat(jnp.asarray(got)[None], 3))[0]
    # interior: exact integer shift; OOB samples zero
    np.testing.assert_allclose(full[5:, :-3], img[:11, 3:], atol=0)
    np.testing.assert_allclose(full[:5], 0.0, atol=0)
    np.testing.assert_allclose(full[:, -3:], 0.0, atol=0)
