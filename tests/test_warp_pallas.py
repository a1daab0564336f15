"""Pallas banded-warp kernel vs the XLA banded reference (interpret mode —
compiled-mode bit-exactness is exercised on real TPU hardware by bench/CI
drives; on this CPU mesh the interpreter runs the same kernel logic)."""

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
