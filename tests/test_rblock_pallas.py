"""Parity tests for the fused residual-chain Pallas kernels
(ops/rblock_pallas.py) against the XLA block path (models/stylizer.py
_block_apply) — the two implementations of models_video.lua:10-53's
residual blocks must agree to accumulation-order rounding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_artistic_videos_tpu.models import arch_dsl, stylizer
from fast_artistic_videos_tpu.ops import rblock_pallas as rbp


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _valid_conv(x, w, b):
    return jax.lax.conv_general_dilated(
        x[None], w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0] + b


def test_chain_conv_matches_xla_valid_conv(rng):
    h0, w0, c = 21, 27, 8
    hp, wp = rbp.chain_geometry(h0, w0, jnp.float32)
    x = jnp.asarray(rng.standard_normal((h0, w0, c)).astype(np.float32))
    xp = jnp.pad(x, ((0, hp - h0), (0, wp - w0), (0, 0)))
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
    y, st = rbp.chain_conv(xp, w, b, (h0 - 2, w0 - 2))
    ref = _valid_conv(x, w, b)
    np.testing.assert_allclose(np.asarray(y)[:h0 - 2, :w0 - 2],
                               np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st)[0], np.asarray(ref).sum((0, 1)),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(st)[1],
                               (np.asarray(ref) ** 2).sum((0, 1)),
                               rtol=1e-5, atol=1e-3)


def test_chain_conv_prologue_eff_relu_skip(rng):
    """eff-affine + ReLU + shifted skip-add prologue == the explicit XLA
    composition, and emit_input returns the materialized input."""
    h0, w0, c = 18, 22, 8
    hp, wp = rbp.chain_geometry(h0, w0, jnp.float32)
    x = jnp.asarray(rng.standard_normal((hp, wp, c)).astype(np.float32))
    skip = jnp.asarray(rng.standard_normal((hp, wp, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
    eff = jnp.asarray(rng.standard_normal((2, c)).astype(np.float32))

    y, st, a = rbp.chain_conv(x, w, b, (h0 - 2, w0 - 2), eff=eff, skip=skip,
                              emit_input=True)
    a_ref = x * eff[0] + eff[1]
    a_ref = a_ref.at[:-2, :-2].add(skip[2:, 2:])
    np.testing.assert_allclose(np.asarray(a)[:h0, :w0],
                               np.asarray(a_ref)[:h0, :w0], atol=1e-5)
    ref = _valid_conv(a_ref, w, b)
    np.testing.assert_allclose(np.asarray(y)[:h0 - 2, :w0 - 2],
                               np.asarray(ref)[:h0 - 2, :w0 - 2], atol=1e-4)

    yr, _ = rbp.chain_conv(x, w, b, (h0 - 2, w0 - 2), eff=eff, pre_relu=True)
    refr = _valid_conv(jnp.maximum(x * eff[0] + eff[1], 0.0), w, b)
    np.testing.assert_allclose(np.asarray(yr)[:h0 - 2, :w0 - 2],
                               np.asarray(refr)[:h0 - 2, :w0 - 2], atol=1e-4)


ARCH = "c9s1-8,d16,d32,R32,R32,R32,U2,c3s1-8,U2,c9s1-3"


@pytest.mark.parametrize("hw", [(64, 80), (68, 92), (100, 52)])
def test_apply_parity_f32(rng, hw):
    spec = arch_dsl.parse_arch(ARCH, in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.standard_normal((1, *hw, 7)).astype(np.float32))
    ref = stylizer.apply(params, spec, x, fused_rblocks=False)
    got = stylizer.apply(params, spec, x, fused_rblocks=True)
    assert got.shape == ref.shape
    # output is tanh * 150; accumulation-order differences amplified by the
    # IN rescale stay ~1e-3 of the 150 scale
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-3)


def test_apply_parity_bf16_within_bf16_noise(rng):
    spec = arch_dsl.parse_arch(ARCH, in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(1), spec)
    x = jnp.asarray(rng.standard_normal((1, 64, 80, 7)).astype(np.float32))
    ref32 = np.asarray(stylizer.apply(params, spec, x, fused_rblocks=False))
    refb = np.asarray(stylizer.apply(params, spec, x, dtype=jnp.bfloat16,
                                     fused_rblocks=False), np.float32)
    gotb = np.asarray(stylizer.apply(params, spec, x, dtype=jnp.bfloat16,
                                     fused_rblocks=True), np.float32)
    noise = np.abs(refb - ref32).max()  # the XLA path's own bf16 error
    assert np.abs(gotb - ref32).max() < 2.0 * noise + 0.5


def test_apply_parity_under_jit_params_closed_over(rng):
    spec = arch_dsl.parse_arch(ARCH, in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.standard_normal((1, 64, 80, 7)).astype(np.float32))
    ref = stylizer.apply(params, spec, x, fused_rblocks=False)
    got = jax.jit(
        lambda xx: stylizer.apply(params, spec, xx, fused_rblocks=True))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-3)


def test_auto_gating():
    """Auto mode: off for traced params (training) and off on CPU; the
    explicit flag wins. Training gradients keep flowing (XLA path)."""
    spec = arch_dsl.parse_arch("c3s1-8,d16,R16,U2,c3s1-3", in_channels=3)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    x = jnp.zeros((1, 32, 32, 3))
    # concrete params on CPU -> auto stays off (backend is cpu)
    assert stylizer._fused_chain_idxs(spec, params, x, None) == ()
    # explicit True finds the run regardless of platform/width
    assert stylizer._fused_chain_idxs(spec, params, x, True) == (2,)
    # batch > 1 is ineligible
    assert stylizer._fused_chain_idxs(
        spec, params, jnp.zeros((2, 32, 32, 3)), True) == ()

    def loss(p):
        return jnp.sum(stylizer.apply(p, spec, x) ** 2)

    g = jax.grad(loss)(params)  # traced params -> XLA path, grads flow
    assert np.isfinite(float(jax.tree_util.tree_leaves(g)[0].sum()))


def test_reflect_start_small_input(rng):
    """reflect-start pre-pads the raw input past the chain threshold, so
    even a tiny frame runs fused; parity holds."""
    spec = arch_dsl.parse_arch("c3s1-8,R8,R8", in_channels=3,
                               padding_type="reflect-start")
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.standard_normal((1, 9, 9, 3)).astype(np.float32))
    ref = stylizer.apply(params, spec, x, fused_rblocks=False)
    got = stylizer.apply(params, spec, x, fused_rblocks=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-3)


def test_too_small_input_falls_back(rng):
    """A chain needing more shrink than the tensor allows (padding type
    'none': VALID blocks, no input pre-pad) falls back to the XLA path —
    the two paths are then the same code, bit-identical."""
    spec = arch_dsl.parse_arch("c3s1-8,R8,R8", in_channels=3,
                               padding_type="none")
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.standard_normal((1, 9, 9, 3)).astype(np.float32))
    ref = stylizer.apply(params, spec, x, fused_rblocks=False)
    got = stylizer.apply(params, spec, x, fused_rblocks=True)
    assert ref.shape[1] == 1  # shrank to 1 px: below the fused threshold
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_geometry_validation():
    with pytest.raises(ValueError):
        rbp.chain_conv(jnp.zeros((17, 40, 8)), jnp.zeros((3, 3, 8, 8)),
                       jnp.zeros((8,)), (15, 38))  # Hp not a tile multiple
    with pytest.raises(ValueError):
        rbp.chain_conv(jnp.zeros((32, 40, 8)), jnp.zeros((3, 3, 8, 8)),
                       jnp.zeros((8,)), (15, 38))  # valid width too wide
