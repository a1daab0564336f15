"""Parity tests for ops/front_pallas.py (interpret mode on the CPU mesh).

The front kernels replace HOW the canonical net's first two phase-domain
convs execute (models_video.lua:10-16 semantics via models/stylizer.py
`_phase_front`), not their math — so parity against plain XLA convs is the
whole contract. In-graph on the TPU the fused front currently REGRESSES
(layout conversions at the XLA->pallas boundary, BENCH_NOTES round 3), so
`fused_front` defaults OFF; these tests keep the kernel honest for the
full-pallas front-end it is the base of.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_artistic_videos_tpu.models import arch_dsl, stylizer
from fast_artistic_videos_tpu.ops import front_pallas as fp


def _xla_same_conv(x, w, b, pad_top, pad_left, valid_h):
    kh, kw = w.shape[0], w.shape[1]
    y = jax.lax.conv_general_dilated(
        x[None], w.astype(x.dtype), (1, 1),
        ((pad_top, kh - 1 - pad_top), (pad_left, kw - 1 - pad_left)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )[0] + b.astype(x.dtype)
    return y[:valid_h]


@pytest.mark.parametrize("kh,kw,pad_top,pad_left,shift,w", [
    (2, 2, 1, 1, 0, 256),
    (3, 3, 1, 1, 0, 256),
    (2, 2, 1, 1, -1, 256),
    # non-sublane-aligned widths (the 1080p + reflect-start quarter grid is
    # 500 wide): same_conv must zero-pad to 8 and mask stats/prologue
    (3, 3, 1, 1, 0, 125),
    (2, 2, 1, 1, -1, 125),
])
def test_same_conv_matches_xla(kh, kw, pad_top, pad_left, shift, w):
    rng = np.random.default_rng(0)
    hv, cin, cout = 13, 128, 64
    hp = fp.front_geometry(hv, kh, pad_top, out_row_shift=shift)
    in_margin = pad_top - shift
    x = np.zeros((hp, w, cin), np.float32)
    x[in_margin:in_margin + hv] = rng.standard_normal((hv, w, cin))
    wk = rng.standard_normal((kh, kw, cin, cout)).astype(np.float32) * 0.1
    b = rng.standard_normal((cout,)).astype(np.float32)

    y, stats = fp.same_conv(jnp.asarray(x), jnp.asarray(wk), jnp.asarray(b),
                            pad_top, pad_left, hv, out_row_shift=shift,
                            interpret=True)
    assert y.shape[1] % 8 == 0  # output keeps the aligned physical width
    ref = _xla_same_conv(jnp.asarray(x)[in_margin:in_margin + hv],
                         jnp.asarray(wk), jnp.asarray(b),
                         pad_top, pad_left, hv)
    got = np.asarray(y)[-shift:hv - shift, :w]
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-5)
    if shift < 0:
        # rows emitted above the logical origin are the next conv's
        # zero padding and must be REAL zeros
        np.testing.assert_array_equal(np.asarray(y)[: -shift], 0.0)
    # masked stats cover exactly the valid logical rows
    np.testing.assert_allclose(np.asarray(stats)[0],
                               np.asarray(ref).sum((0, 1)), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(stats)[1],
                               (np.asarray(ref) ** 2).sum((0, 1)), rtol=1e-4)


@pytest.mark.parametrize("w", [128, 52])
def test_same_conv_eff_relu_prologue(w):
    """The fused affine+ReLU prologue must equal normalizing the input
    first — including keeping the zero padding rows zero (the affine runs
    post-norm in the reference net, so padding stays pad). w=52: the
    alignment pad columns must also stay zero through the affine."""
    rng = np.random.default_rng(1)
    hv, cin, cout = 9, 128, 64
    hp = fp.front_geometry(hv, 2, 1)
    x = np.zeros((hp, w, cin), np.float32)
    x[1:1 + hv] = rng.standard_normal((hv, w, cin))
    wk = rng.standard_normal((2, 2, cin, cout)).astype(np.float32) * 0.1
    b = rng.standard_normal((cout,)).astype(np.float32)
    eff = np.stack([rng.uniform(0.5, 2.0, cin), rng.standard_normal(cin)])

    y, _ = fp.same_conv(jnp.asarray(x), jnp.asarray(wk), jnp.asarray(b),
                        1, 1, hv, eff=jnp.asarray(eff, jnp.float32),
                        relu=True, interpret=True)
    xn = np.where(np.arange(hp)[:, None, None] >= 1,
                  np.maximum(x * eff[0] + eff[1], 0.0), 0.0)
    ref = _xla_same_conv(jnp.asarray(xn, jnp.float32)[1:1 + hv],
                         jnp.asarray(wk), jnp.asarray(b), 1, 1, hv)
    np.testing.assert_allclose(np.asarray(y)[:hv, :w], np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_front_full_apply_parity():
    """stylizer.apply(fused_front=True) must match the default path on the
    canonical arch (f32, small frame)."""
    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 96, 7), jnp.float32)
    ref = stylizer.apply(params, spec, x)
    got = stylizer.apply(params, spec, x, fused_front=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_chain_plan_geometry():
    """chain_plan must produce heights where (a) each stage's nt covers its
    valid rows plus shift, (b) each stage's output height covers the next
    stage's input requirement, (c) margins compose (producer zeroes exactly
    the consumer's top margin)."""
    for hv in (13, 64, 270, 290):
        stages = [(3, 1, 4), (2, 1, 2), (2, 1, 4)]
        shifts, heights = fp.chain_plan(hv, stages)
        assert shifts == [-2, -1, 0]
        out_h = None
        for (kh, pt, tile), sh, hp in zip(stages, shifts, heights):
            nt = (hp - (kh - 1)) // tile
            assert nt * tile >= hv - sh
            assert hp >= hv + (pt - sh) + (kh - 1 - pt)
            if out_h is not None:
                assert out_h >= hp  # producer output covers this input
            out_h = nt * tile


def test_phase_front_pallas2_full_apply_parity():
    """The level-2 full-pallas front + fused residual chain
    (fused_front="full") must match the default XLA path end-to-end on the
    canonical arch — the complete mid-net pallas configuration that the
    1080p streaming bench runs."""
    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 96, 7), jnp.float32)
    ref = stylizer.apply(params, spec, x)
    got = stylizer.apply(params, spec, x, fused_front="full")
    # outputs span ~±150 (canonical tanh constant): atol 2e-3 is ~1.3e-5 of
    # range, i.e. pure f32 accumulation-order rounding headroom
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=2e-3)


def test_phase_front_pallas2_without_chain_parity():
    """fused_front="full" with fused_rblocks explicitly False: layer 2's
    pending norm/relu must be applied by the XLA fallback path."""
    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(2), spec)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 48, 7), jnp.float32)
    ref = stylizer.apply(params, spec, x)
    got = stylizer.apply(params, spec, x, fused_front="full",
                         fused_rblocks=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=2e-3)
