import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fast_artistic_videos_tpu.models import arch_dsl, stylizer


CANON = "c9s1-32,d64,d128,R128,R128,R128,R128,R128,U2,c3s1-64,U2,c9s1-3"


def test_parse_canonical():
    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    assert spec.in_channels == 7
    assert spec.layers[0].kind == "conv" and spec.layers[0].ksize == 9
    assert sum(1 for l in spec.layers if l.kind == "res_block") == 5
    # 5 res blocks at stride 4, valid convs: 2*4 px/side each -> 40
    assert spec.input_pad == 40
    assert spec.total_stride == 4
    assert spec.out_channels == 3


def test_parse_train_default():
    spec = arch_dsl.parse_arch("train-default")
    kinds = [l.kind for l in spec.layers]
    assert kinds[-3:] == ["full_conv", "full_conv", "conv"]
    assert spec.input_pad == 40


def test_parse_errors():
    with pytest.raises(ValueError):
        arch_dsl.parse_arch("x32")
    with pytest.raises(ValueError):
        arch_dsl.parse_arch("c9s1-32", padding_type="wat")


def test_canonical_shapes_and_param_count():
    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    n = stylizer.count_params(params)
    # reference canonical net is ~1.7M params (SURVEY.md §6)
    assert 1.5e6 < n < 2.1e6
    x = jnp.zeros((1, 64, 64, 7))
    y = stylizer.apply(params, spec, x)
    assert y.shape == (1, 64, 64, 3)
    assert y.dtype == jnp.float32


def test_output_bounded_by_tanh_constant():
    spec = arch_dsl.parse_arch("c3s1-8,R8,c3s1-3", in_channels=7, tanh_constant=150.0)
    params = stylizer.init_params(jax.random.PRNGKey(1), spec)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 7)) * 100, jnp.float32)
    y = np.asarray(stylizer.apply(params, spec, x))
    assert np.all(np.abs(y) <= 150.0 + 1e-4)


def test_reflect_start_preserves_size_vs_none_shrinks():
    spec_none = arch_dsl.parse_arch("c3s1-8,R8,R8,c3s1-3", in_channels=3, padding_type="none")
    spec_rs = arch_dsl.parse_arch("c3s1-8,R8,R8,c3s1-3", in_channels=3, padding_type="reflect-start")
    k = jax.random.PRNGKey(0)
    p1 = stylizer.init_params(k, spec_none)
    x = jnp.zeros((1, 40, 40, 3))
    y_none = stylizer.apply(p1, spec_none, x)
    # two res blocks, stride 1: shrink 4 px/side
    assert y_none.shape == (1, 32, 32, 3)
    p2 = stylizer.init_params(k, spec_rs)
    y_rs = stylizer.apply(p2, spec_rs, x)
    assert y_rs.shape == (1, 40, 40, 3)


def test_padding_variants_run():
    for pt in ("zero", "reflect", "replicate"):
        spec = arch_dsl.parse_arch("c3s1-4,d8,R8,u4,c3s1-3", in_channels=3, padding_type=pt)
        params = stylizer.init_params(jax.random.PRNGKey(0), spec)
        y = stylizer.apply(params, spec, jnp.zeros((1, 16, 16, 3)))
        assert y.shape == (1, 16, 16, 3), pt


def test_conv_transpose_matches_naive():
    """conv_transpose2d must equal Torch SpatialFullConvolution(3,3,2,2,1,1,1,1)
    semantics: out[oh,ow] = sum x[ih,iw]*W[kh,kw] with oh=ih*2-1+kh."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 5, 6, 2)).astype(np.float32)
    w_t = rng.normal(size=(2, 3, 3, 3)).astype(np.float32)  # torch (inC,outC,kh,kw)
    b = np.zeros(3, np.float32)
    s, p, a, k = 2, 1, 1, 3
    out_h, out_w = (5 - 1) * s - 2 * p + k + a, (6 - 1) * s - 2 * p + k + a
    ref = np.zeros((out_h, out_w, 3), np.float32)
    for ih in range(5):
        for iw in range(6):
            for kh in range(3):
                for kw in range(3):
                    oh, ow = ih * s - p + kh, iw * s - p + kw
                    if 0 <= oh < out_h and 0 <= ow < out_w:
                        for ci in range(2):
                            for co in range(3):
                                ref[oh, ow, co] += x[0, ih, iw, ci] * w_t[ci, co, kh, kw]
    # our storage: HWIO, spatially flipped
    w_ours = np.transpose(w_t[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()
    with jax.default_matmul_precision("highest"):
        out = np.asarray(
            stylizer.conv_transpose2d(jnp.asarray(x), jnp.asarray(w_ours), jnp.asarray(b), s, p, a)
        )
    assert out.shape == (1, out_h, out_w, 3)
    np.testing.assert_allclose(out[0], ref, atol=1e-4)


def test_instance_norm_semantics():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 8, 9, 4)).astype(np.float32) * 3 + 1
    scale = rng.normal(size=(4,)).astype(np.float32)
    bias = rng.normal(size=(4,)).astype(np.float32)
    y = np.asarray(stylizer.instance_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)))
    for n in range(2):
        for c in range(4):
            ch = x[n, :, :, c]
            ref = (ch - ch.mean()) / np.sqrt(ch.var() + 1e-5) * scale[c] + bias[c]
            np.testing.assert_allclose(y[n, :, :, c], ref, atol=1e-4)


def test_instance_norm_bf16_stats_stable():
    x = (np.random.default_rng(0).normal(size=(1, 16, 16, 2)) + 8.0).astype(np.float32)
    y32 = np.asarray(
        stylizer.instance_norm(jnp.asarray(x), jnp.ones(2), jnp.zeros(2))
    )
    ybf = np.asarray(
        stylizer.instance_norm(jnp.asarray(x, jnp.bfloat16), jnp.ones(2), jnp.zeros(2)),
        dtype=np.float32,
    )
    assert np.abs(ybf - y32).mean() < 0.05


def test_init_matches_torch_distributions():
    spec = arch_dsl.parse_arch("c9s1-32,d64", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    w = np.asarray(params["layer00"]["w"])
    stdv = 1.0 / np.sqrt(9 * 9 * 7)
    assert np.abs(w).max() <= stdv
    assert np.abs(w).max() > 0.8 * stdv  # actually fills the range
    norm = np.asarray(params["layer00_norm"]["scale"])
    assert norm.min() >= 0.0 and norm.max() <= 1.0


def test_bf16_fp32_parity():
    """bf16 compute path must stay within the 1e-2 [0,1]-pixel budget."""
    from fast_artistic_videos_tpu import ops

    spec = arch_dsl.parse_arch("c9s1-16,d32,R32,U2,c9s1-3", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(2), spec)
    rng = np.random.default_rng(1)
    img = rng.random((1, 32, 32, 3)).astype(np.float32)
    x = jnp.concatenate(
        [
            ops.vgg_preprocess(jnp.asarray(img)),
            jnp.zeros((1, 32, 32, 3)),
            jnp.zeros((1, 32, 32, 1)),
        ],
        axis=-1,
    )
    y32 = np.asarray(ops.vgg_deprocess(stylizer.apply(params, spec, x)))
    ybf = np.asarray(
        ops.vgg_deprocess(stylizer.apply(params, spec, x, dtype=jnp.bfloat16))
    )
    assert np.abs(y32 - ybf).mean() < 1e-2


def test_two_level_phase_front_exact():
    """The levels=2 phase front (16 phases, absorbing BOTH strided convs)
    must reproduce the unoptimized graph exactly. Not used by apply() at
    1080p (one level measured faster there) but kept exact for shapes/archs
    where it wins."""
    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(5), spec)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 48, 64, 7)), jnp.float32)
    with jax.default_matmul_precision("highest"):
        xp = stylizer._pad2d(x, spec.input_pad, "reflect")
        got = stylizer._phase_front(
            xp, params["layer00"], spec.layers[0], params["layer00_norm"],
            params["layer01"], spec, levels=2,
            norm1=params["layer01_norm"], p2=params["layer02"],
        )
        want = stylizer.apply(params, spec, x, optimize=False, stop_after=2)
        # reference path applies layer02's norm+relu; replicate on `got`
        got = stylizer._norm_apply(got, params["layer02_norm"], True)
        got = jax.nn.relu(got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_two_level_folded_upsample_conv_exact():
    """U2 + 9x9 conv to few channels folds through TWO s2d levels (the
    4*o <= 16 branch of _folded_upsample_conv) — must equal upsample+conv."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((1, 24, 28, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(9, 9, 64, 3)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    with jax.default_matmul_precision("highest"):
        got = stylizer._folded_upsample_conv(x, w, b, 9, 4)
        want = stylizer.conv2d(stylizer.upsample_nearest(x, 2), w, b, 1, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_phase_io_full_forward_parity():
    """apply(phase_input=True, phase_output=True, fold_preprocess=True) on
    the raw-channel phased input must reproduce the plain forward on the
    reference 7-channel input — the phase-resident engine's whole-net
    contract (no full-res tensor is ever materialized on that path)."""
    from fast_artistic_videos_tpu import ops
    from fast_artistic_videos_tpu.ops import phase as phase_ops

    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    assert stylizer.supports_phase_io(spec)
    params = stylizer.init_params(jax.random.PRNGKey(6), spec)
    rng = np.random.default_rng(9)
    h, w = 48, 64
    content_u8 = rng.integers(0, 256, (1, h, w, 3)).astype(np.float32)
    prior = rng.random((1, h, w, 3)).astype(np.float32)
    cert = (rng.random((1, h, w, 1)) > 0.3).astype(np.float32)

    x_plain = jnp.concatenate([
        jnp.asarray(ops.vgg_preprocess(content_u8 / 255.0)),
        jnp.asarray(ops.vgg_preprocess(prior)) * cert,
        jnp.asarray(cert)], axis=-1)
    x_raw = jnp.concatenate([
        jnp.asarray(content_u8), jnp.asarray(prior) * cert,
        jnp.asarray(cert), jnp.ones((1, h, w, 1))], axis=-1)
    xp = phase_ops.reflect_pad_phased(
        phase_ops.s2d2_flat(x_raw), spec.input_pad // 4)
    assert xp.shape[-1] == 128  # 16 phases x 8 raw channels = full MXU lanes

    with jax.default_matmul_precision("highest"):
        want = stylizer.apply(params, spec, x_plain)
        got_p = stylizer.apply(params, spec, xp, phase_input=True,
                               phase_output=True, fold_preprocess=True)
    assert got_p.shape == (1, h // 4, w // 4, 48)
    got = phase_ops.d2s2_flat(got_p, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-3, rtol=1e-4)


def test_phase_output_fallback_without_fused_tail():
    """phase_output honors its layout contract even when the tail cannot
    stay phased (optimize=False): an explicit transpose at the end."""
    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(6), spec)
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.random((1, 48, 64, 7)), jnp.float32)
    from fast_artistic_videos_tpu.ops import phase as phase_ops

    with jax.default_matmul_precision("highest"):
        want = stylizer.apply(params, spec, x, optimize=False)
        got = stylizer.apply(params, spec, x, optimize=False,
                             phase_output=True)
    np.testing.assert_allclose(
        np.asarray(phase_ops.d2s2_flat(got, 3)), np.asarray(want), atol=0)
