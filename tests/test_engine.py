import jax
import numpy as np
import jax.numpy as jnp

from fast_artistic_videos_tpu.ops.preprocess import vgg_deprocess, vgg_preprocess
from fast_artistic_videos_tpu.video.engine import EngineConfig, StylizerEngine


def _prior_echo_model(params, x):
    """Fake stylizer returning the prior channels (3:6) — exposes the
    engine's warp/mask/fill mechanics directly at its output."""
    return x[..., 3:6]


def _content_echo_model(params, x):
    return x[..., 0:3]


def make_engine(apply_vid=_prior_echo_model, fill="vgg-mean", stride=1):
    return StylizerEngine(
        apply_vid, params_vid=None, stride_multiple=stride,
        config=EngineConfig(fill_occlusions=fill, occlusions_min_filter=3),
    )


def test_first_frame_zero_prior_and_cert():
    eng = make_engine(_prior_echo_model)
    content = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
    out = eng.stylize_first(content)
    # prior channel is vgg-mean fill (zeros in VGG space) -> deprocess(0) = mean/255 BGR->RGB
    expect = vgg_deprocess(jnp.zeros((8, 8, 3))).clip(0, 1)
    np.testing.assert_allclose(out, np.asarray(expect), atol=1e-5)


def test_next_frame_prior_is_warped_masked_prev():
    eng = make_engine(_prior_echo_model)
    rng = np.random.default_rng(1)
    content = rng.random((8, 10, 3)).astype(np.float32)
    prev = rng.random((8, 10, 3)).astype(np.float32)
    flow = np.zeros((8, 10, 2), np.float32)
    flow[..., 0] = 2.0  # shift: prior = prev shifted left by 2
    cert = np.ones((8, 10), np.float32)
    out = eng.stylize_next(content, prev, flow, cert)
    # interior: min_filter(ones)=ones, prior = warp(prev) exactly
    np.testing.assert_allclose(out[:, :-2], prev[:, 2:], atol=1e-4)
    # occluded right band: warp gives 0 content there, cert stays 1 => prior
    # is vgg_preprocess(0)*1 + 0 fill -> deprocess -> 0
    np.testing.assert_allclose(out[:, -2:], 0.0, atol=1e-4)


def test_next_frame_cert_zero_gives_fill():
    eng = make_engine(_prior_echo_model)
    content = np.zeros((6, 6, 3), np.float32)
    prev = np.ones((6, 6, 3), np.float32)
    flow = np.zeros((6, 6, 2), np.float32)
    cert = np.zeros((6, 6), np.float32)  # fully occluded
    out = eng.stylize_next(content, prev, flow, cert)
    expect = np.asarray(vgg_deprocess(jnp.zeros((6, 6, 3)))).clip(0, 1)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_cert_erosion_applied():
    eng = make_engine(_prior_echo_model)
    content = np.zeros((8, 8, 3), np.float32)
    prev = np.ones((8, 8, 3), np.float32)
    flow = np.zeros((8, 8, 2), np.float32)
    cert = np.ones((8, 8), np.float32)
    cert[4, 4] = 0.0
    out = eng.stylize_next(content, prev, flow, cert)
    # min_filter(3) grows the zero to a 3x3 region; there prior -> fill(=0 vgg) -> deprocess
    fill_px = np.asarray(vgg_deprocess(jnp.zeros((1, 1, 3))))[0, 0].clip(0, 1)
    for y in range(3, 6):
        for x in range(3, 6):
            np.testing.assert_allclose(out[y, x], fill_px, atol=1e-5)
    np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-4)


def test_uniform_random_fill_fills_occlusions():
    eng = make_engine(_prior_echo_model, fill="uniform-random")
    content = np.zeros((16, 16, 3), np.float32)
    prev = np.ones((16, 16, 3), np.float32)
    flow = np.zeros((16, 16, 2), np.float32)
    cert = np.zeros((16, 16), np.float32)
    out = eng.stylize_next(content, prev, flow, cert)
    # occluded everywhere -> prior == preprocess(rand)*1 -> deprocess -> uniform noise
    assert out.std() > 0.1


def test_stride_padding_roundtrip():
    eng = make_engine(_content_echo_model, stride=4)
    content = np.random.default_rng(3).random((10, 13, 3)).astype(np.float32)
    out = eng.stylize_first(content)
    assert out.shape == content.shape
    np.testing.assert_allclose(out, content, atol=1e-4)


def test_stylize_with_prior_vr_entry():
    eng = make_engine(_prior_echo_model)
    content = np.zeros((8, 8, 3), np.float32)
    prior = np.full((8, 8, 3), 0.25, np.float32)
    cert = np.ones((8, 8), np.float32)
    out = eng.stylize_with_prior(content, prior, cert, erode_cert=False)
    np.testing.assert_allclose(out, 0.25, atol=1e-4)


# ---------------------------------------------------------------------------
# feature-reuse mode (keyframe + residual-chain delta advection)
# ---------------------------------------------------------------------------

def _reuse_engine(seed=0):
    import jax
    from fast_artistic_videos_tpu.models import arch_dsl, stylizer

    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(seed), spec)
    plan = stylizer.reuse_split_plan(spec)
    assert plan == (2, 8, 10)  # front tap, resume, 5 blocks x 2 px/side
    return StylizerEngine(
        lambda p, x: stylizer.apply(p, spec, x),
        params_vid=params,
        stride_multiple=spec.total_stride,
        config=EngineConfig(occlusions_min_filter=3),
        apply_vid_split=lambda p, x, **kw: stylizer.apply(p, spec, x, **kw),
        reuse_plan=plan,
    )


def test_feature_reuse_keyframe_matches_exact():
    """stylize_next_full is the same forward split at the residual chain —
    it must reproduce stylize_next exactly (same traced ops)."""
    eng = _reuse_engine()
    rng = np.random.default_rng(5)
    content = rng.random((32, 48, 3)).astype(np.float32)
    prev = rng.random((32, 48, 3)).astype(np.float32)
    flow = (rng.standard_normal((32, 48, 2)) * 2).astype(np.float32)
    cert = (rng.random((32, 48)) > 0.2).astype(np.float32)
    # identical RNG key for the fill in both calls
    eng._key = jax.random.PRNGKey(7)
    ref = np.asarray(eng.stylize_next(content, prev, flow, cert))
    eng._key = jax.random.PRNGKey(7)
    out, delta = eng.stylize_next_full(content, prev, flow, cert)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
    assert delta.shape == (8, 12, 128)  # quarter grid of the padded frame
    assert np.isfinite(np.asarray(delta)).all()


def test_feature_reuse_static_scene_matches_full():
    """Zero flow + full certainty + identical inputs: the reuse step's
    advected delta equals the keyframe delta, so the reuse output must
    equal the full recompute."""
    eng = _reuse_engine()
    rng = np.random.default_rng(6)
    content = rng.random((32, 48, 3)).astype(np.float32)
    prev = rng.random((32, 48, 3)).astype(np.float32)
    flow = np.zeros((32, 48, 2), np.float32)
    cert = np.ones((32, 48), np.float32)
    eng._key = jax.random.PRNGKey(3)
    full, delta = eng.stylize_next_full(content, prev, flow, cert)
    eng._key = jax.random.PRNGKey(3)
    out, delta2 = eng.stylize_next_reuse(content, prev, flow, cert, delta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=2e-5)
    np.testing.assert_allclose(np.asarray(delta2), np.asarray(delta),
                               atol=1e-5)


def test_feature_reuse_translation_tracks_full():
    """A 4-px horizontal shift (one feature pixel): the advected delta must
    land where the full recompute puts it — interior outputs stay close
    (instance-norm stats drift slightly, so tolerance is loose but far
    below the no-advection error)."""
    eng = _reuse_engine()
    rng = np.random.default_rng(8)
    base = rng.random((32, 64, 3)).astype(np.float32)
    c1 = base[:, 4:52]
    c2 = base[:, 0:48]          # camera pans left: content shifts right by 4
    # backward flow: frame2(x) = frame1(x + dx). c2(x)=base[x]=c1(x-4),
    # so dx = -4
    flow = np.zeros((32, 48, 2), np.float32)
    flow[..., 0] = -4.0
    cert = np.ones((32, 48), np.float32)
    prev = rng.random((32, 48, 3)).astype(np.float32)

    eng._key = jax.random.PRNGKey(1)
    _, delta = eng.stylize_next_full(c1, prev, flow * 0, cert)
    eng._key = jax.random.PRNGKey(1)
    full2, _ = eng.stylize_next_full(c2, prev, flow, cert)
    eng._key = jax.random.PRNGKey(1)
    reuse2, _ = eng.stylize_next_reuse(c2, prev, flow, cert, delta)
    eng._key = jax.random.PRNGKey(1)
    stale2, _ = eng.stylize_next_reuse(c2, prev, flow * 0, cert, delta)

    inner = (slice(6, 26), slice(10, 38))
    err_adv = np.abs(np.asarray(reuse2)[inner] - np.asarray(full2)[inner]).mean()
    err_stale = np.abs(np.asarray(stale2)[inner] - np.asarray(full2)[inner]).mean()
    assert np.isfinite(err_adv)
    # advecting by the true flow must beat not advecting at all
    assert err_adv < 0.7 * err_stale, (err_adv, err_stale)


def test_stylize_batch_mixed_sizes():
    """Each output is cropped to ITS frame's size (the batch pads to the
    largest frame) — a mixed-size batch must not inherit frame 0's crop."""
    eng = make_engine(_content_echo_model, stride=4)
    rng = np.random.default_rng(7)
    frames = [rng.random((8, 12, 3)).astype(np.float32),
              rng.random((16, 8, 3)).astype(np.float32)]
    outs = eng.stylize_batch(frames)
    assert outs[0].shape == (8, 12, 3)
    assert outs[1].shape == (16, 8, 3)
    for f, o in zip(frames, outs):
        expect = np.clip(np.asarray(vgg_deprocess(vgg_preprocess(f))), 0, 1)
        np.testing.assert_allclose(np.asarray(o), expect, atol=1e-5)


def test_phase_resident_step_matches_plain():
    """The phase-resident step (uint8 content, phased warp, phase-space cert
    erosion, phase-io net, phased deprocess) must reproduce the plain
    _next_impl + nearest-upsampled provider cert within float tolerance."""
    import jax.numpy as jnp
    from fast_artistic_videos_tpu.models import arch_dsl, stylizer
    from fast_artistic_videos_tpu.ops import phase as phase_ops

    spec = arch_dsl.parse_arch("canonical", in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(3), spec)
    apply_vid = lambda p, x: stylizer.apply(p, spec, x)  # noqa: E731
    apply_phased = lambda p, x: stylizer.apply(  # noqa: E731
        p, spec, x, phase_input=True, phase_output=True, fold_preprocess=True)
    eng = StylizerEngine(
        apply_vid, params, stride_multiple=spec.total_stride,
        config=EngineConfig(),
        apply_vid_phased=apply_phased, phase_pad_blocks=spec.input_pad // 4)
    assert eng.supports_phase_resident

    rng = np.random.default_rng(21)
    h, w = 48, 64
    content_u8 = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    prev = rng.random((h, w, 3)).astype(np.float32)
    cert_low = (rng.random((h // 2, w // 2)) > 0.25).astype(np.float32)
    flow = ((rng.random((h, w, 2)) - 0.5) * 6).astype(np.float32)
    band = 8

    with jax.default_matmul_precision("highest"):
        # plain path: full-res nearest-upsampled cert, banded warp
        cert_full = np.repeat(np.repeat(cert_low, 2, 0), 2, 1)
        want = eng.stylize_next(content_u8.astype(np.float32) / 255.0, prev,
                                flow, cert_full, band_hint=band)
        got_p = eng.stylize_next_phased(
            jnp.asarray(content_u8), eng.to_phased(prev),
            phase_ops.s2d2_flat(jnp.asarray(flow)[None])[0], 
            jnp.asarray(cert_low), band_hint=band)
    got = np.asarray(phase_ops.d2s2_flat(jnp.asarray(got_p)[None], 3))[0]
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5)
    # and the writer-path conversion round-trips
    u8 = np.asarray(eng.phased_to_u8(got_p))
    assert u8.shape == (h, w, 3) and u8.dtype == np.uint8
    np.testing.assert_allclose(
        u8 / 255.0, np.asarray(want), atol=0.5 / 255 + 1e-4)


def test_u8_content_and_emit_u8_match_f32_path():
    """uint8 content converts in-program and emit_u8 returns the same
    quantized frame the drivers previously produced with a separate jit
    (driver_video.py round-4: the epilogue fuses into the step, saving a
    full extra pass over the float output)."""
    eng = make_engine(_prior_echo_model)
    rng = np.random.default_rng(7)
    content_u8 = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
    content_f = content_u8.astype(np.float32) / 255.0
    prev = rng.random((8, 10, 3)).astype(np.float32)
    flow = (rng.random((8, 10, 2)).astype(np.float32) - 0.5) * 3.0
    cert = (rng.random((8, 10)) > 0.3).astype(np.float32)

    want = eng.stylize_next(content_f, prev, flow, cert)
    got, got_u8 = eng.stylize_next(content_u8, prev, flow, cert, emit_u8=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=0)
    expect_u8 = np.clip(np.round(np.asarray(want) * 255.0), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(got_u8), expect_u8)

    wantf, wantf_u8 = eng.stylize_first(content_f, emit_u8=True)
    gotf, gotf_u8 = eng.stylize_first(content_u8, emit_u8=True)
    np.testing.assert_allclose(np.asarray(gotf), np.asarray(wantf),
                               atol=1e-6, rtol=0)
    np.testing.assert_array_equal(np.asarray(gotf_u8), np.asarray(wantf_u8))


def test_warp_kernel_pallas_matches_xla():
    """EngineConfig.warp_kernel='pallas' (the large-band TPU path,
    interpret-mode on CPU) must produce the same step output as the XLA
    banded warp — the two dispatch arms of StylizerEngine._banded_warp."""
    rng = np.random.default_rng(3)
    content = rng.random((16, 24, 3)).astype(np.float32)
    prev = rng.random((16, 24, 3)).astype(np.float32)
    flow = (rng.random((16, 24, 2)).astype(np.float32) - 0.5) * 6
    cert = (rng.random((16, 24)) > 0.3).astype(np.float32)

    def run(wk):
        eng = StylizerEngine(
            _prior_echo_model, params_vid=None, stride_multiple=1,
            config=EngineConfig(occlusions_min_filter=3, warp_kernel=wk,
                                seed=7))
        return np.asarray(eng.stylize_next(content, prev, flow, cert,
                                           band_hint=8))

    np.testing.assert_allclose(run("pallas"), run("xla"), atol=1e-5)


def test_flow_band_ladder():
    from fast_artistic_videos_tpu.ops.warp import flow_band

    assert flow_band(0.5) == 8
    assert flow_band(8.0) == 8
    assert flow_band(8.1) == 16
    assert flow_band(18.7) == 24
    assert flow_band(33.0) == 40
    assert flow_band(48.1) == 56
    assert flow_band(64.1) == 128
