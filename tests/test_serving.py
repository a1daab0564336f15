"""Multi-stream serving pool (video/serving.py) on the virtual device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_artistic_videos_tpu.models import arch_dsl, stylizer
from fast_artistic_videos_tpu.video.engine import EngineConfig, StylizerEngine
from fast_artistic_videos_tpu.video.serving import StreamPool

ARCH = "c3s1-8,d16,R16,U2,c3s1-3"


@pytest.fixture(scope="module")
def model():
    spec = arch_dsl.parse_arch(ARCH, in_channels=7)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    return spec, params


def _clip(rng, n=3, h=16, w=24):
    base = rng.random((h, w + 2 * n, 3)).astype(np.float32)
    frames = [base[:, 2 * i:2 * i + w] for i in range(n)]
    flow = np.zeros((h, w, 2), np.float32)
    flow[..., 0] = -2.0
    cert = np.ones((h, w), np.float32)
    cert[:, :2] = 0.0
    return frames, flow, cert


def test_pool_streams_match_solo_engine(model, rng):
    """Each pooled stream's recurrence must equal a solo single-engine run
    of the same clip — pooling changes placement, not math."""
    spec, params = model
    frames_a, flow, cert = _clip(rng)
    frames_b, _, _ = _clip(rng)

    pool = StreamPool(spec, params, n_streams=3, dtype="float32")
    outs = {0: [], 1: [], 2: []}
    clips = {0: frames_a, 1: frames_b, 2: frames_a}
    for t in range(3):
        for s in range(3):
            fc = None if t == 0 else (flow, cert)
            outs[s].append(np.asarray(pool.process(s, clips[s][t], fc)))

    for s, frames in clips.items():
        eng = StylizerEngine(
            lambda p, x: stylizer.apply(p, spec, x), params_vid=params,
            stride_multiple=spec.total_stride,
            config=EngineConfig(dtype="float32"))
        prev = None
        for t in range(3):
            if t == 0:
                prev = eng.stylize_first(frames[t])
            else:
                prev = eng.stylize_next(frames[t], prev, flow, cert)
            np.testing.assert_allclose(outs[s][t], np.asarray(prev),
                                       atol=1e-5,
                                       err_msg=f"stream {s} frame {t}")


def test_pool_pins_streams_round_robin(model, rng):
    """Stream i's carried state must live on devices[i % N] — that is the
    whole point (independent streams scale by chip)."""
    spec, params = model
    devices = jax.local_devices()
    assert len(devices) >= 4
    pool = StreamPool(spec, params, n_streams=len(devices) + 1,
                      devices=devices, dtype="float32")
    frames, flow, cert = _clip(rng)
    for s in range(pool.n_streams):
        out = pool.process(s, frames[0])
        want = devices[s % len(devices)]
        assert pool.device_of(s) == want
        assert want in out.sharding.device_set, (
            f"stream {s} output on {out.sharding.device_set}, want {want}")
    # wrap-around stream shares device 0's engine
    assert pool.device_of(0) == pool.device_of(len(devices))


def test_pool_streaming_flow_and_reset(model, rng):
    """Pool-managed streaming flow: per-stream providers keep independent
    pyramid caches; reset() restarts a stream slot as frame-1."""
    from fast_artistic_videos_tpu.flow import estimator as fest

    spec, params = model
    fparams = fest.init_params(jax.random.PRNGKey(1))
    pool = StreamPool(spec, params, flow_params=fparams, n_streams=2,
                      dtype="float32", flow_scale=1.0)
    frames, _, _ = _clip(rng, h=32, w=32)
    first = np.asarray(pool.process(0, frames[0]))
    for t in range(3):
        a = pool.process(0, frames[t] if t else frames[0])
        b = pool.process(1, frames[2 - t])
        assert np.isfinite(np.asarray(a)).all()
        assert np.isfinite(np.asarray(b)).all()
    pool.reset(0)
    again = np.asarray(pool.process(0, frames[0]))
    np.testing.assert_allclose(again, first, atol=1e-5)


def test_serve_streams_cli(tmp_path, rng):
    """The serving CLI: two clips in, per-stream stylized sequences out,
    bundled demo model + bundled flow (zero external files)."""
    from fast_artistic_videos_tpu.cli import serve_streams
    from fast_artistic_videos_tpu.core import io

    base = rng.random((64, 96, 3)).astype(np.float32)
    for s in range(2):
        d = tmp_path / f"clip{s}"
        d.mkdir()
        for t in (1, 2, 3):
            io.save_image(str(d / f"frame_{t:05d}.ppm"),
                          np.roll(base, t * 2 + s * 7, axis=1))
    rc = serve_streams.main([
        "--model_vid", "demo", "--flow_model", "bundled",
        "--inputs", ",".join(str(tmp_path / f"clip{s}" / "frame_%05d.ppm")
                             for s in range(2)),
        "--output_dir", str(tmp_path / "out"),
        "--dtype", "float32",
    ])
    assert rc == 0
    for s in range(2):
        for t in (1, 2, 3):
            img = io.load_image(str(tmp_path / "out" / f"stream{s}-{t:05d}.png"))
            assert img.shape == (64, 96, 3)
            assert np.isfinite(img).all()
