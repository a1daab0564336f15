import numpy as np
import jax.numpy as jnp
import pytest

from fast_artistic_videos_tpu.core import io
from fast_artistic_videos_tpu.ops import warp
from fast_artistic_videos_tpu.video import vr_geometry as vr
from fast_artistic_videos_tpu.video.driver_vr import PROC_ORDER, VRDriver, VROptions
from fast_artistic_videos_tpu.video.engine import EngineConfig, StylizerEngine

HP, WP = 64, 64
OVERLAP = 16


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def test_warp_map_left_covers_right_strip():
    m = vr.perspective_warp_map_left(HP, OVERLAP, WP)
    assert m.shape == (HP, WP, 2)
    # columns outside the right overlap strip are sentinel (unmapped)
    assert np.all(m[:, : WP - OVERLAP] == vr.SENTINEL)
    assert np.any(m[:, WP - OVERLAP :] != vr.SENTINEL)
    # warping ones produces a mask supported only on the strip
    ones = jnp.ones((HP, WP, 1))
    mask = np.asarray(warp.bilinear_warp(ones, jnp.asarray(m)))[..., 0]
    assert mask[:, : WP - OVERLAP].max() == 0.0
    assert mask[HP // 2, WP - 2] > 0.5


def test_warp_map_right_structure():
    ml = vr.perspective_warp_map_left(HP, OVERLAP, WP)
    mr = vr.perspective_warp_map_right(HP, OVERLAP, WP)
    assert np.all(mr[:, OVERLAP:] == vr.SENTINEL)
    # left map samples leftward (dx < 0 pulls content from the left face
    # half); right map samples rightward
    assert ml[:, WP - OVERLAP :, 0].max() < 0
    assert mr[:, :OVERLAP, 0].min() > 0
    # vertical offsets roughly mirror (reference formulas are off-by-one
    # asymmetric between the two sides, so only approximate)
    np.testing.assert_allclose(
        ml[:, WP - OVERLAP :, 1], mr[:, :OVERLAP, 1][:, ::-1], atol=3.0
    )


def test_warp_map_top_bottom_transpose_of_left_right():
    mt = vr.perspective_warp_map_top(WP, OVERLAP, HP)
    ml = vr.perspective_warp_map_left(HP, OVERLAP, WP)
    # top map's (dy, dx) equals left map's (dx, dy) transposed
    np.testing.assert_allclose(mt[:, :, 1], ml[:, :, 0].T, atol=1e-4)
    np.testing.assert_allclose(mt[:, :, 0], ml[:, :, 1].T, atol=1e-4)
    mb = vr.perspective_warp_map_bottom(WP, OVERLAP, HP)
    assert np.all(mb[OVERLAP:, :] == vr.SENTINEL)


def test_equirectangular_map_in_range():
    m = vr.cube_to_equirectangular_map(32, 32, 8, 8, 64, 32)
    assert m.shape == (32, 64, 2)
    xs = np.arange(64)[None, :] + m[..., 0]
    ys = np.arange(32)[:, None] + m[..., 1]
    # samples must land inside the 6-face strip (6*32 wide, 32 tall)
    assert xs.min() >= 0 and xs.max() <= 6 * 32
    assert ys.min() >= -1 and ys.max() <= 32


def test_rotations_match_reference_semantics():
    x = np.arange(12, dtype=np.float32).reshape(3, 4, 1)
    r = vr.rotate90(x)
    assert r.shape == (4, 3, 1)
    # reference rotate90 = transpose then reverse rows
    np.testing.assert_array_equal(r[..., 0], x[..., 0].T[::-1])
    np.testing.assert_array_equal(vr.rotate180(x), x[::-1, ::-1])
    np.testing.assert_array_equal(
        vr.rotate_minus90(vr.rotate90(x)), x
    )


# ---------------------------------------------------------------------------
# driver mechanics (echo engine exposes the prior at the output)
# ---------------------------------------------------------------------------

def _echo_engine():
    return StylizerEngine(
        lambda p, x: x[..., 3:6],
        params_vid=None,
        stride_multiple=1,
        config=EngineConfig(occlusions_min_filter=3),
    )


@pytest.fixture
def vr_clip(tmp_path, rng):
    d = tmp_path
    (d / "flow").mkdir()
    for f in (1, 2):
        for face in range(1, 7):
            img = rng.random((HP, WP, 3)).astype(np.float32)
            io.save_image(str(d / f"f{f:04d}_{face}.ppm"), img)
    for face in range(1, 7):
        flow = np.zeros((HP, WP, 2), np.float32)
        io.write_flo(str(d / "flow" / f"backward_2_1_{face}.flo"), flow)
        cert = np.full((HP, WP), 255, np.uint8)
        io.write_pgm(str(d / "flow" / f"reliable_2_1_{face}.pgm"), cert)
    return d


def test_vr_driver_runs_two_frames(vr_clip):
    opt = VROptions(
        input_pattern=str(vr_clip / "f%04d_%d.ppm"),
        flow_pattern=str(vr_clip / "flow" / "backward_[%d]_{%d}_%d.flo"),
        occlusions_pattern=str(vr_clip / "flow" / "reliable_[%d]_{%d}_%d.pgm"),
        output_prefix=str(vr_clip / "out" / "o"),
        num_frames=2,
        overlap_pixel_w=OVERLAP,
        overlap_pixel_h=OVERLAP,
        out_cubemap=True,
        median_filter=3,
    )
    driver = VRDriver(_echo_engine(), opt)
    n = driver.run(progress=False)
    assert n == 12
    import os

    for pos in range(6):
        assert os.path.exists(str(vr_clip / "out" / f"o1_{pos}.png"))
        assert os.path.exists(str(vr_clip / "out" / f"o2_{pos}.png"))
    assert os.path.exists(str(vr_clip / "out" / "o-00001_cubemap.png"))
    cm = io.load_image(str(vr_clip / "out" / "o-00001_cubemap.png"))
    side = HP - (3 - 1) - 2 * (OVERLAP // 2 - 3 // 2)  # median shrink + crop
    assert cm.shape == (side, 6 * side, 3)


def test_vr_driver_pallas_strip_warp_matches_gather(vr_clip):
    """The Pallas strip-warp geometry (pallas_strip_warp=True, the TPU
    default) must produce the same face outputs as the gather path — the
    cross-face blend and border priors are the only consumers of the
    static warps."""
    outs = {}
    for flag, sub in ((False, "g"), (True, "p")):
        opt = VROptions(
            input_pattern=str(vr_clip / "f%04d_%d.ppm"),
            flow_pattern=str(vr_clip / "flow" / "backward_[%d]_{%d}_%d.flo"),
            occlusions_pattern=str(vr_clip / "flow" / "reliable_[%d]_{%d}_%d.pgm"),
            output_prefix=str(vr_clip / ("out" + sub) / "o"),
            num_frames=2,
            overlap_pixel_w=OVERLAP,
            overlap_pixel_h=OVERLAP,
            median_filter=3,
            pallas_strip_warp=flag,
        )
        driver = VRDriver(_echo_engine(), opt)
        assert driver.run(progress=False) == 12
        outs[sub] = [
            io.load_image(str(vr_clip / ("out" + sub) / f"o2_{pos}.png"))
            for pos in range(6)
        ]
    for pos in range(6):
        # uint8 quantization: allow 1 LSB from f32 rounding differences
        diff = np.abs(outs["g"][pos].astype(np.int32)
                      - outs["p"][pos].astype(np.int32))
        assert diff.max() <= 1, f"face {pos}: max {diff.max()}"


def test_vr_border_prior_flows_from_neighbor(vr_clip):
    """Face at position 1 gets its right-strip prior from the face at
    position 0 via the left warp map; with the echo engine the stylized
    output IS that prior in the certain region."""
    opt = VROptions(
        input_pattern=str(vr_clip / "f%04d_%d.ppm"),
        flow_pattern=str(vr_clip / "flow" / "backward_[%d]_{%d}_%d.flo"),
        occlusions_pattern=str(vr_clip / "flow" / "reliable_[%d]_{%d}_%d.pgm"),
        output_prefix=str(vr_clip / "out2" / "o"),
        num_frames=1,
        overlap_pixel_w=OVERLAP,
        overlap_pixel_h=OVERLAP,
        median_filter=0,
    )
    driver = VRDriver(_echo_engine(), opt)
    driver.run(progress=False)
    seg0 = driver.segments[0]
    seg1 = driver.segments[1]
    g = driver.geo
    expected = np.asarray(
        warp.bilinear_warp(jnp.asarray(seg0), jnp.asarray(g.map_left))
    )
    # compare on the eroded-certain interior of the right strip
    region = (slice(8, HP - 8), slice(WP - OVERLAP + 4, WP - 4))
    np.testing.assert_allclose(seg1[region], expected[region], atol=2e-2)


def test_vr_equirect_output(vr_clip):
    opt = VROptions(
        input_pattern=str(vr_clip / "f%04d_%d.ppm"),
        output_prefix=str(vr_clip / "out3" / "o"),
        num_frames=1,
        overlap_pixel_w=OVERLAP,
        overlap_pixel_h=OVERLAP,
        create_inconsistent=True,
        out_equi=True,
        out_equi_w=64,
        out_equi_h=32,
        median_filter=3,
    )
    driver = VRDriver(_echo_engine(), opt)
    n = driver.run(progress=False)
    assert n == 6
    import os

    path = str(vr_clip / "out3" / "o-00001_equi.png")
    assert os.path.exists(path)
    assert io.load_image(path).shape == (32, 64, 3)


def test_vr_driver_streaming_flow(vr_clip):
    """On-TPU flow replaces the per-face flow/occlusion files entirely."""
    import jax

    from fast_artistic_videos_tpu.flow import estimator
    from fast_artistic_videos_tpu.flow.provider import StreamingFlowProvider

    params = estimator.init_params(jax.random.PRNGKey(0))
    opt = VROptions(
        input_pattern=str(vr_clip / "f%04d_%d.ppm"),
        output_prefix=str(vr_clip / "outs" / "o"),
        num_frames=2,
        overlap_pixel_w=OVERLAP,
        overlap_pixel_h=OVERLAP,
        median_filter=0,
    )
    driver = VRDriver(
        _echo_engine(), opt,
        flow_provider_factory=lambda: StreamingFlowProvider(params, use_structure=False),
    )
    n = driver.run(progress=False)
    assert n == 12
    assert all(s is not None for s in driver._streamed)


def test_equirect_faces_roundtrip(tmp_path):
    """equirect -> 6 faces (transform_vr) -> cube_to_equirectangular_map
    must reconstruct the panorama (smooth test image, interior region)."""
    eq_h, eq_w = 64, 128
    jj, ii = np.mgrid[0:eq_h, 0:eq_w].astype(np.float32)
    equi = np.stack([
        np.sin(ii / eq_w * 2 * np.pi) * 0.25 + 0.5,
        np.cos(jj / eq_h * np.pi) * 0.25 + 0.5,
        np.sin((ii + jj) / 40) * 0.2 + 0.5,
    ], -1)
    ow = oh = 8
    face = 32
    hplus, wplus = face + oh, face + ow
    faces = vr.equirect_to_faces(equi, hplus, wplus, ow, oh)
    assert set(faces) == {1, 2, 3, 4, 5, 6}
    # rebuild via the driver's strip order: (f,l,r,b,u,d) =
    # faces (6,1,2,5,rot180(3),rot180(4))
    strip = np.concatenate([
        faces[6], faces[1], faces[2], faces[5],
        vr.rotate180(faces[3]), vr.rotate180(faces[4]),
    ], axis=1)
    m = vr.cube_to_equirectangular_map(wplus, hplus, ow, oh, eq_w, eq_h)
    rec = np.asarray(warp.bilinear_warp(jnp.asarray(strip), jnp.asarray(m)))
    # compare away from the poles (top/bottom rows are heavily resampled)
    inner = (slice(10, eq_h - 10), slice(0, eq_w))
    err = np.abs(rec[inner] - equi[inner]).mean()
    assert err < 0.02, err


def test_transform_vr_cli(tmp_path):
    from fast_artistic_videos_tpu.cli import transform_vr

    eq = np.random.default_rng(0).random((32, 64, 3)).astype(np.float32)
    io.save_image(str(tmp_path / "equi_00001.png"), eq)
    rc = transform_vr.main([
        "--input_pattern", str(tmp_path / "equi_%05d.png"),
        "--output_pattern", str(tmp_path / "faces" / "f%04d_%d.ppm"),
        "--face_size", "16",
        "--overlap_pixel_w", "4",
        "--overlap_pixel_h", "4",
    ])
    assert rc == 0
    import os

    for n in range(1, 7):
        path = str(tmp_path / "faces" / f"f0001_{n}.ppm")
        assert os.path.exists(path)
        assert io.load_image(path).shape == (20, 20, 3)


def test_vr_driver_with_evaluator(vr_clip, tmp_path):
    import jax

    from fast_artistic_videos_tpu.models import vgg as vggmod
    from fast_artistic_videos_tpu.video.evaluation import VREvaluator

    vgg_path = str(tmp_path / "vgg.npz")
    params = vggmod.init_params(jax.random.PRNGKey(0))
    flat = {}
    for layer, leaves in params.items():
        for k, v in leaves.items():
            flat[f"{layer}/{k}"] = np.asarray(v)
    np.savez(vgg_path, **flat)
    style_path = str(tmp_path / "style.png")
    io.save_image(style_path, np.random.default_rng(0).random((32, 32, 3)))

    opt = VROptions(
        input_pattern=str(vr_clip / "f%04d_%d.ppm"),
        flow_pattern=str(vr_clip / "flow" / "backward_[%d]_{%d}_%d.flo"),
        occlusions_pattern=str(vr_clip / "flow" / "reliable_[%d]_{%d}_%d.pgm"),
        output_prefix=str(vr_clip / "oute" / "o"),
        num_frames=2,
        overlap_pixel_w=OVERLAP,
        overlap_pixel_h=OVERLAP,
        median_filter=0,
        evaluate=True,
        evaluation_file=str(vr_clip / "vr_eval.txt"),
        loss_network=vgg_path,
        style_image=style_path,
        style_image_size=32,
    )
    driver = VRDriver(_echo_engine(), opt, eval_fn=VREvaluator(opt))
    n = driver.run(progress=False)
    assert n == 12
    assert len(driver.eval_rows) == 12
    lines = open(str(vr_clip / "vr_eval.txt")).read().strip().split("\n")
    # 7 metrics: series + means
    assert len(lines) == 14
    assert lines[0].count(";") == 11


def test_stylize_vr_video_file_one_command(tmp_path):
    """One-command VR pipeline (stylizeVRVideo_*.sh parity minus ffmpeg):
    synthetic equirect clip in -> face split -> streaming per-face flow +
    stylize -> stylized equirect frames out, single invocation."""
    import os

    import jax

    from fast_artistic_videos_tpu.cli import stylize_vr_video_file
    from fast_artistic_videos_tpu.flow import estimator as fest
    from fast_artistic_videos_tpu.models import arch_dsl, checkpoint, stylizer

    rng = np.random.default_rng(3)
    equi_dir = tmp_path / "equi"
    equi_dir.mkdir()
    base = rng.random((48, 96, 3)).astype(np.float32)
    for f in (1, 2):
        io.save_image(str(equi_dir / f"equi_{f:05d}.ppm"),
                      np.roll(base, (f - 1) * 2, axis=1))

    arch = "c3s1-8,d16,R16,U2,c3s1-3"
    spec = arch_dsl.parse_arch(arch, in_channels=7)
    model = str(tmp_path / "vid.npz")
    checkpoint.save_model(
        model, stylizer.init_params(jax.random.PRNGKey(0), spec),
        {"arch": arch, "in_channels": 7, "padding_type": "reflect-start",
         "use_instance_norm": True, "tanh_constant": 150.0})
    flow_model = str(tmp_path / "flow.npz")
    fest.save_params(flow_model, fest.init_params(jax.random.PRNGKey(1)))

    out_dir = str(tmp_path / "work")
    rc = stylize_vr_video_file.main([
        "--frames_dir", str(equi_dir),
        "--model_vid", model,
        "--flow_model", flow_model,
        "--face_size", "16",
        "--overlap_pixel_w", "12",
        "--overlap_pixel_h", "12",
        "--out_dir", out_dir,
    ])
    assert rc == 0
    for f in (1, 2):
        path = os.path.join(out_dir, f"out-{f:05d}_equi.png")
        assert os.path.exists(path), path
        img = io.load_image(path)
        assert img.shape == (48, 96, 3)
        assert img.std() > 0.01
    # per-face intermediates are cleaned up by default
    assert not os.path.exists(os.path.join(out_dir, "out1_0.png"))


def test_vr_driver_batched_flow_fast_check(vr_clip):
    """The VR CLI's --fast_check reaches the batched 6-face provider: the
    driver must run end-to-end with the fast cross-check direction."""
    import jax

    from fast_artistic_videos_tpu.flow import estimator
    from fast_artistic_videos_tpu.flow.provider import (
        BatchedStreamingFlowProvider)

    params = estimator.init_params(jax.random.PRNGKey(0))
    opt = VROptions(
        input_pattern=str(vr_clip / "f%04d_%d.ppm"),
        output_prefix=str(vr_clip / "outfc" / "o"),
        num_frames=2,
        overlap_pixel_w=OVERLAP,
        overlap_pixel_h=OVERLAP,
        median_filter=0,
    )
    driver = VRDriver(
        _echo_engine(), opt,
        batched_flow_provider=BatchedStreamingFlowProvider(
            params, use_structure=False, fast_check=True),
    )
    assert driver.run(progress=False) == 12
    import os

    for pos in range(6):
        assert os.path.exists(str(vr_clip / "outfc" / f"o2_{pos}.png"))


def test_vr_streaming_resume_continuity(vr_clip, rng):
    """Interrupted+resumed VR streaming run matches the uninterrupted run:
    on continue_with the driver primes the batched flow provider with the
    last completed frame's input faces, so the resumed frame warps the
    reloaded faces instead of falling back to a border-only prior
    (VERDICT r3 weak #4; fast_artistic_video_vr.lua:576-583 reloads and
    warps the previous faces the same way)."""
    import os
    import shutil

    import jax

    from fast_artistic_videos_tpu.flow import estimator
    from fast_artistic_videos_tpu.flow.provider import (
        BatchedStreamingFlowProvider)

    # third frame for the resume step (fixture ships two)
    for face in range(1, 7):
        img = rng.random((HP, WP, 3)).astype(np.float32)
        io.save_image(str(vr_clip / f"f0003_{face}.ppm"), img)
    params = estimator.init_params(jax.random.PRNGKey(0))

    def run(outdir, continue_with=0):
        opt = VROptions(
            input_pattern=str(vr_clip / "f%04d_%d.ppm"),
            output_prefix=str(vr_clip / outdir / "o"),
            num_frames=3,
            continue_with=continue_with,
            overlap_pixel_w=OVERLAP,
            overlap_pixel_h=OVERLAP,
            median_filter=0,
        )
        driver = VRDriver(
            _echo_engine(), opt,
            batched_flow_provider=BatchedStreamingFlowProvider(
                params, use_structure=False),
        )
        return driver.run(progress=False)

    assert run("full") == 18
    (vr_clip / "res").mkdir()
    for pos in range(6):  # frames 1-2 already written by the "interrupted" run
        for f in (1, 2):
            shutil.copy(str(vr_clip / "full" / f"o{f}_{pos}.png"),
                        str(vr_clip / "res" / f"o{f}_{pos}.png"))
    assert run("res", continue_with=2) == 6
    for pos in range(6):
        a = io.load_image(str(vr_clip / "full" / f"o3_{pos}.png"))
        b = io.load_image(str(vr_clip / "res" / f"o3_{pos}.png"))
        np.testing.assert_allclose(a, b, atol=0.05)


def test_vr_fused_face_step_matches_staged(rng):
    """The streaming path's fused one-program face step (_run_face_fused:
    border cert max + erosion + border prior + temporal blend + stylize in
    one jit) must reproduce the staged load_cert + min_filter + make_prior
    + stylize_with_prior chain — covering border-only (pos 0), single-side
    (pos 1) and all-sides (pos 4) priors, plus the stride-padding branch
    (stride 4 on a 30-px face)."""
    import types

    from fast_artistic_videos_tpu.ops import filters
    from fast_artistic_videos_tpu.video.driver_vr import _Geometry

    hp = wp = 30  # NOT a multiple of 4: exercises the fused stride padding
    for stride in (1, 4):
        engine = StylizerEngine(
            lambda p, x: x[..., 3:6], params_vid=None,
            stride_multiple=stride,
            config=EngineConfig(occlusions_min_filter=3))
        opt = VROptions(overlap_pixel_w=12, overlap_pixel_h=12,
                        occlusions_min_filter=3)
        driver = VRDriver(engine, opt)
        driver.geo = _Geometry(hp, wp, opt)
        driver.streaming = True
        driver.batched_flow = types.SimpleNamespace(last_band=4)
        driver.segments = [rng.random((hp, wp, 3)).astype(np.float32)
                           for _ in range(6)]
        driver.prev_segments = [rng.random((hp, wp, 3)).astype(np.float32)
                                for _ in range(6)]
        flow = (rng.random((hp, wp, 2)).astype(np.float32) - 0.5) * 6.0
        cert = (rng.random((hp, wp)) > 0.3).astype(np.float32)
        img = rng.random((hp, wp, 3)).astype(np.float32)
        for pos in (0, 1, 4):
            i = 7 + pos
            driver._streamed[pos] = (jnp.asarray(flow), jnp.asarray(cert))
            c = driver.load_cert(i)
            cert_er = filters.min_filter(jnp.asarray(c),
                                         opt.occlusions_min_filter)
            prior = driver.make_prior(i, cert_er)
            want = engine.stylize_with_prior(
                jnp.asarray(img), prior.astype(jnp.float32), cert_er,
                erode_cert=False)
            got = driver._run_face_fused(i, jnp.asarray(img))
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-5)
        # border-only form: frame 1 faces (i < 7) never take the temporal
        # branch even with streamed flow present
        i = 2  # pos 1, frame 1
        driver._streamed[1] = (jnp.asarray(flow), jnp.asarray(cert))
        c = driver.load_cert(i)
        cert_er = filters.min_filter(jnp.asarray(c), opt.occlusions_min_filter)
        prior = driver.make_prior(i, cert_er)
        want = engine.stylize_with_prior(
            jnp.asarray(img), prior.astype(jnp.float32), cert_er,
            erode_cert=False)
        got = driver._run_face_fused(i, jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
