import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_artistic_videos_tpu.core import io
from fast_artistic_videos_tpu.flow import consistency

TOOL_DIR = os.path.join(os.path.dirname(__file__), "..", "tools", "consistencyChecker")


def _smooth(a, it=12):
    for _ in range(it):
        a = 0.25 * (np.roll(a, 1, 0) + np.roll(a, -1, 0) + np.roll(a, 1, 1) + np.roll(a, -1, 1))
    return a


def test_identity_flow_reliable_except_border():
    f = np.zeros((10, 12, 2), np.float32)
    m = np.asarray(consistency.consistency_mask(jnp.asarray(f), jnp.asarray(f)))
    # last row/col: bilinear corner x1+1 falls outside -> unreliable
    np.testing.assert_allclose(m[:-1, :-1], 1.0)
    np.testing.assert_allclose(m[-1, :], 0.0)
    np.testing.assert_allclose(m[:, -1], 0.0)


def test_consistent_shift_reliable():
    f1 = np.zeros((16, 16, 2), np.float32)
    f1[..., 0] = 3.0
    f2 = -f1
    m = np.asarray(consistency.consistency_mask(jnp.asarray(f1), jnp.asarray(f2)))
    np.testing.assert_allclose(m[:-1, :-4], 1.0)


def test_inconsistent_flow_unreliable():
    f1 = np.zeros((16, 16, 2), np.float32)
    f1[..., 0] = 5.0
    f2 = np.zeros_like(f1)  # round-trip error 25 >= 0.01*25 + 0.5
    m = np.asarray(consistency.consistency_mask(jnp.asarray(f1), jnp.asarray(f2)))
    np.testing.assert_allclose(m, 0.0)


def test_structure_term_relaxes_homogeneous_regions():
    rng = np.random.default_rng(0)
    f1 = np.zeros((32, 32, 2), np.float32)
    f1[..., 0] = 1.0
    f2 = -f1 + 0.9  # borderline inconsistency: roundtrip 0.81 vs 0.01*~2+0.5
    img = np.zeros((32, 32, 3), np.float32)
    img[:, 16:] = rng.random((32, 16, 3)).astype(np.float32)  # textured right half
    m_plain = np.asarray(consistency.consistency_mask(jnp.asarray(f1), jnp.asarray(f2)))
    m_struct = np.asarray(
        consistency.consistency_mask(jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(img))
    )
    # without structure: everything fails the check
    assert m_plain[:-1, :-2].max() == 0.0
    # with structure: the flat (left) region is forgiven
    assert m_struct[8:24, 2:8].min() > 0.999


def test_central_diff_symmetric_boundary():
    x = jnp.asarray(np.array([[1.0, 2.0, 4.0, 7.0]], np.float32))
    d = np.asarray(consistency.central_diff(x, axis=1))
    np.testing.assert_allclose(d[0], [0.5, 1.5, 2.5, 1.5])


@pytest.fixture(scope="session")
def checker_binary():
    path = os.path.join(TOOL_DIR, "consistency_checker")
    subprocess.run(["make", "-C", TOOL_DIR], check=True, capture_output=True)
    return path


def test_cpp_tool_matches_jax(checker_binary, tmp_path, rng):
    H, W = 48, 56
    f1 = np.stack(
        [_smooth(rng.normal(size=(H, W))) * 8, _smooth(rng.normal(size=(H, W))) * 8], -1
    ).astype(np.float32)
    f1[:, 30:, 0] += 6.0
    f2 = (-f1 + rng.normal(size=f1.shape) * 0.05).astype(np.float32)
    io.write_flo(str(tmp_path / "f1.flo"), f1)
    io.write_flo(str(tmp_path / "f2.flo"), f2)
    out = str(tmp_path / "out.pgm")
    subprocess.run([checker_binary, str(tmp_path / "f1.flo"), str(tmp_path / "f2.flo"), out],
                   check=True)
    cpp = io.read_pnm(out).astype(np.float32) / 255.0
    jx = np.asarray(consistency.consistency_mask(jnp.asarray(f1), jnp.asarray(f2)))
    # no structure term: implementations share exact math -> identical
    assert (np.abs(cpp - jx) > 1e-6).mean() < 1e-3


def test_cpp_tool_with_structure(checker_binary, tmp_path, rng):
    H, W = 48, 56
    f1 = np.stack(
        [_smooth(rng.normal(size=(H, W))) * 4, _smooth(rng.normal(size=(H, W))) * 4], -1
    ).astype(np.float32)
    f2 = (-f1 + rng.normal(size=f1.shape) * 0.4).astype(np.float32)
    img = (_smooth(rng.normal(size=(H, W)))[..., None] * 0.3 + 0.5).clip(0, 1)
    img = np.repeat(img, 3, axis=2).astype(np.float32)
    io.write_flo(str(tmp_path / "f1.flo"), f1)
    io.write_flo(str(tmp_path / "f2.flo"), f2)
    io.save_image(str(tmp_path / "frame.ppm"), img)
    out = str(tmp_path / "out.pgm")
    subprocess.run(
        [checker_binary, str(tmp_path / "f1.flo"), str(tmp_path / "f2.flo"), out,
         str(tmp_path / "frame.ppm")],
        check=True,
    )
    cpp = io.read_pnm(out).astype(np.float32) / 255.0
    jx = np.asarray(
        consistency.consistency_mask(jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(img))
    )
    # FIR vs recursive Gaussian: only threshold-crossing pixels may differ
    assert (np.abs(cpp - jx) > 1e-6).mean() < 0.03


def test_streaming_mask_native_res_matches_exact():
    """At out_hw == flow resolution the streaming path is the plain mask."""
    f1 = np.zeros((16, 16, 2), np.float32)
    f1[..., 0] = 3.0
    f2 = -f1
    a = np.asarray(consistency.consistency_mask(jnp.asarray(f1), jnp.asarray(f2)))
    b = np.asarray(consistency.consistency_mask_streaming(
        jnp.asarray(f1), jnp.asarray(f2)))
    np.testing.assert_array_equal(a, b)


def test_streaming_mask_upsamples_nearest():
    f1 = np.zeros((8, 12, 2), np.float32)
    f2 = np.zeros_like(f1)
    f1[2:5, 3:7, 0] = 5.0  # inconsistent block (roundtrip 25 >= thresholds)
    m = np.asarray(consistency.consistency_mask_streaming(
        jnp.asarray(f1), jnp.asarray(f2), out_hw=(16, 24)))
    assert m.shape == (16, 24)
    low = np.asarray(consistency.consistency_mask(jnp.asarray(f1), jnp.asarray(f2)))
    np.testing.assert_array_equal(m, np.repeat(np.repeat(low, 2, 0), 2, 1))


def test_streaming_mask_structure_resizes_image(rng):
    f1 = np.zeros((16, 16, 2), np.float32)
    f1[..., 0] = 1.0
    f2 = -f1 + 0.9  # borderline: forgiven only where structure is flat
    img_full = np.zeros((32, 32, 3), np.float32)
    img_full[:, 16:] = rng.random((32, 16, 3)).astype(np.float32)
    m = np.asarray(consistency.consistency_mask_streaming(
        jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(img_full),
        out_hw=(32, 32)))
    assert m.shape == (32, 32)
    assert m[8:24, 0:8].min() > 0.999  # flat left region forgiven
    assert m[8:24, 24:].max() < 1.0  # textured right fails somewhere


def test_provider_flow_res_consistency_matches_fullres_shapes(rng):
    """Streaming provider with consistency_at_flow_res: same output shapes
    and a mask that agrees with the full-res check on easy (consistent)
    motion away from borders."""
    from fast_artistic_videos_tpu.flow import estimator as fest
    from fast_artistic_videos_tpu.flow.provider import StreamingFlowProvider

    params = fest.init_params(jax.random.PRNGKey(0))
    est = fest.FlowEstimator(params)
    frames = [rng.random((64, 96, 3)).astype(np.float32) for _ in range(3)]
    outs = {}
    for lowres in (False, True):
        prov = StreamingFlowProvider(
            flow_estimator=est, use_structure=False, flow_scale=0.5,
            consistency_at_flow_res=lowres)
        for f in frames:
            fc = prov(f)
        outs[lowres] = fc
    (bwd_a, cert_a), (bwd_b, cert_b) = outs[False], outs[True]
    assert bwd_a.shape == bwd_b.shape == (64, 96, 2)
    assert cert_a.shape == cert_b.shape == (64, 96)
    np.testing.assert_allclose(np.asarray(bwd_a), np.asarray(bwd_b),
                               rtol=1e-5, atol=1e-5)


REF_CHECKER_DIR = "/root/reference/consistencyChecker"


@pytest.fixture(scope="session")
def reference_binary(tmp_path_factory):
    """Compile the actual reference consistencyChecker (Brox C++ sources).

    Skips when the reference tree is not present (e.g. a standalone clone of
    this repo); in the build container the sources are read-only at
    /root/reference and compile with plain g++."""
    if not os.path.exists(os.path.join(REF_CHECKER_DIR, "consistencyChecker.cpp")):
        pytest.skip("reference consistencyChecker sources not available")
    out = str(tmp_path_factory.mktemp("refchk") / "ref_checker")
    subprocess.run(
        ["g++", "-O2", "-w", "-o", out,
         os.path.join(REF_CHECKER_DIR, "consistencyChecker.cpp"),
         os.path.join(REF_CHECKER_DIR, "NMath.cpp"),
         "-I", REF_CHECKER_DIR],
        check=True, capture_output=True,
    )
    return out


@pytest.mark.parametrize("with_structure", [False, True])
def test_cpp_tool_bit_exact_vs_reference_binary(
    checker_binary, reference_binary, tmp_path, rng, with_structure
):
    """README claims bit-exactness vs the reference binary; enforce it here
    (consistencyChecker.cpp:80-172), with and without the structure image."""
    H, W = 96, 128
    f1 = np.stack(
        [_smooth(rng.normal(size=(H, W))) * 8, _smooth(rng.normal(size=(H, W))) * 8], -1
    ).astype(np.float32)
    f1[:, 60:, 0] += 6.0
    f2 = (-f1 + rng.normal(size=f1.shape) * 0.05).astype(np.float32)
    io.write_flo(str(tmp_path / "f1.flo"), f1)
    io.write_flo(str(tmp_path / "f2.flo"), f2)
    extra = []
    if with_structure:
        img = (_smooth(rng.normal(size=(H, W)))[..., None] * 0.3 + 0.5).clip(0, 1)
        img = np.repeat(img, 3, axis=2).astype(np.float32)
        io.save_image(str(tmp_path / "frame.ppm"), img)
        extra = [str(tmp_path / "frame.ppm")]
    args = [str(tmp_path / "f1.flo"), str(tmp_path / "f2.flo")]
    subprocess.run([reference_binary, *args, str(tmp_path / "ref.pgm"), *extra],
                   check=True, capture_output=True)
    subprocess.run([checker_binary, *args, str(tmp_path / "ours.pgm"), *extra],
                   check=True, capture_output=True)
    with open(tmp_path / "ref.pgm", "rb") as f:
        ref_bytes = f.read()
    with open(tmp_path / "ours.pgm", "rb") as f:
        our_bytes = f.read()
    assert ref_bytes == our_bytes


def test_cpp_tool_bad_args(checker_binary, tmp_path):
    r = subprocess.run([checker_binary], capture_output=True)
    assert r.returncode == 2
    r = subprocess.run(
        [checker_binary, "/nonexistent.flo", "/nonexistent.flo", str(tmp_path / "o.pgm")],
        capture_output=True,
    )
    assert r.returncode == 1
    assert b"cannot open" in r.stderr


def test_banded_consistency_matches_exact_on_smooth_flow():
    """The streaming provider's banded sample must agree with the exact
    gather path for realistic (low-strain) flow fields; disagreements sit
    on the decision thresholds."""
    from fast_artistic_videos_tpu.flow import train as flow_train

    f1 = flow_train.random_flow_field(np.random.default_rng(0), 192, 224,
                                      max_shift=10)
    f2 = (-f1 + np.random.default_rng(5).normal(size=f1.shape) * 0.05).astype(
        np.float32
    )
    exact = np.asarray(consistency.consistency_mask(jnp.asarray(f1), jnp.asarray(f2)))
    fast = np.asarray(
        consistency.consistency_mask(jnp.asarray(f1), jnp.asarray(f2), band=32)
    )
    assert (exact != fast).mean() < 0.02


def test_banded_consistency_constant_flow_exact():
    f1 = np.zeros((16, 16, 2), np.float32)
    f1[..., 0] = 3.0
    f2 = -f1
    a = np.asarray(consistency.consistency_mask(jnp.asarray(f1), jnp.asarray(f2)))
    b = np.asarray(consistency.consistency_mask(jnp.asarray(f1), jnp.asarray(f2), band=8))
    np.testing.assert_array_equal(a, b)


def test_banded_warp_error_confined_to_unreliable_region():
    """Adversarial bound on the banded-warp approximation (ops/warp.py:76-86).

    The banded path evaluates dy at the horizontal tap columns, so it
    diverges from the exact gather only where dy jumps between the two tap
    columns — a motion discontinuity. This builds the worst case (a step in
    dy with fractional dx, so the taps straddle the step), and asserts the
    contract the drivers rely on: every pixel where banded != exact is
    marked unreliable (0) by the consistency check of the same flow pair,
    i.e. the approximation error never leaks into pixels whose warped prior
    the stylizer is told to trust.
    """
    from fast_artistic_videos_tpu.ops import warp

    h, w = 64, 64
    rng = np.random.default_rng(7)
    img = rng.uniform(size=(h, w, 3)).astype(np.float32)

    flow = np.zeros((h, w, 2), np.float32)
    flow[..., 0] = 0.5                # fractional dx: taps at x and x+1
    flow[:, :32, 1] = 4.0             # dy step across column 32 (divergent
    flow[:, 32:, 1] = -4.0            # motion: the two halves move apart)

    exact = np.asarray(warp.bilinear_warp(jnp.asarray(img), jnp.asarray(flow)))
    banded = np.asarray(warp.bilinear_warp(jnp.asarray(img), jnp.asarray(flow), band=8))
    err = np.abs(exact - banded).max(axis=-1)

    # The adversarial field must actually exercise the approximation...
    assert err.max() > 0.05, "adversarial field failed to trigger the banded approximation"

    mask = np.asarray(
        consistency.consistency_mask(jnp.asarray(flow), jnp.asarray(-flow))
    )
    # ...and every erring pixel must be consistency-masked (mask == 0).
    leaking = (err > 1e-6) & (mask > 0.0)
    assert not leaking.any(), (
        f"banded-warp error leaks into {int(leaking.sum())} pixels the "
        "consistency mask calls reliable"
    )


def test_streaming_erode_window_exact():
    """consistency_mask_streaming(erode_window=w) must equal
    min_filter(nearest-up mask, w) EXACTLY for integer upsample ratios —
    the provider-side erosion that replaces the engine's full-res filter
    (at 4K a ~10 ms stage; BENCH_NOTES round 4)."""
    from fast_artistic_videos_tpu.flow import consistency
    from fast_artistic_videos_tpu.ops import filters

    rng = np.random.default_rng(3)
    for r, w in ((2, 7), (4, 7), (2, 3)):
        hs, ws = 16, 20
        f1 = (rng.random((hs, ws, 2)).astype(np.float32) - 0.5) * 4
        f2 = -f1 + rng.normal(0, 0.3, (hs, ws, 2)).astype(np.float32)
        img = rng.integers(0, 256, (hs * r, ws * r, 3), dtype=np.uint8)
        plain = consistency.consistency_mask_streaming(
            jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(img),
            out_hw=(hs * r, ws * r), band=8)
        want = filters.min_filter(plain, w)
        got = consistency.consistency_mask_streaming(
            jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(img),
            out_hw=(hs * r, ws * r), band=8, erode_window=w)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_streaming_erode_window_native_res():
    """erode_window with out_hw == flow res = a plain min_filter."""
    from fast_artistic_videos_tpu.flow import consistency
    from fast_artistic_videos_tpu.ops import filters

    rng = np.random.default_rng(4)
    hs, ws = 14, 18
    f1 = (rng.random((hs, ws, 2)).astype(np.float32) - 0.5) * 4
    f2 = -f1
    plain = consistency.consistency_mask_streaming(
        jnp.asarray(f1), jnp.asarray(f2), None, out_hw=(hs, ws), band=8)
    want = filters.min_filter(plain, 7)
    got = consistency.consistency_mask_streaming(
        jnp.asarray(f1), jnp.asarray(f2), None, out_hw=(hs, ws), band=8,
        erode_window=7)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_warp_limit_backstop_streaming():
    """warp_limit marks |flow| > limit unreliable, dilated by one flow-res
    pixel (the engine's full-res flow bilinearly mixes 2x2 flow-res
    neighbors); elsewhere the mask is untouched. This is what lets the
    provider hand the engine the plain flow bucket as warp band instead of
    the consistency check's 2x round-trip coverage."""
    hs, ws, r = 16, 20, 2
    f1 = np.zeros((hs, ws, 2), np.float32)
    f1[...] = 2.0
    f1[6:8, 9:11, 0] = 11.0  # beyond limit 8
    f2 = -f1
    base = np.asarray(consistency.consistency_mask_streaming(
        jnp.asarray(f1), jnp.asarray(f2), None, out_hw=(hs * r, ws * r),
        band=16))
    got = np.asarray(consistency.consistency_mask_streaming(
        jnp.asarray(f1), jnp.asarray(f2), None, out_hw=(hs * r, ws * r),
        band=16, warp_limit=8.0))
    # violating block + 1 flow-res pixel ring -> zero (in full-res coords)
    assert got[5 * r:8 * r, 8 * r:12 * r].max() == 0.0
    # outside the dilated ring: identical to the unlimited mask
    keep = np.ones((hs * r, ws * r), bool)
    keep[4 * r:9 * r, 7 * r:13 * r] = False
    np.testing.assert_array_equal(got[keep], base[keep])


def test_warp_limit_backstop_native_res():
    """consistency_mask(warp_limit=L): native-res flow needs no dilation —
    exactly the violating pixels are zeroed."""
    h, w = 16, 16
    f1 = np.zeros((h, w, 2), np.float32)
    f1[..., 0] = 3.0
    f1[5, 5, 1] = -9.0
    f2 = -f1
    base = np.asarray(consistency.consistency_mask(
        jnp.asarray(f1), jnp.asarray(f2), band=16))
    got = np.asarray(consistency.consistency_mask(
        jnp.asarray(f1), jnp.asarray(f2), band=16, warp_limit=8.0))
    assert got[5, 5] == 0.0
    keep = np.ones((h, w), bool)
    keep[5, 5] = False
    np.testing.assert_array_equal(got[keep], base[keep])


def test_rel_maxabs_ignores_failing_garbage_flow():
    """with_rel_maxabs returns max |flow1| over check-PASSING pixels: a
    block of garbage flow that fails the round trip (new content entering
    the frame) must not grow the band-sizing signal, and the mask itself
    is identical to the two-return form. Computed BEFORE the warp_limit
    backstop, so genuine passing motion beyond the current engine band
    still grows the next bucket."""
    hs, ws = 16, 20
    f1 = np.full((hs, ws, 2), 3.0, np.float32)
    f2 = np.full((hs, ws, 2), -3.0, np.float32)
    f1[6:9, 9:12, 0] = 20.0  # garbage: f2 does not invert it -> fails
    base = consistency.consistency_mask_streaming(
        jnp.asarray(f1), jnp.asarray(f2), None, out_hw=(hs, ws), band=48)
    got, rel = consistency.consistency_mask_streaming(
        jnp.asarray(f1), jnp.asarray(f2), None, out_hw=(hs, ws), band=48,
        with_rel_maxabs=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))
    assert float(rel) == 3.0
    # before-the-backstop: a warp_limit that zeroes EVERY passing pixel
    # leaves the signal untouched (else the bucket could never recover)
    _, rel2 = consistency.consistency_mask_streaming(
        jnp.asarray(f1), jnp.asarray(f2), None, out_hw=(hs, ws), band=48,
        warp_limit=2.0, with_rel_maxabs=True)
    assert float(rel2) == 3.0
    # native-res wrapper, same contract
    _, rel3 = consistency.consistency_mask(
        jnp.asarray(f1), jnp.asarray(f2), band=48, with_rel_maxabs=True)
    assert float(rel3) == 3.0


def test_rel_maxabs_escape_hatch_on_total_failure():
    """When almost nothing passes (scene cut), rel_max falls back to the
    raw max |flow| so the band bucket recovers next pair instead of
    deadlocking small."""
    hs, ws = 16, 20
    rng = np.random.default_rng(7)
    f1 = (rng.random((hs, ws, 2)).astype(np.float32) - 0.5) * 30.0
    f2 = (rng.random((hs, ws, 2)).astype(np.float32) - 0.5) * 30.0
    _, rel = consistency.consistency_mask_streaming(
        jnp.asarray(f1), jnp.asarray(f2), None, out_hw=(hs, ws), band=8,
        with_rel_maxabs=True)
    assert float(rel) == float(np.abs(f1).max())


def test_rel_maxabs_batch_reduces_over_streams():
    """Batched form returns ONE scalar: the max over every stream's
    passing pixels (the VR driver shares one band bucket across faces)."""
    hs, ws = 12, 14
    f1 = np.full((2, hs, ws, 2), 2.0, np.float32)
    f1[1] = 5.0
    f2 = -f1
    certs, rel = consistency.consistency_mask_streaming_batch(
        jnp.asarray(f1), jnp.asarray(f2), None, out_hw=(hs, ws), band=16,
        with_rel_maxabs=True)
    assert certs.shape == (2, hs, ws)
    assert float(rel) == 5.0
